"""1-D convolution primitives with torch-equivalent shape semantics.

The LA-VAE stacks (reference model/pretrained/vqvae.py, myvqvae.py) are
built from Conv1d(k,s,p) and ConvTranspose1d(k,s,p) with torch semantics:
  conv   out = floor((T + 2p - k)/s) + 1
  convT  out = (T-1)*s - 2p + k
We implement both over ``lax.conv_general_dilated`` in NCW layout (the
transposed conv as input-dilation + flipped kernel — the standard algebraic
equivalence), golden-tested vs torch in tests/test_conv1d.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["Conv1d", "ConvTranspose1d"]

_DN = ("NCH", "OIH", "NCH")


def _torch_conv_uniform(fan_in: int):
    """torch Conv1d/ConvTranspose1d default init: kaiming_uniform(a=sqrt(5))
    == U(-1/sqrt(fan_in), 1/sqrt(fan_in)), with torch's fan_in convention
    fan_in = weight.size(1) * kernel_size — i.e. in_ch*k for Conv1d's
    (out, in, k) weight and out_ch*k for ConvTranspose1d's (in, out, k)
    weight (a known torch quirk). The bias uses the same bound. Explicit
    bound rather than flax variance_scaling: the latter's default axis
    convention computes fan_in = in*out on these layouts (4x under-scaled
    for Conv1d(1->64, k=4))."""
    bound = fan_in ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv1d(nn.Module):
    """torch-style Conv1d over (B, C, T)."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[1]
        init = _torch_conv_uniform(in_ch * self.kernel_size)
        w = self.param("kernel", init,
                       (self.features, in_ch, self.kernel_size))
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=_DN)
        if self.use_bias:
            b = self.param("bias", init, (self.features,))
            y = y + b.astype(y.dtype)[None, :, None]
        return y


class ConvTranspose1d(nn.Module):
    """torch-style ConvTranspose1d over (B, C, T): conv of the s-dilated
    input with the flipped kernel, padded k-1-p per side."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[1]
        # torch fan_in = weight.size(1)*k = out_ch*k on the (in, out, k)
        # ConvTranspose layout
        init = _torch_conv_uniform(self.features * self.kernel_size)
        # stored in torch convT layout (in, out, k) for checkpoint parity
        w = self.param("kernel", init,
                       (in_ch, self.features, self.kernel_size))
        w_conv = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (out, in, k)
        pad = self.kernel_size - 1 - self.padding
        y = lax.conv_general_dilated(
            x, w_conv.astype(x.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=_DN)
        if self.use_bias:
            b = self.param("bias", init, (self.features,))
            y = y + b.astype(y.dtype)[None, :, None]
        return y
