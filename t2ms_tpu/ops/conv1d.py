"""1-D convolution primitives with torch-equivalent shape semantics.

The LA-VAE stacks (reference model/pretrained/vqvae.py, myvqvae.py) are
built from Conv1d(k,s,p) and ConvTranspose1d(k,s,p) with torch semantics:
  conv   out = floor((T + 2p - k)/s) + 1
  convT  out = (T-1)*s - 2p + k

TPU lowering: these are NOT lax.conv ops. XLA realizes tiny NCW 1-D
convolutions terribly on TPU — the round-3 scaled-train profile measured
0.6-0.9 ms device time per VAE conv whose FLOP content is ~25 us (23
convolution fusions = 18.2 ms of a 208 ms step, with the VAE frozen!).
Both primitives therefore lower to single MXU matmuls:

  Conv1d      im2col: K strided views stacked into (B, T_out, K*C),
              contracted with the (K*C, O) reshaped kernel — one matmul
              with a C*K-deep contraction (384 for the k3/c128 res convs).
  ConvT1d     one (B*T, C) @ (C, O*K) matmul producing every tap, then K
              interior-dilated shifted pads summed (lax.pad with negative
              edge padding trims the torch `padding` crop) — the scatter
              relation y[t*s + dk - p] += x[t] @ w[:, :, dk].

Both are algebraically exact (same contraction, reassociated), golden-
tested vs torch in tests/test_conv1d.py and through the full LA-VAE
weight-transplant goldens.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["Conv1d", "ConvTranspose1d"]


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


def conv1d_matmul(x: jnp.ndarray, w: jnp.ndarray, stride: int,
                  padding: int) -> jnp.ndarray:
    """torch-semantics conv1d as one matmul: x (B, C, T), w (O, C, K)
    -> (B, O, T_out)."""
    B, C, T = x.shape
    O, _, K = w.shape
    if padding:
        x = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
    T_out = (T + 2 * padding - K) // stride + 1
    cols = [lax.slice_in_dim(x, dk, dk + (T_out - 1) * stride + 1,
                             stride, axis=2) for dk in range(K)]
    xcol = jnp.stack(cols, axis=1)                   # (B, K, C, T_out)
    xcol = xcol.reshape(B, K * C, T_out).transpose(0, 2, 1)
    wmat = w.transpose(2, 1, 0).reshape(K * C, O)    # K-major, matches xcol
    return (xcol @ wmat).transpose(0, 2, 1)          # (B, O, T_out)


def conv_transpose1d_matmul(x: jnp.ndarray, w: jnp.ndarray, stride: int,
                            padding: int) -> jnp.ndarray:
    """torch-semantics conv_transpose1d as one matmul + K shifted
    interior-dilated pads: x (B, C, T), w (C, O, K) -> (B, O, L_out)
    with L_out = (T-1)*stride - 2*padding + K."""
    B, C, T = x.shape
    _, O, K = w.shape
    L_out = (T - 1) * stride - 2 * padding + K
    dilated = (T - 1) * stride + 1
    z = (x.transpose(0, 2, 1) @ w.reshape(C, O * K))  # (B, T, O*K)
    z = z.reshape(B, T, O, K).transpose(0, 2, 1, 3)   # (B, O, T, K)
    zero = jnp.zeros((), z.dtype)
    y = None
    for dk in range(K):
        lo = dk - padding
        part = lax.pad(z[..., dk], zero,
                       [(0, 0, 0), (0, 0, 0), (lo, L_out - dilated - lo,
                                               stride - 1)])
        y = part if y is None else y + part
    return y


class Conv1d(nn.Module):
    """torch-style Conv1d over (B, C, T), lowered to one MXU matmul."""
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
        y = conv1d_matmul(x, w.astype(x.dtype), self.stride, self.padding)
        if self.use_bias:
            b = self.param("bias", init, (self.features,))
            y = y + b.astype(y.dtype)[None, :, None]
        return y


class ConvTranspose1d(nn.Module):
    """torch-style ConvTranspose1d over (B, C, T), lowered to one MXU
    matmul + K shifted dilated pads. Weight stored in torch convT layout
    (in, out, k) for checkpoint parity."""
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
        w = self.param("kernel", init,
                       (in_ch, self.features, self.kernel_size))
        y = conv_transpose1d_matmul(x, w.astype(x.dtype), self.stride,
                                    self.padding)
        if self.use_bias:
            b = self.param("bias", init, (self.features,))
            y = y + b.astype(y.dtype)[None, :, None]
        return y
