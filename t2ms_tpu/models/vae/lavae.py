"""Length-Adaptive VAE (LA-VAE), unified uni/multivariate.

Reference: model/pretrained/vqvae.py (univariate, latent grid hardcoded 30)
and model/pretrained/myvqvae.py (multivariate, grid = flow_dim, plus a final
resize to the exact requested length). One module subsumes both:

  Encoder: Conv1d(k4,s2,p1) -> ReLU -> Conv1d(k4,s2,p1) -> ReLU
           -> Conv1d(k3,s1,p1) -> ResidualStack -> 1x1 Conv to embedding_dim
           -> linear-resize to ``latent_grid``            (the LA trick)
  Decoder: linear-resize latent to length/4 -> Conv1d(k3,s1,p1)
           -> ResidualStack -> ConvT(k4,s2,p1) -> ReLU -> ConvT(k4,s2,p1)
           [-> exact-length resize when ``exact_length_output``]

Training loss = recon MSE + cross MSE(before, after), where ``before`` is
the pre-resize encoder latent and ``after`` the post-resize decoder input
(vqvae.py:123-125) — this cross term is what makes the fixed latent grid
length-consistent.

TPU notes: resizes are matmuls (ops/resize), convs lower to MXU convolutions;
``decode`` takes a *static* length so each length bucket is one compiled
program (no dynamic shapes under jit).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from t2ms_tpu.ops.conv1d import Conv1d, ConvTranspose1d
from t2ms_tpu.ops.resize import linear_resize

__all__ = ["LAVAE", "lavae_loss", "smooth_l1_temporal_loss"]


class ResidualStack(nn.Module):
    """N x residual units, then a final ReLU (reference vqvae.py:7-33).

    IMPORTANT reference quirk reproduced here: the unit's Sequential
    starts with ReLU(inplace=True) (vqvae.py:11), which MUTATES the skip
    operand before the addition in ``x + self._block(x)`` — the reference
    therefore computes relu(x) + conv1(relu(conv3(relu(x)))), i.e. the
    trunk passes through ReLU every unit. Trained reference weights only
    reproduce under these semantics (verified empirically; checkpoint
    interop golden in tests/test_torch_ckpt_import.py)."""
    num_hiddens: int
    num_residual_layers: int
    num_residual_hiddens: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_residual_layers):
            x = nn.relu(x)               # inplace-ReLU aliases the skip
            h = Conv1d(self.num_residual_hiddens, 3, 1, 1, use_bias=False,
                       name=f"res{i}_conv3")(x)
            h = nn.relu(h)
            h = Conv1d(self.num_hiddens, 1, 1, 0, use_bias=False,
                       name=f"res{i}_conv1")(h)
            x = x + h
        return nn.relu(x)


class Encoder(nn.Module):
    in_channels: int
    num_hiddens: int
    num_residual_layers: int
    num_residual_hiddens: int
    embedding_dim: int
    latent_grid: int

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if x.ndim == 2:          # univariate (B, T) -> (B, 1, T)
            x = x[:, None, :]
        h = nn.relu(Conv1d(self.num_hiddens // 2, 4, 2, 1, name="conv1")(x))
        h = nn.relu(Conv1d(self.num_hiddens, 4, 2, 1, name="conv2")(h))
        h = Conv1d(self.num_hiddens, 3, 1, 1, name="conv3")(h)
        h = ResidualStack(self.num_hiddens, self.num_residual_layers,
                          self.num_residual_hiddens, name="res_stack")(h)
        before = Conv1d(self.embedding_dim, 1, 1, 0, name="pre_vq")(h)
        z = linear_resize(before, self.latent_grid)
        return z, before


class Decoder(nn.Module):
    out_channels: int
    num_hiddens: int
    num_residual_layers: int
    num_residual_hiddens: int
    exact_length_output: bool

    @nn.compact
    def __call__(self, z, length: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        after = linear_resize(z, int(length / 4))
        h = Conv1d(self.num_hiddens, 3, 1, 1, name="conv1")(after)
        h = ResidualStack(self.num_hiddens, self.num_residual_layers,
                          self.num_residual_hiddens, name="res_stack")(h)
        h = nn.relu(ConvTranspose1d(self.num_hiddens // 2, 4, 2, 1,
                                    name="convt1")(h))
        x = ConvTranspose1d(self.out_channels, 4, 2, 1, name="convt2")(h)
        if self.exact_length_output:
            x = linear_resize(x, length)   # myvqvae.py:85
        if self.out_channels == 1:
            x = jnp.squeeze(x, axis=1)     # vqvae.py:105 torch.squeeze
        return x, after


class LAVAE(nn.Module):
    """Unified LA-VAE. ``in_channels=1, latent_grid=30,
    exact_length_output=False`` reproduces the T2S vqvae;
    ``in_channels=input_dim, latent_grid=flow_dim,
    exact_length_output=True`` reproduces the T2MS myvqvae."""
    in_channels: int = 1
    num_hiddens: int = 128          # block_hidden_size
    num_residual_layers: int = 2
    num_residual_hiddens: int = 256  # res_hidden_size
    embedding_dim: int = 64
    latent_grid: int = 30           # flow_dim in the motion track
    exact_length_output: bool = False

    def setup(self):
        self.encoder = Encoder(self.in_channels, self.num_hiddens,
                               self.num_residual_layers,
                               self.num_residual_hiddens,
                               self.embedding_dim, self.latent_grid)
        self.decoder = Decoder(self.in_channels, self.num_hiddens,
                               self.num_residual_layers,
                               self.num_residual_hiddens,
                               self.exact_length_output)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z, length: int):
        return self.decoder(z, length)

    def __call__(self, x):
        length = x.shape[-1]
        z, before = self.encoder(x)
        recon, after = self.decoder(z, length)
        return recon, z, before, after


def lavae_loss(model: LAVAE, params, batch: jnp.ndarray):
    """loss = recon MSE + cross MSE(before, after) (vqvae.py:118-135).
    Returns (loss, (recon_error, recon, z)) for value_and_grad(has_aux)."""
    recon, z, before, after = model.apply(params, batch)
    # align channel-squeeze asymmetry EXPLICITLY: a (B, 1, T) batch vs a
    # squeezed (B, T) recon must drop its channel axis — expanding the
    # batch instead broadcast (B,1,1,T) against (B,T) into a silent
    # cross-batch-pair mean
    target = batch
    if target.ndim == recon.ndim + 1 and target.shape[1] == 1:
        target = target[:, 0]
    elif target.ndim + 1 == recon.ndim:
        target = target[:, None, :]
    if target.shape != recon.shape:
        raise ValueError(
            f"batch {batch.shape} does not reconcile with recon "
            f"{recon.shape}")
    recon_error = jnp.mean(jnp.square(recon - target))
    cross = jnp.mean(jnp.square(before - after))
    return recon_error + cross, (recon_error, recon, z)


def smooth_l1_temporal_loss(x, y, lambda_smooth: float = 0.1):
    """myvqvae.custom_loss (myvqvae.py:144-156): smooth-L1 + temporal
    smoothness on first differences. Unused by the reference trainer but
    part of the public surface."""
    def smooth_l1(a, b):
        d = jnp.abs(a - b)
        return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))
    loss = smooth_l1(x, y)
    xd = x[..., 1:] - x[..., :-1]
    yd = y[..., 1:] - y[..., :-1]
    return loss + lambda_smooth * smooth_l1(xd, yd)
