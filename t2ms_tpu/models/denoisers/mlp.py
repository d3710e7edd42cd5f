"""MLP denoiser with text cross-attention.

Reference: model/denoiser/mlp.py — 8 stacked layers; each layer adds a
64-d time embedding (broadcast over the token axis), applies text
cross-attention (query from the series, key/value from a 128-d text
embedding repeated over tokens), a LayerNorm, an MLP over the feature axis
(64 -> 256 -> 64), and an MLP over the token axis (6 -> 256 -> 6).

The reference hardcodes latents of shape (B, 64, 6) (mlp.py:49-85); here
``feat_dim``/``latent_len`` are parameters with those defaults so the module
generalizes. Unused reference submodules (norm1/norm3/self_attn/self_attn2/
pos_emb, defined but never called in mlp.py:71-85) are not instantiated —
behavior, not dead weight, is what we reproduce.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from t2ms_tpu.models.denoisers.dit import time_embedding

__all__ = ["MLPDenoiser"]


def _xavier():
    return nn.initializers.xavier_uniform()


def _torch_linear(fan_in: int):
    """torch nn.Linear default init (reference mlp.py uses plain Linears
    with NO custom init): kernel kaiming_uniform(a=sqrt(5)) ==
    U(+-sqrt(1/fan_in)), bias U(+-1/sqrt(fan_in)). Flax's lecun_normal +
    zero bias starts the same forward math at a different point —
    measurably slower training on this architecture (BASELINE.md round-2
    MLP gate section) — so from-scratch dynamics match torch only with
    these bounds. Transplant parity tests are init-independent."""
    bound = fan_in ** -0.5

    def bias(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return dict(
        kernel_init=nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"),
        bias_init=bias)


class _TextCrossAttention(nn.Module):
    """Cross-attention from series tokens to text tokens
    (reference mlp.py:21-47)."""
    n_embd: int
    condition_dim: int
    n_head: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_output):
        B, T, _ = x.shape
        T_E = encoder_output.shape[1]
        C, h = self.n_embd, self.n_head
        hd = C // h
        k = nn.Dense(C, dtype=self.compute_dtype, name="key",
                     **_torch_linear(self.condition_dim))(encoder_output)
        q = nn.Dense(C, dtype=self.compute_dtype, name="query",
                     **_torch_linear(C))(x)
        v = nn.Dense(C, dtype=self.compute_dtype, name="value",
                     **_torch_linear(self.condition_dim))(encoder_output)
        q = q.reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T_E, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T_E, h, hd).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
        att = jax.nn.softmax(att.astype(jnp.float32), -1).astype(
            self.compute_dtype)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(C, dtype=self.compute_dtype, name="proj",
                        **_torch_linear(C))(y)


class _MLPLayer(nn.Module):
    feat_dim: int
    latent_len: int
    text_dim: int
    hidden: int
    n_head: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, text_emb, text_mask=None):
        dtype = self.compute_dtype
        # time embedding over the feature axis, broadcast over tokens
        # (mlp.py:73-75: t_emb (B, feat) -> (B, feat, 1) + input (B, feat, L))
        temb = time_embedding(t, self.feat_dim).astype(dtype)
        x = x + temb[:, :, None]
        h = x.transpose(0, 2, 1)                       # (B, L, feat)
        if text_emb is not None:
            text_tokens = jnp.repeat(text_emb[:, None, :].astype(dtype),
                                     self.latent_len, axis=1)
            attn = _TextCrossAttention(self.feat_dim, self.text_dim,
                                       self.n_head, dtype,
                                       name="cross_attn")(h, text_tokens)
            if text_mask is not None:
                # mask=0 zeroes the whole cross-attn RESIDUAL — exactly the
                # reference's text_input=None skip (mlp.py:77, infer.py:79).
                # Zeroing only the embedding would be wrong here: the k/v/
                # proj biases would still inject a learned offset.
                attn = attn * text_mask[:, None, None].astype(dtype)
            h = h + attn
        h = nn.LayerNorm(dtype=dtype, name="norm")(h)
        m = nn.Dense(self.hidden, dtype=dtype, name="mlp_fc1",
                     **_torch_linear(self.feat_dim))(h)
        m = nn.relu(m)
        m = nn.Dense(self.feat_dim, dtype=dtype, name="mlp_fc2",
                     **_torch_linear(self.hidden))(m)
        h = h + m
        h = h.transpose(0, 2, 1)                       # (B, feat, L)
        m2 = nn.Dense(self.hidden, dtype=dtype, name="mlp2_fc1",
                      **_torch_linear(self.latent_len))(h)
        m2 = nn.relu(m2)
        return nn.Dense(self.latent_len, dtype=dtype, name="mlp2_fc2",
                        **_torch_linear(self.hidden))(m2)


class MLPDenoiser(nn.Module):
    """8-layer MLP denoiser (reference mlp.py:87-94).

    Input latent (B, feat_dim, latent_len); returns the same shape.
    """
    feat_dim: int = 64
    latent_len: int = 6
    text_dim: int = 128
    depth: int = 8
    hidden: int = 256
    n_head: int = 4
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 text_emb: Optional[jnp.ndarray] = None,
                 text_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``text_mask`` (B,) of {0,1}: per-sample conditioning switch. 0
        suppresses the cross-attn residual entirely — the jittable
        equivalent of the reference's text_input=None path (mlp.py:77),
        enabling a single fused CFG forward over the stacked cond/uncond
        batch."""
        h = x.astype(self.compute_dtype)
        for i in range(self.depth):
            h = _MLPLayer(self.feat_dim, self.latent_len, self.text_dim,
                          self.hidden, self.n_head, self.compute_dtype,
                          name=f"layer_{i}")(h, t, text_emb, text_mask)
        return h.astype(x.dtype)
