"""Shared CLI plumbing: model factories and state helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from t2ms_tpu.models.denoisers import DiT, MLPDenoiser
from t2ms_tpu.models.vae import LAVAE
from t2ms_tpu.training.trainer import TrainState

__all__ = ["build_denoiser", "build_t2s_vae", "build_motion_vae",
           "init_denoiser_state", "DENOISER_CHOICES"]

DENOISER_CHOICES = ("DiT", "MLP")


def build_denoiser(name: str, latent_len: int, latent_dim: int = 64,
                   compute_dtype=jnp.float32):
    """Reference factory {'DiT': Transformer, 'MLP': MLP} (train.py:16,
    mytrain.py:23) — parametric latent geometry instead of two copies.
    ``compute_dtype`` is the activation dtype (params stay f32; bf16 is
    the TPU serving config, BASELINE.md)."""
    if name == "DiT":
        return DiT(latent_len=latent_len, latent_dim=latent_dim,
                   compute_dtype=compute_dtype)
    if name == "MLP":
        return MLPDenoiser(feat_dim=latent_dim, latent_len=latent_len,
                           compute_dtype=compute_dtype)
    raise ValueError("No denoiser found")


def build_t2s_vae(args=None) -> LAVAE:
    """T2S LA-VAE at the reference pretraining defaults
    (pretrained_lavae_unified.py:119-122)."""
    g = (lambda k, d: getattr(args, k, d)) if args is not None else (
        lambda k, d: d)
    return LAVAE(in_channels=1,
                 num_hiddens=g("block_hidden_size", 128),
                 num_residual_layers=g("num_residual_layers", 2),
                 num_residual_hiddens=g("res_hidden_size", 256),
                 embedding_dim=g("embedding_dim", 64),
                 latent_grid=g("latent_grid", 30),
                 exact_length_output=False)


def build_motion_vae(args) -> LAVAE:
    """Motion conv VAE (model/pretrained/myvqvae.py topology): channels =
    input_dim, latent grid = flow_dim, exact-length decode."""
    return LAVAE(in_channels=args.input_dim,
                 num_hiddens=getattr(args, "block_hidden_size", 128),
                 num_residual_layers=getattr(args, "num_residual_layers", 3),
                 num_residual_hiddens=getattr(args, "res_hidden_size", 256),
                 embedding_dim=getattr(args, "embedding_dim", 64),
                 latent_grid=args.flow_dim,
                 exact_length_output=True)


def init_denoiser_state(denoiser, optimizer, latent_shape, emb_dim=128,
                        seed=0) -> TrainState:
    x = jnp.zeros((2,) + tuple(latent_shape))
    params = denoiser.init(jax.random.key(seed), x, jnp.zeros(2),
                           jnp.zeros((2, emb_dim)))
    return TrainState(params, optimizer.init(params),
                      jnp.zeros((), jnp.int32))
