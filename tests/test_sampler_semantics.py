"""Sampler semantic tests: trajectory endpoints, CFG linearity identity,
DDPM backward time indexing, and euler-step consistency with a manual
Python-loop reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from t2ms_tpu.models.backbones import rectified_flow as rf
from t2ms_tpu.models.denoisers import DiT
from t2ms_tpu.models.vae import LAVAE
from t2ms_tpu.sampling import make_cfg_sampler


def _setup(B=4, T=24):
    vae = LAVAE(in_channels=1, latent_grid=6, num_hiddens=16,
                num_residual_hiddens=16, embedding_dim=8)
    x = jax.random.normal(jax.random.key(0), (B, T))
    vp = vae.init(jax.random.key(1), x)
    dit = DiT(latent_len=6, latent_dim=8, d_model=32, depth=1, num_heads=2)
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(2), z, jnp.zeros(B), jnp.zeros((B, 32)))
    dp = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.key(3), p.shape),
        dp)
    emb = jax.random.normal(jax.random.key(4), (B, 32))
    return vae, vp, dit, dp, x, emb


def test_scan_sampler_matches_python_loop():
    """The fused lax.scan sampler must equal a hand-rolled python loop with
    two separate forwards per step (the reference structure)."""
    vae, vp, dit, dp, x, emb = _setup()
    steps, cfg = 7, 3.0
    sampler = make_cfg_sampler(dit, vae, "flowmatching", steps, cfg, 24)
    out = sampler(dp, vp, jax.random.key(9), x, emb)

    z_enc, _ = vae.apply(vp, x, method=vae.encode)
    x_t = jax.random.normal(jax.random.key(9), z_enc.shape, z_enc.dtype)
    for j in range(steps):
        t = jnp.full((x.shape[0],), j / steps)
        pu = dit.apply(dp, x_t, t, jnp.zeros_like(emb))
        pc = dit.apply(dp, x_t, t, emb)
        pred = pu + cfg * (pc - pu)
        x_t = rf.euler(x_t, pred, 1.0 / steps)
    series, _ = vae.apply(vp, x_t, 24, method=vae.decode)
    np.testing.assert_allclose(np.asarray(out.latent), np.asarray(x_t),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.series), np.asarray(series),
                               rtol=2e-4, atol=2e-5)


def test_trajectory_last_equals_final_latent():
    vae, vp, dit, dp, x, emb = _setup()
    sampler = make_cfg_sampler(dit, vae, "flowmatching", 5, 2.0, 24,
                               collect_trajectory=True)
    out = sampler(dp, vp, jax.random.key(1), x, emb)
    np.testing.assert_allclose(np.asarray(out.trajectory[-1]),
                               np.asarray(out.latent), atol=1e-6)


def test_cfg_scale_one_equals_plain_conditional():
    """At cfg_scale=1, pred == conditional prediction exactly."""
    vae, vp, dit, dp, x, emb = _setup()
    s1 = make_cfg_sampler(dit, vae, "flowmatching", 5, 1.0, 24)
    out1 = s1(dp, vp, jax.random.key(2), x, emb)

    z_enc, _ = vae.apply(vp, x, method=vae.encode)
    x_t = jax.random.normal(jax.random.key(2), z_enc.shape, z_enc.dtype)
    for j in range(5):
        t = jnp.full((x.shape[0],), j / 5)
        pred = dit.apply(dp, x_t, t, emb)
        x_t = rf.euler(x_t, pred, 1.0 / 5)
    np.testing.assert_allclose(np.asarray(out1.latent), np.asarray(x_t),
                               rtol=2e-4, atol=2e-5)
