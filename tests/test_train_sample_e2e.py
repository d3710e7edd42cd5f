"""End-to-end slice: tiny synthetic corpus -> VAE pretrain -> denoiser train
-> CFG sampling, on CPU (SURVEY.md §4(c)). Loss must drop; shapes must hold;
the sampler must be deterministic under jit and sensitive to cfg_scale."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from t2ms_tpu.models.denoisers import DiT
from t2ms_tpu.models.vae import LAVAE
from t2ms_tpu.training.trainer import (TrainState, make_denoiser_train_step,
                                       make_vae_train_step)
from t2ms_tpu.sampling import make_cfg_sampler, decode_trajectory


def _toy_data(key, n=32, T=24):
    tt = jnp.linspace(0, 1, T)
    freqs = jax.random.uniform(key, (n, 1), minval=1.0, maxval=3.0)
    x = jnp.sin(2 * jnp.pi * freqs * tt[None, :])
    emb = jax.nn.one_hot(jnp.arange(n) % 8, 32)
    return x.astype(jnp.float32), emb.astype(jnp.float32)


def test_e2e_vae_then_denoiser_then_sample():
    key = jax.random.key(0)
    x, emb = _toy_data(key)
    vae = LAVAE(in_channels=1, latent_grid=6, num_hiddens=32,
                num_residual_hiddens=32, embedding_dim=8)
    vae_params = vae.init(jax.random.key(1), x)

    # --- VAE pretrain ---
    opt_v = optax.adamw(1e-3)
    sv = TrainState(vae_params, opt_v.init(vae_params), jnp.zeros((), jnp.int32))
    vstep = make_vae_train_step(vae, opt_v, donate=False)
    first = None
    for i in range(60):
        sv, (loss_v, recon) = vstep(sv, x)
        if first is None:
            first = float(loss_v)
    assert float(loss_v) < first, (first, float(loss_v))
    vae_params = sv.params

    # --- denoiser train (flowmatching) ---
    dit = DiT(latent_len=6, latent_dim=8, d_model=32, depth=2, num_heads=2)
    z, _ = vae.apply(vae_params, x, method=vae.encode)
    d_params = dit.init(jax.random.key(2), z, jnp.zeros(x.shape[0]), emb)
    opt_d = optax.adamw(1e-3)
    sd = TrainState(d_params, opt_d.init(d_params), jnp.zeros((), jnp.int32))
    dstep = make_denoiser_train_step(dit, vae, opt_d, "flowmatching",
                                     total_step=10, donate=False)
    losses = []
    for i in range(80):
        sd, loss_d = dstep(sd, vae_params, jax.random.fold_in(key, i), x, emb)
        losses.append(float(loss_d))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), (
        np.mean(losses[:10]), np.mean(losses[-10:]))

    # --- sampling ---
    sampler = make_cfg_sampler(dit, vae, "flowmatching", total_step=10,
                               cfg_scale=3.0, out_length=24,
                               collect_trajectory=True)
    out = sampler(sd.params, vae_params, jax.random.key(9), x[:4], emb[:4])
    assert out.series.shape == (4, 24)
    assert out.latent.shape == out.latent_enc.shape == (4, 8, 6)
    assert out.trajectory.shape == (10, 4, 8, 6)
    assert bool(jnp.isfinite(out.series).all())

    # deterministic under fixed key
    out2 = sampler(sd.params, vae_params, jax.random.key(9), x[:4], emb[:4])
    np.testing.assert_allclose(np.asarray(out.series),
                               np.asarray(out2.series), atol=1e-6)

    # cfg_scale actually matters
    sampler0 = make_cfg_sampler(dit, vae, "flowmatching", total_step=10,
                                cfg_scale=0.0, out_length=24)
    out0 = sampler0(sd.params, vae_params, jax.random.key(9), x[:4], emb[:4])
    assert not np.allclose(np.asarray(out.series), np.asarray(out0.series))

    # trajectory decode helper
    frames = decode_trajectory(vae, vae_params, out.trajectory, 24)
    assert frames.shape == (10, 24)


def test_ddpm_train_and_sample_smoke():
    key = jax.random.key(3)
    x, emb = _toy_data(key, n=16)
    vae = LAVAE(in_channels=1, latent_grid=6, num_hiddens=32,
                num_residual_hiddens=32, embedding_dim=8)
    vae_params = vae.init(jax.random.key(1), x)
    dit = DiT(latent_len=6, latent_dim=8, d_model=32, depth=2, num_heads=2)
    z, _ = vae.apply(vae_params, x, method=vae.encode)
    d_params = dit.init(jax.random.key(2), z, jnp.zeros(16, jnp.int32), emb)
    opt = optax.adamw(1e-3)
    sd = TrainState(d_params, opt.init(d_params), jnp.zeros((), jnp.int32))
    dstep = make_denoiser_train_step(dit, vae, opt, "ddpm", total_step=10,
                                     donate=False)
    for i in range(5):
        sd, loss = dstep(sd, vae_params, jax.random.fold_in(key, i), x, emb)
    assert np.isfinite(float(loss))

    sampler = make_cfg_sampler(dit, vae, "ddpm", total_step=10,
                               cfg_scale=3.0, out_length=24)
    out = sampler(sd.params, vae_params, jax.random.key(7), x[:2], emb[:2])
    assert out.series.shape == (2, 24)
    assert bool(jnp.isfinite(out.series).all())


def test_train_step_multi_bucket_shapes():
    """Same step_fn compiles per bucket and runs for 24/48/96."""
    vae = LAVAE(in_channels=1, latent_grid=6, num_hiddens=32,
                num_residual_hiddens=32, embedding_dim=8)
    vae_params = vae.init(jax.random.key(0), jnp.ones((4, 24)))
    dit = DiT(latent_len=6, latent_dim=8, d_model=32, depth=2, num_heads=2)
    d_params = dit.init(jax.random.key(1), jnp.ones((4, 8, 6)),
                        jnp.zeros(4), jnp.ones((4, 32)))
    opt = optax.adamw(1e-3)
    sd = TrainState(d_params, opt.init(d_params), jnp.zeros((), jnp.int32))
    step = make_denoiser_train_step(dit, vae, opt, donate=False)
    for T in (24, 48, 96):
        x = jnp.ones((4, T))
        emb = jnp.ones((4, 32))
        sd, loss = step(sd, vae_params, jax.random.key(T), x, emb)
        assert np.isfinite(float(loss))
    assert int(sd.step) == 3
