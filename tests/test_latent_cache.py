"""Latent-cache training path (VERDICT r3 #4): one-shot frozen-VAE
encode + precoded=True train step must be numerically identical to the
reference-style per-step encode (train.py:73 — the encoder is frozen and
deterministic, so when it runs cannot change the loss)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from t2ms_tpu.data.loaders import BucketBatcher
from t2ms_tpu.models.denoisers import DiT
from t2ms_tpu.models.vae import LAVAE
from t2ms_tpu.training.trainer import (TrainState, make_denoiser_train_step,
                                       precompute_latent_buckets)


def _setup(T=24, B=4):
    vae = LAVAE(in_channels=1, latent_grid=6)
    dit = DiT(latent_len=6, latent_dim=64)
    x = jax.random.normal(jax.random.key(0), (B, T))
    emb = jax.random.normal(jax.random.key(1), (B, 128))
    vp = vae.init(jax.random.key(2), x)
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(3), z, jnp.zeros(B), emb)
    opt = optax.adamw(1e-3)
    return vae, dit, x, emb, vp, dp, opt


def test_precoded_step_matches_per_step_encode():
    vae, dit, x, emb, vp, dp, opt = _setup()
    st_a = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
    st_b = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
    step = make_denoiser_train_step(dit, vae, opt, "flowmatching", 10,
                                    donate=False)
    step_pre = make_denoiser_train_step(dit, vae, opt, "flowmatching", 10,
                                        donate=False, precoded=True)
    z, _ = vae.apply(vp, x, method=vae.encode)
    for i in range(3):
        k = jax.random.key(10 + i)
        st_a, loss_a = step(st_a, vp, k, x, emb)
        st_b, loss_b = step_pre(st_b, vp, k, z, emb)
        np.testing.assert_allclose(float(loss_a), float(loss_b), atol=1e-6)
    # The loss check above is the identity proof (1e-6 every step). Params
    # drift a bit more: the cached path encodes OUTSIDE the jitted step, so
    # XLA fuses the encoder differently — last-ulp f32 jitter in z, which
    # AdamW's 1/(sqrt(v)+eps) normalization amplifies for near-zero grads
    # over 3 steps (measured max 5.4e-5 vs ~1e-3-scale updates). rtol=0:
    # near-zero params make relative comparison meaningless.
    for a, b in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-4)


def test_precompute_latent_buckets_roundtrip():
    vae, dit, x, emb, vp, dp, opt = _setup(B=10)
    x24 = np.asarray(jax.random.normal(jax.random.key(5), (10, 24)))
    x48 = np.asarray(jax.random.normal(jax.random.key(6), (7, 48)))
    buckets = {
        24: dict(x=x24, embedding=np.zeros((10, 128), np.float32),
                 texts=["t"] * 10),
        48: dict(x=x48, embedding=np.zeros((7, 128), np.float32),
                 texts=["t"] * 7),
    }
    batcher = BucketBatcher(buckets, batch_size=2, seed=0,
                            process_index=0, process_count=1)
    cached = precompute_latent_buckets(vae, vp, batcher, chunk=4)
    assert cached is not None
    # latents match a direct whole-bucket encode (wrap-pad is trimmed)
    for length, raw in ((24, x24), (48, x48)):
        want = np.asarray(vae.apply(vp, jnp.asarray(raw),
                                    method=vae.encode)[0])
        got = cached.buckets[length]["x"]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)
        # non-x columns carried over
        assert cached.buckets[length]["texts"] == ["t"] * raw.shape[0]
    # batch stream composition is preserved (same seed/order/shapes)
    for a, b in zip(batcher.epoch(0), cached.epoch(0)):
        assert a.bucket == b.bucket and len(a) == len(b)


def test_latent_cache_respects_ram_budget():
    vae, dit, x, emb, vp, dp, opt = _setup()
    buckets = {24: dict(x=np.zeros((50, 24), np.float32),
                        embedding=np.zeros((50, 128), np.float32),
                        texts=["t"] * 50)}
    batcher = BucketBatcher(buckets, batch_size=2,
                            process_index=0, process_count=1)
    assert precompute_latent_buckets(vae, vp, batcher, max_bytes=100) is None


def test_precoded_composes_with_grad_accum():
    """precoded=True must give the same loss as the in-step encode under
    gradient accumulation too (microbatch splitting happens on the latent
    batch axis instead of the raw-series one)."""
    vae, dit, x, emb, vp, dp, opt = _setup(B=8)
    z, _ = vae.apply(vp, x, method=vae.encode)
    st_a = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
    st_b = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
    step = make_denoiser_train_step(dit, vae, opt, "flowmatching", 10,
                                    donate=False, accum_steps=2)
    step_pre = make_denoiser_train_step(dit, vae, opt, "flowmatching", 10,
                                        donate=False, accum_steps=2,
                                        precoded=True)
    for i in range(2):
        k = jax.random.key(20 + i)
        st_a, loss_a = step(st_a, vp, k, x, emb)
        st_b, loss_b = step_pre(st_b, vp, k, z, emb)
        np.testing.assert_allclose(float(loss_a), float(loss_b), atol=1e-6)
