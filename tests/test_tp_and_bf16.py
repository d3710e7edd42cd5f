"""Tensor-parallel sharding and bf16 compute tests."""

import jax
import jax.numpy as jnp
import numpy as np

from t2ms_tpu.models.denoisers import DiT
from t2ms_tpu.parallel import make_mesh, shard_batch
from t2ms_tpu.parallel.tp import dit_param_spec, shard_dit_params


def _setup(attention_impl="einsum", compute_dtype=jnp.float32):
    dit = DiT(latent_len=30, latent_dim=64, compute_dtype=compute_dtype,
              attention_impl=attention_impl)
    x = jax.random.normal(jax.random.key(0), (8, 64, 30))
    t = jnp.linspace(0, 1, 8)
    emb = jax.random.normal(jax.random.key(1), (8, 128))
    params = DiT(latent_len=30, latent_dim=64).init(
        jax.random.key(2), x, t, emb)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.key(3), p.shape),
        params)
    return dit, params, x, t, emb


def test_tp_sharded_forward_matches_replicated():
    """DiT forward on a (4 data x 2 model) mesh with Megatron-style param
    sharding equals the single-device result."""
    dit, params, x, t, emb = _setup()
    want = dit.apply(params, x, t, emb)

    mesh = make_mesh(data=4, model=2)
    spec = dit_param_spec(params)
    # qkv kernels split over model axis, biases replicated
    flat = jax.tree_util.tree_flatten_with_path(spec)[0]
    qkv_specs = [s for p, s in flat if "qkv" in str(p) and s != jax.sharding.PartitionSpec()]
    assert qkv_specs, "expected sharded qkv kernels"

    with mesh:
        sharded = shard_dit_params(params, mesh)
        xs = shard_batch(mesh, np.asarray(x))
        got = jax.jit(lambda p, x, t, e: dit.apply(p, x, t, e))(
            sharded, xs, t, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_bf16_compute_close_to_f32():
    dit32, params, x, t, emb = _setup()
    want = np.asarray(dit32.apply(params, x, t, emb))
    dit16 = DiT(latent_len=30, latent_dim=64,
                compute_dtype=jnp.bfloat16)
    got = np.asarray(dit16.apply(params, x, t, emb))
    assert got.dtype == np.float32          # cast back at the boundary
    # bf16 has ~3 decimal digits; outputs are O(1)
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.05)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.999


def test_bf16_sampler_runs_and_is_finite():
    from t2ms_tpu.models.vae import LAVAE
    from t2ms_tpu.sampling import make_cfg_sampler
    dit = DiT(latent_len=6, latent_dim=8, d_model=32, depth=2, num_heads=2,
              compute_dtype=jnp.bfloat16)
    vae = LAVAE(in_channels=1, latent_grid=6, num_hiddens=32,
                num_residual_hiddens=32, embedding_dim=8)
    x = jax.random.normal(jax.random.key(0), (4, 24))
    vp = vae.init(jax.random.key(1), x)
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(2), z, jnp.zeros(4), jnp.zeros((4, 32)))
    sampler = make_cfg_sampler(dit, vae, "flowmatching", 10, 3.0, 24)
    out = sampler(dp, vp, jax.random.key(3), x,
                  jax.random.normal(jax.random.key(4), (4, 32)))
    assert bool(jnp.isfinite(out.series).all())
