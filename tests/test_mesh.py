"""Mesh/sharding smoke tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from t2ms_tpu.parallel import data_sharding, make_mesh, shard_batch


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_sharded_mean_matches_local():
    mesh = make_mesh()
    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    xs = shard_batch(mesh, x)
    assert xs.sharding == data_sharding(mesh, 2)
    got = jax.jit(lambda a: jnp.mean(a * 2))(xs)
    assert float(got) == float(np.mean(x * 2))


def test_jit_grad_over_sharded_batch():
    """DP semantics: grads from a sharded batch equal single-device grads."""
    mesh = make_mesh()
    w = jnp.ones((4,))
    x = np.random.default_rng(0).standard_normal((16, 4)).astype(np.float32)

    def loss(w, x):
        return jnp.mean(jnp.square(x @ w))

    g_local = jax.grad(loss)(w, jnp.asarray(x))
    g_shard = jax.jit(jax.grad(loss))(w, shard_batch(mesh, x))
    np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_local),
                               rtol=1e-5, atol=1e-6)
