"""Pipeline-parallel tests: pipeline_apply (GPipe schedule over a 'stage'
mesh axis, shard_map + ppermute) must match sequential stage application
exactly — forward and gradients — on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh

from t2ms_tpu.parallel import pipeline_apply


def _stage_fn(params, h):
    w, b = params["w"], params["b"]
    return jnp.tanh(h @ w + b)


def _make(S, D, key):
    ks = jax.random.split(key, 2 * S)
    return {
        "w": jnp.stack([jax.random.normal(ks[i], (D, D)) / np.sqrt(D)
                        for i in range(S)]),
        "b": jnp.stack([0.1 * jax.random.normal(ks[S + i], (D,))
                        for i in range(S)]),
    }


def _sequential(stage_params, x, S):
    h = x
    for s in range(S):
        p = jax.tree_util.tree_map(lambda a: a[s], stage_params)
        h = _stage_fn(p, h)
    return h


def test_pipeline_forward_matches_sequential():
    S, D, B = 4, 16, 8
    mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))
    params = _make(S, D, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (B, D))
    want = _sequential(params, x, S)
    for M in (S, 2 * S):
        got = pipeline_apply(_stage_fn, params, x, mesh, "stage",
                             n_microbatches=M)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_pipeline_gradients_match_sequential():
    S, D, B = 4, 8, 8
    mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))
    params = _make(S, D, jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (B, D))
    tgt = jax.random.normal(jax.random.key(4), (B, D))

    def loss_pp(p):
        return jnp.mean((pipeline_apply(_stage_fn, p, x, mesh, "stage")
                         - tgt) ** 2)

    def loss_seq(p):
        return jnp.mean((_sequential(p, x, S) - tgt) ** 2)

    g_pp = jax.grad(loss_pp)(params)
    g_seq = jax.grad(loss_seq)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_dit_blocks():
    """Real workload: the 4 DiT blocks as 4 pipeline stages (token stream
    (B, N, D) with shared conditioning closed over)."""
    from t2ms_tpu.models.denoisers.dit import DiTBlock

    S, B, N, D = 4, 8, 12, 32
    mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))
    block = DiTBlock(d_model=D, num_heads=4, mlp_ratio=2.0)
    x = jax.random.normal(jax.random.key(0), (B, N, D))
    c = jax.random.normal(jax.random.key(1), (B, D))
    p0 = block.init(jax.random.key(2), x, c)
    # nonzero adaLN so blocks actually transform
    p0 = jax.tree_util.tree_map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.key(5), a.shape),
        p0)
    stacked = jax.tree_util.tree_map(
        lambda a: jnp.stack([a * (1.0 + 0.1 * s) for s in range(S)]), p0)

    # per-microbatch conditioning rides along with the activation
    def fn(params, h):
        tokens, cond = h[:, :N], h[:, N:]
        out = block.apply(params, tokens, cond[:, 0])
        return jnp.concatenate([out, cond], axis=1)

    h0 = jnp.concatenate([x, jnp.repeat(c[:, None, :], 1, 1)], axis=1)
    got = pipeline_apply(fn, stacked, h0, mesh, "stage")[:, :N]
    want = h0
    for s in range(S):
        p = jax.tree_util.tree_map(lambda a: a[s], stacked)
        want = fn(p, want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want[:, :N]),
                               rtol=1e-5, atol=1e-5)
