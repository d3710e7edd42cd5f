"""Fused LN+modulate custom-VJP op (ops.dit_block.mod_ln_diffable):
forward/grad parity vs the eager flax-equivalent oracle, q-block
accumulation of dshift/dscale, and the DiTBlock wiring (param tree
unchanged, numerics within compute-dtype tolerance)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2ms_tpu.ops.dit_block import mod_ln_block_q, mod_ln_diffable


def _oracle(x, mod2, eps=1e-6):
    """Flax-equivalent eager math: param-free LayerNorm (f32 stats) then
    modulate in the compute dtype (models/denoisers/dit._modulate)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps))
    return (y * (1.0 + mod2[:, 1][:, None, :].astype(jnp.float32))
            + mod2[:, 0][:, None, :].astype(jnp.float32)).astype(x.dtype)


def _inputs(dtype, B=3, N=16, D=24, seed=0):
    ks = jax.random.split(jax.random.key(seed), 2)
    x = jax.random.normal(ks[0], (B, N, D), dtype)
    mod2 = jax.random.normal(ks[1], (B, 2, D), dtype) * 0.3
    return x, mod2


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_parity(dtype):
    x, mod2 = _inputs(dtype)
    got = mod_ln_diffable(x, mod2, 1e-6, 0, True)
    want = _oracle(x, mod2)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=tol)


def test_grad_parity_f32():
    x, mod2 = _inputs(jnp.float32)
    w = jax.random.normal(jax.random.key(7), x.shape)

    def loss_fused(x, m):
        return jnp.sum(w * mod_ln_diffable(x, m, 1e-6, 0, True))

    def loss_oracle(x, m):
        return jnp.sum(w * _oracle(x, m))

    gx, gm = jax.grad(loss_fused, argnums=(0, 1))(x, mod2)
    ox, om = jax.grad(loss_oracle, argnums=(0, 1))(x, mod2)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ox), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(om), atol=1e-5)


def test_grad_accumulates_across_q_blocks():
    """Explicit block_q < N exercises the dmod f32-scratch accumulation
    across the q-block grid axis (zero at i==0, flush at the last)."""
    x, mod2 = _inputs(jnp.float32, B=2, N=16, D=128, seed=1)

    def loss(x, m, bq):
        return jnp.sum(jnp.sin(mod_ln_diffable(x, m, 1e-6, bq, True)))

    g1 = jax.grad(loss, argnums=(0, 1))(x, mod2, 16)      # one block
    g4 = jax.grad(loss, argnums=(0, 1))(x, mod2, 4)       # four blocks
    for a, b in zip(g1, g4):
        # 1e-5: f32 reassociation between one- and four-block sums
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_envelope():
    assert mod_ln_block_q(1024, 512, 2) in (256, 512)     # scaled train
    assert mod_ln_block_q(4096, 128, 2) >= 512            # long-series
    assert mod_ln_block_q(480, 128, 2) == 480             # reference scale
    assert mod_ln_block_q(100, 128, 2) == 0               # ragged N
    assert mod_ln_block_q(512, 96, 2) == 0                # lane-unaligned D
    # a q-block always divides N
    for n in (384, 768, 1024, 2048):
        bq = mod_ln_block_q(n, 512, 2)
        assert bq and n % bq == 0


def test_dit_block_wiring(monkeypatch):
    """DiTBlock with the fused kernel forced on (interpret on CPU) must
    match the default XLA path — same param tree, same forward, same
    grads — since the block LNs are parameter-free."""
    from t2ms_tpu.models.denoisers.dit import DiTBlock
    blk = DiTBlock(d_model=32, num_heads=4, mlp_ratio=2.0)
    x = jax.random.normal(jax.random.key(0), (2, 8, 32))
    c = jax.random.normal(jax.random.key(1), (2, 32))

    monkeypatch.setenv("T2MS_FUSED_MOD_LN", "0")
    params = blk.init(jax.random.key(2), x, c)
    # adaLN-zero init makes shift/scale/gates 0 — perturb so the
    # modulate path actually transforms
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.key(3), a.shape),
        params)
    out_ref = blk.apply(params, x, c)
    g_ref = jax.grad(lambda p: jnp.sum(jnp.square(
        blk.apply(p, x, c))))(params)

    monkeypatch.setenv("T2MS_FUSED_MOD_LN", "1")
    params_fused = blk.init(jax.random.key(2), x, c)
    assert (jax.tree_util.tree_structure(params_fused)
            == jax.tree_util.tree_structure(params))
    out_fused = blk.apply(params, x, c)
    g_fused = jax.grad(lambda p: jnp.sum(jnp.square(
        blk.apply(p, x, c))))(params)

    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
