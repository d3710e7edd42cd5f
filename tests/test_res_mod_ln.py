"""Fused gated-residual + LN + modulate custom-VJP op
(ops.dit_block.res_mod_ln_diffable): forward/grad parity vs the eager
flax-equivalent oracle, q-block accumulation of dgate/dshift/dscale, the
envelope, and the full-DiT pending-residual wiring (param tree unchanged,
both forward and grads match the eager composition)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2ms_tpu.ops.dit_block import res_mod_ln_block_q, res_mod_ln_diffable


def _oracle(x, h, gm3, eps=1e-6):
    """Eager math of the fused boundary: gated residual in the compute
    dtype (models/denoisers/dit.DiTBlock), then param-free LayerNorm
    (f32 stats) + modulate."""
    g = gm3[:, 0][:, None, :]
    y = x + g.astype(x.dtype) * h
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), axis=-1, keepdims=True)
    n = (yf - mu) * jax.lax.rsqrt(var + eps)
    out = (n * (1.0 + gm3[:, 2][:, None, :].astype(jnp.float32))
           + gm3[:, 1][:, None, :].astype(jnp.float32)).astype(x.dtype)
    return out, y


def _inputs(dtype, B=3, N=16, D=24, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(ks[0], (B, N, D), dtype)
    h = jax.random.normal(ks[1], (B, N, D), dtype)
    gm3 = jax.random.normal(ks[2], (B, 3, D), dtype) * 0.3
    return x, h, gm3


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_parity(dtype):
    x, h, gm3 = _inputs(dtype)
    got_out, got_y = res_mod_ln_diffable(x, h, gm3, 1e-6, 0, True)
    want_out, want_y = _oracle(x, h, gm3)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got_out, np.float32),
                               np.asarray(want_out, np.float32), atol=tol)
    np.testing.assert_allclose(np.asarray(got_y, np.float32),
                               np.asarray(want_y, np.float32), atol=tol)


def test_grad_parity_f32():
    """Both outputs carry cotangents (modulated feeds qkv/MLP, the stream
    feeds the next residual) — weight each differently so the test
    catches a swapped/dropped cotangent."""
    x, h, gm3 = _inputs(jnp.float32)
    w1 = jax.random.normal(jax.random.key(7), x.shape)
    w2 = jax.random.normal(jax.random.key(8), x.shape)

    def loss_fused(x, h, m):
        out, y = res_mod_ln_diffable(x, h, m, 1e-6, 0, True)
        return jnp.sum(w1 * out) + jnp.sum(w2 * jnp.sin(y))

    def loss_oracle(x, h, m):
        out, y = _oracle(x, h, m)
        return jnp.sum(w1 * out) + jnp.sum(w2 * jnp.sin(y))

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, h, gm3)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2))(x, h, gm3)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grad_accumulates_across_q_blocks():
    """Explicit block_q < N exercises the dgate/dmod f32-scratch
    accumulation across the q-block grid axis."""
    x, h, gm3 = _inputs(jnp.float32, B=2, N=16, D=128, seed=1)

    def loss(x, h, m, bq):
        out, y = res_mod_ln_diffable(x, h, m, 1e-6, bq, True)
        return jnp.sum(jnp.sin(out)) + jnp.sum(jnp.cos(y))

    g1 = jax.grad(loss, argnums=(0, 1, 2))(x, h, gm3, 16)   # one block
    g4 = jax.grad(loss, argnums=(0, 1, 2))(x, h, gm3, 4)    # four blocks
    for a, b in zip(g1, g4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_envelope():
    assert res_mod_ln_block_q(1024, 512, 2) in (128, 256)   # scaled train
    assert res_mod_ln_block_q(4096, 128, 2) >= 512          # long-series
    assert res_mod_ln_block_q(480, 128, 2) == 480           # reference
    assert res_mod_ln_block_q(100, 128, 2) == 0             # ragged N
    assert res_mod_ln_block_q(512, 96, 2) == 0              # unaligned D
    for n in (384, 768, 1024, 2048):
        bq = res_mod_ln_block_q(n, 512, 2)
        assert bq and n % bq == 0


def test_dit_pending_residual_wiring(monkeypatch):
    """Full DiT with the fused boundary forced on (interpret on CPU) must
    match the default eager composition — same param tree, same forward,
    same grads. This exercises BOTH fusion sites: intra-block
    (attn residual -> MLP mod_ln) and cross-block (trailing MLP residual
    -> next block's leading mod_ln via the pending mechanism), plus the
    eager final boundary feeding the affine final_ln."""
    from t2ms_tpu.models.denoisers.dit import DiT
    dit = DiT(latent_len=8, latent_dim=8, d_model=32, depth=3, num_heads=4,
              mlp_ratio=2.0)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8))
    t = jnp.asarray([0.3, 0.7])
    emb = jax.random.normal(jax.random.key(1), (2, 32))

    monkeypatch.setenv("T2MS_FUSED_RES_LN", "0")
    params = dit.init(jax.random.key(2), x, t, emb)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.key(3), a.shape),
        params)
    out_ref = dit.apply(params, x, t, emb)
    g_ref = jax.grad(lambda p: jnp.sum(jnp.square(
        dit.apply(p, x, t, emb))))(params)

    monkeypatch.setenv("T2MS_FUSED_RES_LN", "1")
    params_fused = dit.init(jax.random.key(2), x, t, emb)
    assert (jax.tree_util.tree_structure(params_fused)
            == jax.tree_util.tree_structure(params))
    out_fused = dit.apply(params, x, t, emb)
    g_fused = jax.grad(lambda p: jnp.sum(jnp.square(
        dit.apply(p, x, t, emb))))(params)

    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_ref)):
        # rtol term: f32 reassociation between the fused one-program
        # boundary and XLA's residual+LN composition on O(100) grads
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=5e-5)
