"""Fused-block serving path: fast_dit_forward (Pallas whole-block kernel,
interpret mode on CPU) must reproduce DiT.apply on the same param tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2ms_tpu.models.denoisers import DiT
from t2ms_tpu.models.denoisers.dit_fast import (fast_dit_forward,
                                                fast_forward_supported)
from t2ms_tpu.ops.dit_block import dit_block_reference, fused_dit_block


def _block_inputs(B=2, N=24, D=32, hidden=64, seed=0):
    r = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(r.standard_normal(s), jnp.float32)
    return dict(x=f(B, N, D), mod=0.1 * f(B, 6, D),
                wqkv=0.2 * f(D, 3 * D), bqkv=0.1 * f(3 * D),
                wproj=0.2 * f(D, D), bproj=0.1 * f(D),
                wfc1=0.2 * f(D, hidden), bfc1=0.1 * f(hidden),
                wfc2=0.2 * f(hidden, D), bfc2=0.1 * f(D))


def test_fused_block_matches_reference_interpret():
    kw = _block_inputs()
    want = dit_block_reference(num_heads=4, **kw)
    got = fused_dit_block(num_heads=4, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fast_dit_forward_matches_flax_apply():
    """Whole-model parity: identical param tree, reference T2S geometry."""
    dit = DiT(latent_len=30, latent_dim=64)
    assert fast_forward_supported(dit)
    B = 2
    x = jax.random.normal(jax.random.key(0), (B, 64, 30))
    t = jnp.array([0.25, 0.75])
    emb = jax.random.normal(jax.random.key(1), (B, 128))
    params = dit.init(jax.random.key(2), x, t, emb)
    # adaLN starts at zeros (adaLN-zero) -> perturb so the blocks act
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.key(3), p.shape),
        params)
    mask = jnp.array([0.0, 1.0])
    want = dit.apply(params, x, t, emb, mask)
    got = fast_dit_forward(dit, params, x, t, emb, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)


def test_fast_dit_forward_no_text():
    dit = DiT(latent_len=30, latent_dim=64)
    x = jax.random.normal(jax.random.key(4), (2, 64, 30))
    t = jnp.array([0.1, 0.9])
    params = dit.init(jax.random.key(5), x, t,
                      jnp.zeros((2, 128)))
    want = dit.apply(params, x, t)
    got = fast_dit_forward(dit, params, x, t, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)


def test_fast_forward_supported_envelope():
    assert fast_forward_supported(DiT(latent_len=30, latent_dim=64))
    # 1024 tokens fit in bf16 (the serving config) but not in f32
    assert fast_forward_supported(
        DiT(latent_len=64, latent_dim=64, compute_dtype=jnp.bfloat16))
    assert not fast_forward_supported(DiT(latent_len=6, latent_dim=8))
    # a scaled DiT must fall back to the flax path (VMEM budget)
    assert not fast_forward_supported(
        DiT(latent_len=64, latent_dim=64, d_model=512, depth=12,
            num_heads=8, mlp_ratio=4.0, compute_dtype=jnp.bfloat16))


def test_fused_stack_matches_per_block():
    """The whole-stack kernel must equal sequential fused blocks."""
    from t2ms_tpu.ops.dit_block import fused_dit_block, fused_dit_stack
    r = np.random.default_rng(7)
    B, N, D, hidden, L = 2, 24, 32, 64, 3
    f = lambda *s: jnp.asarray(r.standard_normal(s), jnp.float32)
    x = f(B, N, D)
    mods = 0.1 * f(B, L, 6, D)
    ws = dict(wqkv=0.2 * f(L, D, 3 * D), bqkv=0.1 * f(L, 3 * D),
              wproj=0.2 * f(L, D, D), bproj=0.1 * f(L, D),
              wfc1=0.2 * f(L, D, hidden), bfc1=0.1 * f(L, hidden),
              wfc2=0.2 * f(L, hidden, D), bfc2=0.1 * f(L, D))
    want = x
    for l in range(L):
        want = fused_dit_block(
            want, mods[:, l], ws["wqkv"][l], ws["bqkv"][l], ws["wproj"][l],
            ws["bproj"][l], ws["wfc1"][l], ws["bfc1"][l], ws["wfc2"][l],
            ws["bfc2"][l], num_heads=4, interpret=True)
    got = fused_dit_stack(x, mods, num_heads=4, interpret=True, **ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)


def test_fused_stack_variants_match_default():
    """The experimental in-kernel attention ('folded' two-matmul
    block-diagonal) and batch-slab (batch_block G > 1) variants must
    agree with the shipped per-element per-head-loop kernel. (On-chip
    A/B ranked the default fastest — scripts/bench_stack_variants.py —
    so these stay opt-in experiments, but their math is pinned here.)"""
    from t2ms_tpu.ops.dit_block import fused_dit_stack
    r = np.random.default_rng(11)
    B, N, D, hidden, L = 4, 24, 32, 64, 2
    f = lambda *s: jnp.asarray(r.standard_normal(s), jnp.float32)
    x = f(B, N, D)
    mods = 0.1 * f(B, L, 6, D)
    ws = dict(wqkv=0.2 * f(L, D, 3 * D), bqkv=0.1 * f(L, 3 * D),
              wproj=0.2 * f(L, D, D), bproj=0.1 * f(L, D),
              wfc1=0.2 * f(L, D, hidden), bfc1=0.1 * f(L, hidden),
              wfc2=0.2 * f(L, hidden, D), bfc2=0.1 * f(L, D))
    base = np.asarray(fused_dit_stack(x, mods, num_heads=4,
                                      interpret=True, **ws))
    for kw in (dict(attn_impl="folded"), dict(batch_block=2),
               dict(attn_impl="folded", batch_block=4)):
        got = fused_dit_stack(x, mods, num_heads=4, interpret=True,
                              **kw, **ws)
        np.testing.assert_allclose(np.asarray(got), base,
                                   rtol=5e-4, atol=1e-5, err_msg=str(kw))
    with pytest.raises(ValueError):
        fused_dit_stack(x, mods, num_heads=4, interpret=True,
                        batch_block=3, **ws)


def test_fused_block_vjp_matches_reference_grads():
    """The whole-block Pallas backward (jax.vjp over _block_math INSIDE
    the kernel, weight grads accumulated across the batch grid) must
    reproduce eager-reference gradients for every input."""
    from t2ms_tpu.ops.dit_block import fused_dit_block_diffable
    kw = _block_inputs(B=3)
    names = list(kw)
    args = [kw[n] for n in names]

    def loss_fused(*a):
        return jnp.sum(jnp.square(
            fused_dit_block_diffable(*a, 4, True)))

    def loss_ref(*a):
        return jnp.sum(jnp.square(dit_block_reference(*a, 4)))

    got = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for g, w, n in zip(got, want, names):
        assert g.shape == kw[n].shape and g.dtype == kw[n].dtype, n
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4,
            err_msg=f"d{n} mismatch")


def test_fused_block_vjp_mixed_dtypes():
    """bf16 activations with f32 mod/weights (the serving/training dtype
    split) must produce cotangents in each primal's OWN dtype — the
    custom_vjp contract rejects a bf16 dmod for an f32 mod primal."""
    from t2ms_tpu.ops.dit_block import fused_dit_block_diffable
    kw = _block_inputs(B=2)
    args = [kw[n] for n in kw]
    args[0] = args[0].astype(jnp.bfloat16)          # x bf16, rest f32

    def loss(*a):
        return jnp.sum(jnp.square(
            fused_dit_block_diffable(*a, 4, True).astype(jnp.float32)))

    grads = jax.grad(loss, argnums=(0, 1, 2))(*args)
    assert grads[0].dtype == jnp.bfloat16           # dx follows x
    assert grads[1].dtype == jnp.float32            # dmod follows mod
    assert grads[2].dtype == jnp.float32            # dw f32
    assert all(bool(jnp.isfinite(g.astype(jnp.float32)).all())
               for g in grads)


def test_fast_dit_train_forward_grads_match_flax():
    """End-to-end training-path parity: grads of the fast train forward
    (per-block fused custom VJP) vs flax DiT.apply grads on the SAME
    param tree — the round-2 verdict's 'Done' check for item 2."""
    from t2ms_tpu.models.denoisers.dit_fast import fast_dit_train_forward
    dit = DiT(latent_len=8, latent_dim=32, d_model=64, depth=2,
              num_heads=4, mlp_ratio=2.0)
    B = 2
    x = jax.random.normal(jax.random.key(0), (B, 32, 8))
    t = jnp.array([0.25, 0.75])
    emb = jax.random.normal(jax.random.key(1), (B, 64))  # d_model-sized
    params = dit.init(jax.random.key(2), x, t, emb)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.key(3), p.shape),
        params)
    mask = jnp.array([0.0, 1.0])
    tgt = jax.random.normal(jax.random.key(6), x.shape)

    def loss_fast(p):
        out = fast_dit_train_forward(dit, p, x, t, emb, mask,
                                     interpret=True)
        return jnp.mean(jnp.square(out - tgt))

    def loss_flax(p):
        return jnp.mean(jnp.square(dit.apply(p, x, t, emb, mask) - tgt))

    lf, gf = jax.value_and_grad(loss_fast)(params)
    lw, gw = jax.value_and_grad(loss_flax)(params)
    np.testing.assert_allclose(float(lf), float(lw), rtol=1e-4)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_w = dict(jax.tree_util.tree_leaves_with_path(gw))
    for path, g in flat_f:
        w = flat_w[path]
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_train_forward_supported_envelope():
    from t2ms_tpu.models.denoisers.dit_fast import train_forward_supported
    # reference geometry in the bf16 training config fits
    assert train_forward_supported(
        DiT(latent_len=30, latent_dim=64, compute_dtype=jnp.bfloat16))
    # explicit attention_impl opts out (oracle/A-B runs)
    assert not train_forward_supported(
        DiT(latent_len=30, latent_dim=64, compute_dtype=jnp.bfloat16,
            attention_impl="einsum"))
    # scaled d_model=512 exceeds the block-VJP envelope
    assert not train_forward_supported(
        DiT(latent_len=64, latent_dim=64, d_model=512, depth=12,
            num_heads=8, mlp_ratio=4.0, compute_dtype=jnp.bfloat16))


def test_fused_block_split_matches_reference_interpret():
    """The three-kernel split path (scaled-geometry serving) must match
    the eager block oracle; block_q override exercises q-blocking on a
    tiny geometry (q row-blocking is exact — full K/V per program)."""
    from t2ms_tpu.ops.dit_block import fused_dit_block_split
    kw = _block_inputs()
    want = dit_block_reference(num_heads=4, **kw)
    got = fused_dit_block_split(num_heads=4, block_q=8, interpret=True,
                                **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_split_dit_forward_matches_flax_apply():
    """Whole-model parity for the split serving path at a small
    qualifying geometry (pc=128, d=128 -> block_q=128 via the
    envelope)."""
    from t2ms_tpu.models.denoisers.dit_fast import (split_dit_forward,
                                                    split_forward_supported)
    dit = DiT(latent_len=8, latent_dim=64)
    assert split_forward_supported(dit)
    B = 2
    x = jax.random.normal(jax.random.key(0), (B, 64, 8))
    t = jnp.array([0.25, 0.75])
    emb = jax.random.normal(jax.random.key(1), (B, 128))
    params = dit.init(jax.random.key(2), x, t, emb)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.key(3), p.shape),
        params)
    mask = jnp.array([0.0, 1.0])
    want = dit.apply(params, x, t, emb, mask)
    got = split_dit_forward(dit, params, x, t, emb, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)


def test_split_forward_supported_envelope():
    from t2ms_tpu.models.denoisers.dit_fast import split_forward_supported
    from t2ms_tpu.ops.dit_block import split_block_q
    # the scaled 56.7M geometry is exactly what the split path is for
    scaled = DiT(latent_len=64, latent_dim=64, d_model=512, depth=12,
                 num_heads=8, mlp_ratio=4.0, compute_dtype=jnp.bfloat16)
    assert split_forward_supported(scaled)
    # envelope picks a q-block that divides N and fits the MLP half
    assert split_block_q(1024, 512, 2048, 8, 2) in (128, 256)
    # tiny geometry: lanes not 128-aligned -> unsupported
    assert not split_forward_supported(DiT(latent_len=6, latent_dim=8))
    # reference 480 tokens: no admissible q-block divides N -> stack
    # path covers it anyway
    assert split_block_q(480, 128, 256, 4, 2) == 0
    # N beyond the largest on-chip-smoked geometry is refused until a
    # kernel_smoke entry covers it
    assert split_block_q(2048, 512, 2048, 8, 2) == 0
    # a block_q override that does not divide N must raise, not leave
    # trailing output rows unwritten
    from t2ms_tpu.ops.dit_block import fused_dit_block_split
    kw = _block_inputs()
    with pytest.raises(ValueError, match="must divide"):
        fused_dit_block_split(num_heads=4, block_q=7, interpret=True, **kw)
