"""Attention kernel tests: flash (Pallas, interpret mode on CPU) and ring
(shard_map over the 8-device mesh) vs the einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2ms_tpu.ops.attention import (attention, einsum_attention,
                                    flash_attention)
from t2ms_tpu.parallel import make_mesh
from t2ms_tpu.parallel.ring_attention import ring_attention_sharded


def _qkv(B=2, H=4, N=512, D=32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(jax.random.normal(k, (B, H, N, D)) for k in ks)


def test_flash_matches_einsum_interpret():
    q, k, v = _qkv()
    want = einsum_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_flash_fallback_on_awkward_shape():
    q, k, v = _qkv(N=100)   # no divisor that's a multiple of 8 -> fallback
    got = flash_attention(q, k, v)
    want = einsum_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dispatcher_modes():
    q, k, v = _qkv(N=256)
    a = attention(q, k, v, impl="einsum")
    b = attention(q, k, v, impl="auto")   # CPU -> einsum
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ring_attention_matches_full():
    mesh = make_mesh()
    q, k, v = _qkv(B=1, H=2, N=64, D=16, seed=3)
    want = einsum_attention(q, k, v)
    got = ring_attention_sharded(q, k, v, mesh, "data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_ring_attention_long_sequence():
    """SUSHI-scale: 2048 tokens sharded 8 ways."""
    mesh = make_mesh()
    q, k, v = _qkv(B=1, H=1, N=2048, D=32, seed=4)
    want = einsum_attention(q, k, v)
    got = ring_attention_sharded(q, k, v, mesh, "data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-5)


def test_dit_with_flash_impl_matches_einsum():
    """Same params, both attention impls, identical outputs (1024 tokens =
    the benchpress DiT token count, block-divisible)."""
    from t2ms_tpu.models.denoisers import DiT
    x = jax.random.normal(jax.random.key(5), (2, 64, 64))  # H=W=64 -> 1024
    t = jnp.array([0.3, 0.7])
    emb = jax.random.normal(jax.random.key(6), (2, 128))
    dit_e = DiT(latent_len=64, latent_dim=64, attention_impl="einsum")
    params = dit_e.init(jax.random.key(0), x, t, emb)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.key(1), p.shape),
        params)
    out_e = dit_e.apply(params, x, t, emb)
    # flash on CPU runs the pallas kernel in interpret mode implicitly? No:
    # use interpret via fallback check — run kernel in interpret mode by
    # monkeypatching would be heavy; instead verify through the dispatcher
    # fallback equivalence at this shape.
    from t2ms_tpu.ops import attention as A
    orig = A.flash_attention

    def interp_flash(q, k, v, **kw):
        kw["interpret"] = True
        return orig(q, k, v, **kw)

    A.flash_attention = interp_flash
    try:
        dit_f = DiT(latent_len=64, latent_dim=64, attention_impl="flash")
        out_f = dit_f.apply(params, x, t, emb)
    finally:
        A.flash_attention = orig
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               rtol=5e-4, atol=5e-5)


def test_vmem_attention_matches_einsum_interpret():
    from t2ms_tpu.ops.attention import vmem_attention
    q, k, v = _qkv(N=64, D=32)
    want = einsum_attention(q, k, v)
    got = vmem_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_flash_dispatcher_is_differentiable():
    """Training through the flash path must produce einsum-equivalent
    gradients (custom VJP recomputes attention eagerly)."""
    from t2ms_tpu.ops import attention as A
    q, k, v = _qkv(N=64, D=32, B=1, H=2)
    orig = A.flash_attention
    A.flash_attention = lambda q, k, v, **kw: orig(q, k, v, interpret=True,
                                                   **kw)
    try:
        def loss_flash(q):
            return jnp.sum(A._flash_diffable(q, k, v) ** 2)

        def loss_einsum(q):
            return jnp.sum(einsum_attention(q, k, v) ** 2)

        g_flash = jax.grad(loss_flash)(q)
        g_einsum = jax.grad(loss_einsum)(q)
    finally:
        A.flash_attention = orig
    np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_einsum),
                               rtol=5e-4, atol=5e-5)


def test_ring_attention_gradients_match_full():
    """Sequence-parallel training viability: grads through the ring equal
    grads through full attention."""
    mesh = make_mesh()
    q, k, v = _qkv(B=1, H=2, N=32, D=8, seed=9)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention_sharded(q, k, v, mesh, "data") ** 2)

    def loss_full(q, k, v):
        return jnp.sum(einsum_attention(q, k, v) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   rtol=5e-4, atol=5e-5)


def test_packed_attention_matches_einsum_interpret():
    from t2ms_tpu.ops.attention import packed_attention
    q, k, v = _qkv(B=2, H=4, N=96, D=32)
    want = einsum_attention(q, k, v)
    for pack in (1, 2, 4, 8):
        got = packed_attention(q, k, v, pack=pack, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)


def test_packed_attention_odd_pack_degrades():
    """bh not divisible by the requested pack: pack halves until it fits."""
    from t2ms_tpu.ops.attention import packed_attention
    q, k, v = _qkv(B=3, H=2, N=32, D=16, seed=7)   # bh = 6
    want = einsum_attention(q, k, v)
    got = packed_attention(q, k, v, pack=4, interpret=True)  # -> pack 2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_packed_dispatcher_is_differentiable():
    """Training through impl='packed' produces einsum-equivalent grads."""
    from t2ms_tpu.ops import attention as A
    q, k, v = _qkv(N=64, D=32, B=1, H=2)
    orig = A.packed_attention
    A.packed_attention = lambda q, k, v, **kw: orig(q, k, v,
                                                    interpret=True, **kw)
    try:
        g_packed = jax.grad(
            lambda q: jnp.sum(A._packed_diffable(q, k, v) ** 2))(q)
        g_einsum = jax.grad(
            lambda q: jnp.sum(einsum_attention(q, k, v) ** 2))(q)
    finally:
        A.packed_attention = orig
    np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_einsum),
                               rtol=5e-4, atol=5e-5)


def test_fused_heads_matches_einsum_interpret():
    from t2ms_tpu.ops.attention import _einsum_natural, fused_heads_attention
    ks = jax.random.split(jax.random.key(11), 3)
    q, k, v = (jax.random.normal(kk, (2, 96, 128)) for kk in ks)
    want = _einsum_natural(q, k, v, 4)
    got = fused_heads_attention(q, k, v, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fused_heads_is_differentiable():
    from t2ms_tpu.ops import attention as A
    ks = jax.random.split(jax.random.key(12), 3)
    q, k, v = (jax.random.normal(kk, (1, 48, 64)) for kk in ks)
    orig = A.fused_heads_attention
    A.fused_heads_attention = lambda *a, **kw: orig(*a, interpret=True, **kw)
    try:
        g_fused = jax.grad(
            lambda q: jnp.sum(A.fused_heads_diffable(q, k, v, 2) ** 2))(q)
        g_eager = jax.grad(
            lambda q: jnp.sum(A._einsum_natural(q, k, v, 2) ** 2))(q)
    finally:
        A.fused_heads_attention = orig
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_eager),
                               rtol=5e-4, atol=5e-5)


def test_dit_with_fused_impl_matches_einsum():
    """attention_impl='fused' (the TPU serving path, interpret mode here)
    equals the einsum DiT output with identical params."""
    from t2ms_tpu.models.denoisers import DiT
    from t2ms_tpu.ops import attention as A
    x = jax.random.normal(jax.random.key(13), (2, 64, 30))
    t = jnp.array([0.3, 0.7])
    emb = jax.random.normal(jax.random.key(14), (2, 128))
    dit_e = DiT(latent_len=30, latent_dim=64, attention_impl="einsum")
    params = dit_e.init(jax.random.key(0), x, t, emb)
    out_e = dit_e.apply(params, x, t, emb)
    orig = A.fused_heads_attention
    A.fused_heads_attention = lambda *a, **kw: orig(*a, interpret=True, **kw)
    try:
        dit_f = DiT(latent_len=30, latent_dim=64, attention_impl="fused")
        out_f = dit_f.apply(params, x, t, emb)
    finally:
        A.fused_heads_attention = orig
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               rtol=5e-4, atol=5e-5)


def test_fused_heads_pallas_bwd_matches_eager_vjp():
    """The Pallas backward kernel (interpret mode) must reproduce the
    eager einsum VJP for dq, dk AND dv."""
    from t2ms_tpu.ops.attention import (_einsum_natural,
                                        fused_heads_attention_bwd)
    ks = jax.random.split(jax.random.key(21), 4)
    q, k, v = (jax.random.normal(kk, (2, 96, 128)) for kk in ks[:3])
    g = jax.random.normal(ks[3], (2, 96, 128))
    _, vjp = jax.vjp(lambda a, b, c: _einsum_natural(a, b, c, 4), q, k, v)
    want = vjp(g)
    # explicit whole-row block: N=96 is below the envelope's floor, and
    # the default path now refuses rather than guessing (see
    # test_bwd_refuses_unfitting_geometry)
    got = fused_heads_attention_bwd(q, k, v, g, 4, block_q=96,
                                    interpret=True)
    for got_i, want_i, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got_i), np.asarray(want_i), rtol=1e-3, atol=1e-4,
            err_msg=f"d{name} mismatch")


def test_fused_heads_pipelined_bwd_matches_eager_vjp():
    """The round-5 PIPELINED backward (dp hoisted ahead of the softmax,
    1/r folded into (bq, D) operands — no (bq, N) normalization pass)
    must stay exact vs the eager einsum VJP, whole-row, blocked AND
    head-grouped."""
    from t2ms_tpu.ops.attention import (_einsum_natural,
                                        fused_heads_attention_bwd)
    ks = jax.random.split(jax.random.key(22), 4)
    q, k, v = (jax.random.normal(kk, (2, 96, 128)) for kk in ks[:3])
    g = jax.random.normal(ks[3], (2, 96, 128))
    _, vjp = jax.vjp(lambda a, b, c: _einsum_natural(a, b, c, 4), q, k, v)
    want = vjp(g)
    for kw in ({"block_q": 96}, {"block_q": 32},
               {"block_q": 48, "head_groups": 2}):
        got = fused_heads_attention_bwd(q, k, v, g, 4, pipelined=True,
                                        interpret=True, **kw)
        for got_i, want_i, name in zip(got, want, "qkv"):
            np.testing.assert_allclose(
                np.asarray(got_i), np.asarray(want_i), rtol=1e-3,
                atol=1e-4, err_msg=f"d{name} mismatch at {kw}")


def test_bwd_refuses_unfitting_geometry():
    """The public backward entry must REFUSE geometries its envelope
    rejects instead of silently running the whole-row kernel that was
    measured to OOM VMEM, and must reject non-dividing explicit blocks
    (a truncated grid leaves gradient rows unwritten)."""
    from t2ms_tpu.ops.attention import (fused_heads_attention_bwd,
                                        fused_heads_attention_bwd_two_pass)
    ks = jax.random.split(jax.random.key(70), 4)
    q, k, v, g = (jax.random.normal(kk, (1, 4096, 128), jnp.bfloat16)
                  for kk in ks)
    with pytest.raises(ValueError, match="no VMEM-fitting"):
        fused_heads_attention_bwd(q, k, v, g, 4, interpret=True)
    qs, ks_, vs, gs = (x[:, :96] for x in (q, k, v, g))
    with pytest.raises(ValueError, match="must divide"):
        fused_heads_attention_bwd(qs, ks_, vs, gs, 4, block_q=64,
                                  interpret=True)
    with pytest.raises(ValueError, match="must divide"):
        fused_heads_attention_bwd_two_pass(qs, ks_, vs, gs, 4,
                                           blocks=(64, 32, 32),
                                           interpret=True)


def test_packed_refuses_vmem_exceeding_geometry():
    """packed_attention halves pack to fit its VMEM budget and raises
    when even pack=1 exceeds it (previously it dispatched a kernel that
    OOMs on chip at N>=1024)."""
    from t2ms_tpu.ops.attention import packed_attention
    ks = jax.random.split(jax.random.key(71), 3)
    q, k, v = (jax.random.normal(kk, (1, 4, 2048, 32), jnp.bfloat16)
               for kk in ks)
    with pytest.raises(ValueError, match="exceeds VMEM"):
        packed_attention(q, k, v, interpret=True)


def test_fused_heads_blocked_q_matches_einsum():
    """Long-series regime: q processed in blocks against full VMEM K/V
    must equal whole-row fused heads / einsum (softmax stays exact)."""
    from t2ms_tpu.ops.attention import (_einsum_natural,
                                        fused_heads_attention)
    ks = jax.random.split(jax.random.key(30), 3)
    q, k, v = (jax.random.normal(kk, (2, 96, 64)) for kk in ks)
    want = _einsum_natural(q, k, v, 2)
    got = fused_heads_attention(q, k, v, 2, block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fused_heads_block_q_envelope():
    from t2ms_tpu.ops.attention import fused_heads_block_q
    assert fused_heads_block_q(480, 128) == 480      # whole-row serving
    assert fused_heads_block_q(1024, 128, 2) == 1024
    bq = fused_heads_block_q(4096, 128, 2)           # long-series: blocked
    assert bq and bq < 4096 and 4096 % bq == 0
    assert fused_heads_block_q(100, 128) == 0        # not lane-aligned
    assert fused_heads_block_q(64, 128) == 0         # too short


def test_fused_heads_blocked_bwd_matches_eager_vjp():
    """Blocked backward (q walked in blocks, dk/dv accumulated in carries)
    must reproduce the eager einsum VJP."""
    from t2ms_tpu.ops.attention import (_einsum_natural,
                                        fused_heads_attention_bwd)
    ks = jax.random.split(jax.random.key(40), 4)
    q, k, v = (jax.random.normal(kk, (2, 96, 64)) for kk in ks[:3])
    g = jax.random.normal(ks[3], (2, 96, 64))
    _, vjp = jax.vjp(lambda a, b, c: _einsum_natural(a, b, c, 2), q, k, v)
    want = vjp(g)
    got = fused_heads_attention_bwd(q, k, v, g, 2, block_q=32,
                                    interpret=True)
    for got_i, want_i, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got_i), np.asarray(want_i), rtol=1e-3, atol=1e-4,
            err_msg=f"d{name} mismatch (blocked)")


def test_two_pass_bwd_matches_eager_vjp():
    """The two-pass long-series backward (dq+stats pass, dk/dv pass) must
    reproduce the eager einsum VJP. Run at a reduced N with explicit
    blocks so interpret mode stays fast; the N=4096 envelope is asserted
    separately and exercised on-chip by scripts/kernel_smoke.py."""
    from t2ms_tpu.ops.attention import (_einsum_natural,
                                        fused_heads_attention_bwd_two_pass)
    ks = jax.random.split(jax.random.key(50), 4)
    q, k, v = (jax.random.normal(kk, (2, 256, 128)) for kk in ks[:3])
    g = jax.random.normal(ks[3], (2, 256, 128))
    _, vjp = jax.vjp(lambda a, b, c: _einsum_natural(a, b, c, 4), q, k, v)
    want = vjp(g)
    got = fused_heads_attention_bwd_two_pass(q, k, v, g, 4,
                                             blocks=(64, 128, 128),
                                             interpret=True)
    for got_i, want_i, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got_i), np.asarray(want_i), rtol=1e-3, atol=1e-4,
            err_msg=f"d{name} mismatch")


def test_two_pass_bwd_envelope_admits_sushi_scale():
    """N=4096 @ HD=128 (the SUSHI long-series training geometry) must now
    have a VMEM-fitting backward (VERDICT r2 #3) — and the envelope still
    refuses what it can't hold."""
    from t2ms_tpu.ops.attention import (_bwd_block_q, _bwd_two_pass_blocks)
    assert _bwd_block_q(4096, 128, 2) == 0       # single-pass can't
    blocks = _bwd_two_pass_blocks(4096, 128, 2)  # two-pass can
    assert blocks is not None
    bq, bk, cq = blocks
    assert 4096 % bq == 0 and 4096 % bk == 0 and 4096 % cq == 0
    # ragged / tiny shapes stay unsupported
    assert _bwd_two_pass_blocks(100, 128, 2) is None
    assert _bwd_two_pass_blocks(128, 128, 2) is None


def test_head_grouped_bwd_matches_eager_vjp():
    """The lane-blocked (head-grouped) single-pass backward — grid walks
    (batch, head group), each program seeing a disjoint (N, HD/G) lane
    slice — must reproduce the eager einsum VJP exactly like the
    ungrouped kernel (heads are independent, so grouping is pure
    blocking)."""
    from t2ms_tpu.ops.attention import (_einsum_natural,
                                        fused_heads_attention_bwd)
    ks = jax.random.split(jax.random.key(60), 4)
    q, k, v = (jax.random.normal(kk, (2, 96, 256)) for kk in ks[:3])
    g = jax.random.normal(ks[3], (2, 96, 256))
    _, vjp = jax.vjp(lambda a, b, c: _einsum_natural(a, b, c, 4), q, k, v)
    want = vjp(g)
    got = fused_heads_attention_bwd(q, k, v, g, 4, block_q=32,
                                    head_groups=2, interpret=True)
    for got_i, want_i, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got_i), np.asarray(want_i), rtol=1e-3, atol=1e-4,
            err_msg=f"d{name} mismatch (head-grouped)")


def test_head_group_envelope():
    """The scaled-train geometry (N=1024, HD=512, 8 heads) must admit a
    head-grouped single-pass backward (the profile-driven round-3 lever:
    5 matmuls vs the two-pass kernel's 7), while HD=128 long-series
    (lane splitting bottoms out at 128 lanes) must not."""
    from t2ms_tpu.ops.attention import _bwd_block_q, _bwd_head_groups
    assert _bwd_block_q(1024, 512, 2) == 0          # full refs blow VMEM
    hg = _bwd_head_groups(1024, 512, 8, 2)
    assert hg is not None
    g, bq = hg
    assert 8 % g == 0 and (512 // g) % 128 == 0 and 1024 % bq == 0
    assert _bwd_head_groups(4096, 128, 4, 2) is None
    assert _bwd_head_groups(100, 512, 8, 2) is None


def test_stats_forward_matches_plain_and_logsumexp():
    """The stats forward must produce the IDENTICAL primal output as the
    plain fused-heads kernel (same math, one extra write) plus the exact
    per-head softmax log-sum-exp."""
    from t2ms_tpu.ops.attention import (fused_heads_attention,
                                        fused_heads_attention_with_stats)
    ks = jax.random.split(jax.random.key(80), 3)
    q, k, v = (jax.random.normal(kk, (2, 96, 128)) for kk in ks)
    out, lse = fused_heads_attention_with_stats(q, k, v, 4, interpret=True)
    want = fused_heads_attention(q, k, v, 4, block_q=96, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-6, atol=1e-7)
    B, N, HD, H = 2, 96, 128, 4
    D = HD // H
    split = lambda x: x.reshape(B, N, H, D).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", split(q) * D ** -0.5, split(k))
    want_lse = jax.nn.logsumexp(s, axis=-1).transpose(0, 2, 1)  # (B, N, H)
    assert lse.shape == (B, N, H) and lse.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               rtol=1e-5, atol=1e-5)


def test_lean_bwd_matches_eager_vjp():
    """The lean backward (probabilities rebuilt as exp(s - lse), softmax
    row term from g.o) must reproduce the eager einsum VJP — whole-row
    and blocked/head-grouped walks."""
    from t2ms_tpu.ops.attention import (_einsum_natural,
                                        fused_heads_attention_bwd_lean,
                                        fused_heads_attention_with_stats)
    ks = jax.random.split(jax.random.key(81), 4)
    q, k, v = (jax.random.normal(kk, (2, 128, 256)) for kk in ks[:3])
    g = jax.random.normal(ks[3], (2, 128, 256))
    o, lse = fused_heads_attention_with_stats(q, k, v, 4, interpret=True)
    _, vjp = jax.vjp(lambda a, b, c: _einsum_natural(a, b, c, 4), q, k, v)
    want = vjp(g)
    for grp, bq in ((1, 128), (2, 64), (4, 32)):
        got = fused_heads_attention_bwd_lean(q, k, v, g, o, lse, 4,
                                             groups=grp, block_q=bq,
                                             interpret=True)
        for got_i, want_i, name in zip(got, want, "qkv"):
            np.testing.assert_allclose(
                np.asarray(got_i), np.asarray(want_i), rtol=1e-3,
                atol=1e-4, err_msg=f"d{name} mismatch (lean g={grp})")


def test_lean_bwd_envelope_and_refusals():
    """Envelope admits the scaled-train geometry; tiny/ragged shapes and
    partial explicit configs are refused."""
    from t2ms_tpu.ops.attention import (_bwd_lean_groups,
                                        fused_heads_attention_bwd_lean)
    got = _bwd_lean_groups(1024, 512, 8, 2)
    assert got is not None
    grp, bq = got
    assert 8 % grp == 0 and (512 // grp) % 128 == 0 and 1024 % bq == 0
    assert _bwd_lean_groups(100, 128, 4, 2) is None
    assert _bwd_lean_groups(64, 128, 4, 2) is None
    ks = jax.random.split(jax.random.key(82), 6)
    q, k, v, g, o = (jax.random.normal(kk, (1, 96, 128)) for kk in ks[:5])
    lse = jax.random.normal(ks[5], (1, 96, 4))
    with pytest.raises(ValueError, match="both groups and block_q"):
        fused_heads_attention_bwd_lean(q, k, v, g, o, lse, 4, groups=2)
    with pytest.raises(ValueError, match="must divide"):
        fused_heads_attention_bwd_lean(q, k, v, g, o, lse, 4, groups=1,
                                       block_q=64, interpret=True)


def test_lean_custom_vjp_wiring(monkeypatch):
    """With T2MS_ATTN_LEAN_BWD=1 the diffable path must save stats in the
    forward and route the backward through the lean kernel (interpret on
    CPU), producing the same gradients as the default path."""
    from t2ms_tpu.ops import attention as A
    ks = jax.random.split(jax.random.key(83), 3)
    q, k, v = (jax.random.normal(kk, (2, 96, 128)) for kk in ks)

    def loss(q, k, v):
        return jnp.sum(jnp.square(A.fused_heads_diffable(q, k, v, 4)))

    monkeypatch.setenv("T2MS_ATTN_LEAN_BWD", "0")
    want = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("T2MS_ATTN_LEAN_BWD", "1")
    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for got_i, want_i, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got_i), np.asarray(want_i), rtol=1e-3, atol=1e-4,
            err_msg=f"d{name} mismatch (lean wiring)")


def test_lean_two_pass_bwd_matches_eager_vjp():
    """The lean two-pass backward (dq pass + dk/dv pass sharing the
    precomputed [lse | delta] stats) must reproduce the eager einsum
    VJP. Reduced N with explicit blocks so interpret mode stays fast;
    the N=4096 envelope is asserted separately and exercised on-chip by
    scripts/kernel_smoke.py."""
    from t2ms_tpu.ops.attention import (
        _einsum_natural, fused_heads_attention_bwd_lean_two_pass,
        fused_heads_attention_with_stats)
    ks = jax.random.split(jax.random.key(84), 4)
    q, k, v = (jax.random.normal(kk, (2, 256, 128)) for kk in ks[:3])
    g = jax.random.normal(ks[3], (2, 256, 128))
    o, lse = fused_heads_attention_with_stats(q, k, v, 4, interpret=True)
    _, vjp = jax.vjp(lambda a, b, c: _einsum_natural(a, b, c, 4), q, k, v)
    want = vjp(g)
    got = fused_heads_attention_bwd_lean_two_pass(q, k, v, g, o, lse, 4,
                                                  blocks=(64, 128, 128),
                                                  interpret=True)
    for got_i, want_i, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got_i), np.asarray(want_i), rtol=1e-3, atol=1e-4,
            err_msg=f"d{name} mismatch (lean two-pass)")


def test_lean_two_pass_envelope():
    """The SUSHI long-series geometry (N=4096 @ HD=128) must admit a
    lean two-pass backward (lane-grouping bottoms out there), with
    dividing blocks; ragged/tiny shapes refused."""
    from t2ms_tpu.ops.attention import (_bwd_lean_groups,
                                        _bwd_lean_two_pass_blocks)
    assert _bwd_lean_groups(4096, 128, 4, 2) is None
    blocks = _bwd_lean_two_pass_blocks(4096, 128, 2)
    assert blocks is not None
    bq, bk, cq = blocks
    assert 4096 % bq == 0 and 4096 % bk == 0 and 4096 % cq == 0
    assert _bwd_lean_two_pass_blocks(100, 128, 2) is None
    assert _bwd_lean_two_pass_blocks(128, 128, 2) is None
