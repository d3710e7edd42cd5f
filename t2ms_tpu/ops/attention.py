"""Attention kernels: einsum reference, Pallas flash attention, dispatcher.

The reference uses timm's eager attention (transformer.py:104) — fine at
480 tokens, quadratic-memory at the long-series scale (SUSHI len-2048 and
beyond, SURVEY.md §2.6). The Pallas kernel computes softmax online over KV
blocks so memory is O(block) instead of O(N^2), keeps the running
statistics in VMEM scratch, and tiles Q over the grid.

Layout convention: (B, H, N, D) with D the head dim (lane-aligned 128 when
possible). ``attention()`` dispatches: einsum for short sequences or
non-TPU backends, flash for long sequences on TPU (threshold overridable).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["attention", "einsum_attention", "flash_attention",
           "packed_attention", "fused_heads_attention",
           "fused_heads_attention_with_stats",
           "fused_heads_diffable", "fused_heads_attention_bwd",
           "fused_heads_attention_bwd_lean",
           "fused_heads_attention_bwd_lean_two_pass",
           "fused_heads_attention_bwd_two_pass"]


def einsum_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     scale: Optional[float] = None) -> jnp.ndarray:
    """Reference eager attention (B, H, N, D).

    Softmax runs in the caller's dtype: the sampler is HBM-bandwidth-bound
    on the materialized (N, N) score tensor, and keeping it bf16 is +25%
    end-to-end with outputs matching f32 to correlation 1-1e-15 (softmax's
    internal max-subtraction keeps the exps in [0, 1], where bf16's
    relative precision is ample; the PV matmul accumulates in f32 on the
    MXU). Pass f32 q/k/v for f32 scores."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                  scale: float):
    """One (batch*head, q-block) program: online-softmax scan over KV
    blocks held in VMEM."""
    q = q_ref[0].astype(jnp.float32) * scale            # (block_q, D)
    n_kv = k_ref.shape[1]
    num_blocks = n_kv // block_k

    def body(blk, carry):
        acc, row_max, row_sum = carry
        idx = pl.ds(blk * block_k, block_k)
        k = k_ref[0, idx, :].astype(jnp.float32)
        v = v_ref[0, idx, :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        blk_max = jnp.max(s, axis=-1)
        new_max = jnp.maximum(row_max, blk_max)
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(s - new_max[:, None])
        acc = acc * correction[:, None] + jnp.dot(
            p, v, preferred_element_type=jnp.float32)
        row_sum = row_sum * correction + jnp.sum(p, axis=-1)
        return (acc, new_max, row_sum)

    block_q, d = q.shape
    init = (jnp.zeros((block_q, d), jnp.float32),
            jnp.full((block_q,), -jnp.inf, jnp.float32),
            jnp.zeros((block_q,), jnp.float32))
    acc, _, row_sum = jax.lax.fori_loop(0, num_blocks, body, init)
    o_ref[0] = (acc / row_sum[:, None]).astype(o_ref.dtype)


def _auto_block(n: int, cap: int = 256) -> int:
    """Largest divisor of n that is <= cap and a multiple of 8."""
    best = 0
    for b in range(8, cap + 1, 8):
        if n % b == 0:
            best = b
    return best


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Pallas online-softmax attention, (B, H, N, D) -> same.

    Block sizes must DIVIDE N — padded KEY positions would corrupt the
    softmax without -inf masking, so no padding is done. When no
    admissible block divides N the call falls back to the exact XLA
    einsum path, which materializes the (B, H, N, N) scores in HBM:
    long-series callers must pad/bucket N to a block multiple themselves
    (patch counts here are powers of two times small factors, so the
    auto blocks always divide in practice)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, H, N, D = q.shape
    if block_q is None:
        block_q = _auto_block(N)
    if block_k is None:
        block_k = _auto_block(N)
    if (not block_q or not block_k or N % block_k != 0
            or N % block_q != 0):
        # fall back: correctness first for awkward shapes
        return einsum_attention(q, k, v, scale)
    bh = B * H
    qf = q.reshape(bh, N, D)
    kf = k.reshape(bh, N, D)
    vf = v.reshape(bh, N, D)
    grid = (bh, N // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, N, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, N, D)


def _vmem_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Whole-row attention with VMEM-resident scores: for short/medium N
    the (N, N) score matrix fits on-chip, so softmax never touches HBM."""
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                       preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


def vmem_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: Optional[float] = None,
                   interpret: bool = False) -> jnp.ndarray:
    """Pallas attention keeping the score matrix entirely in VMEM —
    removes the HBM score traffic that bounds the eager path. Valid while
    (N^2 + 3ND) floats fit in VMEM (N up to ~1.5k)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, H, N, D = q.shape
    bh = B * H
    qf = q.reshape(bh, N, D)
    kf = k.reshape(bh, N, D)
    vf = v.reshape(bh, N, D)
    out = pl.pallas_call(
        functools.partial(_vmem_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, N, D), q.dtype),
        grid=(bh,),
        in_specs=[pl.BlockSpec((1, N, D), lambda b: (b, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, N, D)


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One program = ``pack`` (batch*head) rows of attention, scores
    VMEM-resident.

    Round-1's one-(batch,head)-per-program kernel lost to XLA's batched
    einsum at N=480: 2048 tiny programs (~123 KB of input each) can't keep
    the DMA and MXU pipelines full. Packing several rows per program and
    letting Mosaic batch the dots restores the pipeline while still never
    spilling the (N, N) scores to HBM — which is what bounds the einsum
    path (the bf16 score tensor alone is ~1 GB/layer/step at the serving
    op-point, BASELINE.md)."""
    q = q_ref[...].astype(jnp.float32) * scale          # (pack, N, D)
    k = k_ref[...].astype(jnp.float32)
    s = jax.lax.dot_general(                            # (pack, N, N)
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[...] = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[...],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def packed_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     scale: Optional[float] = None, pack: int = 4,
                     interpret: bool = False) -> jnp.ndarray:
    """Pallas attention with ``pack`` (batch*head) rows per program and the
    score matrix entirely in VMEM. The serving-shape winner (N a few
    hundred, D small): removes the HBM score traffic that bounds eager
    attention while keeping programs fat enough to pipeline. ``pack``
    halves automatically until the program's live set fits the VMEM
    budget (s/p f32 + packed p + f32 q/k copies + double-buffered refs);
    raises if even pack=1 does not fit — use flash/einsum there."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, H, N, D = q.shape
    bh = B * H
    bpe = jnp.dtype(q.dtype).itemsize
    vmem = lambda p: p * (N * N * (8 + bpe) + N * D * (8 + 8 * bpe))
    while pack > 1 and (bh % pack or vmem(pack) >= 11 * 2 ** 20):
        pack //= 2
    if vmem(pack) >= 11 * 2 ** 20:
        raise ValueError(
            f"packed attention exceeds VMEM at N={N}, D={D} even at "
            f"pack=1; use flash or einsum for this geometry")
    qf = q.reshape(bh, N, D)
    kf = k.reshape(bh, N, D)
    vf = v.reshape(bh, N, D)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, N, D), q.dtype),
        grid=(bh // pack,),
        in_specs=[pl.BlockSpec((pack, N, D), lambda b: (b, 0, 0))] * 3,
        out_specs=pl.BlockSpec((pack, N, D), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, N, D)


def _fused_heads_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int,
                        scale: float):
    """One program = one batch element, ALL heads, natural (N, H*D) layout.

    Profiling the serving op-point (BASELINE.md; trace 2026-08-16) showed
    eager attention costs ~17 of 21 ms/step: the bf16 (B,H,N,N) probability
    tensor round-trips HBM (~1.9 GB/layer) and the head split/merge
    reshapes copy another ~250 MB/layer. This kernel eliminates both: it
    consumes q/k/v in the PRE-head-split layout the qkv projection already
    produces (head h = lane slice [h*D:(h+1)*D]), keeps every score matrix
    in VMEM, and emits the merged (N, H*D) output the out-projection wants.
    Heads are unrolled as independent 2D dot->softmax->dot chains so the
    compiler can overlap head h's VPU softmax with head h+1's MXU matmuls.
    Softmax runs in bf16 exactly like the XLA einsum path (max-subtraction
    keeps the exps in [0,1] where bf16 is ample); the normalizing division
    is deferred past the PV matmul so it touches (N, D), not (N, N)."""
    for h, sl, o in attn_heads_natural(q_ref[0], k_ref[0], v_ref[0],
                                       num_heads, scale):
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def attn_heads_natural(q_all, k_all, v_all, num_heads: int, scale: float,
                       with_stats: bool = False):
    """Per-head attention on natural (N, H*D) VALUES — the shared core of
    the fused kernels. Yields (head, lane_slice, out_f32) so callers place
    results in their own layout; with ``with_stats`` additionally yields
    the per-row log-sum-exp lse = m + log r (f32), the residual the LEAN
    backward kernel reuses to skip its softmax reductions. See
    _fused_heads_kernel for the why of each precision choice."""
    H = num_heads
    D = q_all.shape[-1] // H
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_all[:, sl] * jnp.asarray(scale, q_all.dtype)
        k = k_all[:, sl]
        v = v_all[:, sl]
        s = jax.lax.dot_general(                      # (N, N) scores, f32
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # Mosaic needs f32 acc
        # stop_gradient on the row max is EXACT (softmax and its
        # normalized PV output are shift-invariant, so dp/dm = 0
        # analytically) and halves the autodiff residual set when this
        # code is differentiated inside the block-VJP kernel: neither
        # the f32 score matrix nor the max-VJP mask must be kept.
        m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp((s - m).astype(q.dtype))          # exp at input width
        r = jnp.sum(e.astype(jnp.float32), axis=-1)   # (N,) f32
        o = jax.lax.dot_general(
            e, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if with_stats:
            yield h, sl, o / r[:, None], m[:, 0] + jnp.log(r)
        else:
            yield h, sl, o / r[:, None]


def attn_heads_folded(q_all, k_all, v_all, num_heads: int, scale: float):
    """ALL heads' attention as TWO matmuls on natural (N, H*D) VALUES —
    an in-kernel alternative to the ``attn_heads_natural`` per-head loop
    for SMALL d_head where that loop issues 2H skinny matmuls with
    pipeline bubbles between them.

    Folding: scores for every head land lane-concatenated in one
    S (N, H*N) = q @ Kblk matmul, where Kblk (H*D, H*N) holds each
    head's transposed K block-diagonally (off-block zeros contribute
    nothing); PV is one E (N, H*N) @ Vstk (H*N, H*D) matmul with V
    placed block-diagonally. MXU pass count is identical to the loop
    (K-depth d<128 already costs one pass either way) — the win is
    2 big matmuls + one wide softmax instead of 2H small matmuls and
    H skinny softmaxes interleaved. Softmax is segment-wise per head
    on lane ranges, numerics identical to the loop (f32 scores, exact
    rowwise softmax, exp at input width, f32 PV accumulation).

    Returns the (N, H*D) f32 attention output (heads already merged)."""
    H = num_heads
    N, HD = q_all.shape
    D = HD // H
    dt = q_all.dtype
    # Static block-diagonal assembly (dynamic_update_slice has no Mosaic
    # lowering): each head's row block is [0 … K_h.T … 0] built by
    # concatenation with Python-int offsets.
    def blockdiag(rows_of, blkw):
        out = []
        for h in range(H):
            parts = []
            if h:
                parts.append(jnp.zeros((rows_of(h).shape[0], h * blkw), dt))
            parts.append(rows_of(h))
            if h < H - 1:
                parts.append(jnp.zeros((rows_of(h).shape[0],
                                        (H - 1 - h) * blkw), dt))
            out.append(jnp.concatenate(parts, axis=1) if len(parts) > 1
                       else parts[0])
        return jnp.concatenate(out, axis=0)

    kblk = blockdiag(lambda h: k_all[:, h * D:(h + 1) * D].T, N)  # (H*D, H*N)
    vstk = blockdiag(lambda h: v_all[:, h * D:(h + 1) * D], D)    # (H*N, H*D)
    s = jax.lax.dot_general(                      # (N, H*N) scores, f32
        q_all * jnp.asarray(scale, dt), kblk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # segment-wise softmax: max/sum per head's N-lane range (exact; see
    # attn_heads_natural for the stop_gradient rationale)
    e_parts, r_parts = [], []
    for h in range(H):
        sh = s[:, h * N:(h + 1) * N]
        m = jax.lax.stop_gradient(jnp.max(sh, axis=-1, keepdims=True))
        eh = jnp.exp((sh - m).astype(dt))
        e_parts.append(eh)
        r_parts.append(jnp.sum(eh.astype(jnp.float32), axis=-1,
                               keepdims=True))
    e = jnp.concatenate(e_parts, axis=-1)         # (N, H*N)
    o = jax.lax.dot_general(
        e, vstk, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # (N, H*D) f32
    r = jnp.concatenate([jnp.broadcast_to(rp, (N, D)) for rp in r_parts],
                        axis=-1)                  # (N, H*D) f32
    return o / r


def fused_heads_block_q(n: int, hd: int, bpe: int = 2,
                        budget: int = 10 * 2 ** 20) -> int:
    """Largest q-block (multiple of 128, divisor of n; or n itself when
    short) whose per-head working set — f32 score block + its exp copy +
    full K/V rows — fits the VMEM budget. 0 = geometry unsupported (fall
    back to flash/einsum)."""
    if n % 8 != 0 or n < 128:
        return 0

    def fits(bq):
        return (bq * n * 4 + bq * n * bpe + 2 * n * hd * bpe
                + 3 * bq * hd * bpe) < budget

    if n <= 1024 and fits(n):
        return n
    for bq in (1024, 512, 384, 256, 128):
        if n % bq == 0 and fits(bq):
            return bq
    return 0


def fused_heads_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          num_heads: int, scale: Optional[float] = None,
                          block_q: Optional[int] = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Head-packed VMEM attention on the natural (B, N, H*D) layout —
    the serving-shape path (see _fused_heads_kernel). No head split/merge
    transposes, no HBM score traffic.

    For long series (N beyond what one program's VMEM holds as a full
    (N, N) score matrix) q is processed in blocks against FULL K/V rows
    resident in VMEM — softmax stays EXACT (each program sees whole score
    rows), unlike online-softmax flash. At the DiT's d=32 head geometry
    this beats both einsum (which round-trips the (B,H,N,N) scores
    through HBM) and the per-(batch,head) flash kernel (which re-loads
    K/V per q-block program and pays f32 online rescaling): measured
    67.8 -> 27.9 ms/step vs einsum at 4096 tokens (BASELINE.md)."""
    B, N, HD = q.shape
    D = HD // num_heads
    if scale is None:
        scale = D ** -0.5
    if block_q is None:
        block_q = fused_heads_block_q(N, HD, jnp.dtype(q.dtype).itemsize)
        if not block_q:
            # geometry outside the kernel envelope (ragged N, too short,
            # or VMEM-exceeding): honor the documented contract and fall
            # back to the einsum path instead of running an unvalidated
            # whole-row kernel on chip (ADVICE r2). Interpret mode keeps
            # the whole-row kernel so CPU tests exercise the kernel math
            # at tiny shapes.
            if interpret:
                block_q = N
            else:
                return _einsum_natural(q, k, v, num_heads, scale)
    if N % block_q != 0:
        # a partial trailing q-block would silently leave output rows
        # unwritten — refuse rather than return garbage
        raise ValueError(f"block_q {block_q} must divide N {N}")
    return pl.pallas_call(
        functools.partial(_fused_heads_kernel, num_heads=num_heads,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, N, HD), q.dtype),
        grid=(B, N // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, HD), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, HD), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v)


def _einsum_natural(q, k, v, num_heads, scale=None):
    """Eager oracle for the natural layout: split -> einsum -> merge."""
    B, N, HD = q.shape
    D = HD // num_heads

    def split(x):
        return x.reshape(B, N, num_heads, D).transpose(0, 2, 1, 3)

    y = einsum_attention(split(q), split(k), split(v), scale)
    return y.transpose(0, 2, 1, 3).reshape(B, N, HD)


def _fused_heads_stats_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                              num_heads: int, scale: float):
    """Forward kernel that ALSO emits the per-row softmax log-sum-exp
    (lse = row_max + log exp_row_sum, f32): identical attention math to
    _fused_heads_kernel, one extra tiny (block_q, H) write. Saved as a
    custom-VJP residual so the lean backward reconstructs the normalized
    probabilities as exp(s - lse) in ONE VPU pass — no max reduce, no sum
    reduce, no divide (see _bwd_lean_kernel)."""
    cols = []
    for h, sl, o, lse in attn_heads_natural(q_ref[0], k_ref[0], v_ref[0],
                                            num_heads, scale,
                                            with_stats=True):
        o_ref[0, :, sl] = o.astype(o_ref.dtype)
        cols.append(lse)
    lse_ref[0] = jnp.stack(cols, axis=-1)                # (block_q, H)


def fused_heads_attention_with_stats(q: jnp.ndarray, k: jnp.ndarray,
                                     v: jnp.ndarray, num_heads: int,
                                     scale: Optional[float] = None,
                                     block_q: Optional[int] = None,
                                     interpret: bool = False):
    """fused_heads_attention that also returns the per-row log-sum-exp,
    shape (B, N, H) f32 — the residual feeding the lean backward. Same
    envelope as the plain forward (the lse block adds <1 MB lane-padded);
    raises outside it: callers gate on fused_heads_block_q +
    _bwd_lean_groups BEFORE choosing this path (the stats are useless
    without a fitting lean backward)."""
    B, N, HD = q.shape
    D = HD // num_heads
    if scale is None:
        scale = D ** -0.5
    if block_q is None:
        block_q = fused_heads_block_q(N, HD, jnp.dtype(q.dtype).itemsize)
        if not block_q:
            if interpret:
                block_q = N
            else:
                raise ValueError(
                    f"no VMEM-fitting stats forward at N={N}, HD={HD}; "
                    f"use fused_heads_attention (einsum fallback) instead")
    if N % block_q != 0:
        raise ValueError(f"block_q {block_q} must divide N {N}")
    qblk = pl.BlockSpec((1, block_q, HD), lambda b, i: (b, i, 0))
    full = pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0))
    return pl.pallas_call(
        functools.partial(_fused_heads_stats_kernel, num_heads=num_heads,
                          scale=scale),
        out_shape=[jax.ShapeDtypeStruct((B, N, HD), q.dtype),
                   jax.ShapeDtypeStruct((B, N, num_heads), jnp.float32)],
        grid=(B, N // block_q),
        in_specs=[qblk, full, full],
        out_specs=[qblk,
                   pl.BlockSpec((1, block_q, num_heads),
                                lambda b, i: (b, i, 0))],
        interpret=interpret,
    )(q, k, v)


def _fused_heads_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref,
                            dv_ref, *, num_heads: int, scale: float):
    """Backward of the fused-heads forward, one program per batch element:
    recompute the probabilities in VMEM (exactly the forward's bf16-exp /
    deferred-normalization recipe) and form dq/dk/dv with the standard
    softmax VJP — ds = p * (dp - rowsum(dp * p)) — without the (N, N)
    tensors ever touching HBM.

    Why (train-step profile 2026-08-16, B=1024): the eager-recompute VJP
    dominated training — the XLA backward materializes the (B, H, N, N)
    probability/gradient tensors in HBM several times per layer
    (2x 5.7 ms transpose-matmul fusions + 5.3 ms softmax-backward
    reduction + the forward recompute, vs 3.7 ms for the whole fused
    forward). 5 NxND matmuls per head, everything VMEM-resident."""
    H = num_heads
    q_all, k_all, v_all, g_all = q_ref[0], k_ref[0], v_ref[0], g_ref[0]
    D = q_all.shape[-1] // H
    dt = q_all.dtype
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_all[:, sl]
        k = k_all[:, sl]
        v = v_all[:, sl]
        g = g_all[:, sl].astype(jnp.float32)
        s = jax.lax.dot_general(                        # (N, N) f32
            q * jnp.asarray(scale, dt), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(dt))                 # forward's bf16 exp
        r = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        p = e.astype(jnp.float32) / r                   # (N, N) probs
        # dv_h = p^T @ g
        dv = jax.lax.dot_general(
            p.astype(dt), g.astype(dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dp = g @ v^T
        dp = jax.lax.dot_general(
            g.astype(dt), v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        t = jnp.sum(dp * p, axis=-1, keepdims=True)     # (N, 1) f32
        ds = (p * (dp - t)).astype(dt)                  # (N, N)
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _fused_heads_bwd_blocked_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref,
                                    dk_ref, dv_ref, *, num_heads: int,
                                    scale: float, block_q: int):
    """Blocked variant of the backward for the long-series regime: one
    program per batch element; per head, q/g are walked in blocks against
    full VMEM K/V rows (softmax rows recomputed exactly, as in the
    blocked forward) while dk/dv accumulate in f32 carries. Only the
    (block_q, N) score tiles are ever live — no (N, N) buffer."""
    H = num_heads
    N = q_ref.shape[1]
    D = q_ref.shape[-1] // H
    dt = q_ref.dtype
    nb = N // block_q
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]

        def body(blk, carry):
            dk_acc, dv_acc = carry
            rows = pl.ds(blk * block_q, block_q)
            q = q_ref[0, rows, sl]
            g = g_ref[0, rows, sl].astype(dt)
            s = jax.lax.dot_general(
                q * jnp.asarray(scale, dt), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (bq, N)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp((s - m).astype(dt))
            r = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            p = e.astype(jnp.float32) / r
            dv_acc = dv_acc + jax.lax.dot_general(
                p.astype(dt), g,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                g, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            t = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = (p * (dp - t)).astype(dt)
            dq = jax.lax.dot_general(
                ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dq_ref[0, rows, sl] = dq.astype(dq_ref.dtype)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            return dk_acc, dv_acc

        zero = jnp.zeros((N, D), jnp.float32)
        dk_acc, dv_acc = jax.lax.fori_loop(0, nb, body, (zero, zero))
        dk_ref[0, :, sl] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv_acc.astype(dv_ref.dtype)


def _bwd_pipelined_blocked_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref,
                                  dk_ref, dv_ref, *, num_heads: int,
                                  scale: float, block_q: int):
    """PIPELINED variant of the blocked single-pass backward (round 5,
    TODO.md's one untried scaled-MFU lever): same refs/grid as
    `_fused_heads_bwd_blocked_kernel`, restructured so the MXU never
    waits on the f32 probability normalization.

    Two changes vs the default kernel:

    1. `dp = g @ v^T` is issued IMMEDIATELY after the score matmul —
       it depends on nothing the softmax produces, so Mosaic can
       overlap it with the row-max/exp/row-sum VPU work instead of
       serializing matmul -> softmax -> matmul as the default's
       program order forces.
    2. The probabilities are NEVER normalized as an (bq, N) tensor.
       With p = e * r^-1 (row scaling), every use of p folds the
       1/r into an (bq, D)-sized operand or output instead:
         dv = e^T @ (g * r^-1)                    [scale g, K=bq]
         t  = rowsum(dp * e) * r^-1               [(bq, 1)]
         ds_u = e * (dp - t)  (unnormalized ds)
         dq = (ds_u @ k) * (scale * r^-1)         [scale the output]
         dk = ds_u^T @ (q * scale * r^-1)         [scale q, K=bq]
       This removes the (bq, N) f32 divide and one (bq, N) cast from
       the critical path between the score matmul and the three
       gradient matmuls. (Algebra: p = e/r row-wise; ds = p*(dp -
       rowsum(dp*p)) = e*(dp - t)*r^-1 with t = rowsum(dp*e)*r^-1;
       row scaling of ds commutes out of dq's rows and into dk's
       contraction operand q.)

    Exact same math as the default backward — only the association of
    the 1/r scaling differs (bf16 rounding moves from the (bq, N) ds
    tensor to the (bq, D) scaled operands, comparable precision).
    Opt-in via T2MS_ATTN_PIPE_BWD=1 until the on-chip A/B decides the
    default (BASELINE.md scaled-train row)."""
    H = num_heads
    N = q_ref.shape[1]
    D = q_ref.shape[-1] // H
    dt = q_ref.dtype
    nb = N // block_q
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]

        def body(blk, carry):
            dk_acc, dv_acc = carry
            rows = pl.ds(blk * block_q, block_q)
            q = q_ref[0, rows, sl]
            g = g_ref[0, rows, sl]
            s = jax.lax.dot_general(
                q * jnp.asarray(scale, dt), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (bq, N)
            # softmax-independent: overlaps the VPU softmax below
            dp = jax.lax.dot_general(
                g.astype(dt), v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (bq, N)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp((s - m).astype(dt))              # fwd's bf16 exp
            ef = e.astype(jnp.float32)
            inv_r = 1.0 / jnp.sum(ef, axis=-1, keepdims=True)  # (bq, 1)
            gs = (g.astype(jnp.float32) * inv_r).astype(dt)    # (bq, D)
            dv_acc = dv_acc + jax.lax.dot_general(
                e, gs, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            t = jnp.sum(dp * ef, axis=-1, keepdims=True) * inv_r
            ds_u = (ef * (dp - t)).astype(dt)            # unnormalized
            dq = jax.lax.dot_general(
                ds_u, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_ref[0, rows, sl] = (dq * (scale * inv_r)).astype(
                dq_ref.dtype)
            qs = (q.astype(jnp.float32) * (scale * inv_r)).astype(dt)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds_u, qs, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dk_acc, dv_acc

        zero = jnp.zeros((N, D), jnp.float32)
        dk_acc, dv_acc = jax.lax.fori_loop(0, nb, body, (zero, zero))
        dk_ref[0, :, sl] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv_acc.astype(dv_ref.dtype)


def _bwd_pass1_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, stats_ref, *,
                      num_heads: int, scale: float):
    """Two-pass long-series backward, pass 1 (grid = batch x q-block):
    full softmax rows against VMEM-resident K/V produce dq for this
    q-block PLUS the per-row stats pass 2 needs — m (row max), r (exp row
    sum) and delta = rowsum(dp * p) (the softmax-VJP row term). stats
    layout (1, bq, 3H) f32, columns [m_h | r_h | delta_h] per head (the
    lane dim must be the full array dim or a multiple of 128; 3H is
    lane-padded but tiny). Design per TODO.md round-2 note: the
    single-pass blocked kernel needs 7 full-row refs (~14.7 MB
    double-buffered at N=4096, over VMEM); splitting dq from dk/dv
    leaves each pass only the refs it actually walks."""
    H = num_heads
    D = q_ref.shape[-1] // H
    dt = q_ref.dtype
    cols = [None] * (3 * H)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        g = g_ref[0, :, sl].astype(dt)
        s = jax.lax.dot_general(
            q * jnp.asarray(scale, dt), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bq, N)
        m = jnp.max(s, axis=-1)                          # (bq,)
        e = jnp.exp((s - m[:, None]).astype(dt))         # forward's recipe
        r = jnp.sum(e.astype(jnp.float32), axis=-1)      # (bq,)
        p = e.astype(jnp.float32) / r[:, None]
        dp = jax.lax.dot_general(
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(dp * p, axis=-1)                 # (bq,)
        ds = (p * (dp - delta[:, None])).astype(dt)
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        cols[h], cols[H + h], cols[2 * H + h] = m, r, delta
    stats_ref[0] = jnp.stack(cols, axis=-1)              # (bq, 3H)


def _bwd_pass2_kernel(q_ref, k_ref, v_ref, g_ref, stats_ref, dk_ref,
                      dv_ref, *, num_heads: int, scale: float,
                      chunk_q: int):
    """Two-pass long-series backward, pass 2 (grid = batch x k-block):
    walk ALL q rows in chunks against this k/v block, rebuilding the
    exact probabilities from pass 1's saved (m, r) — no second row-max
    pass, softmax identical bit-for-bit to the forward recipe — and
    accumulate dk/dv for the block in f32 carries."""
    H = num_heads
    N = q_ref.shape[1]
    D = q_ref.shape[-1] // H
    dt = q_ref.dtype
    nc = N // chunk_q
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        k = k_ref[0, :, sl]                              # (bk, D)
        v = v_ref[0, :, sl]

        def body(c, carry):
            dk_acc, dv_acc = carry
            rows = pl.ds(c * chunk_q, chunk_q)
            q = q_ref[0, rows, sl]
            g = g_ref[0, rows, sl].astype(dt)
            st = stats_ref[0, rows, :]                   # (cq, 3H) f32
            m, r, delta = st[:, h], st[:, H + h], st[:, 2 * H + h]
            s = jax.lax.dot_general(
                q * jnp.asarray(scale, dt), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (cq, bk)
            e = jnp.exp((s - m[:, None]).astype(dt))
            p = e.astype(jnp.float32) / r[:, None]
            dv_acc = dv_acc + jax.lax.dot_general(
                p.astype(dt), g,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                g, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = (p * (dp - delta[:, None])).astype(dt)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            return dk_acc, dv_acc

        bk = k.shape[0]
        zero = jnp.zeros((bk, D), jnp.float32)
        dk_acc, dv_acc = jax.lax.fori_loop(0, nc, body, (zero, zero))
        dk_ref[0, :, sl] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv_acc.astype(dv_ref.dtype)


def _bwd_two_pass_blocks(n: int, hd: int, bpe: int = 2):
    """(block_q, block_k, chunk_q) for the two-pass backward, or None.

    VMEM accounting per the calibrated rules (CLAUDE.md): score tiles
    cost s/p/dp f32 + e/ds at input width + slack = 14 + 2*bpe bytes per
    element, and grid-block refs count DOUBLE (Mosaic prefetches the
    next grid step's buffers). Pass 1 holds 2 full-row refs (k, v) + an
    (bq, N) score tile; pass 2 holds 2 full-row refs (q, g) + the
    lane-padded (N, 3H->128) f32 stats + a (cq, bk) tile. Budget 11 MB =
    ~30% headroom under the 16 MB scoped limit."""
    if n % 8 != 0 or n < 256:
        return None
    budget = 11 * 2 ** 20
    per_elem = 14 + 2 * bpe
    full_row = 2 * 2 * n * hd * bpe          # two refs, double-buffered
    stats = 2 * n * 128 * 4                  # (N, 3H) lane-padded, x2
    p1 = None
    for bq in (256, 128, 64, 32):
        if n % bq == 0 and full_row + per_elem * bq * n < budget:
            p1 = bq
            break
    if p1 is None:
        return None
    for bk in (512, 256, 128):
        cq = 512 if n % 512 == 0 else 256
        if n % bk == 0 and n % cq == 0 \
                and full_row + stats + per_elem * cq * bk < budget:
            return (p1, bk, cq)
    return None


def fused_heads_attention_bwd_two_pass(q, k, v, g, num_heads: int,
                                       scale: Optional[float] = None,
                                       blocks=None, interpret: bool = False):
    """Long-series backward as two Pallas passes (see the pass kernels):
    admits N=4096+ at HD=128 where the single-pass blocked kernel's
    7 full-row refs exceed VMEM. ~7 NxNxD matmuls total (vs 5 minimum;
    the eager fallback instead round-trips several (B, H, N, N) tensors
    through HBM). Returns (dq, dk, dv)."""
    B, N, HD = q.shape
    H = num_heads
    if scale is None:
        scale = (HD // H) ** -0.5
    if blocks is None:
        blocks = _bwd_two_pass_blocks(N, HD, jnp.dtype(q.dtype).itemsize)
        if blocks is None:
            raise ValueError(f"no two-pass geometry for N={N}, HD={HD}")
    bq, bk, cq = blocks
    if N % bq or N % bk or N % cq:
        # a non-dividing block truncates the grid / pass-2 chunk walk and
        # silently drops the tail rows' gradients
        raise ValueError(f"blocks {blocks} must divide N={N}")
    full = pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0))
    qblk = pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0))
    dq, stats = pl.pallas_call(
        functools.partial(_bwd_pass1_kernel, num_heads=H, scale=scale),
        out_shape=[jax.ShapeDtypeStruct((B, N, HD), q.dtype),
                   jax.ShapeDtypeStruct((B, N, 3 * H), jnp.float32)],
        grid=(B, N // bq),
        in_specs=[qblk, full, full, qblk],
        out_specs=[qblk,
                   pl.BlockSpec((1, bq, 3 * H), lambda b, i: (b, i, 0))],
        interpret=interpret,
    )(q, k, v, g)
    kblk = pl.BlockSpec((1, bk, HD), lambda b, j: (b, j, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_pass2_kernel, num_heads=H, scale=scale,
                          chunk_q=cq),
        out_shape=[jax.ShapeDtypeStruct((B, N, HD), q.dtype)] * 2,
        grid=(B, N // bk),
        in_specs=[full, kblk, kblk, full,
                  pl.BlockSpec((1, N, 3 * H), lambda b, j: (b, 0, 0))],
        out_specs=[kblk, kblk],
        interpret=interpret,
    )(q, k, v, g, stats)
    return dq, dk, dv


def _bwd_lean_kernel(q_ref, k_ref, v_ref, g_ref, stats_ref, dq_ref,
                     dk_ref, dv_ref, *, heads_per_group: int, scale: float,
                     block_q: int):
    """LEAN single-pass backward (grid = batch x head-group): reuses the
    forward's saved softmax statistics instead of recomputing them.

    Why (scaled-train profile 2026-08-19, .onchip_r04_profile_precoded):
    the 12 per-layer attention-VJP programs cost ~5.16 ms each — ~30% of
    the 204 ms step — against a ~3.5 ms MXU floor; the gap is VPU passes
    over the (block_q, N) score tiles. The stats block carries, per row
    and head, [lse | delta] (lse = forward log-sum-exp; delta =
    rowsum(g * o) = the softmax-VJP row term via the forward output,
    delta_i = g_i . o_i analytically, precomputed in XLA). That removes
    FOUR tile-wide passes vs the recompute kernels: the max reduce, the
    sum reduce, the normalizing divide (p = exp(s - lse) is ONE exp
    pass), and the (block_q, N) rowsum(dp * p) reduction. Matmul count
    is unchanged (5 per head — the minimum). Heads are walked per lane
    group exactly like _fused_heads_bwd_blocked_kernel; dk/dv accumulate
    in f32 carries across q-blocks."""
    H = heads_per_group
    N = q_ref.shape[1]
    D = q_ref.shape[-1] // H
    dt = q_ref.dtype
    nb = N // block_q
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]

        def body(blk, carry):
            dk_acc, dv_acc = carry
            rows = pl.ds(blk * block_q, block_q)
            q = q_ref[0, rows, sl]
            g = g_ref[0, rows, sl]
            st = stats_ref[0, 0, rows, :]                # (bq, 2H) f32
            lse, delta = st[:, h], st[:, H + h]          # (bq,) each
            s = jax.lax.dot_general(
                q * jnp.asarray(scale, dt), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (bq, N) f32
            p = jnp.exp((s - lse[:, None]).astype(dt))   # normalized, dt
            gd = g.astype(dt)
            dv_acc = dv_acc + jax.lax.dot_general(
                p, gd, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                gd, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = (p.astype(jnp.float32)
                  * (dp - delta[:, None])).astype(dt)
            dq = jax.lax.dot_general(
                ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dq_ref[0, rows, sl] = dq.astype(dq_ref.dtype)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            return dk_acc, dv_acc

        zero = jnp.zeros((N, D), jnp.float32)
        dk_acc, dv_acc = jax.lax.fori_loop(0, nb, body, (zero, zero))
        dk_ref[0, :, sl] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv_acc.astype(dv_ref.dtype)


def _bwd_lean_groups(n: int, hd: int, num_heads: int, bpe: int = 2):
    """(groups, block_q) for the LEAN single-pass backward, or None.
    VMEM accounting per the calibrated rules (CLAUDE.md): 7 lane-grouped
    grid refs (q/k/v/g/dq/dk/dv) count DOUBLE, plus the lane-padded f32
    [lse | delta] stats block and ~16 B per live score element (s f32 +
    p at both widths + dp f32 + ds dt). 11 MB budget = ~30% headroom
    under the 16 MB scoped limit; UNverified estimates stay conservative
    until kernel_smoke passes the geometry on chip (lean_bwd entry).
    Fewest groups first, then block_q descending — the round-3 on-chip
    ranking showed large q-blocks dominate."""
    if n % 8 != 0 or n < 128:
        return None
    d = hd // num_heads
    # Configs MEASURED clean on the real chip at estimates above the
    # general budget (same rule as _bwd_head_groups' proven table).
    # (4, 512) at the scaled geometry: round-5 on-chip A/B ranked it
    # FASTEST of all backward variants (366.6 ms vs grouped-default
    # 411.5 vs the general-envelope lean pick g2/bq128 483.2 per 20
    # reps, `.onchip_r05_attn_ab.log`) — the round-4 in-step lean
    # NEGATIVE was measured through the g2/bq128 envelope pick, not
    # this config. Smoked via kernel_smoke's lean_bwd entry (auto).
    proven = {(1024, 512, 8): (4, 512)}
    got = proven.get((n, hd, num_heads))
    if got:
        return got
    budget = 11 * 2 ** 20
    stats = 2 * n * 128 * 4                  # (1, 1, n, 2Hg) lane-padded, x2
    for g in (1, 2, 4, 8, 16):
        if num_heads % g:
            continue
        ghd = hd // g
        if ghd % 128 or ghd < d:
            continue
        refs = 14 * n * ghd * bpe
        if refs + stats >= budget:
            continue
        cands = ([n] if n <= 1024 else []) + [512, 384, 256, 128, 64, 32]
        for bq in cands:
            if n % bq == 0 and refs + stats + bq * n * 16 < budget:
                return (g, bq)
    return None


def _lean_stats(g, o, lse, num_heads: int):
    """[lse | delta] per (row, head), f32 (B, N, 2H): delta_h =
    rowsum(g_h * o_h) — the softmax-VJP row term from the saved forward
    output, ONE cheap XLA bandwidth pass over (B, N, HD) instead of a
    per-tile (block_q, N) reduction inside the kernel."""
    B, N, HD = g.shape
    D = HD // num_heads
    gh = g.astype(jnp.float32).reshape(B, N, num_heads, D)
    oh = o.astype(jnp.float32).reshape(B, N, num_heads, D)
    delta = jnp.sum(gh * oh, axis=-1)                    # (B, N, H)
    return jnp.concatenate([lse, delta], axis=-1)        # (B, N, 2H)


def fused_heads_attention_bwd_lean(q, k, v, g, o, lse, num_heads: int,
                                   scale: Optional[float] = None,
                                   groups: Optional[int] = None,
                                   block_q: Optional[int] = None,
                                   interpret: bool = False):
    """Dispatcher for the lean (stats-reusing) backward: q/k/v/g plus the
    forward output ``o`` and per-row log-sum-exp ``lse`` (from
    fused_heads_attention_with_stats); returns (dq, dk, dv). delta is
    precomputed in XLA (_lean_stats) and the combined [lse | delta]
    block is regrouped host-side to (B, G, N, 2*H/G) so each
    (batch, group) program reads a contiguous small-lane block (the
    layout trick proven by the two-pass kernel's stats). Raises outside
    the envelope and on non-dividing blocks."""
    B, N, HD = q.shape
    H = num_heads
    if scale is None:
        scale = (HD // H) ** -0.5
    if groups is None or block_q is None:
        if interpret:
            groups, block_q = (groups or 1), (block_q or N)
        elif groups is None and block_q is None:
            got = _bwd_lean_groups(N, HD, H, jnp.dtype(q.dtype).itemsize)
            if got is None:
                raise ValueError(
                    f"no VMEM-fitting lean backward at N={N}, HD={HD}; "
                    f"use the recompute kernels")
            groups, block_q = got
        else:
            # silently replacing a PARTIAL explicit config with the
            # envelope's pick would time/smoke the wrong kernel
            raise ValueError("pass both groups and block_q, or neither")
    G = groups
    if H % G or HD % G:
        raise ValueError(f"groups {G} incompatible with HD={HD}, "
                         f"num_heads={H}")
    if N % block_q:
        raise ValueError(f"block_q {block_q} must divide N={N}")
    Hg = H // G
    ghd = HD // G
    stats = _lean_stats(g, o, lse, H)                    # (B, N, 2H)
    # group-interleave: [lse_g | delta_g] per group gi, shape (B,G,N,2Hg)
    lse_g = stats[..., :H].reshape(B, N, G, Hg)
    del_g = stats[..., H:].reshape(B, N, G, Hg)
    stats_g = jnp.concatenate([lse_g, del_g], axis=-1).transpose(0, 2, 1, 3)
    spec = pl.BlockSpec((1, N, ghd), lambda b, gi: (b, 0, gi))
    return pl.pallas_call(
        functools.partial(_bwd_lean_kernel, heads_per_group=Hg,
                          scale=scale, block_q=block_q),
        out_shape=[jax.ShapeDtypeStruct((B, N, HD), q.dtype)] * 3,
        grid=(B, G),
        in_specs=[spec] * 4 + [pl.BlockSpec((1, 1, N, 2 * Hg),
                                            lambda b, gi: (b, gi, 0, 0))],
        out_specs=[spec] * 3,
        interpret=interpret,
    )(q, k, v, g, stats_g)


def _bwd_lean_p1_kernel(q_ref, k_ref, v_ref, g_ref, stats_ref, dq_ref, *,
                        num_heads: int, scale: float):
    """Lean two-pass backward, pass 1 (grid = batch x q-block): dq for
    this q-block against full VMEM K/V rows, probabilities rebuilt as
    exp(s - lse) and the row term read from the precomputed stats —
    unlike _bwd_pass1_kernel there is NO stats output and NO max/sum/
    divide/rowsum(dp*p) tile passes. 3 matmuls per head."""
    H = num_heads
    D = q_ref.shape[-1] // H
    dt = q_ref.dtype
    st = stats_ref[0]                                    # (bq, 2H) f32
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        g = g_ref[0, :, sl].astype(dt)
        lse, delta = st[:, h], st[:, H + h]
        s = jax.lax.dot_general(
            q * jnp.asarray(scale, dt), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bq, N)
        p = jnp.exp((s - lse[:, None]).astype(dt))
        dp = jax.lax.dot_general(
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p.astype(jnp.float32) * (dp - delta[:, None])).astype(dt)
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)


def _bwd_lean_p2_kernel(q_ref, k_ref, v_ref, g_ref, stats_ref, dk_ref,
                        dv_ref, *, num_heads: int, scale: float,
                        chunk_q: int):
    """Lean two-pass backward, pass 2 (grid = batch x k-block): walk ALL
    q rows in chunks against this k/v block, probabilities from the
    saved lse (one exp pass — _bwd_pass2_kernel additionally pays the
    normalizing divide) and the row term from the precomputed stats;
    dk/dv accumulate in f32 carries. 4 matmuls per head."""
    H = num_heads
    N = q_ref.shape[1]
    D = q_ref.shape[-1] // H
    dt = q_ref.dtype
    nc = N // chunk_q
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        k = k_ref[0, :, sl]                              # (bk, D)
        v = v_ref[0, :, sl]

        def body(c, carry):
            dk_acc, dv_acc = carry
            rows = pl.ds(c * chunk_q, chunk_q)
            q = q_ref[0, rows, sl]
            g = g_ref[0, rows, sl].astype(dt)
            st = stats_ref[0, rows, :]                   # (cq, 2H) f32
            lse, delta = st[:, h], st[:, H + h]
            s = jax.lax.dot_general(
                q * jnp.asarray(scale, dt), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (cq, bk)
            p = jnp.exp((s - lse[:, None]).astype(dt))
            dv_acc = dv_acc + jax.lax.dot_general(
                p, g, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                g, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = (p.astype(jnp.float32)
                  * (dp - delta[:, None])).astype(dt)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            return dk_acc, dv_acc

        bk = k.shape[0]
        zero = jnp.zeros((bk, D), jnp.float32)
        dk_acc, dv_acc = jax.lax.fori_loop(0, nc, body, (zero, zero))
        dk_ref[0, :, sl] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv_acc.astype(dv_ref.dtype)


def _bwd_lean_two_pass_blocks(n: int, hd: int, bpe: int = 2):
    """(block_q, block_k, chunk_q) for the LEAN two-pass backward, or
    None. Same accounting scheme as _bwd_two_pass_blocks with the lean
    live set: ~(12 + 2*bpe) B per score element (s/p32/dp f32 + p/ds at
    input width — no e tile), 2 double-counted full-row refs per pass,
    lane-padded f32 [lse | delta] stats in both passes."""
    if n % 8 != 0 or n < 256:
        return None
    budget = 11 * 2 ** 20
    per_elem = 12 + 2 * bpe
    full_row = 2 * 2 * n * hd * bpe          # two refs, double-buffered
    stats = 2 * n * 128 * 4                  # (n, 2H) lane-padded, x2
    p1 = None
    for bq in (256, 128, 64, 32):
        if n % bq == 0 and full_row + 2 * bq * 128 * 4 \
                + per_elem * bq * n < budget:
            p1 = bq
            break
    if p1 is None:
        return None
    for bk in (512, 256, 128):
        cq = 512 if n % 512 == 0 else 256
        if n % bk == 0 and n % cq == 0 \
                and full_row + stats + per_elem * cq * bk < budget:
            return (p1, bk, cq)
    return None


def fused_heads_attention_bwd_lean_two_pass(q, k, v, g, o, lse,
                                            num_heads: int,
                                            scale: Optional[float] = None,
                                            blocks=None,
                                            interpret: bool = False):
    """Lean backward for the long-series regime (N=4096+ at HD=128,
    where lane-grouping bottoms out at 128 lanes): two Pallas passes
    sharing the precomputed [lse | delta] stats. Same matmul count as
    fused_heads_attention_bwd_two_pass (7 per head) minus its softmax
    recompute tile passes in pass 1 and the divide in pass 2. Returns
    (dq, dk, dv)."""
    B, N, HD = q.shape
    H = num_heads
    if scale is None:
        scale = (HD // H) ** -0.5
    if blocks is None:
        blocks = _bwd_lean_two_pass_blocks(N, HD,
                                           jnp.dtype(q.dtype).itemsize)
        if blocks is None:
            raise ValueError(f"no lean two-pass geometry for N={N}, "
                             f"HD={HD}")
    bq, bk, cq = blocks
    if N % bq or N % bk or N % cq:
        raise ValueError(f"blocks {blocks} must divide N={N}")
    stats = _lean_stats(g, o, lse, H)                    # (B, N, 2H)
    full = pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0))
    qblk = pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0))
    dq = pl.pallas_call(
        functools.partial(_bwd_lean_p1_kernel, num_heads=H, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, N, HD), q.dtype),
        grid=(B, N // bq),
        in_specs=[qblk, full, full, qblk,
                  pl.BlockSpec((1, bq, 2 * H), lambda b, i: (b, i, 0))],
        out_specs=qblk,
        interpret=interpret,
    )(q, k, v, g, stats)
    kblk = pl.BlockSpec((1, bk, HD), lambda b, j: (b, j, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_lean_p2_kernel, num_heads=H, scale=scale,
                          chunk_q=cq),
        out_shape=[jax.ShapeDtypeStruct((B, N, HD), q.dtype)] * 2,
        grid=(B, N // bk),
        in_specs=[full, kblk, kblk, full,
                  pl.BlockSpec((1, N, 2 * H), lambda b, j: (b, 0, 0))],
        out_specs=[kblk, kblk],
        interpret=interpret,
    )(q, k, v, g, stats)
    return dq, dk, dv


def _bwd_head_groups(n: int, hd: int, num_heads: int, bpe: int = 2):
    """(groups, block_q) for the LANE-BLOCKED single-pass backward, or
    None. Heads are independent lane slices of the natural (N, H*D)
    layout, so the grid can walk head groups: each (batch, group)
    program sees only its (N, HD/groups) lane block of q/k/v/g/dq/dk/dv,
    shrinking the 7 full-row refs that rule the single-pass kernel out
    at HD=512 (14*N*HD*bpe = 14.7 MB there) by the group factor — with
    ZERO extra HBM traffic (the lane blocks are disjoint). Keeps the
    5-matmul single-pass backward where the ungrouped envelope
    (_bwd_block_q) fails and the 7-matmul two-pass kernel was the only
    fit (scaled-train profile 2026-08-17: two-pass = 7.2 ms/layer of
    the 232 ms step at d_model=512). Groups must leave a lane-aligned
    (multiple-of-128) block; HD=128 long-series stays two-pass.

    Calibration (measured on-chip A/B at B=64, N=1024, HD=512 — see
    BASELINE.md round-3): LARGE q-blocks dominate the ranking
    (bq=512/g=2 = 342 ms vs two-pass 486 vs bq=128/g=2 = 522 per 20
    reps), and the (2, 512) config — formula estimate 15.74 MB — runs
    clean at the production geometry. That point sits within 0.5% of
    the 16 MB scoped limit, so it is admitted ONLY via the explicit
    proven-geometry table below (smoked in scripts/kernel_smoke.py);
    every other geometry gets the same ~30% -headroom 11 MB budget as
    the sibling envelopes (CLAUDE.md calibration rule — Mosaic's
    accounting exceeds naive estimates). Fewest groups first, then bq
    descending."""
    if n % 8 != 0 or n < 128:
        return None
    d = hd // num_heads
    # (n, hd, num_heads) -> (groups, block_q): configs MEASURED clean on
    # the real chip at estimates above the general budget; extend only
    # together with a kernel_smoke entry.
    proven = {(1024, 512, 8): (2, 512)}
    got = proven.get((n, hd, num_heads))
    if got:
        return got
    budget = 11 * 2 ** 20
    for g in (2, 4, 8, 16):
        ghd = hd // g
        if num_heads % g or ghd % 128 or ghd < d:
            continue
        refs = 14 * n * ghd * bpe
        if refs >= budget:
            continue
        for bq in (512, 384, 256, 128, 64, 32):
            if n % bq == 0 and bq * n * 16 + refs < budget:
                return (g, bq)
    return None


def _bwd_block_q(n: int, hd: int, bpe: int = 2) -> int:
    """q-block for the Pallas backward. The whole-row kernel's live set is
    ~18 B per score element (s/p/dp f32 + e/ds compute-dtype + slack —
    MEASURED: 18.77 MB at N=1024, a VMEM OOM against the 16 MB scoped
    limit), so whole-row only below that; otherwise the largest blocked-q
    whose ~16 B/elem tiles + f32 dk/dv accumulators fit."""
    if n % 8 != 0 or n < 128:
        return 0
    # 11 MB budget = ~30% margin under the 16 MB scoped-vmem limit, and
    # the (1, n, hd) grid blocks (4 inputs + 3 outputs) count DOUBLE:
    # Mosaic pipelines the next batch element's blocks while the current
    # one computes. Both terms are calibrated against measured OOMs
    # (whole-row N=1024/HD=128: 18.77 MB; blocked HD=512: 16.77 MB flat
    # in bq — the 2x7 ref buffers alone are 14.7 MB there).
    budget = 11 * 2 ** 20
    refs = 14 * n * hd * bpe
    if n * n * 18 + refs < budget:
        return n
    for bq in (512, 384, 256, 128):
        if n % bq == 0 and bq * n * 16 + refs < budget:
            return bq
    return 0


def fused_heads_attention_bwd(q, k, v, g, num_heads: int,
                              scale: Optional[float] = None,
                              block_q: Optional[int] = None,
                              head_groups: int = 1,
                              pipelined: Optional[bool] = None,
                              interpret: bool = False):
    """Pallas backward pass for the natural-layout attention: inputs and
    upstream gradient g all (B, N, H*D); returns (dq, dk, dv). N beyond
    the whole-row VMEM envelope runs the blocked kernel; head_groups > 1
    additionally walks lane-aligned head groups on the grid's second
    axis so the refs fit at wide HD (see _bwd_head_groups). Raises when
    no VMEM-fitting block exists (callers pick the two-pass kernel or
    the eager einsum VJP there — see _fused_heads_bwd) and on a
    non-dividing explicit block_q, which would silently leave dq rows
    unwritten and drop their dk/dv contributions."""
    B, N, HD = q.shape
    if scale is None:
        scale = (HD // num_heads) ** -0.5
    if block_q and N % block_q:
        raise ValueError(f"block_q {block_q} must divide N={N}")
    if pipelined is None:
        pipelined = _pipe_bwd_enabled(grouped=head_groups > 1)
    blocked_kernel = (_bwd_pipelined_blocked_kernel if pipelined
                      else _fused_heads_bwd_blocked_kernel)
    if head_groups > 1:
        G = head_groups
        ghd = HD // G
        if HD % G or ghd % (HD // num_heads) or num_heads % G:
            raise ValueError(f"head_groups {G} incompatible with "
                             f"HD={HD}, num_heads={num_heads}")
        spec = pl.BlockSpec((1, N, ghd), lambda b, gi: (b, 0, gi))
        kernel = functools.partial(blocked_kernel,
                                   num_heads=num_heads // G, scale=scale,
                                   block_q=block_q or N)
        grid = (B, G)
    else:
        spec = pl.BlockSpec((1, N, HD), lambda b: (b, 0, 0))
        if block_q is None:
            block_q = _bwd_block_q(N, HD, jnp.dtype(q.dtype).itemsize)
            if not block_q:
                raise ValueError(
                    f"no VMEM-fitting single-pass backward at N={N}, "
                    f"HD={HD} (whole-row would exceed the measured "
                    f"envelope); use head_groups, "
                    f"fused_heads_attention_bwd_two_pass, or the eager "
                    f"einsum VJP")
        if block_q == N and not pipelined:
            kernel = functools.partial(_fused_heads_bwd_kernel,
                                       num_heads=num_heads, scale=scale)
        else:
            kernel = functools.partial(blocked_kernel,
                                       num_heads=num_heads, scale=scale,
                                       block_q=block_q)
        grid = (B,)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((B, N, HD), q.dtype)] * 3,
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        interpret=interpret,
    )(q, k, v, g)


# Measured NEGATIVE on chip (wave F/G, 2026-08-20): isolated at the
# scaled geometry lean_g2_bq512 711.3 ms vs grouped 713.2 (tie), but
# IN-STEP scaled train 4.31 steps/s (43.3% MFU) vs 4.87 (49.0%) default,
# and long-series lean_two_pass 66.5 ms vs two_pass 63.4 — the
# exp(s - lse) probability rebuild + lse-residual plumbing cost more
# than the 4 saved VPU passes (which overlapped MXU issue anyway).
# Stays permanently opt-in via T2MS_ATTN_LEAN_BWD=1; kept because the
# kernels are parity-green (kernel_smoke 26/26) and the stats forward
# is independently useful. See BASELINE.md scaled-train row.
_LEAN_BWD_DEFAULT_ON = False

# Round-5 pipelined single-pass backward (dp hoisted ahead of the
# softmax, normalization folded into (bq, D) operands — see
# _bwd_pipelined_blocked_kernel). DEFAULT-ON for the HEAD-GROUPED
# dispatch only, where the in-step A/B was won: scaled train (B=64,
# d=512) 5.01 steps/s = 50.4% MFU vs 4.89 = 49.1% default vs 4.80 =
# 48.2% lean@proven-config (`.onchip_r05_scaled_{pipe,base,lean4}.log`;
# same-session partners, identical final loss). NOTE the isolated
# ranking INVERTED in-step a fourth time (pipe lost isolated 476.9 vs
# grouped 411.5 ms, lean won isolated 366.6 and lost in-step) — only
# in-step A/Bs decide defaults. Ungrouped geometries (HD=128 whole-row/
# blocked) have no in-step measurement, so the default there stays the
# recompute kernel; T2MS_ATTN_PIPE_BWD=1 forces pipelined everywhere.
_PIPE_BWD_DEFAULT_ON = True


def _pipe_bwd_enabled(grouped: bool = True) -> bool:
    """Gate for the pipelined single-pass attention backward:
    T2MS_ATTN_PIPE_BWD=0 force-disables, =1 force-enables everywhere;
    otherwise the default flag applies only to the head-grouped
    dispatch (the geometry class where the in-step win is measured)."""
    flag = os.environ.get("T2MS_ATTN_PIPE_BWD", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return grouped and _PIPE_BWD_DEFAULT_ON


def _lean_bwd_enabled() -> bool:
    """Gate for the stats-residual (lean) attention backward:
    T2MS_ATTN_LEAN_BWD=0 force-disables, =1 force-enables (interpret mode
    on CPU — tests); otherwise TPU + the default flag."""
    flag = os.environ.get("T2MS_ATTN_LEAN_BWD", "")
    if flag == "0":
        return False
    if jax.default_backend() in ("cpu",):
        return flag == "1"
    return flag == "1" or _LEAN_BWD_DEFAULT_ON


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_heads_diffable(q, k, v, num_heads):
    """fused_heads_attention with a Pallas VMEM backward (geometry
    permitting; eager-recompute fallback otherwise)."""
    return fused_heads_attention(q, k, v, num_heads)


def _fused_heads_fwd(q, k, v, num_heads):
    """Residuals are (q, k, v, o, lse): o/lse present only when the lean
    gate is on AND both the stats forward and the lean backward admit the
    geometry — then the forward emits its softmax log-sum-exp for the
    backward to reuse (one extra tiny write; primal outputs identical).
    The untraced serving path never runs this function, so inference
    programs are untouched."""
    n, hd = q.shape[1], q.shape[2]
    bpe = jnp.dtype(q.dtype).itemsize
    if _lean_bwd_enabled():
        if jax.default_backend() in ("cpu",):
            out, lse = fused_heads_attention_with_stats(
                q, k, v, num_heads, interpret=True)
            return out, (q, k, v, out, lse)
        if ((_bwd_lean_groups(n, hd, num_heads, bpe)
             or _bwd_lean_two_pass_blocks(n, hd, bpe))
                and fused_heads_block_q(n, hd, bpe)):
            out, lse = fused_heads_attention_with_stats(q, k, v, num_heads)
            return out, (q, k, v, out, lse)
    return fused_heads_attention(q, k, v, num_heads), (q, k, v, None, None)


def _fused_heads_bwd(num_heads, res, g):
    q, k, v, o, lse = res
    n = q.shape[1]
    hd = q.shape[-1]
    bpe = jnp.dtype(q.dtype).itemsize
    # lean kernel when the forward saved softmax stats (gate + envelope
    # checked there); else: whole-row/blocked kernel while its live set
    # fits VMEM; wide-HD geometries whose full-row refs overflow split
    # into lane-aligned head groups (5-matmul single pass, the scaled
    # d=512 winner); the long-series regime (N=4096+ at HD=128, where
    # lane splitting bottoms out) runs the two-pass kernel; off-TPU (or
    # geometry with no fitting block) falls back to the eager recompute
    if lse is not None:
        if jax.default_backend() in ("cpu",):
            return fused_heads_attention_bwd_lean(q, k, v, g, o, lse,
                                                  num_heads, interpret=True)
        if _bwd_lean_groups(n, hd, num_heads, bpe):
            return fused_heads_attention_bwd_lean(q, k, v, g, o, lse,
                                                  num_heads)
        return fused_heads_attention_bwd_lean_two_pass(q, k, v, g, o, lse,
                                                       num_heads)
    if jax.default_backend() not in ("cpu",):
        if _bwd_block_q(n, hd, bpe):
            return fused_heads_attention_bwd(q, k, v, g, num_heads)
        hg = _bwd_head_groups(n, hd, num_heads, bpe)
        if hg:
            return fused_heads_attention_bwd(q, k, v, g, num_heads,
                                             block_q=hg[1],
                                             head_groups=hg[0])
        if _bwd_two_pass_blocks(n, hd, bpe):
            return fused_heads_attention_bwd_two_pass(q, k, v, g,
                                                      num_heads)
    _, vjp = jax.vjp(
        lambda a, b, c: _einsum_natural(a, b, c, num_heads), q, k, v)
    return vjp(g)


fused_heads_diffable.defvjp(_fused_heads_fwd, _fused_heads_bwd)


@jax.custom_vjp
def _packed_diffable(q, k, v):
    """packed_attention with an einsum-recompute backward (same pattern as
    _flash_diffable): serving never differentiates, training recomputes."""
    return packed_attention(q, k, v)


def _packed_fwd(q, k, v):
    return packed_attention(q, k, v), (q, k, v)


@jax.custom_vjp
def _flash_diffable(q, k, v):
    """flash_attention with an einsum-recompute backward: the Pallas
    kernel has no VJP, so training recomputes attention eagerly for the
    gradient (the forward still avoids HBM score traffic — pattern per
    the custom-VJP section of the Pallas guide)."""
    return flash_attention(q, k, v)


def _flash_fwd(q, k, v):
    return flash_attention(q, k, v), (q, k, v)


def _flash_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: einsum_attention(a, b, c), q, k, v)
    return vjp(g)


_flash_diffable.defvjp(_flash_fwd, _flash_bwd)
_packed_diffable.defvjp(_packed_fwd, _flash_bwd)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              impl: str = "auto", flash_threshold: int = 1024
              ) -> jnp.ndarray:
    """Dispatcher on the head-split (B, H, N, D) layout: 'einsum' |
    'packed' | 'flash' | 'auto' (flash on TPU for long N, einsum
    otherwise — XLA's batched einsum wins the mid-range in THIS layout;
    the serving-shape winner is the natural-layout fused_heads path the
    DiT selects before splitting heads, see BASELINE.md). Differentiable
    everywhere via the custom-VJP wrappers."""
    if impl == "einsum":
        return einsum_attention(q, k, v)
    if impl == "flash":
        return _flash_diffable(q, k, v)
    if impl == "packed":
        return _packed_diffable(q, k, v)
    n = q.shape[2]
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu and n >= flash_threshold and _auto_block(n):
        return _flash_diffable(q, k, v)
    return einsum_attention(q, k, v)
