"""Fused DiT block: one Pallas program per batch element for the WHOLE
adaLN-zero block — LN -> modulate -> qkv -> multi-head attention -> proj
-> gated residual -> LN -> modulate -> MLP (tanh GELU) -> gated residual.

Why (profile 2026-08-16, serving op-point, after the fused-heads attention
kernel): the remaining per-layer cost was bandwidth-bound XLA fusions
shuttling (B, N, 128) activations through HBM between every sub-op —
qkv projection 0.39 ms, adaLN/residual fusions 0.57 ms, MLP/LN pairs
0.53 ms, layout copies 0.20 ms per layer. Fusing the block end-to-end
reads x once (63 MB/layer at the op-point) and writes x once; everything
between lives in VMEM. Weight matrices (~0.33 MB bf16) replicate to every
program; per-sample adaLN vectors ride along as a (6, D) block.

Round 3 adds a TRAINING path: ``fused_dit_block_diffable`` is a
custom_vjp whose backward is ONE Pallas program per batch element that
re-runs ``jax.vjp`` over the SAME ``_block_math`` entirely in VMEM —
activations, probabilities and all intermediate grads never touch HBM,
and per-layer weight grads accumulate across the batch grid in f32 VMEM
scratch. This attacks the round-2 train-step profile's 61 ms long tail
of small XLA fusions (TODO.md): the whole block fwd+bwd is two HBM
round-trips of x instead of dozens. Reference block semantics:
transformer.py:94-124 (adaLN-zero), timm Mlp with approximate GELU
(transformer.py:100,105).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from t2ms_tpu.ops.attention import attn_heads_folded, attn_heads_natural

__all__ = ["fused_dit_block", "fused_dit_stack", "dit_block_reference",
           "fused_dit_block_diffable", "block_vjp_supported",
           "fused_dit_block_split", "split_block_q",
           "mod_ln_diffable", "mod_ln_block_q",
           "res_mod_ln_diffable", "res_mod_ln_block_q"]


def _ln(x, eps):
    """LayerNorm without scale/bias (DiT block LNs, epsilon 1e-6), f32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


def _attn_merged(q, k, v, num_heads: int, scale: float, attn_impl: str):
    """(N, D) merged-head attention output in the compute dtype, via the
    per-head loop (default) or the folded two-matmul variant."""
    if attn_impl == "folded":
        return attn_heads_folded(q, k, v, num_heads, scale).astype(q.dtype)
    parts = [None] * num_heads
    for h, _, o in attn_heads_natural(q, k, v, num_heads, scale):
        parts[h] = o.astype(q.dtype)
    return jnp.concatenate(parts, axis=-1)


def _mod_ln(x, sh, sc, eps):
    """LN -> adaLN modulate at f32, back to the compute dtype. THE block
    numerics recipe — shared by _block_math, the G-batched stack and the
    split kernels so a precision change lands everywhere at once."""
    return (_ln(x, eps) * (1.0 + sc.astype(jnp.float32))
            + sh.astype(jnp.float32)).astype(x.dtype)


def _dense(h, w, b):
    """Row-major dense with f32 accumulation and f32 bias-add, cast back
    to the input dtype (the recipe every block matmul uses)."""
    return (jax.lax.dot_general(
        h, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + b.astype(jnp.float32)).astype(h.dtype)


def _attn_proj_residual(x, q, k, v, gate, wproj, bproj, num_heads: int,
                        scale: float, attn_impl: str = "loop"):
    """attention -> out-projection -> gated residual on VMEM values; q
    may be a row-block of x while k/v are full rows (exact softmax)."""
    attn = _attn_merged(q, k, v, num_heads, scale, attn_impl)
    return x + gate.astype(x.dtype) * _dense(attn, wproj, bproj)


def _mlp_half(x, sh, sc, gate, wfc1, bfc1, wfc2, bfc2, eps):
    """LN -> modulate -> MLP (tanh GELU) -> gated residual (row-local)."""
    h1 = jax.nn.gelu(_dense(_mod_ln(x, sh, sc, eps), wfc1, bfc1),
                     approximate=True)
    return x + gate.astype(x.dtype) * _dense(h1, wfc2, bfc2)


def _block_math(x, mod, wqkv, bqkv, wproj, bproj, wfc1, bfc1, wfc2, bfc2,
                num_heads: int, eps: float, attn_impl: str = "loop"):
    """One adaLN-zero block on VMEM values: x (N, D), mod (6, D), flax
    Dense-layout weights. Shared by the single-block and whole-stack
    kernels; the split kernels reuse the same half helpers."""
    D = x.shape[-1]
    qkv = _dense(_mod_ln(x, mod[0][None, :], mod[1][None, :], eps),
                 wqkv, bqkv)
    scale = (D // num_heads) ** -0.5
    x = _attn_proj_residual(x, qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:],
                            mod[2][None, :], wproj, bproj, num_heads,
                            scale, attn_impl)
    return _mlp_half(x, mod[3][None, :], mod[4][None, :], mod[5][None, :],
                     wfc1, bfc1, wfc2, bfc2, eps)


def _block_math_g(x, mod, wqkv, bqkv, wproj, bproj, wfc1, bfc1, wfc2, bfc2,
                  num_heads: int, eps: float, attn_impl: str = "loop"):
    """G-batched adaLN-zero block on VMEM values: x (G, N, D), mod
    (G, 6, D). Dense layers run on the flattened (G*N, D) rows — G times
    the MXU rows per matmul, amortizing per-op pipeline overhead that
    dominates at small N*D — while attention and the per-sample adaLN
    gates stay per-element (cross-element attention would be wrong, and
    block-diagonal masking would multiply MXU passes by G)."""
    dt = x.dtype
    G, N, D = x.shape
    f32 = jnp.float32
    m = lambda i: mod[:, i][:, None, :]               # (G, 1, D)

    def dense(h2d, w, b):
        return (jax.lax.dot_general(
            h2d, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32) + b.astype(f32)).astype(dt)

    y = (_ln(x, eps) * (1.0 + m(1).astype(f32))
         + m(0).astype(f32)).astype(dt)
    qkv = dense(y.reshape(G * N, D), wqkv, bqkv).reshape(G, N, 3 * D)
    scale = (D // num_heads) ** -0.5
    attn = jnp.stack([
        _attn_merged(qkv[g, :, :D], qkv[g, :, D:2 * D], qkv[g, :, 2 * D:],
                     num_heads, scale, attn_impl) for g in range(G)])
    proj = dense(attn.reshape(G * N, D), wproj, bproj).reshape(G, N, D)
    x = x + m(2).astype(dt) * proj

    y = (_ln(x, eps) * (1.0 + m(4).astype(f32))
         + m(3).astype(f32)).astype(dt)
    h1 = dense(y.reshape(G * N, D), wfc1, bfc1)
    h1 = jax.nn.gelu(h1, approximate=True)
    h2 = dense(h1, wfc2, bfc2).reshape(G, N, D)
    return x + m(5).astype(dt) * h2


def _block_kernel(x_ref, mod_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                  wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, o_ref, *,
                  num_heads: int, eps: float):
    o_ref[0] = _block_math(
        x_ref[0], mod_ref[0], wqkv_ref[...], bqkv_ref[...], wproj_ref[...],
        bproj_ref[...], wfc1_ref[...], bfc1_ref[...], wfc2_ref[...],
        bfc2_ref[...], num_heads, eps)


def _stack_kernel(x_ref, mod_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                  wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, o_ref, *,
                  num_heads: int, eps: float, depth: int,
                  attn_impl: str = "loop"):
    """ALL transformer blocks in one program: x never leaves HBM between
    layers (the (B, N, D) activation round-trips HBM once per model
    instead of once per layer)."""
    x = x_ref[0]
    for l in range(depth):
        x = _block_math(
            x, mod_ref[0, l], wqkv_ref[l], bqkv_ref[l], wproj_ref[l],
            bproj_ref[l], wfc1_ref[l], bfc1_ref[l], wfc2_ref[l],
            bfc2_ref[l], num_heads, eps, attn_impl)
    o_ref[0] = x


def _stack_kernel_g(x_ref, mod_ref, wqkv_ref, bqkv_ref, wproj_ref,
                    bproj_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                    o_ref, *, num_heads: int, eps: float, depth: int,
                    attn_impl: str = "loop"):
    """G-batched whole-stack program: each program owns a (G, N, D) slab
    of the batch (see _block_math_g)."""
    x = x_ref[...]
    for l in range(depth):
        x = _block_math_g(
            x, mod_ref[:, l], wqkv_ref[l], bqkv_ref[l], wproj_ref[l],
            bproj_ref[l], wfc1_ref[l], bfc1_ref[l], wfc2_ref[l],
            bfc2_ref[l], num_heads, eps, attn_impl)
    o_ref[...] = x


def fused_dit_block(x: jnp.ndarray, mod: jnp.ndarray, wqkv, bqkv, wproj,
                    bproj, wfc1, bfc1, wfc2, bfc2, num_heads: int,
                    eps: float = 1e-6,
                    interpret: bool = False) -> jnp.ndarray:
    """x (B, N, D) + per-sample adaLN vectors mod (B, 6, D) + raw weight
    matrices (flax Dense layout: kernel (in, out), bias (out,)) -> block
    output (B, N, D). One Pallas program per batch element."""
    B, N, D = x.shape
    hidden = wfc1.shape[1]
    dt = x.dtype
    const = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape))
    w = lambda a: a.astype(dt)
    return pl.pallas_call(
        functools.partial(_block_kernel, num_heads=num_heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, N, D), dt),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 6, D), lambda b: (b, 0, 0)),
            const(D, 3 * D), const(1, 3 * D),
            const(D, D), const(1, D),
            const(D, hidden), const(1, hidden),
            const(hidden, D), const(1, D),
        ],
        out_specs=pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(x, mod, w(wqkv), w(bqkv)[None], w(wproj), w(bproj)[None],
      w(wfc1), w(bfc1)[None], w(wfc2), w(bfc2)[None])


def fused_dit_stack(x: jnp.ndarray, mod: jnp.ndarray, wqkv, bqkv, wproj,
                    bproj, wfc1, bfc1, wfc2, bfc2, num_heads: int,
                    eps: float = 1e-6, attn_impl: str = "loop",
                    batch_block: int = 1,
                    interpret: bool = False) -> jnp.ndarray:
    """Whole transformer stack in one Pallas program per batch slab:
    x (B, N, D), per-sample per-layer adaLN vectors mod (B, L, 6, D),
    weights stacked over the layer axis (L, ...). The activation reads
    HBM once and writes once for the WHOLE stack (vs once per layer with
    fused_dit_block); weights (~1.3 MB bf16 at reference scale) stay
    VMEM-resident across layers. ``batch_block`` G > 1 gives each
    program a (G, N, D) slab (dense matmuls on G*N rows, attention per
    element); ``attn_impl`` picks the in-kernel attention ('loop' or
    'folded' — see ops.attention.attn_heads_folded)."""
    B, N, D = x.shape
    L = wqkv.shape[0]
    hidden = wfc1.shape[-1]
    dt = x.dtype
    G = batch_block
    if B % G:
        raise ValueError(f"batch_block {G} must divide batch {B}")
    const = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape))
    w = lambda a: a.astype(dt)
    kernel = functools.partial(
        _stack_kernel if G == 1 else _stack_kernel_g,
        num_heads=num_heads, eps=eps, depth=L, attn_impl=attn_impl)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, D), dt),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((G, L, 6, D), lambda b: (b, 0, 0, 0)),
            const(L, D, 3 * D), const(L, 3 * D),
            const(L, D, D), const(L, D),
            const(L, D, hidden), const(L, hidden),
            const(L, hidden, D), const(L, D),
        ],
        out_specs=pl.BlockSpec((G, N, D), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(x, mod, w(wqkv), w(bqkv), w(wproj), w(bproj), w(wfc1), w(bfc1),
      w(wfc2), w(bfc2))


def _block_vjp_kernel(x_ref, mod_ref, wqkv_ref, bqkv_ref, wproj_ref,
                      bproj_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                      dy_ref,
                      dx_ref, dmod_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                      dbproj_ref, dwfc1_ref, dbfc1_ref, dwfc2_ref,
                      dbfc2_ref,
                      *accs, num_heads: int, eps: float,
                      compute_dtype):
    """Backward of one adaLN-zero block, one program per batch element.

    ``jax.vjp`` over the shared ``_block_math`` runs INSIDE the kernel:
    Mosaic compiles the transposed matmuls, softmax VJP and GELU VJP on
    VMEM values, so none of the (N, N) probability tensors or (N, D)
    intermediate grads that dominate the XLA backward ever reach HBM.
    Weights enter f32 and are cast to compute dtype inside the traced
    function, so weight grads come back f32 (the cast's VJP) and
    accumulate across the batch grid in f32 VMEM scratch — written to
    the (constant-indexed) grad outputs by the last program."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    dt = compute_dtype

    def f(x, mod, *ws):
        return _block_math(x, mod, *(w.astype(dt) for w in ws),
                           num_heads=num_heads, eps=eps)

    ws = (wqkv_ref[...], bqkv_ref[...], wproj_ref[...], bproj_ref[...],
          wfc1_ref[...], bfc1_ref[...], wfc2_ref[...], bfc2_ref[...])
    out, vjp = jax.vjp(f, x_ref[0], mod_ref[0], *ws)
    grads = vjp(dy_ref[0].astype(out.dtype))
    dx_ref[0] = grads[0].astype(dx_ref.dtype)
    dmod_ref[0] = grads[1].astype(dmod_ref.dtype)

    @pl.when(b == 0)
    def _zero():
        for acc in accs:
            acc[...] = jnp.zeros_like(acc)

    for acc, dw in zip(accs, grads[2:]):
        acc[...] += dw.astype(jnp.float32)

    @pl.when(b == nb - 1)
    def _flush():
        outs = (dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dwfc1_ref,
                dbfc1_ref, dwfc2_ref, dbfc2_ref)
        for o, acc in zip(outs, accs):
            o[...] = acc[...]


def block_vjp_supported(n: int, d: int, hidden: int, num_heads: int,
                        bpe: int = 2) -> bool:
    """VMEM envelope for the block-VJP kernel: the vjp residuals keep
    per-head (N, N) scores (f32) + probabilities (compute dtype) alive
    simultaneously for ALL heads, plus the (N, 3D)/(N, hidden)
    activations fwd+bwd, f32 weights (x2 for grads + scratch) and the
    block refs (double-buffered). Calibrated against the measured
    serving-kernel envelope; ~30% headroom under the 16 MB limit."""
    if n % 8 != 0 or not (128 <= n <= 1024):
        return False
    heads_resid = num_heads * n * n * bpe        # e residual per head
    head_transient = n * n * (8 + 2 * bpe)       # one head's bwd tiles
    acts = 6 * n * (3 * d + hidden) * bpe        # fwd+bwd activations
    weights = 5 * 4 * (d * 3 * d + d * d + 2 * d * hidden)  # w+grad+scratch
    refs = 2 * 3 * n * d * bpe                   # x/dy/dx double-buffered
    return (heads_resid + head_transient + acts + weights + refs
            < 13 * 2 ** 20)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_dit_block_diffable(x, mod, wqkv, bqkv, wproj, bproj, wfc1, bfc1,
                             wfc2, bfc2, num_heads, interpret=False):
    """Differentiable fused DiT block: Pallas forward (fused_dit_block)
    + Pallas whole-block backward (_block_vjp_kernel). Weights in f32
    (the param tree's dtype); activations run in x.dtype. Grad contract
    matches flax exactly: dx/dmod in x.dtype's tree, weight grads f32."""
    return fused_dit_block(x, mod, wqkv, bqkv, wproj, bproj, wfc1, bfc1,
                           wfc2, bfc2, num_heads, interpret=interpret)


def _fused_block_diff_fwd(x, mod, wqkv, bqkv, wproj, bproj, wfc1, bfc1,
                          wfc2, bfc2, num_heads, interpret):
    out = fused_dit_block(x, mod, wqkv, bqkv, wproj, bproj, wfc1, bfc1,
                          wfc2, bfc2, num_heads, interpret=interpret)
    return out, (x, mod, wqkv, bqkv, wproj, bproj, wfc1, bfc1, wfc2, bfc2)


def _fused_block_diff_bwd(num_heads, interpret, res, g):
    x, mod, *ws = res
    B, N, D = x.shape
    hidden = ws[4].shape[1]
    dt = x.dtype
    f32 = jnp.float32
    const = lambda *shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape))
    w_specs = [const(D, 3 * D), const(1, 3 * D), const(D, D), const(1, D),
               const(D, hidden), const(1, hidden), const(hidden, D),
               const(1, D)]
    w_shapes = [(D, 3 * D), (1, 3 * D), (D, D), (1, D), (D, hidden),
                (1, hidden), (hidden, D), (1, D)]
    bspec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0))
    mspec = pl.BlockSpec((1, 6, D), lambda b: (b, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_block_vjp_kernel, num_heads=num_heads,
                          eps=1e-6, compute_dtype=dt),
        out_shape=([jax.ShapeDtypeStruct((B, N, D), dt),
                    # dmod must carry mod's OWN dtype: the custom_vjp
                    # cotangent contract rejects a bf16 dmod for an f32
                    # mod primal (the forward accepts mixed dtypes)
                    jax.ShapeDtypeStruct((B, 6, D), mod.dtype)]
                   + [jax.ShapeDtypeStruct(s, f32) for s in w_shapes]),
        grid=(B,),
        in_specs=[bspec, mspec] + w_specs + [bspec],
        out_specs=[bspec, mspec] + w_specs,
        scratch_shapes=[pltpu.VMEM(s, f32) for s in w_shapes],
        interpret=interpret,
    )(x, mod, *[w.reshape(s) for w, s in zip(ws, w_shapes)], g)
    dx, dmod = outs[0], outs[1]
    dws = [d.reshape(w.shape) for d, w in zip(outs[2:], ws)]
    return (dx, dmod, *dws)


fused_dit_block_diffable.defvjp(_fused_block_diff_fwd,
                                _fused_block_diff_bwd)


def _qkv_split_kernel(x_ref, mod_ref, wqkv_ref, bqkv_ref,
                      q_ref, k_ref, v_ref, *, eps: float):
    """LN -> adaLN modulate -> qkv projection for one q row-block (the
    shared _mod_ln/_dense recipe — bit-identical to _block_math)."""
    D = x_ref.shape[-1]
    qkv = _dense(_mod_ln(x_ref[0], mod_ref[0, 0][None, :],
                         mod_ref[0, 1][None, :], eps),
                 wqkv_ref[...], bqkv_ref[...])
    q_ref[0] = qkv[:, :D]
    k_ref[0] = qkv[:, D:2 * D]
    v_ref[0] = qkv[:, 2 * D:]


def _attn_split_kernel(q_ref, k_ref, v_ref, x_ref, mod_ref, wproj_ref,
                       bproj_ref, o_ref, *, num_heads: int, scale: float):
    """Multi-head attention for one q row-block against the FULL K/V,
    followed by the out-projection and the gated residual (shared
    _attn_proj_residual — rectangular q vs full K/V is exact)."""
    o_ref[0] = _attn_proj_residual(
        x_ref[0], q_ref[0], k_ref[0], v_ref[0], mod_ref[0, 2][None, :],
        wproj_ref[...], bproj_ref[...], num_heads, scale)


def _mlp_split_kernel(x_ref, mod_ref, wfc1_ref, bfc1_ref, wfc2_ref,
                      bfc2_ref, o_ref, *, eps: float):
    """LN -> adaLN modulate -> MLP -> gated residual for one row-block
    (purely row-local, so any q-blocking is exact; shared _mlp_half)."""
    o_ref[0] = _mlp_half(
        x_ref[0], mod_ref[0, 3][None, :], mod_ref[0, 4][None, :],
        mod_ref[0, 5][None, :], wfc1_ref[...], bfc1_ref[...],
        wfc2_ref[...], bfc2_ref[...], eps)


def split_block_q(n: int, d: int, hidden: int, num_heads: int,
                  bpe: int = 2) -> int:
    """Pick the q row-block for the SPLIT fused block (0 = unsupported).

    The split path exists for geometries whose whole-block working set
    exceeds VMEM (d_model 512: ~6.3 MB of weights/layer + (N, hidden)
    activations + per-head scores — the single-program block kernel
    needs ~26 MB).  Splitting the block at its two residual boundaries
    gives three kernels with independent, q-blockable working sets; the
    envelope models ALL THREE (qkv / attention / MLP), with the
    measured Mosaic rules from ops.attention: grid-block refs count
    DOUBLE (next step prefetch) — including the full-row K/V refs,
    whose index map varies with the batch grid axis — constants once,
    ~30% headroom under the 16 MB limit. N is capped at 1024, the
    largest geometry stress-tested on chip (scripts/kernel_smoke.py
    dit_block_split_1024_d512); raise the cap only together with a new
    smoke entry."""
    if n % 8 or d % num_heads or d % 128 or not (128 <= n <= 1024):
        return 0
    for bq in (512, 256, 128):
        if n % bq:
            continue
        attn = (2 * 2 * n * d * bpe          # K, V full rows, DOUBLED
                + 2 * 3 * bq * d * bpe       # q/x blocks, double-buffered
                + d * d * bpe                # wproj
                + 2 * bq * d * bpe           # out block, double-buffered
                # transients: f32 scores + exp-at-dt + f32 PV, one head
                + bq * n * (4 + bpe) + bq * d * 4 + bq * d * bpe)
        qkv = (d * 3 * d * bpe               # wqkv
               + 2 * bq * d * bpe            # x block, double-buffered
               + 2 * 3 * bq * d * bpe        # q/k/v out blocks, doubled
               + bq * 3 * d * 4              # f32 matmul result
               + 2 * bq * d * 4)             # f32 LN copies
        mlp = (2 * 2 * bq * d * bpe + 2 * d * hidden * bpe
               + 2 * bq * hidden * bpe + bq * hidden * 4)
        if max(attn, qkv, mlp) < 11 * 2 ** 20:
            return bq
    return 0


def fused_dit_block_split(x: jnp.ndarray, mod: jnp.ndarray, wqkv, bqkv,
                          wproj, bproj, wfc1, bfc1, wfc2, bfc2,
                          num_heads: int, eps: float = 1e-6,
                          block_q: int = 0,
                          interpret: bool = False) -> jnp.ndarray:
    """adaLN-zero DiT block as THREE q-blocked Pallas kernels (qkv half,
    attention+proj+residual, MLP half) for geometries too fat for the
    single-program ``fused_dit_block`` (e.g. d_model=512 at 1024 tokens,
    where the whole-block working set is ~26 MB but each split kernel
    stays under the VMEM budget).

    Why not leave it to XLA: the scaled-serve profile (round 3) showed
    21.5% of device time in f32 LayerNorm convert+reduce fusions and 9%
    in glue fusions, because every sub-op round-trips the (B, N, D)
    activation through HBM.  The split kernels keep each half's
    intermediates in VMEM: per layer the activation traffic drops to
    x->QKV, (QKV, x)->x', x'->out.  Attention consumes the full K/V per
    program (exact softmax, bf16 exp like every serving kernel) while q
    is row-blocked, which is exact.  Reference block semantics:
    transformer.py:94-124."""
    B, N, D = x.shape
    hidden = wfc1.shape[1]
    dt = x.dtype
    bq = block_q or split_block_q(N, D, hidden, num_heads,
                                  jnp.dtype(dt).itemsize)
    if not bq:
        raise ValueError(f"split kernel unsupported at N={N}, D={D}")
    if N % bq:
        # a non-dividing override would silently leave N % bq trailing
        # rows of the output buffers unwritten
        raise ValueError(f"block_q {bq} must divide N={N}")
    nq = N // bq
    scale = (D // num_heads) ** -0.5
    const = lambda *shape: pl.BlockSpec(shape,
                                        lambda b, i: (0,) * len(shape))
    qblk = pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0))
    full = pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0))
    mspec = pl.BlockSpec((1, 6, D), lambda b, i: (b, 0, 0))
    w = lambda a: a.astype(dt)

    q, k, v = pl.pallas_call(
        functools.partial(_qkv_split_kernel, eps=eps),
        out_shape=[jax.ShapeDtypeStruct((B, N, D), dt)] * 3,
        grid=(B, nq),
        in_specs=[qblk, mspec, const(D, 3 * D), const(1, 3 * D)],
        out_specs=[qblk] * 3,
        interpret=interpret,
    )(x, mod, w(wqkv), w(bqkv)[None])

    x = pl.pallas_call(
        functools.partial(_attn_split_kernel, num_heads=num_heads,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, N, D), dt),
        grid=(B, nq),
        in_specs=[qblk, full, full, qblk, mspec, const(D, D), const(1, D)],
        out_specs=qblk,
        interpret=interpret,
    )(q, k, v, x, mod, w(wproj), w(bproj)[None])

    return pl.pallas_call(
        functools.partial(_mlp_split_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, N, D), dt),
        grid=(B, nq),
        in_specs=[qblk, mspec, const(D, hidden), const(1, hidden),
                  const(hidden, D), const(1, D)],
        out_specs=qblk,
        interpret=interpret,
    )(x, mod, w(wfc1), w(bfc1)[None], w(wfc2), w(bfc2)[None])


def _mod_ln_fwd_kernel(x_ref, mod_ref, o_ref, *, eps: float):
    o_ref[0] = _mod_ln(x_ref[0], mod_ref[0, 0][None, :],
                       mod_ref[0, 1][None, :], eps)


def _mod_ln_bwd_kernel(x_ref, mod_ref, dy_ref, dx_ref, dmod_ref, acc, *,
                       eps: float):
    """VJP of LN+modulate for one q row-block: ``jax.vjp`` over the shared
    ``_mod_ln`` runs inside the kernel (the f32 LN internals never touch
    HBM); dshift/dscale accumulate across the q-block grid axis in f32
    scratch and flush into the per-sample dmod output at the last block."""
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    out, vjp = jax.vjp(
        lambda xb, sh, sc: _mod_ln(xb, sh, sc, eps),
        x_ref[0], mod_ref[0, 0][None, :], mod_ref[0, 1][None, :])
    dx, dsh, dsc = vjp(dy_ref[0].astype(out.dtype))
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _zero():
        acc[...] = jnp.zeros_like(acc)

    acc[0, :] += dsh[0].astype(jnp.float32)
    acc[1, :] += dsc[0].astype(jnp.float32)

    @pl.when(i == ni - 1)
    def _flush():
        dmod_ref[0] = acc[...].astype(dmod_ref.dtype)


def mod_ln_block_q(n: int, d: int, bpe: int = 2) -> int:
    """q row-block for the fused LN+modulate custom-VJP kernels (0 =
    geometry unsupported -> callers keep the XLA LayerNorm path).

    Live set per row (the bwd kernel is the fat one): x/dy/dx blocks
    (double-buffered grid refs count twice — measured Mosaic rule, see
    _bwd_block_q) plus ~6 f32 copies for the LN vjp internals (xf,
    centered, normalized, dyf, dxhat, dxf) ≈ ``6*bpe + 24`` bytes/elem;
    budgeted at 11 MB (~30% headroom under the 16 MB scoped limit).
    LN is per-token, so any row-blocking is exact."""
    if n % 8 != 0 or n < 8 or d % 128 != 0:
        return 0
    per_row = d * (3 * 2 * bpe + 24)
    for bq in (n, 1024, 512, 256, 128):
        if bq <= n and n % bq == 0 and bq * per_row < 11 * 2 ** 20:
            return bq
    return 0


def _mod_ln_call(x, mod2, eps, block_q, interpret):
    B, N, D = x.shape
    bq = block_q or mod_ln_block_q(N, D, jnp.dtype(x.dtype).itemsize)
    if not bq:
        if interpret:          # CPU tests exercise the kernel math at
            bq = N             # tiny (lane-unaligned) shapes
        else:
            raise ValueError(f"mod_ln kernel unsupported at N={N}, D={D}")
    if N % bq:
        raise ValueError(f"block_q {bq} must divide N={N}")
    return pl.pallas_call(
        functools.partial(_mod_ln_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        grid=(B, N // bq),
        in_specs=[pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
                  pl.BlockSpec((1, 2, D), lambda b, i: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(x, mod2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def mod_ln_diffable(x, mod2, eps=1e-6, block_q=0, interpret=False):
    """Fused LayerNorm (no scale/bias, like the DiT block LNs) + adaLN
    modulate with Pallas forward AND backward — x (B, N, D), mod2
    (B, 2, D) = [shift, scale] -> (B, N, D).

    Why: the round-3 scaled-train profile attributed ~21.5% of the
    232 ms step (d_model=512, B=64 bf16) to f32 LayerNorm
    convert+reduce fusions — XLA materializes f32 copies of the
    (B, N, D) activation around every LN and its VJP. Here each
    direction is one Pallas program per (batch, q-block): x is read
    once and written once in the compute dtype; all f32 stats/copies
    live in VMEM. Numerics recipe is the shared ``_mod_ln`` (identical
    to the serving kernels); LN is token-local so q-blocking is exact.
    Reference semantics: transformer.py:7-8,94-124 (modulate +
    norm1/norm2 without elementwise affine)."""
    return _mod_ln_call(x, mod2, eps, block_q, interpret)


def _mod_ln_diff_fwd(x, mod2, eps, block_q, interpret):
    return _mod_ln_call(x, mod2, eps, block_q, interpret), (x, mod2)


def _mod_ln_diff_bwd(eps, block_q, interpret, res, dy):
    x, mod2 = res
    B, N, D = x.shape
    bq = block_q or mod_ln_block_q(N, D, jnp.dtype(x.dtype).itemsize)
    if not bq:
        if interpret:
            bq = N
        else:
            raise ValueError(f"mod_ln kernel unsupported at N={N}, D={D}")
    blk = pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0))
    mblk = pl.BlockSpec((1, 2, D), lambda b, i: (b, 0, 0))
    dx, dmod = pl.pallas_call(
        functools.partial(_mod_ln_bwd_kernel, eps=eps),
        out_shape=[jax.ShapeDtypeStruct((B, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, 2, D), mod2.dtype)],
        grid=(B, N // bq),
        in_specs=[blk, mblk, blk],
        out_specs=[blk, mblk],
        scratch_shapes=[pltpu.VMEM((2, D), jnp.float32)],
        interpret=interpret,
    )(x, mod2, dy)
    return dx, dmod


mod_ln_diffable.defvjp(_mod_ln_diff_fwd, _mod_ln_diff_bwd)


# --------------------------------------------------------------------------
# Fused gated-residual + LN + modulate (the DiT block BOUNDARY op)
# --------------------------------------------------------------------------

def _res_mod_ln(x, h, g, sh, sc, eps):
    """y = x + g*h (the adaLN-zero gated residual, compute dtype — matches
    the eager path and _attn_proj_residual exactly), then LN+modulate.
    Returns (modulated, y): the residual stream y continues downstream."""
    y = x + g.astype(x.dtype) * h
    return _mod_ln(y, sh, sc, eps), y


def _res_mod_ln_fwd_kernel(x_ref, h_ref, gm_ref, o_ref, y_ref, *,
                           eps: float):
    out, y = _res_mod_ln(x_ref[0], h_ref[0], gm_ref[0, 0][None, :],
                         gm_ref[0, 1][None, :], gm_ref[0, 2][None, :], eps)
    o_ref[0] = out
    y_ref[0] = y


def _res_mod_ln_bwd_kernel(x_ref, h_ref, gm_ref, do_ref, dy_ref,
                           dx_ref, dh_ref, dgm_ref, acc, *, eps: float):
    """VJP of residual+gate+LN+modulate for one q row-block, same recipe
    as _mod_ln_bwd_kernel: ``jax.vjp`` over the shared forward runs inside
    the kernel; the per-sample (gate, shift, scale) grads are row-sums, so
    they accumulate across the q-block grid axis in f32 scratch and flush
    at the last block. BOTH outputs carry cotangents (the modulated path
    feeds qkv/MLP, the stream feeds the next residual)."""
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    (out, y), vjp = jax.vjp(
        lambda xb, hb, g, sh, sc: _res_mod_ln(xb, hb, g, sh, sc, eps),
        x_ref[0], h_ref[0], gm_ref[0, 0][None, :],
        gm_ref[0, 1][None, :], gm_ref[0, 2][None, :])
    dx, dh, dg, dsh, dsc = vjp((do_ref[0].astype(out.dtype),
                                dy_ref[0].astype(y.dtype)))
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dh_ref[0] = dh.astype(dh_ref.dtype)

    @pl.when(i == 0)
    def _zero():
        acc[...] = jnp.zeros_like(acc)

    acc[0, :] += dg[0].astype(jnp.float32)
    acc[1, :] += dsh[0].astype(jnp.float32)
    acc[2, :] += dsc[0].astype(jnp.float32)

    @pl.when(i == ni - 1)
    def _flush():
        dgm_ref[0] = acc[...].astype(dgm_ref.dtype)


def res_mod_ln_block_q(n: int, d: int, bpe: int = 2) -> int:
    """q row-block for the fused residual+LN+modulate custom-VJP kernels
    (0 = geometry unsupported -> callers keep the eager residual + the
    mod_ln/LayerNorm path). Live set per row, bwd (the fat one): SIX
    (1, bq, D) grid block refs (x/h/do/dy in, dx/dh out), double-buffered
    per the measured Mosaic rule (see _bwd_block_q), plus ~10 f32
    row-copies for the residual+LN vjp internals ≈ ``12*bpe + 40``
    bytes/elem; budgeted at 11 MB (~30% headroom under the 16 MB scoped
    limit). Row-local math, so any row-blocking is exact."""
    if n % 8 != 0 or n < 8 or d % 128 != 0:
        return 0
    per_row = d * (12 * bpe + 40)
    for bq in (n, 1024, 512, 256, 128):
        if bq <= n and n % bq == 0 and bq * per_row < 11 * 2 ** 20:
            return bq
    return 0


def _res_mod_ln_call(x, h, gm3, eps, block_q, interpret):
    B, N, D = x.shape
    bq = block_q or res_mod_ln_block_q(N, D, jnp.dtype(x.dtype).itemsize)
    if not bq:
        if interpret:          # CPU tests exercise the kernel math at
            bq = N             # tiny (lane-unaligned) shapes
        else:
            raise ValueError(f"res_mod_ln kernel unsupported at N={N}, "
                             f"D={D}")
    if N % bq:
        raise ValueError(f"block_q {bq} must divide N={N}")
    blk = pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0))
    gblk = pl.BlockSpec((1, 3, D), lambda b, i: (b, 0, 0))
    return pl.pallas_call(
        functools.partial(_res_mod_ln_fwd_kernel, eps=eps),
        out_shape=[jax.ShapeDtypeStruct((B, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, N, D), x.dtype)],
        grid=(B, N // bq),
        in_specs=[blk, blk, gblk],
        out_specs=[blk, blk],
        interpret=interpret,
    )(x, h, gm3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def res_mod_ln_diffable(x, h, gm3, eps=1e-6, block_q=0, interpret=False):
    """Fused adaLN-zero block boundary with Pallas forward AND backward:
    gated residual ``y = x + gate*h`` then parameter-free LN + modulate —
    x/h (B, N, D), gm3 (B, 3, D) = [gate, shift, scale] ->
    (modulated (B, N, D), y (B, N, D)).

    Why: after mod_ln_diffable the round-4 scaled-train profile
    (B=64, d_model=512, N=1024, bf16; 204.5 ms device step) still shows
    ~15 ms/step of XLA elementwise glue at the block boundaries — the
    gated-residual multiply_add fusions (4.8 ms), the per-sample
    dgate multiply_reduce fusions (6.6 ms) and the copies between them —
    each a full HBM round-trip of the (B, N, D) activation. This kernel
    does residual + LN + modulate in ONE read of (x, h) and one write of
    (out, y) per direction; the per-sample gate/shift/scale grads
    accumulate in VMEM scratch across the row grid. Numerics recipe is
    the shared ``_mod_ln`` (identical to mod_ln_diffable and the serving
    kernels); the residual add matches the eager path's compute dtype.
    Reference block semantics: transformer.py:7-8,94-124 (modulate +
    gated residuals, norms without elementwise affine)."""
    return _res_mod_ln_call(x, h, gm3, eps, block_q, interpret)


def _res_mod_ln_diff_fwd(x, h, gm3, eps, block_q, interpret):
    return _res_mod_ln_call(x, h, gm3, eps, block_q, interpret), (x, h, gm3)


def _res_mod_ln_diff_bwd(eps, block_q, interpret, res, cts):
    x, h, gm3 = res
    do, dy = cts
    B, N, D = x.shape
    bq = block_q or res_mod_ln_block_q(N, D, jnp.dtype(x.dtype).itemsize)
    if not bq:
        if interpret:
            bq = N
        else:
            raise ValueError(f"res_mod_ln kernel unsupported at N={N}, "
                             f"D={D}")
    blk = pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0))
    gblk = pl.BlockSpec((1, 3, D), lambda b, i: (b, 0, 0))
    dx, dh, dgm = pl.pallas_call(
        functools.partial(_res_mod_ln_bwd_kernel, eps=eps),
        out_shape=[jax.ShapeDtypeStruct((B, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, N, D), h.dtype),
                   jax.ShapeDtypeStruct((B, 3, D), gm3.dtype)],
        grid=(B, N // bq),
        in_specs=[blk, blk, gblk, blk, blk],
        out_specs=[blk, blk, gblk],
        scratch_shapes=[pltpu.VMEM((3, D), jnp.float32)],
        interpret=interpret,
    )(x, h, gm3, do, dy)
    return dx, dh, dgm


res_mod_ln_diffable.defvjp(_res_mod_ln_diff_fwd, _res_mod_ln_diff_bwd)


def dit_block_reference(x, mod, wqkv, bqkv, wproj, bproj, wfc1, bfc1, wfc2,
                        bfc2, num_heads: int, eps: float = 1e-6):
    """Eager oracle of the same block math (used by tests; mirrors
    models/denoisers/dit.DiTBlock exactly)."""
    from t2ms_tpu.ops.attention import _einsum_natural
    dt = x.dtype
    sh_a, sc_a, g_a, sh_m, sc_m, g_m = [mod[:, i][:, None, :]
                                        for i in range(6)]
    y = (_ln(x, eps) * (1.0 + sc_a.astype(jnp.float32))
         + sh_a.astype(jnp.float32)).astype(dt)
    qkv = y @ wqkv.astype(dt) + bqkv.astype(dt)
    D = x.shape[-1]
    attn = _einsum_natural(qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:],
                           num_heads)
    x = x + g_a.astype(dt) * (attn.astype(dt) @ wproj.astype(dt)
                              + bproj.astype(dt))
    y = (_ln(x, eps) * (1.0 + sc_m.astype(jnp.float32))
         + sh_m.astype(jnp.float32)).astype(dt)
    h1 = jax.nn.gelu(y @ wfc1.astype(dt) + bfc1.astype(dt),
                     approximate=True)
    return x + g_m.astype(dt) * (h1 @ wfc2.astype(dt) + bfc2.astype(dt))
