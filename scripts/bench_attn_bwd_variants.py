"""On-chip A/B of the scaled-geometry attention BACKWARD variants.

The round-4 precoded-step profile (.onchip_r04_profile_precoded.log)
attributes ~30% of the 204 ms scaled train step to the 12 per-layer
attention-VJP programs (~5.16 ms each) at B=64, N=1024, HD=512, H=8 —
vs a ~1.7 ms MXU floor (10*N^2*HD*B bf16 FLOPs at 197 TFLOP/s). The gap
is VPU passes over the score tiles, which the LEAN kernel halves by
reusing forward residuals (lse + output). This harness times every
admitted backward variant at the REAL train batch and prints one JSON
line; the winner decides _bwd_lean_groups' proven table and the
_LEAN_BWD_DEFAULT_ON flip.

Parity protocol (ADVICE r3): each variant is ASSERTED against the f32
eager VJP oracle at B=2 BEFORE being timed at B=64 (the full-batch f32
einsum VJP would materialize a 2.1 GB score tensor just for checking);
a variant that fails parity or OOMs is recorded failed, never timed.

    python scripts/bench_attn_bwd_variants.py [--reps 10] [--batch 64]
    python scripts/bench_attn_bwd_variants.py --long   # N=4096 @ HD=128
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, HD, H = 1024, 512, 8          # scaled-train geometry (--long overrides)
MIN_CORR = 0.999


def _corr(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.corrcoef(a, b)[0, 1])


def _nat(seed, B, dtype):
    ks = jax.random.split(jax.random.key(seed), 4)
    return tuple(jax.random.normal(k, (B, N, HD), dtype) for k in ks)


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--long", action="store_true",
                    help="long-series geometry: N=4096, HD=128, H=4")
    args = ap.parse_args()
    from t2ms_tpu.ops import attention as A

    global N, HD, H
    if args.long:
        N, HD, H = 4096, 128, 4
    if args.batch is None:
        args.batch = 8 if args.long else 64

    dt = jnp.bfloat16
    qs, ks_, vs, gs = _nat(30, 2, dt)                 # parity shapes
    qb, kb, vb, gb = _nat(31, args.batch, dt)         # timing shapes
    f32 = lambda x: x.astype(jnp.float32)
    _, vjp = jax.vjp(lambda a, b, c: A._einsum_natural(a, b, c, H),
                     f32(qs), f32(ks_), f32(vs))
    want = vjp(f32(gs))

    stats = jax.jit(
        lambda a, b, c: A.fused_heads_attention_with_stats(a, b, c, H))
    os_, lses = stats(qs, ks_, vs)
    ob, lseb = stats(qb, kb, vb)
    _sync((ob, lseb))

    def lean(grp, bq):
        return jax.jit(lambda q, k, v, g, o, l:
                       A.fused_heads_attention_bwd_lean(
                           q, k, v, g, o, l, H, groups=grp, block_q=bq))

    variants = {
        "two_pass": (jax.jit(lambda q, k, v, g:
                             A.fused_heads_attention_bwd_two_pass(
                                 q, k, v, g, H)), False),
    }
    if args.long:
        variants["lean_two_pass"] = (jax.jit(
            lambda q, k, v, g, o, l:
            A.fused_heads_attention_bwd_lean_two_pass(q, k, v, g, o, l, H)),
            True)
    else:
        variants["grouped_g2_bq512"] = (jax.jit(
            lambda q, k, v, g: A.fused_heads_attention_bwd(
                q, k, v, g, H, block_q=512, head_groups=2)), False)
        # round-5 pipelined kernel (dp before softmax, no (bq, N)
        # normalization pass) at the same proven geometries
        for grp, bq in ((2, 512), (2, 256), (4, 512), (2, 1024)):
            variants[f"pipe_g{grp}_bq{bq}"] = (jax.jit(
                functools.partial(
                    lambda q, k, v, g, grp, bq:
                    A.fused_heads_attention_bwd(
                        q, k, v, g, H, block_q=bq, head_groups=grp,
                        pipelined=True), grp=grp, bq=bq)), False)
        auto = A._bwd_lean_groups(N, HD, H, 2)
        if auto:
            variants[f"lean_auto_g{auto[0]}_bq{auto[1]}"] = (lean(*auto),
                                                             True)
        for grp, bq in ((2, 256), (4, 256), (4, 512), (2, 512)):
            if auto and (grp, bq) == auto:
                continue
            variants[f"lean_g{grp}_bq{bq}"] = (lean(grp, bq), True)

    results = {}
    for name, (fn, needs_stats) in variants.items():
        pa = (qs, ks_, vs, gs) + ((os_, lses) if needs_stats else ())
        ta = (qb, kb, vb, gb) + ((ob, lseb) if needs_stats else ())
        try:
            got = fn(*pa)
            _sync(got)
            corr = min(_corr(g, w) for g, w in zip(got, want))
            if corr < MIN_CORR:
                results[name] = {"ok": False, "corr": round(corr, 6)}
                print(f"  {name}: PARITY FAIL corr={corr:.6f}",
                      file=sys.stderr)
                continue
            out = fn(*ta)           # compile at the timing batch
            _sync(out)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn(*ta)
            _sync(out)
            ms = 1e3 * (time.perf_counter() - t0) / args.reps
            tflops = 10 * N * N * HD * args.batch / (ms * 1e-3) / 1e12
            results[name] = {"ok": True, "corr": round(corr, 6),
                             "ms": round(ms, 3),
                             "tflops": round(tflops, 1)}
            print(f"  {name}: {ms:.3f} ms  {tflops:.1f} TFLOP/s "
                  f"corr={corr:.6f}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — record OOM/compile fails
            results[name] = {"ok": False,
                             "error": str(e).splitlines()[0][:200]}
            print(f"  {name}: ERROR {str(e).splitlines()[0][:200]}",
                  file=sys.stderr)

    # forward overhead of emitting the stats residual
    plain = jax.jit(lambda a, b, c: A.fused_heads_attention(a, b, c, H))
    for nm, fn in (("fwd_plain", plain), ("fwd_with_stats", stats)):
        out = fn(qb, kb, vb)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(qb, kb, vb)
        _sync(out)
        ms = 1e3 * (time.perf_counter() - t0) / args.reps
        results[nm] = {"ok": True, "ms": round(ms, 3)}
        print(f"  {nm}: {ms:.3f} ms", file=sys.stderr)

    timed = {k: v["ms"] for k, v in results.items()
             if v.get("ok") and ("bq" in k or "two_pass" in k)}
    best = min(timed, key=timed.get) if timed else None
    print(json.dumps({"metric": "attn_bwd_variants",
                      "batch": args.batch, "n": N, "hd": HD,
                      "best": best, "results": results}))
    sys.exit(0 if timed else 1)


if __name__ == "__main__":
    main()
