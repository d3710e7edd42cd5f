"""On-chip A/B of fused_dit_stack variants at the SERVING geometry
(B=512 = the CFG-doubled sampler batch, N=480 patch tokens, D=128, H=4,
L=4, bf16) — the stack kernel is ~95% of sampler device time, so any win
here moves the headline bench directly.

Variants: per-head-loop vs folded two-matmul attention
(ops.attention.attn_heads_folded) x batch_block G (1 element per program
vs a (G, N, D) slab). Parity vs the shipped G=1 loop kernel is asserted
for every variant before timing.

Timing method: ``--inner`` chained kernel calls inside ONE ``lax.scan``
program (output feeds the next input), so a single dispatch amortizes
the ~5-100 ms axon tunnel latency that makes isolated per-call timings
meaningless (CLAUDE.md); reported ms is per inner call.

    python scripts/bench_stack_variants.py [--batch 512] [--inner 25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--inner", type=int, default=25,
                    help="kernel calls chained inside one scan program")
    ap.add_argument("--reps", type=int, default=3,
                    help="timed dispatches of the whole scan program")
    ap.add_argument("--n", type=int, default=480)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    args = ap.parse_args()

    from t2ms_tpu.ops.dit_block import fused_dit_stack
    B, N, D, L, H = args.batch, args.n, args.d, args.depth, args.heads
    hid = 2 * D
    ks = jax.random.split(jax.random.key(0), 10)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, N, D), dt)
    mod = (jax.random.normal(ks[1], (B, L, 6, D)) * 0.1).astype(dt)
    wqkv = jax.random.normal(ks[2], (L, D, 3 * D)) * 0.05
    bqkv = jnp.zeros((L, 3 * D))
    wproj = jax.random.normal(ks[3], (L, D, D)) * 0.05
    bproj = jnp.zeros((L, D))
    wfc1 = jax.random.normal(ks[4], (L, D, hid)) * 0.05
    bfc1 = jnp.zeros((L, hid))
    wfc2 = jax.random.normal(ks[5], (L, hid, D)) * 0.05
    bfc2 = jnp.zeros((L, D))
    a = (x, mod, wqkv, bqkv, wproj, bproj, wfc1, bfc1, wfc2, bfc2)
    rest = a[1:]

    variants = [("loop_g1", dict()),
                ("loop_g4", dict(batch_block=4)),
                ("folded_g1", dict(attn_impl="folded")),
                ("folded_g4", dict(attn_impl="folded", batch_block=4)),
                ]

    def make_chain(kw):
        def step(h, _):
            o = fused_dit_stack(h, *rest, H, **kw)
            return o, ()
        # Reduce to a scalar ON DEVICE: transferring the (B, N, D)
        # activation through the axon tunnel costs ~2.5 s (~24 MB/s) and
        # would swamp the ~10 ms/call kernel time being measured.
        return jax.jit(lambda h: jnp.sum(
            jax.lax.scan(step, h, (), length=args.inner)[0]
            .astype(jnp.float32)))

    base = np.asarray(jax.jit(
        lambda *a: fused_dit_stack(*a, H))(*a), np.float32)
    out = {}
    for name, kw in variants:
        try:
            got = np.asarray(jax.jit(
                lambda *a, kw=kw: fused_dit_stack(*a, H, **kw))(*a),
                np.float32)
            err = float(np.max(np.abs(got - base)))
            # parity gate BEFORE timing: a numerically wrong variant must
            # not enter the ranked results (bf16 stacks agree to ~1e-1
            # absolute on unit-scale activations; real divergence is O(1))
            if err > 0.25:
                out[name] = {"error": f"parity maxerr={err:.2e}",
                             "maxerr": err}
                print(f"  {name}: PARITY FAIL maxerr={err:.2e}", flush=True)
                continue
            chain = make_chain(kw)
            np.asarray(chain(x))                     # compile + warmup
            t0 = time.perf_counter()
            for _ in range(args.reps):
                r = chain(x)
            np.asarray(r)
            ms = ((time.perf_counter() - t0)
                  / (args.reps * args.inner) * 1e3)
            out[name] = {"ms": round(ms, 3), "maxerr": err}
            print(f"  {name}: {ms:.3f} ms/call maxerr={err:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report OOM/compile fails
            out[name] = {"error": str(e)[:200]}
            print(f"  {name}: FAILED {str(e)[:200]}", flush=True)
    print(json.dumps({"metric": "stack_variants", "batch": B,
                      "inner": args.inner, "results": out}), flush=True)


if __name__ == "__main__":
    main()
