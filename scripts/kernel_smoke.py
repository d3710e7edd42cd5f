"""On-chip Pallas kernel regression smoke (VERDICT r2 #7).

Runs EVERY Pallas kernel at its LARGEST admitted geometry on the real
TPU, asserts numeric parity vs the einsum/eager oracle and that nothing
OOMs VMEM — institutionalizing the CLAUDE.md rule "stress-test every
kernel at its LARGEST intended geometry on the real chip" as a check.

One command, <2 min, one JSON line out. Run after ANY kernel change:

    python scripts/kernel_smoke.py            # all kernels
    python scripts/kernel_smoke.py --only two_pass_bwd

Parity gate: Pearson correlation >= 0.999 vs the f32 oracle per output
(bf16 recipes differ from f32 einsum in the last bits, so exact allclose
is the wrong gate at serving dtype; correlation catches real breakage —
wrong blocks, unwritten rows, bad accumulation — which shows up as
corr << 0.99)."""

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

MIN_CORR = 0.999


def _corr(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.corrcoef(a, b)[0, 1])


def _check(name, got, want, results, t_ms):
    """got/want: pytrees (tuples) of arrays."""
    got = jax.tree_util.tree_leaves(got)
    want = jax.tree_util.tree_leaves(want)
    # zip() would truncate to the common prefix — a kernel regressing to
    # return FEWER outputs than the oracle must fail, not green-pass on
    # the surviving leaves
    assert len(got) == len(want), \
        f"{name}: {len(got)} outputs vs oracle {len(want)}"
    corrs = [_corr(g, w) for g, w in zip(got, want)]
    ok = all(np.isfinite(np.asarray(g)).all() for g in got) \
        and all(c >= MIN_CORR for c in corrs)
    results[name] = {"ok": bool(ok), "corr": round(min(corrs), 6),
                     "ms": round(t_ms, 2)}
    print(f"  {name}: {'PASS' if ok else 'FAIL'} "
          f"corr={min(corrs):.6f} {t_ms:.1f} ms", file=sys.stderr)


def _timed(fn, *args):
    # sync EVERY leaf (tunnel sync is a host transfer): multi-program
    # composites (e.g. the two-pass backward — dq from pass 1, dk/dv from
    # pass 2) would otherwise stop the clock before the later pass runs
    def sync(o):
        for leaf in jax.tree_util.tree_leaves(o):
            np.asarray(leaf)
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    return out, 1e3 * (time.perf_counter() - t0)


def _nat(seed, B, N, HD, dtype):
    ks = jax.random.split(jax.random.key(seed), 4)
    return tuple(jax.random.normal(k, (B, N, HD), dtype) for k in ks)


def _split(seed, B, H, N, D, dtype):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(jax.random.normal(k, (B, H, N, D), dtype) for k in ks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    from t2ms_tpu.ops import attention as A
    from t2ms_tpu.ops import dit_block as DB

    dt = jnp.bfloat16                       # the serving dtype
    results = {}

    def want_run(name):
        return not args.only or args.only in name

    # --- flash: long-series head-split layout, largest bench geometry ---
    if want_run("flash"):
        q, k, v = _split(1, 2, 4, 4096, 32, dt)
        want = A.einsum_attention(*jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), (q, k, v)))
        got, ms = _timed(jax.jit(A.flash_attention), q, k, v)
        _check("flash_4096", got, want, results, ms)

    # --- packed + vmem: serving op-point geometry ---
    if want_run("packed"):
        q, k, v = _split(2, 8, 4, 480, 32, dt)
        want = A.einsum_attention(*jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), (q, k, v)))
        got, ms = _timed(jax.jit(A.packed_attention), q, k, v)
        _check("packed_480", got, want, results, ms)
    if want_run("vmem"):
        q, k, v = _split(3, 8, 4, 480, 32, dt)
        want = A.einsum_attention(*jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), (q, k, v)))
        got, ms = _timed(jax.jit(A.vmem_attention), q, k, v)
        _check("vmem_480", got, want, results, ms)

    # --- fused-heads fwd: whole-row at its largest N, blocked at 4096 ---
    if want_run("fused_whole"):
        n = max(n for n in (256, 512, 768, 1024)
                if A.fused_heads_block_q(n, 128, 2) == n)
        q, k, v, _ = _nat(4, 4, n, 128, dt)
        want = A._einsum_natural(*(x.astype(jnp.float32)
                                   for x in (q, k, v)), 4)
        got, ms = _timed(jax.jit(lambda a, b, c:
                                 A.fused_heads_attention(a, b, c, 4)),
                         q, k, v)
        _check(f"fused_heads_wholerow_{n}", got, want, results, ms)
    if want_run("fused_blocked"):
        q, k, v, _ = _nat(5, 2, 4096, 128, dt)
        want = A._einsum_natural(*(x.astype(jnp.float32)
                                   for x in (q, k, v)), 4)
        got, ms = _timed(jax.jit(lambda a, b, c:
                                 A.fused_heads_attention(a, b, c, 4)),
                         q, k, v)
        _check("fused_heads_blocked_4096", got, want, results, ms)

    # --- fused-heads bwd: whole-row, blocked, and two-pass regimes ---
    def bwd_oracle(q, k, v, g):
        f32 = lambda x: x.astype(jnp.float32)
        _, vjp = jax.vjp(lambda a, b, c: A._einsum_natural(a, b, c, 4),
                         f32(q), f32(k), f32(v))
        return vjp(f32(g))

    if want_run("bwd_wholerow"):
        n = max(n for n in (256, 512, 768) if A._bwd_block_q(n, 128, 2) == n)
        q, k, v, g = _nat(6, 4, n, 128, dt)
        got, ms = _timed(jax.jit(lambda *a:
                                 A.fused_heads_attention_bwd(*a, 4)),
                         q, k, v, g)
        _check(f"bwd_wholerow_{n}", got, bwd_oracle(q, k, v, g), results, ms)
    if want_run("bwd_blocked"):
        n = max(n for n in (512, 1024, 2048)
                if 0 < A._bwd_block_q(n, 128, 2) < n)
        q, k, v, g = _nat(7, 2, n, 128, dt)
        got, ms = _timed(jax.jit(lambda *a:
                                 A.fused_heads_attention_bwd(*a, 4)),
                         q, k, v, g)
        _check(f"bwd_blocked_{n}", got, bwd_oracle(q, k, v, g), results, ms)
    if want_run("two_pass_bwd"):
        assert A._bwd_two_pass_blocks(4096, 128, 2), "envelope regressed"
        q, k, v, g = _nat(8, 2, 4096, 128, dt)
        got, ms = _timed(
            jax.jit(lambda *a: A.fused_heads_attention_bwd_two_pass(*a, 4)),
            q, k, v, g)
        _check("two_pass_bwd_4096", got, bwd_oracle(q, k, v, g), results, ms)

    # --- scaled geometry HD=512 (d_model=512, 8 heads, 1024 tokens) ---
    def bwd_oracle8(q, k, v, g):
        f32 = lambda x: x.astype(jnp.float32)
        _, vjp = jax.vjp(lambda a, b, c: A._einsum_natural(a, b, c, 8),
                         f32(q), f32(k), f32(v))
        return vjp(f32(g))

    if want_run("scaled_fwd"):
        assert A.fused_heads_block_q(1024, 512, 2), "envelope regressed"
        q, k, v, _ = _nat(11, 2, 1024, 512, dt)
        want = A._einsum_natural(*(x.astype(jnp.float32)
                                   for x in (q, k, v)), 8)
        got, ms = _timed(jax.jit(lambda a, b, c:
                                 A.fused_heads_attention(a, b, c, 8)),
                         q, k, v)
        _check("scaled_fwd_1024_hd512", got, want, results, ms)
    if want_run("scaled_bwd"):
        assert A._bwd_two_pass_blocks(1024, 512, 2), "envelope regressed"
        q, k, v, g = _nat(12, 2, 1024, 512, dt)
        got, ms = _timed(
            jax.jit(lambda *a: A.fused_heads_attention_bwd_two_pass(*a, 8)),
            q, k, v, g)
        _check("scaled_bwd_1024_hd512", got, bwd_oracle8(q, k, v, g),
               results, ms)
    if want_run("scaled_bwd_grouped"):
        # the auto-dispatched scaled-train backward: 5-matmul single pass
        # over lane-aligned head groups (profile-driven round-3 lever)
        hg = A._bwd_head_groups(1024, 512, 8, 2)
        assert hg, "head-group envelope regressed"
        q, k, v, g = _nat(13, 2, 1024, 512, dt)
        got, ms = _timed(
            jax.jit(lambda *a: A.fused_heads_attention_bwd(
                *a, 8, block_q=hg[1], head_groups=hg[0])),
            q, k, v, g)
        _check(f"scaled_bwd_grouped_g{hg[0]}_bq{hg[1]}", got,
               bwd_oracle8(q, k, v, g), results, ms)
    if want_run("scaled_bwd_pipe"):
        # round-5 pipelined single-pass backward at the same proven
        # grouped geometry (dp hoisted ahead of the softmax, 1/r folded
        # into (bq, D) operands — see _bwd_pipelined_blocked_kernel)
        hg = A._bwd_head_groups(1024, 512, 8, 2)
        assert hg, "head-group envelope regressed"
        q, k, v, g = _nat(21, 2, 1024, 512, dt)
        got, ms = _timed(
            jax.jit(lambda *a: A.fused_heads_attention_bwd(
                *a, 8, block_q=hg[1], head_groups=hg[0], pipelined=True)),
            q, k, v, g)
        _check(f"scaled_bwd_pipe_g{hg[0]}_bq{hg[1]}", got,
               bwd_oracle8(q, k, v, g), results, ms)

    if want_run("stats_fwd"):
        # lean-path forward: primal + per-row log-sum-exp residual
        assert A.fused_heads_block_q(1024, 512, 2), "envelope regressed"
        q, k, v, _ = _nat(18, 2, 1024, 512, dt)
        f32 = lambda x: x.astype(jnp.float32)
        want_o = A._einsum_natural(f32(q), f32(k), f32(v), 8)
        B, N, HD, H = q.shape[0], 1024, 512, 8
        D = HD // H
        split = lambda x: f32(x).reshape(B, N, H, D).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", split(q) * D ** -0.5, split(k))
        want_lse = jax.nn.logsumexp(s, axis=-1).transpose(0, 2, 1)
        got, ms = _timed(jax.jit(
            lambda a, b, c: A.fused_heads_attention_with_stats(a, b, c, 8)),
            q, k, v)
        _check("stats_fwd_1024_hd512", got, (want_o, want_lse), results, ms)

    if want_run("lean_bwd"):
        # lean backward at its auto-dispatched scaled config: p rebuilt
        # as exp(s - lse), softmax row term from g.o — 4 fewer VPU passes
        # per score tile than the recompute kernels
        grp = A._bwd_lean_groups(1024, 512, 8, 2)
        assert grp, "lean envelope regressed"
        q, k, v, g = _nat(19, 2, 1024, 512, dt)
        o, lse = jax.jit(
            lambda a, b, c: A.fused_heads_attention_with_stats(a, b, c, 8)
        )(q, k, v)
        got, ms = _timed(jax.jit(
            lambda *a: A.fused_heads_attention_bwd_lean(*a, 8)),
            q, k, v, g, o, lse)
        _check(f"lean_bwd_g{grp[0]}_bq{grp[1]}", got,
               bwd_oracle8(q, k, v, g), results, ms)

    if want_run("lean_two_pass"):
        # long-series lean backward (N=4096 @ HD=128 — grouping bottoms
        # out, the two passes share the precomputed [lse | delta] stats)
        assert A._bwd_lean_two_pass_blocks(4096, 128, 2), \
            "lean two-pass envelope regressed"
        q, k, v, g = _nat(20, 2, 4096, 128, dt)
        o, lse = jax.jit(
            lambda a, b, c: A.fused_heads_attention_with_stats(a, b, c, 4)
        )(q, k, v)
        got, ms = _timed(jax.jit(
            lambda *a: A.fused_heads_attention_bwd_lean_two_pass(*a, 4)),
            q, k, v, g, o, lse)
        _check("lean_two_pass_4096", got, bwd_oracle(q, k, v, g),
               results, ms)

    # --- fused LN+modulate custom-VJP: scaled-train + long-series ---
    def _modln_case(name, seed, B, N, D):
        assert DB.mod_ln_block_q(N, D, 2), "mod_ln envelope regressed"
        ks = jax.random.split(jax.random.key(seed), 3)
        x = jax.random.normal(ks[0], (B, N, D), dt)
        mod2 = jax.random.normal(ks[1], (B, 2, D), dt) * 0.3
        g = jax.random.normal(ks[2], (B, N, D), dt)

        def oracle(x, m):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
            y = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
            return (y * (1.0 + m[:, 1][:, None].astype(jnp.float32))
                    + m[:, 0][:, None].astype(jnp.float32))

        got, ms = _timed(jax.jit(lambda a, b: DB.mod_ln_diffable(a, b)),
                         x, mod2)
        _check(f"mod_ln_fwd_{name}", got, oracle(x, mod2), results, ms)

        def fused_grads(x, m, g):
            _, vjp = jax.vjp(lambda a, b: DB.mod_ln_diffable(a, b), x, m)
            return vjp(g)

        _, ovjp = jax.vjp(oracle, x.astype(jnp.float32),
                          mod2.astype(jnp.float32))
        got, ms = _timed(jax.jit(fused_grads), x, mod2, g)
        _check(f"mod_ln_bwd_{name}", got, ovjp(g.astype(jnp.float32)),
               results, ms)

    if want_run("mod_ln_scaled"):
        _modln_case("1024_d512", 14, 4, 1024, 512)
    if want_run("mod_ln_long"):
        _modln_case("4096_d128", 15, 2, 4096, 128)

    # --- fused gated-residual + LN + modulate (block-boundary VJP) ---
    def _resln_case(name, seed, B, N, D):
        assert DB.res_mod_ln_block_q(N, D, 2), "res_mod_ln envelope regressed"
        ks = jax.random.split(jax.random.key(seed), 5)
        x = jax.random.normal(ks[0], (B, N, D), dt)
        h = jax.random.normal(ks[1], (B, N, D), dt)
        gm3 = jax.random.normal(ks[2], (B, 3, D), dt) * 0.3
        go = jax.random.normal(ks[3], (B, N, D), dt)
        gy = jax.random.normal(ks[4], (B, N, D), dt)

        def oracle(x, h, m):
            y = x + m[:, 0][:, None] * h
            yf = y.astype(jnp.float32)
            mu = jnp.mean(yf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(yf - mu), axis=-1, keepdims=True)
            n = (yf - mu) * jax.lax.rsqrt(var + 1e-6)
            return (n * (1.0 + m[:, 2][:, None].astype(jnp.float32))
                    + m[:, 1][:, None].astype(jnp.float32)), yf

        got, ms = _timed(
            jax.jit(lambda a, b, c: DB.res_mod_ln_diffable(a, b, c)),
            x, h, gm3)
        _check(f"res_mod_ln_fwd_{name}", got, oracle(x, h, gm3),
               results, ms)

        def fused_grads(x, h, m, go, gy):
            _, vjp = jax.vjp(
                lambda a, b, c: DB.res_mod_ln_diffable(a, b, c), x, h, m)
            return vjp((go, gy))

        _, ovjp = jax.vjp(oracle, x.astype(jnp.float32),
                          h.astype(jnp.float32), gm3.astype(jnp.float32))
        got, ms = _timed(jax.jit(fused_grads), x, h, gm3, go, gy)
        _check(f"res_mod_ln_bwd_{name}", got,
               ovjp((go.astype(jnp.float32), gy.astype(jnp.float32))),
               results, ms)

    if want_run("res_mod_ln_scaled"):
        _resln_case("1024_d512", 16, 4, 1024, 512)
    if want_run("res_mod_ln_long"):
        _resln_case("4096_d128", 17, 2, 4096, 128)

    # --- fused DiT block + stack at the serving geometry ---
    if want_run("dit"):
        B, N, D, hidden, L = 8, 480, 128, 256, 4
        ks = jax.random.split(jax.random.key(9), 12)
        x = jax.random.normal(ks[0], (B, N, D), dt)
        mod = (jax.random.normal(ks[1], (B, 6, D), dt) * 0.1)
        wb = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) * 0.05
        ws = (wb(2, D, 3 * D), wb(3, 3 * D), wb(4, D, D), wb(5, D),
              wb(6, D, hidden), wb(7, hidden), wb(8, hidden, D), wb(9, D))
        want = DB.dit_block_reference(x.astype(jnp.float32),
                                      mod.astype(jnp.float32), *ws, 4)
        got, ms = _timed(jax.jit(lambda *a: DB.fused_dit_block(*a, 4)),
                         x, mod, *ws)
        _check("dit_block_480", got, want, results, ms)

        modL = jnp.stack([mod] * L, axis=1)
        wsL = tuple(jnp.stack([w] * L) for w in ws)
        wantL = x.astype(jnp.float32)
        for _ in range(L):
            wantL = DB.dit_block_reference(wantL, mod.astype(jnp.float32),
                                           *ws, 4)
        gotL, ms = _timed(jax.jit(lambda *a: DB.fused_dit_stack(*a, 4)),
                          x, modL, *wsL)
        _check("dit_stack_480x4", gotL, wantL, results, ms)

    # --- SPLIT block kernels at the SCALED serving geometry (d=512) ---
    if want_run("dit_split"):
        B, N, D, hidden, H = 4, 1024, 512, 2048, 8
        ks = jax.random.split(jax.random.key(11), 12)
        x = jax.random.normal(ks[0], (B, N, D), dt)
        mod = (jax.random.normal(ks[1], (B, 6, D), dt) * 0.1)
        wb = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) * 0.02
        ws = (wb(2, D, 3 * D), wb(3, 3 * D), wb(4, D, D), wb(5, D),
              wb(6, D, hidden), wb(7, hidden), wb(8, hidden, D), wb(9, D))
        want = DB.dit_block_reference(x.astype(jnp.float32),
                                      mod.astype(jnp.float32), *ws, H)
        got, ms = _timed(jax.jit(
            lambda *a: DB.fused_dit_block_split(*a, H)), x, mod, *ws)
        _check("dit_block_split_1024_d512", got, want, results, ms)

    # --- fused DiT block custom-VJP training path (grads) ---
    if want_run("block_vjp") and hasattr(DB, "fused_dit_block_diffable"):
        B, N, D, hidden = 8, 480, 128, 256
        ks = jax.random.split(jax.random.key(10), 12)
        x = jax.random.normal(ks[0], (B, N, D), dt)
        mod = (jax.random.normal(ks[1], (B, 6, D), dt) * 0.1)
        wb = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) * 0.05
        ws = (wb(2, D, 3 * D), wb(3, 3 * D), wb(4, D, D), wb(5, D),
              wb(6, D, hidden), wb(7, hidden), wb(8, hidden, D), wb(9, D))

        def loss_fused(x, mod, *ws):
            return jnp.sum(jnp.square(
                DB.fused_dit_block_diffable(x, mod, *ws, 4)))

        def loss_ref(x, mod, *ws):
            return jnp.sum(jnp.square(
                DB.dit_block_reference(x, mod, *ws, 4)))

        got, ms = _timed(jax.jit(jax.grad(loss_fused,
                                          argnums=tuple(range(10)))),
                         x, mod, *ws)
        want = jax.grad(loss_ref, argnums=tuple(range(10)))(
            x.astype(jnp.float32), mod.astype(jnp.float32), *ws)
        _check("dit_block_vjp_480", got, want, results, ms)

    if not results:
        # a typo'd/renamed --only must not green the gate with 0 kernels
        print(json.dumps({"metric": "kernel_smoke", "kernels": 0,
                          "failed": 0, "pass": False,
                          "error": f"--only {args.only!r} matched no "
                                   f"kernel section"}))
        sys.exit(1)
    n_fail = sum(not r["ok"] for r in results.values())
    print(json.dumps({"metric": "kernel_smoke", "kernels": len(results),
                      "failed": n_fail, "pass": n_fail == 0,
                      "results": results}))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
