"""On-chip serving-engine benchmark: online throughput + tail latency.

Drives the dynamic-batching ServingEngine (serving/engine.py) at the
flagship T2S geometry (bench.py: LA-VAE 30x64 + DiT d128 bf16, len-96,
100-step CFG) under two regimes:

  * saturated: N client threads submit as fast as futures resolve —
    measures sustained series/sec through the batching path (upper
    bound = bench.py's offline number; the gap is batching overhead);
  * trickle: lone requests against an idle engine — measures the
    end-to-end online p50/p95 (queue wait + smallest-tier program +
    host transfer), the number an interactive deployment cares about.

Timing follows CLAUDE.md tunnel rules: the engine's dispatcher syncs
each batch with a host transfer (the only reliable sync), and the
saturated phase measures wall-clock over MANY batches, not per-call.

Prints ONE JSON line. Usage: python scripts/bench_serving.py
  [--requests 2048] [--clients 64] [--tiers 1,16,64,256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_flagship():
    from t2ms_tpu.models.denoisers import DiT
    from t2ms_tpu.models.vae import LAVAE
    dit = DiT(latent_len=30, latent_dim=64, compute_dtype=jnp.bfloat16)
    vae = LAVAE(in_channels=1, latent_grid=30)
    x = jax.random.normal(jax.random.key(0), (2, 96))
    emb = jax.random.normal(jax.random.key(1), (2, 128))
    vae_params = vae.init(jax.random.key(2), x)
    z, _ = vae.apply(vae_params, x, method=vae.encode)
    d_params = dit.init(jax.random.key(3), z, jnp.zeros(2), emb)
    return dit, vae, d_params, vae_params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=2048,
                   help="saturated-phase request count")
    p.add_argument("--clients", type=int, default=64)
    p.add_argument("--tiers", type=str, default="1,16,64,256")
    p.add_argument("--trickle", type=int, default=20,
                   help="idle-engine single requests for the p50")
    p.add_argument("--total_step", type=int, default=100)
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="engine batch deadline. The first on-chip run "
                        "(clients=64, 5 ms) measured 55% padding: the "
                        "deadline fires long before blocking clients can "
                        "refill a tier-sized group. Size clients to the "
                        "largest tier and the deadline to ~10% of a "
                        "batch's service time for a saturation number.")
    p.add_argument("--lengths", type=str, default="96",
                   help="comma list of out-length buckets served "
                        "concurrently (VERDICT r4 #6 mixed-bucket "
                        "scenario: 24,48,96 — each request draws a "
                        "random bucket; the engine batches per bucket)")
    p.add_argument("--rate", type=float, default=0.0,
                   help="OPEN-LOOP arrival rate in requests/sec (one "
                        "submitter thread, exponential inter-arrivals — "
                        "arrivals independent of service, the textbook "
                        "saturation load). 0 = the closed-loop client "
                        "threads (legacy saturated phase)")
    p.add_argument("--solver", default="euler",
                   choices=["euler", "heun", "midpoint"],
                   help="flow integrator for every engine program — "
                        "heun with --total_step 25 is the round-5 "
                        "recommended production config (quality >= "
                        "euler/100 at the 8000-step gate, half the "
                        "model evals)")
    args = p.parse_args()

    from t2ms_tpu.serving import ServingEngine
    dit, vae, d_params, vae_params = build_flagship()
    tiers = [int(t) for t in args.tiers.split(",")]
    lengths = [int(s) for s in args.lengths.split(",")]
    eng = ServingEngine(dit, vae, d_params, vae_params,
                        total_step=args.total_step, solver=args.solver,
                        out_lengths=tuple(lengths),
                        batch_tiers=tiers, max_wait_ms=args.max_wait_ms,
                        text_emb_dim=128)
    print(f"# warmup: compiling {len(tiers)} programs...", flush=True)
    t0 = time.perf_counter()
    eng.warmup()
    print(f"# warmup done in {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    embs = rng.standard_normal((256, 128), dtype=np.float32)

    # --- saturated phase ---------------------------------------------
    done = []
    lock = threading.Lock()
    lrng = np.random.default_rng(1)
    req_lengths = lrng.choice(lengths, size=args.requests)

    if args.rate > 0:
        # open-loop: one submitter, exponential inter-arrivals; futures
        # resolve on a collector pool so arrivals never block on service
        futs = []
        t0 = time.perf_counter()
        next_t = t0
        for i in range(args.requests):
            next_t += lrng.exponential(1.0 / args.rate)
            dt = next_t - time.perf_counter()
            if dt > 0:
                time.sleep(dt)
            futs.append(eng.submit(embs[i % 256], int(req_lengths[i]),
                                   seed=i))
        for f in futs:
            done.append(f.result(timeout=600))
        wall = time.perf_counter() - t0
    else:
        n_left = threading.Semaphore(args.requests)
        ctr = iter(range(args.requests))
        ctr_lock = threading.Lock()

        def client(i):
            while n_left.acquire(blocking=False):
                with ctr_lock:
                    j = next(ctr)
                r = eng.submit(embs[j % 256], int(req_lengths[j]),
                               seed=j).result(timeout=600)
                with lock:
                    done.append(r)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
    sat_tput = len(done) / wall
    st = eng.stats()

    # --- trickle phase ------------------------------------------------
    lats = []
    for i in range(args.trickle):
        t1 = time.perf_counter()
        eng.submit(embs[i], lengths[-1], seed=10_000 + i).result(timeout=600)
        lats.append(time.perf_counter() - t1)
        time.sleep(0.05)          # let the engine go idle between
    lats.sort()
    eng.close()

    extra = {
        "saturated_requests": len(done),
        "clients": args.clients,
        "tiers": tiers,
        "lengths": lengths,
        "open_loop_rate": args.rate or None,
        "solver": args.solver, "total_step": args.total_step,
        "padding_fraction": round(st["padding_fraction"], 4),
        "batches": st["batches"],
        "saturated_p50_s": round(
            sorted(r.latency_s for r in done)[len(done) // 2], 4),
        "trickle_p50_s": round(lats[len(lats) // 2], 4),
        "trickle_p95_s": round(lats[int(len(lats) * 0.95)], 4),
    }
    if "per_bucket" in st:
        extra["per_bucket"] = {
            L: {k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in row.items() if k != "latencies"}
            for L, row in st["per_bucket"].items()}
    print(json.dumps({
        "metric": ("serving_engine_throughput_mixed"
                   if len(lengths) > 1 else
                   "serving_engine_throughput_len96"),
        "value": round(sat_tput, 1),
        "unit": "series/sec/chip",
        "vs_baseline": None,
        "extra": extra,
    }), flush=True)


if __name__ == "__main__":
    main()
