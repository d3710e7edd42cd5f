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
    args = p.parse_args()

    from t2ms_tpu.serving import ServingEngine
    dit, vae, d_params, vae_params = build_flagship()
    tiers = [int(t) for t in args.tiers.split(",")]
    eng = ServingEngine(dit, vae, d_params, vae_params,
                        total_step=args.total_step, out_lengths=(96,),
                        batch_tiers=tiers, max_wait_ms=args.max_wait_ms,
                        text_emb_dim=128)
    print(f"# warmup: compiling {len(tiers)} programs...", flush=True)
    t0 = time.perf_counter()
    eng.warmup()
    print(f"# warmup done in {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    embs = rng.standard_normal((256, 128), dtype=np.float32)

    # --- saturated phase ---------------------------------------------
    n_left = threading.Semaphore(args.requests)
    done = []
    lock = threading.Lock()

    def client(i):
        while n_left.acquire(blocking=False):
            r = eng.submit(embs[i % 256], 96, seed=i).result(timeout=600)
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
        eng.submit(embs[i], 96, seed=10_000 + i).result(timeout=600)
        lats.append(time.perf_counter() - t1)
        time.sleep(0.05)          # let the engine go idle between
    lats.sort()
    eng.close()

    print(json.dumps({
        "metric": "serving_engine_throughput_len96",
        "value": round(sat_tput, 1),
        "unit": "series/sec/chip",
        "vs_baseline": None,
        "extra": {
            "saturated_requests": len(done),
            "clients": args.clients,
            "tiers": tiers,
            "padding_fraction": round(st["padding_fraction"], 4),
            "batches": st["batches"],
            "saturated_p50_s": round(
                sorted(r.latency_s for r in done)[len(done) // 2], 4),
            "trickle_p50_s": round(lats[len(lats) // 2], 4),
            "trickle_p95_s": round(lats[int(len(lats) * 0.95)], 4),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
