"""Scaled-DiT bench: the 56.7M-param geometry (d_model=512, depth 12,
heads 8, mlp x4, 1024 patch tokens) that probes the framework's compute
ceiling — the ~1M-param reference model is latency-bound, this one is
MXU-bound (BASELINE.md round-2: serve 41% MFU, train ~30% with the eager
attention VJP because the round-2 Pallas backward excluded HD=512).

Round 3: the two-pass backward admits HD=512, so the training step runs
Pallas fwd+bwd attention. Prints one JSON line per mode with TFLOP/s and
MFU vs the v5e bf16 peak (197 TFLOP/s).

    python scripts/bench_scaled.py [--modes train,serve] [--batch 64]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def _flops_per_token_fwd(d, depth, mlp_ratio, n_tokens):
    """Dense matmul FLOPs per token per forward (qkv+proj+mlp) plus
    attention score/PV FLOPs."""
    per_layer = 2 * (d * 3 * d + d * d + 2 * d * d * mlp_ratio)
    attn = 2 * 2 * n_tokens * d            # scores + PV, per token
    return depth * (per_layer + attn)


def build(B, heads=8):
    from t2ms_tpu.models.denoisers import DiT
    from t2ms_tpu.models.vae import LAVAE
    dit = DiT(latent_len=64, latent_dim=64, d_model=512, depth=12,
              num_heads=heads, mlp_ratio=4.0, compute_dtype=jnp.bfloat16)
    vae = LAVAE(in_channels=1, latent_grid=64)
    x = jax.random.normal(jax.random.key(0), (B, 96))
    emb = jax.random.normal(jax.random.key(1), (B, 512))
    vp = vae.init(jax.random.key(2), x)
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(3), z, jnp.zeros(B), emb)
    n_par = sum(p.size for p in jax.tree_util.tree_leaves(dp))
    return dit, vae, x, emb, vp, dp, n_par


def bench_serve(B=16, steps=20, heads=8):
    from t2ms_tpu.sampling import make_cfg_sampler
    dit, vae, x, emb, vp, dp, n_par = build(B, heads)
    sampler = make_cfg_sampler(dit, vae, "flowmatching", total_step=steps,
                               cfg_scale=7.0, out_length=96)
    out = sampler(dp, vp, jax.random.key(4), x, emb)
    np.asarray(out.series)
    # Sustained throughput: dispatch all runs, sync once at the end
    # (per-run transfers measure tunnel latency, not the chip; see
    # bench_train for the rationale).
    runs = 4
    t0 = time.perf_counter()
    outs = [sampler(dp, vp, jax.random.key(5 + i), x, emb)
            for i in range(runs)]
    for o in outs:
        np.asarray(o.series)
    dt = (time.perf_counter() - t0) / runs
    tokens = 1024
    fl = _flops_per_token_fwd(512, 12, 4.0, tokens) * tokens
    total = fl * 2 * B * steps             # CFG pair = 2B forwards
    tf = total / dt / 1e12
    return {"metric": "scaled_dit_serve", "series_per_sec":
            round(B / dt, 2), "tflops": round(tf, 1),
            "mfu": round(tf / V5E_BF16_PEAK_TFLOPS, 3),
            "params": n_par, "batch": B, "heads": heads, "steps": steps}


def bench_train(B=64, n_steps=8, precoded=True, heads=8):
    import optax

    from t2ms_tpu.training.trainer import (TrainState,
                                           make_denoiser_train_step)
    dit, vae, x, emb, vp, dp, n_par = build(B, heads)
    opt = optax.adamw(1e-4)
    st = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
    if precoded:
        # The production CLIs cache the frozen-VAE latents out of the hot
        # loop by default (--latent_cache, cli/train.py), so the canonical
        # steady-state step takes latents directly. The round-4 profile
        # measured the in-step conv encode at 17.6 ms of the 204.5 ms
        # device step (8.6%) — time the old path spent on FLOPs the MFU
        # accounting never counted. --encode_in_step restores the old A/B.
        x, _ = vae.apply(vp, x, method=vae.encode)
    step = make_denoiser_train_step(dit, vae, opt, "flowmatching", 100,
                                    donate=False, precoded=precoded)
    st, loss = step(st, vp, jax.random.key(4), x, emb)
    np.asarray(loss)
    # Steps chain through the TrainState carry, so async dispatch keeps
    # the device busy back-to-back — sync ONCE at the end, like a real
    # training loop (cli/train logs occasionally, not per step). A
    # per-step np.asarray(loss) would add a full ~100+ ms tunnel
    # round-trip to every step and measure the tunnel, not the chip.
    t0 = time.perf_counter()
    for i in range(n_steps):
        st, loss = step(st, vp, jax.random.key(5 + i), x, emb)
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / n_steps
    tokens = 1024
    fl = _flops_per_token_fwd(512, 12, 4.0, tokens) * tokens
    total = fl * 3 * B                     # fwd + ~2x bwd
    tf = total / dt / 1e12
    return {"metric": "scaled_dit_train", "steps_per_sec":
            round(1 / dt, 2), "tflops": round(tf, 1),
            "mfu": round(tf / V5E_BF16_PEAK_TFLOPS, 3),
            "params": n_par, "batch": B, "precoded": bool(precoded),
            "heads": heads, "loss": float(loss)}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="train,serve")
    ap.add_argument("--batch", type=int, default=64,
                    help="train batch (serve uses --serve_batch)")
    ap.add_argument("--serve_batch", type=int, default=16)
    ap.add_argument("--heads", type=int, default=8,
                    help="head count at d_model=512 (8 -> d=64 heads, "
                         "the reference-ratio default; 4 -> d=128 heads "
                         "— the roofline experiment: same FLOPs, double "
                         "the per-head score-matmul MXU utilization cap)")
    ap.add_argument("--encode_in_step", action="store_true",
                    help="run the frozen-VAE encode inside the train step "
                         "(the pre-latent-cache methodology) instead of "
                         "feeding precomputed latents")
    args = ap.parse_args()
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    bad = [m for m in modes if m not in ("train", "serve")]
    if bad:
        # a typo must not silently launch an expensive TPU train run
        ap.error(f"unknown mode(s) {bad}; choose from train,serve")
    for mode in modes:
        if mode == "serve":
            print(json.dumps(bench_serve(args.serve_batch,
                                         heads=args.heads)), flush=True)
        else:
            print(json.dumps(bench_train(
                args.batch, precoded=not args.encode_in_step,
                heads=args.heads)), flush=True)


if __name__ == "__main__":
    main()
