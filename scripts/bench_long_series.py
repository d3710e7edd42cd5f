"""Long-series serving bench: SUSHI-length (2048) generation through the
flash-attention regime.

The reference handles long series by resampling to a fixed 30x64 latent
(vqvae.py:70); its longest realized sequence is SUSHI len-2048
(evaluation.py:282). The TPU-native long-series MODE instead scales the
latent grid itself (SURVEY.md §5 long-context row): here latent_len=256
-> (256/2)x(64/2) = 4096 patch tokens, beyond the fused-block envelope,
so the sampler runs the flax path and the attention dispatcher picks the
Pallas flash kernel (online softmax, O(block) memory) — the einsum path
at this scale materializes a (B, 4, 4096, 4096) score tensor per layer.

Prints one JSON line per config: flash (auto) vs einsum at the same
geometry, series/sec and per-step latency.
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


def run(attention_impl: str, B: int, steps: int, out_len: int,
        latent_len: int):
    from t2ms_tpu.models.denoisers import DiT
    from t2ms_tpu.models.vae import LAVAE
    from t2ms_tpu.sampling import make_cfg_sampler

    dit = DiT(latent_len=latent_len, latent_dim=64,
              compute_dtype=jnp.bfloat16, attention_impl=attention_impl)
    vae = LAVAE(in_channels=1, latent_grid=latent_len)
    x = jax.random.normal(jax.random.key(0), (B, out_len))
    emb = jax.random.normal(jax.random.key(1), (B, 128))
    vp = vae.init(jax.random.key(2), x)
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(3), z, jnp.zeros(B), emb)
    sampler = make_cfg_sampler(dit, vae, "flowmatching", total_step=steps,
                               cfg_scale=7.0, out_length=out_len)
    out = sampler(dp, vp, jax.random.key(4), x, emb)
    np.asarray(out.series)          # sync through the tunnel
    # Sustained throughput: dispatch all runs, ONE host sync at the end
    # (a per-run np.asarray pays a tunnel round-trip per batch and
    # measures the tunnel, not the chip — see CLAUDE.md).
    runs = 3
    t0 = time.perf_counter()
    outs = [sampler(dp, vp, jax.random.key(5 + i), x, emb)
            for i in range(runs)]
    for o in outs:
        np.asarray(o.series)
    dt = (time.perf_counter() - t0) / runs
    return {
        "metric": f"long_series_sampling_{attention_impl}",
        "series_per_sec": round(B * runs / (dt * runs), 3),
        "ms_per_denoise_step": round(1e3 * dt / steps, 3),
        "out_len": out_len, "tokens": (latent_len // 2) * 32, "batch": B,
        "steps": steps,
    }


def run_train(bwd_mode: str, B: int, out_len: int, latent_len: int,
              n_steps: int = 6):
    """Long-series TRAINING step (the round-2 gap): DiT at 4096 patch
    tokens, one jitted step. bwd_mode selects the attention backward:
      kernel — the dispatcher's choice (two-pass Pallas at N=4096);
      eager  — _bwd_two_pass_blocks disabled, i.e. the round-2 fallback
               (fused fwd + eager einsum VJP materializing (B,H,N,N)).
    """
    import optax

    from t2ms_tpu.models.denoisers import DiT
    from t2ms_tpu.models.vae import LAVAE
    from t2ms_tpu.ops import attention as A
    from t2ms_tpu.training.trainer import (TrainState,
                                           make_denoiser_train_step)

    saved = A._bwd_two_pass_blocks
    if bwd_mode == "eager":
        A._bwd_two_pass_blocks = lambda *a, **k: None
    try:
        dit = DiT(latent_len=latent_len, latent_dim=64,
                  compute_dtype=jnp.bfloat16)
        vae = LAVAE(in_channels=1, latent_grid=latent_len)
        x = jax.random.normal(jax.random.key(0), (B, out_len))
        emb = jax.random.normal(jax.random.key(1), (B, 128))
        vp = vae.init(jax.random.key(2), x)
        z, _ = vae.apply(vp, x, method=vae.encode)
        dp = dit.init(jax.random.key(3), z, jnp.zeros(B), emb)
        opt = optax.adamw(1e-4)
        st = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
        step = make_denoiser_train_step(dit, vae, opt, "flowmatching", 100,
                                        donate=False)
        st, loss = step(st, vp, jax.random.key(4), x, emb)
        np.asarray(loss)                 # sync through the tunnel
        # Steps chain through the TrainState carry; sync ONCE at the end
        # like a real training loop (see CLAUDE.md on per-step syncs).
        t0 = time.perf_counter()
        for i in range(n_steps):
            st, loss = step(st, vp, jax.random.key(5 + i), x, emb)
        np.asarray(loss)
        dt = (time.perf_counter() - t0) / n_steps
    finally:
        A._bwd_two_pass_blocks = saved
    return {
        "metric": f"long_series_train_{bwd_mode}",
        "ms_per_step": round(1e3 * dt, 2),
        "steps_per_sec": round(1.0 / dt, 3),
        "tokens": (latent_len // 2) * 32, "batch": B,
        "loss": float(loss),
    }


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out_len", type=int, default=2048)
    ap.add_argument("--latent_len", type=int, default=256)
    ap.add_argument("--impls", default="auto,einsum")
    ap.add_argument("--train", action="store_true",
                    help="bench the TRAINING step (kernel vs eager bwd) "
                         "instead of sampling")
    ap.add_argument("--train_batch", type=int, default=8)
    args = ap.parse_args()
    if args.train:
        for mode in ("kernel", "eager"):
            res = run_train(mode, args.train_batch, args.out_len,
                            args.latent_len)
            print(json.dumps(res), flush=True)
        return
    for impl in args.impls.split(","):
        res = run(impl, args.batch, args.steps, args.out_len,
                  args.latent_len)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
