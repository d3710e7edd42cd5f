"""EMA shadow-weights A/B at the SCALED geometry (VERDICT r4 #7).

The gate-scale A/B measured EMA as a quality NEGATIVE (BASELINE.md: the
0.8M model at 8k steps has no late-iterate noise to average away) and the
feature was documented as "a larger-scale lever" — a claim never tested
at the 56.7M geometry where it would bind. This script tests it there:
one training run of the scaled DiT (d=512, depth 12, heads 8, mlp x4 —
bench_scaled.py geometry) on a varied synthetic corpus, tracking an EMA
shadow (training is identical step for step, so live-vs-EMA is perfectly
paired), then evaluates the rectified-flow objective on a HELD-OUT batch
with identical (t, noise) draws for both parameter sets.

Decision rule: if ema_eval_loss < live_eval_loss the "larger-scale
lever" claim stands (recorded in BASELINE.md); otherwise strike it.

    python scripts/ab_scaled_ema.py [--steps 2000] [--decay 0.999]
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


def make_batch(key_i, n, T=96, n_classes=8):
    """The quality_gate corpus family (per-call seeded) at the scaled
    model's 512-dim embedding."""
    rng = np.random.default_rng((7, key_i, T))
    tt = np.linspace(0, 1, T)
    cls = rng.integers(0, n_classes, n)
    freqs = 1.0 + cls * 0.5
    phase = (cls * 0.7)[:, None]
    x = np.sin(2 * np.pi * freqs[:, None] * tt[None] + phase)
    x = (x + 1) / 2 + 0.02 * rng.standard_normal((n, T))
    emb = np.zeros((n, 512), np.float32)
    emb[np.arange(n), cls] = 1.0
    return jnp.asarray(x, jnp.float32), jnp.asarray(emb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--decay", type=float, default=0.999)
    ap.add_argument("--eval_draws", type=int, default=8,
                    help="paired (t, noise) draws averaged for the "
                         "held-out eval loss")
    args = ap.parse_args()

    import optax

    from t2ms_tpu.models.denoisers import DiT
    from t2ms_tpu.models.vae import LAVAE
    from t2ms_tpu.training.ema import make_ema_update
    from t2ms_tpu.training.trainer import (TrainState,
                                           make_denoiser_train_step)

    B = args.batch
    dit = DiT(latent_len=64, latent_dim=64, d_model=512, depth=12,
              num_heads=8, mlp_ratio=4.0, compute_dtype=jnp.bfloat16)
    vae = LAVAE(in_channels=1, latent_grid=64)
    x0, e0 = make_batch(0, B)
    vp = vae.init(jax.random.key(2), x0)
    z0, _ = vae.apply(vp, x0, method=vae.encode)
    dp = dit.init(jax.random.key(3), z0, jnp.zeros(B), e0)
    n_par = sum(p.size for p in jax.tree_util.tree_leaves(dp))
    opt = optax.adamw(1e-4)
    st = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
    step = make_denoiser_train_step(dit, vae, opt, "flowmatching", 100,
                                    donate=False)
    ema_update = make_ema_update(args.decay)   # already jitted + donating
    ema = st.params

    t0 = time.time()
    loss = jnp.zeros(())
    for i in range(args.steps):
        x, e = make_batch(1000 + i, B)
        st, loss = step(st, vp, jax.random.key(i), x, e)
        ema = ema_update(ema, st.params)
        if i % 200 == 0:
            print(f"step {i}: loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr,
                  flush=True)
    final_loss = float(loss)

    # --- paired held-out eval: same (t, noise) for both arms ---------
    xe, ee = make_batch(999_999, 256)
    ze, _ = jax.jit(lambda v, x: vae.apply(v, x, method=vae.encode))(vp, xe)

    @jax.jit
    def eval_loss(params, key):
        kt, kn = jax.random.split(key)
        t = jnp.round(jax.random.uniform(kt, (ze.shape[0],)) * 100) / 100
        n = jax.random.normal(kn, ze.shape)
        x_t = t[:, None, None] * ze + (1 - t[:, None, None]) * n
        pred = dit.apply(params, x_t, t, ee)
        return jnp.mean(jnp.square(pred - (ze - n)))

    live, shadow = [], []
    for d in range(args.eval_draws):
        k = jax.random.key(777_000 + d)
        live.append(float(eval_loss(st.params, k)))
        shadow.append(float(eval_loss(ema, k)))
    live_m, ema_m = float(np.mean(live)), float(np.mean(shadow))
    print(json.dumps({
        "metric": "scaled_ema_ab",
        "params": n_par, "steps": args.steps, "decay": args.decay,
        "final_train_loss": round(final_loss, 5),
        "live_eval_loss": round(live_m, 5),
        "ema_eval_loss": round(ema_m, 5),
        "ema_wins": bool(ema_m < live_m),
        "paired_draws": args.eval_draws,
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
