"""Optimizers and LR schedules matching the reference trainers.

Two recipes exist in the reference:

1. Denoiser (train.py:37-38, mytrain.py:44-45):
   AdamW(lr=1e-4, weight_decay=0) + OneCycleLR(max_lr=1e-4,
   total_steps=len(loader)*epochs) with torch defaults
   (pct_start=0.3, cosine anneal, div_factor=25, final_div_factor=1e4).
   optax.cosine_onecycle_schedule implements exactly this.

   DOCUMENTED DEVIATION (split-train stepping): the reference advances
   the scheduler per optimizer step only under mix_train (train.py:90);
   its split path calls scheduler.step() once per EPOCH (train.py:131)
   against the same total_steps, so a reference split run effectively
   never leaves early warmup. We step per optimizer step in BOTH modes —
   an intentional fix of that quirk, so split-mode LR trajectories
   diverge from a bit-exact reference replay.

2. VAE (model/pretrained/core.py:15-20):
   AdamW(lr, weight_decay=1e-2) + LinearLR(start_factor=0.1, 1000 iters)
   then CosineAnnealingLR(T_max=400-1000, eta_min=1e-6). Note the reference
   passes T_max = -600; torch's cosine is even in T_max so behavior equals
   T_max=600 — we implement the *behavior* (periodic cosine, period 600)
   and document the delta here rather than copying the negative constant.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

__all__ = ["onecycle_adamw", "warmup_cosine_adamw", "vae_schedule"]


def onecycle_adamw(total_steps: int, max_lr: float = 1e-4,
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    # floor of 4: optax's cosine_onecycle divides by the warmup interval
    # int(pct_start * T), which is ZERO for T <= 3 — the schedule then
    # returns NaN lr and one update NaNs the whole parameter tree
    # (observed in a --steps 2 smoke run; 4 is the smallest T whose
    # intervals are all nonzero at pct_start=0.3)
    sched = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 4),
        peak_value=max_lr,
        pct_start=0.3,
        div_factor=25.0,
        final_div_factor=1e4,
    )
    return optax.adamw(sched, weight_decay=weight_decay)


def vae_schedule(base_lr: float, warmup_steps: int = 1000,
                 cosine_period: int = 600, start_factor: float = 0.1,
                 eta_min: float = 1e-6):
    """LinearLR warmup then *periodic* CosineAnnealingLR, matching torch's
    SequentialLR([LinearLR, CosineAnnealingLR], milestones=[1000])."""
    def sched(step):
        step = jnp.asarray(step)
        warm = base_lr * (start_factor
                          + (1 - start_factor) * jnp.minimum(step, warmup_steps)
                          / warmup_steps)
        t = step - warmup_steps
        cos = eta_min + (base_lr - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * t / cosine_period))
        return jnp.where(step < warmup_steps, warm, cos)
    return sched


def warmup_cosine_adamw(base_lr: float = 1e-3, weight_decay: float = 1e-2,
                        warmup_steps: int = 1000, cosine_period: int = 600
                        ) -> optax.GradientTransformation:
    return optax.adamw(vae_schedule(base_lr, warmup_steps, cosine_period),
                       weight_decay=weight_decay)
