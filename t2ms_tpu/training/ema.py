"""Opt-in exponential moving average of denoiser weights.

The reference has no EMA (train.py keeps a single live parameter set);
EMA-of-weights is standard production practice for diffusion samplers
(DDPM, Ho et al. 2020, appendix — decay 0.999; typical 0.999-0.9999):
the averaged weights smooth late-training oscillation and usually sample
better than the last iterate. Exposed as ``--ema_decay`` on the training
CLIs (0 = off, the reference behavior) and ``--use_ema`` on the infer
CLIs; the EMA tree is checkpointed next to each ``model_{step}`` as
``model_{step}_ema`` via the ordinary params saver, so resume and
serving pick it up with no TrainState or payload-format change.

No quality claim is recorded for the synthetic gates until an on-chip
A/B lands (BASELINE.md discipline: measured numbers only).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax

__all__ = ["make_ema_update", "ema_name", "prune_ema"]


def ema_name(step) -> str:
    """Checkpoint name for the EMA tree next to ``model_{step}``."""
    return f"model_{step}_ema"


def prune_ema(directory: str, keep_steps, current: int) -> None:
    """Drop ``model_{s}_ema`` trees whose step the checkpoint manager no
    longer retains (mirrors its loss-history sidecar cleanup)."""
    import os
    import re
    import shutil
    keep = set(int(s) for s in keep_steps) | {int(current)}
    for entry in os.listdir(directory):
        m = re.fullmatch(r"model_(\d+)_ema", entry)
        if m and int(m.group(1)) not in keep:
            shutil.rmtree(os.path.join(directory, entry),
                          ignore_errors=True)


def make_ema_update(decay: float) -> Callable:
    """Jitted ``ema = decay * ema + (1 - decay) * params``. Initialize
    ``ema = params`` (no bias correction — the diffusion convention;
    with warmup-from-init the early EMA simply lags the live weights).
    Donates the old EMA buffers: the tree is updated in place on device,
    costing one fused multiply-add pass per step and no extra transfer."""
    if not 0.0 < decay < 1.0:
        raise ValueError(f"ema decay must be in (0, 1), got {decay}")

    @functools.partial(jax.jit, donate_argnums=0)
    def update(ema, params):
        return jax.tree_util.tree_map(
            lambda e, p: e * decay + (1.0 - decay) * p.astype(e.dtype),
            ema, params)

    return update
