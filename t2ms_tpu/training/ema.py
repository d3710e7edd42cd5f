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
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["make_ema_update", "ema_name", "prune_ema", "setup_cli_ema",
           "save_cli_ema", "load_ema_for_inference"]


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


def setup_cli_ema(decay: float, params,
                  checkpoint_path: str = "") -> Tuple:
    """Training-CLI entry: returns ``(ema, update)`` or ``(None, None)``
    when decay is 0/off. The shadow starts as a COPY of the live params
    (the update donates the old EMA buffers, so aliasing the live
    weights would delete them on the first update); on resume, a saved
    ``{checkpoint_path}_ema`` tree takes precedence."""
    if not decay:
        return None, None
    update = make_ema_update(decay)
    ema = jax.tree_util.tree_map(jnp.copy, params)
    path = checkpoint_path + "_ema" if checkpoint_path else ""
    if path and os.path.isdir(path):
        from t2ms_tpu.training import checkpoints as ckpt
        ema = ckpt.load_params(path, ema)
        print(f"Resumed EMA weights from {path}")
    return ema, update


def save_cli_ema(directory: str, ema, epoch: int, keep_steps) -> None:
    """Persist the shadow next to ``model_{epoch}`` and prune trees the
    checkpoint manager no longer retains."""
    from t2ms_tpu.training import checkpoints as ckpt
    ckpt.save_params(directory, ema, name=ema_name(epoch))
    prune_ema(directory, keep_steps, epoch)


def load_ema_for_inference(checkpoint_path: str, params_like):
    """Infer-CLI entry for ``--use_ema``: load ``{checkpoint_path}_ema``
    or fail loudly (sampling silently from live weights would defeat
    the flag)."""
    path = checkpoint_path + "_ema"
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"--use_ema: no EMA checkpoint at {path} (train with "
            f"--ema_decay to produce one)")
    from t2ms_tpu.training import checkpoints as ckpt
    params = ckpt.load_params(path, params_like)
    print(f"Loaded EMA weights from {path}")
    return params


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
