"""Checkpoint IO (Orbax) with the reference's artifact semantics.

Reference saves dict checkpoints {model, optimizer, epoch, loss_list} every
N epochs (train.py:92-95, mytrain.py:90-94) and resumes optimizer state and
epoch from --checkpoint_path (train.py:42-47). We keep exactly those fields
as an Orbax PyTree checkpoint {params, opt_state, step, loss_history}; VAE
"final_model" checkpoints hold {params} (mirroring the state_dict saves at
pretrained_mylavae.py:233).

Directory naming matches the reference path schemas via t2ms_tpu.config.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    """Detach a pytree from its device sharding before saving.

    Checkpoints written from a DP/TP mesh would otherwise embed that
    mesh's sharding metadata, and a later restore (Orbax populates
    sharding from file when the target gives none) re-commits the params
    to the TRAINING topology — which crashes serving jits that mix them
    with differently-placed arrays (e.g. mytrain on a 4-device mesh ->
    myinfer single-device). Checkpoints are topology-neutral host data;
    placement is the restorer's business."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), tree)

__all__ = ["save_train_ckpt", "load_train_ckpt", "save_params",
           "load_params", "latest_step", "wait_for_saves",
           "TrainCheckpointManager"]


class TrainCheckpointManager:
    """Orbax CheckpointManager with retention, keeping the reference's
    ``model_{step}`` naming (train.py:92-95).

    ``max_to_keep`` bounds the number of retained checkpoints;
    ``keep_period`` additionally preserves every keep_period-th step
    forever (preserve-every-N). None for either = unbounded, matching the
    reference's keep-everything behavior. The variable-length loss-history
    sidecar lives next to each step directory and is pruned in lockstep
    with Orbax's retention deletes."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None,
                 keep_period: Optional[int] = None,
                 asynchronous: bool = False):
        self.directory = os.path.abspath(directory)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_period=keep_period,
            step_prefix="model",
            enable_async_checkpointing=asynchronous,
            create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=opts)

    def _sidecar(self, step: int) -> str:
        return os.path.join(self.directory,
                            f"model_{step}.loss_history.npy")

    def save(self, step: int, params, opt_state, loss_history=None,
             opt_step: Optional[int] = None) -> None:
        """``step`` names the checkpoint directory (the reference's EPOCH,
        model_{epoch}); ``opt_step`` is the true optimizer-step counter.
        They differ whenever an epoch has more than one batch — storing
        the epoch into TrainState.step on resume would replay fold_in RNG
        keys already consumed earlier in the run, so the payload keeps
        both fields."""
        payload = {"params": _to_host(params),
                   "opt_state": _to_host(opt_state),
                   "step": np.asarray(step if opt_step is None
                                      else opt_step),
                   "epoch": np.asarray(step)}
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        np.save(self._sidecar(step),
                np.asarray(loss_history if loss_history is not None else [],
                           dtype=np.float32))
        kept = set(self.all_steps())
        for entry in os.listdir(self.directory):
            if entry.startswith("model_") and \
                    entry.endswith(".loss_history.npy"):
                try:
                    s = int(entry.split("_", 1)[1].split(".", 1)[0])
                except ValueError:
                    continue
                if s not in kept and s != step:
                    os.remove(os.path.join(self.directory, entry))

    def restore(self, step: Optional[int], params_like,
                opt_state_like) -> Dict[str, Any]:
        if step is None:
            step = self.latest_step()
        target = {"params": params_like, "opt_state": opt_state_like,
                  "step": np.asarray(0), "epoch": np.asarray(0)}
        try:
            restored = dict(self._mgr.restore(
                step, args=ocp.args.StandardRestore(target)))
        except (ValueError, KeyError):
            # pre-epoch-field checkpoint: its payload step IS the epoch
            target.pop("epoch")
            restored = dict(self._mgr.restore(
                step, args=ocp.args.StandardRestore(target)))
            restored["epoch"] = restored["step"]
        sidecar = self._sidecar(step)
        restored["loss_history"] = (np.load(sidecar).tolist()
                                    if os.path.exists(sidecar) else [])
        return restored

    def all_steps(self):
        return list(self._mgr.all_steps())

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def wait_for_saves() -> None:
    """Block until all asynchronous checkpoint saves have committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


_ASYNC_CKPTR = None


def _ckptr():
    return ocp.StandardCheckpointer()


def _async_ckptr():
    """Shared async checkpointer (SURVEY.md §5: 'Orbax async
    checkpointing') — saves overlap with subsequent train steps."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    return _ASYNC_CKPTR


def save_train_ckpt(directory: str, step: int, params, opt_state,
                    loss_history=None, asynchronous: bool = False) -> str:
    """Save {params, opt_state, step, loss_history} at directory/model_{step}
    (reference filename scheme 'model_{epoch}.pth'). With
    ``asynchronous=True`` the device-to-host copy is issued and the write
    completes in the background (call ``wait_for_saves()`` before exit)."""
    # the sidecar np.save below must not race orbax's (possibly async)
    # directory creation
    os.makedirs(directory, exist_ok=True)
    path = os.path.abspath(os.path.join(directory, f"model_{step}"))
    payload = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state),
        "step": np.asarray(step),
    }
    ckptr = _async_ckptr() if asynchronous else _ckptr()
    ckptr.save(path, payload, force=True)
    if not asynchronous:
        ckptr.wait_until_finished()
    # variable-length host artifact lives NEXT TO the Orbax tree (orbax
    # finalizes the directory atomically, so nothing foreign may live in it
    # during an async save)
    np.save(path + ".loss_history.npy",
            np.asarray(loss_history if loss_history is not None else [],
                       dtype=np.float32))
    return path


def load_train_ckpt(path: str, params_like, opt_state_like) -> Dict[str, Any]:
    hist_base = os.path.abspath(path)
    # CheckpointManager-written steps nest the pytree under default/
    if os.path.isdir(os.path.join(os.path.abspath(path), "default")):
        path = os.path.join(os.path.abspath(path), "default")
    if opt_state_like is None:
        # params-only restore (inference path): ignore the stored opt_state
        handler = ocp.PyTreeCheckpointer()
        restored = handler.restore(
            os.path.abspath(path),
            args=ocp.args.PyTreeRestore(
                item={"params": params_like, "step": np.asarray(0)},
                partial_restore=True))
        restored = dict(restored)
        restored["opt_state"] = None
    else:
        target = {
            "params": params_like,
            "opt_state": opt_state_like,
            "step": np.asarray(0),
            "epoch": np.asarray(0),
        }
        try:
            restored = _ckptr().restore(os.path.abspath(path), target)
        except (ValueError, KeyError):
            # pre-epoch-field checkpoint: payload step IS the epoch
            target.pop("epoch")
            restored = dict(_ckptr().restore(os.path.abspath(path), target))
            restored["epoch"] = restored["step"]
    hist_path = hist_base + ".loss_history.npy"
    legacy = os.path.join(hist_base, "loss_history.npy")
    if os.path.exists(hist_path):
        restored["loss_history"] = np.load(hist_path).tolist()
    elif os.path.exists(legacy):
        restored["loss_history"] = np.load(legacy).tolist()
    else:
        restored["loss_history"] = []
    return restored


def save_params(directory: str, params, name: str = "final_model") -> str:
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = _ckptr()
    ckptr.save(path, {"params": _to_host(params)}, force=True)
    ckptr.wait_until_finished()
    return path


def load_params(path: str, params_like):
    restored = _ckptr().restore(os.path.abspath(path),
                                {"params": params_like})
    return restored["params"]


def latest_step(directory: str) -> Optional[int]:
    """Largest N among model_N subdirectories."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for entry in os.listdir(directory):
        if entry.startswith("model_"):
            try:
                steps.append(int(entry.split("_", 1)[1]))
            except ValueError:
                continue
    return max(steps) if steps else None
