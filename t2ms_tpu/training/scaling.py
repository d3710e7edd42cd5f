"""CLI-facing scaling policy: mesh + grad accumulation + compute dtype.

The reference trains single-device with a default batch of 9216
(reference train.py:142-143) — fine on a large-HBM GPU, but one v5e chip
holds 16 GB and the measured envelope at the T2S DiT geometry is ~1024
rows per device in one shot (BASELINE.md: batch 9216 unaccumulated OOMs;
the swept op-point uses 9x accumulation). Rather than leaving that
knowledge in scripts/, the CLIs derive a ScalingPlan here:

  * mesh: DP over the largest device count that divides the global batch
    (degenerates to 1x1 on a single chip — same code path everywhere);
  * accum_steps: smallest count whose per-device microbatch fits the cap
    AND whose microbatch still divides evenly over the data axis;
  * compute_dtype: the serving/training activation dtype (params stay
    f32; bf16 is the TPU-native serving config, BASELINE.md).

All CLIs (train/mytrain/infer/myinfer) call ``setup_scaling(args)`` so
one policy governs every entry point.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from t2ms_tpu.parallel.mesh import make_mesh, replicated

__all__ = ["ScalingPlan", "parse_dtype", "auto_accum_steps",
           "setup_scaling", "add_scaling_args"]

# Measured single-shot per-device row envelope at the T2S DiT geometry
# (BASELINE.md round-2: B=1024 bf16/f32 trains in one shot; 9216 OOMs).
DEFAULT_MICROBATCH_CAP = 1024

_DTYPE_ALIASES = {
    "f32": jnp.float32, "float32": jnp.float32, "fp32": jnp.float32,
    "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
}


class ScalingPlan(NamedTuple):
    mesh: object                  # jax.sharding.Mesh (1x1 on one device)
    n_data: int                   # DP width actually used
    accum_steps: int              # gradient-accumulation microsteps
    compute_dtype: jnp.dtype      # activation dtype (params stay f32)

    def describe(self) -> str:
        return (f"devices={self.n_data} (of {len(jax.devices())}), "
                f"accum_steps={self.accum_steps}, "
                f"compute_dtype={jnp.dtype(self.compute_dtype).name}")


def parse_dtype(name) -> jnp.dtype:
    if not isinstance(name, str):
        return jnp.dtype(name)
    try:
        return _DTYPE_ALIASES[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown compute dtype {name!r}; use f32 or bf16") from None


def auto_accum_steps(global_batch: int, n_data: int = 1,
                     microbatch_cap: int = DEFAULT_MICROBATCH_CAP) -> int:
    """Smallest accum count so that (a) the per-device microbatch is at
    most ``microbatch_cap`` rows, (b) the microbatch divides the global
    batch, and (c) the microbatch still shards evenly over ``n_data``.

    Terminates: a = global_batch // n_data always satisfies (b) and (c),
    with a per-device microbatch of 1 row."""
    if global_batch % n_data:
        raise ValueError(
            f"global batch {global_batch} not divisible by DP width "
            f"{n_data}")
    a = max(1, math.ceil(global_batch / (n_data * microbatch_cap)))
    while global_batch % a or (global_batch // a) % n_data:
        a += 1
    return a


def _dp_width(batch_size: int, n_devices: int) -> int:
    """Largest d <= n_devices with batch_size % d == 0 (so every
    microbatch shards evenly). Falls back to 1 for tiny odd batches."""
    for d in range(min(n_devices, batch_size), 0, -1):
        if batch_size % d == 0:
            return d
    return 1


def add_scaling_args(p, default_dtype: str = "f32",
                     default_cap: int = DEFAULT_MICROBATCH_CAP) -> None:
    """Install the shared scaling flag surface on an ArgumentParser."""
    p.add_argument("--accum_steps", type=int, default=0,
                   help="gradient accumulation microsteps "
                        "(0 = auto from --microbatch_cap)")
    p.add_argument("--microbatch_cap", type=int, default=default_cap,
                   help="max per-device rows in one unaccumulated "
                        "forward+backward (measured HBM envelope)")
    p.add_argument("--compute_dtype", type=str, default=default_dtype,
                   choices=["f32", "float32", "bf16", "bfloat16"],
                   help="activation dtype; params stay f32 "
                        "(bf16 is the TPU serving config)")


def setup_scaling(args, batch_size: Optional[int] = None,
                  for_training: bool = True) -> ScalingPlan:
    """Build the ScalingPlan for a CLI invocation.

    ``batch_size`` defaults to args.batch_size. For serving
    (``for_training=False``) accumulation is always 1.
    """
    if batch_size is None:
        batch_size = args.batch_size
    if jax.process_count() > 1:
        # multi-host jit requires every process's addressable devices to
        # participate in the mesh — a jax.devices()[:d] slice would drop
        # whole hosts and fail at dispatch. Use ALL devices and demand
        # divisibility instead of silently shrinking the DP width.
        n_data = len(jax.devices())
        if batch_size % n_data:
            raise ValueError(
                f"global batch {batch_size} must divide over all "
                f"{n_data} devices in a multi-host run (every host's "
                f"chips must join the mesh); pad the batch or adjust "
                f"--batch_size")
        mesh = make_mesh(jax.devices(), data=n_data, model=1)
    else:
        n_data = _dp_width(batch_size, len(jax.devices()))
        mesh = make_mesh(jax.devices()[:n_data], data=n_data, model=1)
    dtype = parse_dtype(getattr(args, "compute_dtype", "f32"))
    if not for_training:
        return ScalingPlan(mesh, n_data, 1, dtype)
    cap = getattr(args, "microbatch_cap", DEFAULT_MICROBATCH_CAP)
    accum = getattr(args, "accum_steps", 0)
    if accum:
        mb = batch_size // accum
        if batch_size % accum or mb % n_data:
            raise ValueError(
                f"--accum_steps {accum} does not evenly split batch "
                f"{batch_size} over {n_data} devices")
    else:
        accum = auto_accum_steps(batch_size, n_data, cap)
    return ScalingPlan(mesh, n_data, accum, dtype)


def replicate_tree(plan: ScalingPlan, tree):
    """Commit a pytree (params/opt state) replicated over the plan's mesh
    so jit emits no resharding transfers against DP-sharded batches."""
    return jax.device_put(tree, replicated(plan.mesh))
