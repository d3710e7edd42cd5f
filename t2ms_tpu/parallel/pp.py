"""Pipeline parallelism: stage tags + a real GPipe microbatch pipeline.

The reference model (4 DiT blocks, ~1M params) does not need pipeline
parallelism (SURVEY.md §2.6), but the framework provides a working
TPU-native implementation, not just hooks:

* ``stage(i)`` / ``current_stage()`` — profiler-visible stage tags
  (jax.named_scope) usable from any model code.
* ``pipeline_apply(fn, stage_params, x, mesh, ...)`` — run a stack of S
  identical-signature stages over an S-sized ``'stage'`` mesh axis with
  the classic GPipe schedule: the batch is split into M microbatches,
  activations flow stage→stage via ``lax.ppermute`` over ICI inside one
  ``shard_map``, every device computes every tick (the pipeline bubble is
  the usual (S-1)/(M+S-1) overhead), and the last stage's outputs are
  gathered with a masked psum. The whole schedule is one ``lax.scan`` —
  fully jittable and reverse-differentiable (ppermute transposes to the
  reverse permutation, so grads pipeline backwards automatically).

Stage parameters are stacked on a leading S axis and sharded
``P('stage')``: each device materializes only its own stage's weights.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stage", "current_stage", "pipeline_apply"]

_STAGE_STACK: list = []


@contextlib.contextmanager
def stage(index: int) -> Iterator[None]:
    """Mark a region as pipeline stage ``index`` — an INFORMATIONAL tag
    (profiler-visible via named_scope; ``current_stage`` reads it for
    logging/debug). ``pipeline_apply`` does NOT consume it: the schedule
    derives stage indices from ``lax.axis_index``. Tracing-time only and
    not thread-safe — don't query it from concurrent tracers."""
    _STAGE_STACK.append(index)
    with jax.named_scope(f"pp_stage_{index}"):
        try:
            yield
        finally:
            _STAGE_STACK.pop()


def current_stage() -> Optional[int]:
    return _STAGE_STACK[-1] if _STAGE_STACK else None


def pipeline_apply(fn: Callable, stage_params, x: jnp.ndarray,
                   mesh: Mesh, axis: str = "stage",
                   n_microbatches: Optional[int] = None) -> jnp.ndarray:
    """GPipe-schedule forward over a 'stage' mesh axis.

    fn(params_s, h) -> h must keep the activation shape (true for
    transformer blocks); ``stage_params`` is a pytree whose leaves are
    stacked on a leading S axis (S = mesh.shape[axis]); ``x`` is the full
    batch (B, ...) with B divisible by ``n_microbatches`` (default S).

    Returns fn_{S-1}(... fn_0(x)) exactly (one compiled program; verified
    against sequential application in tests/test_pp.py).
    """
    from t2ms_tpu.parallel.compat import shard_map

    S = mesh.shape[axis]
    M = n_microbatches or S
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible into {M} microbatches")
    mb = B // M
    micro = x.reshape(M, mb, *x.shape[1:])

    p_stage = jax.tree_util.tree_map(lambda _: P(axis), stage_params)
    fwd_perm = [(s, s + 1) for s in range(S - 1)]

    def worker(params, micro_all):
        # params leaves arrive with leading dim 1 (this device's stage)
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        s_idx = lax.axis_index(axis)
        first, last = s_idx == 0, s_idx == S - 1

        def tick(carry, t):
            buf, out_acc = carry
            # inject microbatch t at stage 0 (clamped index; masked later)
            inj = lax.dynamic_index_in_dim(
                micro_all, jnp.minimum(t, M - 1), axis=0, keepdims=False)
            h_in = jnp.where(first, inj, buf)
            h = fn(params, h_in)
            # collect finished microbatch t-(S-1) at the last stage
            j = t - (S - 1)
            valid = last & (j >= 0) & (j < M)
            out_acc = lax.dynamic_update_index_in_dim(
                out_acc,
                jnp.where(valid, h,
                          lax.dynamic_index_in_dim(
                              out_acc, jnp.clip(j, 0, M - 1), 0,
                              keepdims=False)),
                jnp.clip(j, 0, M - 1), 0)
            if S > 1:
                buf = lax.ppermute(h, axis, fwd_perm)
            else:
                buf = h
            return (buf, out_acc), None

        buf0 = jnp.zeros(micro_all.shape[1:], x.dtype)
        out0 = jnp.zeros_like(micro_all)
        (_, out_acc), _ = lax.scan(tick, (buf0, out0),
                                   jnp.arange(M + S - 1))
        # only the last stage holds real outputs; replicate via masked psum
        out = lax.psum(jnp.where(last, out_acc, 0.0), axis)
        return out

    piped = shard_map(
        worker, mesh=mesh,
        in_specs=(p_stage, P()),
        out_specs=P(),
        check_rep=False)
    out = piped(stage_params, micro)
    return out.reshape(B, *x.shape[1:])
