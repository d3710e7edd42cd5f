"""Pipeline-parallel stage annotation hooks.

The reference model (4 DiT blocks, ~1M params) does not need pipeline
parallelism (SURVEY.md §2.6: "expose stage annotation hooks only"), so this
module provides exactly that: a way to tag layer ranges with logical stages
so a future scheduler (or GSPMD sharding_constraint over a 'stage' axis)
can split them without touching model code.

``stage(i)`` is a context tag; ``annotate(x, i)`` optionally constrains an
activation to a stage's mesh slice when a 'stage' axis exists, and is a
no-op otherwise — models can call it unconditionally.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stage", "annotate", "current_stage"]

_STAGE_STACK: list = []


@contextlib.contextmanager
def stage(index: int) -> Iterator[None]:
    """Mark a region as pipeline stage ``index`` (profiler-visible via
    named_scope; consumed by future schedulers)."""
    _STAGE_STACK.append(index)
    with jax.named_scope(f"pp_stage_{index}"):
        try:
            yield
        finally:
            _STAGE_STACK.pop()


def current_stage() -> Optional[int]:
    return _STAGE_STACK[-1] if _STAGE_STACK else None


def annotate(x, stage_index: Optional[int] = None,
             mesh: Optional[Mesh] = None):
    """Attach a stage sharding constraint when the active mesh has a
    'stage' axis; identity otherwise."""
    if mesh is None:
        try:
            mesh = jax.sharding.get_abstract_mesh()  # type: ignore[attr-defined]
        except Exception:
            mesh = None
    if mesh is None or "stage" not in getattr(mesh, "axis_names", ()):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P()))
