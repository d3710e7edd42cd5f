"""Version shims for the jax APIs the parallel layer leans on."""

from __future__ import annotations


def shard_map(f, *, mesh, in_specs, out_specs, check_rep: bool = True):
    """``jax.shard_map`` across jax versions: >= 0.8 promoted the API out
    of ``jax.experimental`` and renamed ``check_rep`` to ``check_vma``.
    One shim so pp.py and ring_attention.py support the same jax range."""
    try:
        from jax import shard_map as _sm         # jax >= 0.8
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=check_rep)
    except ImportError:                           # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=check_rep)
