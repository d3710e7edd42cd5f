"""Tensor-parallel partition rules for the DiT denoiser.

The reference has no TP (single device; SURVEY.md §2.6) — at ~1M params it
doesn't need any — but the mesh API is designed for it so a scaled-up
denoiser shards without code changes: attention qkv/proj and MLP kernels
split over the ``model`` axis (Megatron-style column/row pairing), biases
and LayerNorms replicated, batch over ``data``. XLA inserts the all-reduces
over ICI from these shardings; there is no hand-written collective.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["dit_param_spec", "shard_dit_params"]


def _spec_for(path: str, leaf) -> P:
    # flax param paths look like: params/block_0/attn/qkv/kernel
    if leaf.ndim < 2:
        return P()                     # biases, norms: replicated
    if "qkv/kernel" in path or "fc1/kernel" in path:
        return P(None, "model")        # column parallel (split output dim)
    if "proj/kernel" in path or "fc2/kernel" in path:
        return P("model", None)        # row parallel (split input dim)
    if "adaLN_modulation/kernel" in path:
        return P(None, "model")
    return P()                         # patch/unpatch embeddings: replicated


def dit_param_spec(params) -> Any:
    """PartitionSpec pytree matching a DiT param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(
            "/".join(getattr(p, "key", str(p)) for p in path), leaf),
        params)


def shard_dit_params(params, mesh: Mesh):
    """Place a DiT param tree with TP shardings over ``mesh``."""
    spec = dit_param_spec(params)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params, spec)
