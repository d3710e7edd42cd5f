"""PRNG utilities: threaded, fold_in-based key derivation.

The reference seeds global RNGs (utils.py:26-36 seed_everything); the JAX
equivalent threads explicit keys. ``step_key(root, step)`` gives exact
reproducibility independent of execution order, and named folds keep the
streams for noise / timestep / CFG-drop decorrelated.
"""

from __future__ import annotations

import hashlib

import jax

__all__ = ["root_key", "step_key", "named_fold", "seed_everything"]


def seed_everything(seed: int) -> "jax.Array":
    """Host-side global seeding + JAX root key (reference utils.py:26-36
    seeds random/numpy/torch; here the host RNGs that the data pipeline may
    touch, returning the explicit JAX key that replaces torch's global
    stream)."""
    import random

    import numpy as np
    if seed is None:
        # reference utils.py:26-36 treats None as "don't seed"; a jax key
        # must still be returned, so draw one from OS entropy
        import os
        return root_key(int.from_bytes(os.urandom(8), "little") >> 1)
    print(f"Global seed set to {seed}")
    random.seed(seed)
    np.random.seed(seed)
    return root_key(seed)


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def step_key(key: jax.Array, step) -> jax.Array:
    return jax.random.fold_in(key, step)


def named_fold(key: jax.Array, name: str) -> jax.Array:
    """Deterministically derive a stream from a string tag."""
    tag = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")
    return jax.random.fold_in(key, tag)
