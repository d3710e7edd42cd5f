"""Rectified-flow (flow-matching) backbone as pure jittable functions.

Reference: model/backbone/rectified_flow.py:4-16 —
  create_flow: x_t = t*x_1 + (1-t)*x_0 with x_0 ~ N(0,I), t broadcast [B,1,1]
  euler:       x_{t+dt} = x_t + v*dt
  loss:        MSE(v, x_1 - x_0)

Being stateless math, the TPU-native form is a namespace of pure functions
closed over nothing; they compose into jitted train/sample steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["create_flow", "euler", "loss", "sample_t"]


def sample_t(key: jax.Array, batch: int, total_step: int) -> jnp.ndarray:
    """Training-time t: round(U[0,1] * total_step) / total_step
    (reference train.py:69)."""
    u = jax.random.uniform(key, (batch,))
    return jnp.round(u * total_step) / total_step


def create_flow(key: jax.Array, x_1: jnp.ndarray, t: jnp.ndarray):
    """Linear interpolant between pure noise x_0 and data x_1.

    t has shape (B,) and broadcasts over trailing dims.
    Returns (x_t, x_0)."""
    x_0 = jax.random.normal(key, x_1.shape, dtype=x_1.dtype)
    t = t.reshape(t.shape[0], *((1,) * (x_1.ndim - 1))).astype(x_1.dtype)
    x_t = t * x_1 + (1.0 - t) * x_0
    return x_t, x_0


def euler(x_t: jnp.ndarray, v: jnp.ndarray, dt: float) -> jnp.ndarray:
    return x_t + v * dt


def loss(v: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE against the straight-flow velocity target x_1 - x_0."""
    return jnp.mean(jnp.square(v - target))
