"""DDPM backbone: precomputed schedule arrays + pure jittable steps.

Reference: model/backbone/DDPM.py:10-38 —
  linear beta schedule 1e-4 -> 0.02 over total_steps, alpha_bar = cumprod,
  q_sample forward noising, ancestral p_sample with sigma^2 = beta, MSE loss.

TPU-native form: the schedule is a small pytree of device arrays closed over
by jitted step functions (no torch-style buffers); sampling timesteps run
*backwards* t = total_steps-1-j, matching infer.py:84.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["DDPMSchedule", "make_schedule", "q_sample", "p_sample",
           "p_sample_mean_var", "ddim_step", "ddim_timesteps", "loss"]


class DDPMSchedule(NamedTuple):
    beta: jnp.ndarray        # (T,)
    alpha: jnp.ndarray       # (T,)
    alpha_bar: jnp.ndarray   # (T,)
    total_steps: int


def make_schedule(total_steps: int, dtype=jnp.float32) -> DDPMSchedule:
    beta = jnp.linspace(1e-4, 0.02, total_steps, dtype=dtype)
    alpha = 1.0 - beta
    alpha_bar = jnp.cumprod(alpha)
    return DDPMSchedule(beta, alpha, alpha_bar, total_steps)


def _gather(consts: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """consts[t] reshaped to (B, 1, 1, ...) for broadcasting
    (reference DDPM.py:7-9)."""
    c = consts[t]
    return c.reshape(c.shape[0], *((1,) * (ndim - 1)))


def q_sample(sched: DDPMSchedule, x0: jnp.ndarray, t: jnp.ndarray,
             eps: jnp.ndarray):
    """Forward noising: x_t = sqrt(a_bar)*x0 + sqrt(1-a_bar)*eps."""
    a_bar = _gather(sched.alpha_bar, t, x0.ndim)
    mean = jnp.sqrt(a_bar) * x0
    var = 1.0 - a_bar
    return mean + jnp.sqrt(var) * eps, eps


def p_sample_mean_var(sched: DDPMSchedule, xt: jnp.ndarray,
                      eps_pred: jnp.ndarray, t: jnp.ndarray):
    """Posterior mean and variance of one ancestral reverse step
    (reference DDPM.py:28-36). Split out so callers that need their own
    noise source (per-sample keys in the serving engine) share the exact
    step math with ``p_sample``."""
    a_bar = _gather(sched.alpha_bar, t, xt.ndim)
    a = _gather(sched.alpha, t, xt.ndim)
    eps_coef = (1.0 - a) / jnp.sqrt(1.0 - a_bar)
    mean = (xt - eps_coef * eps_pred) / jnp.sqrt(a)
    var = _gather(sched.beta, t, xt.ndim)
    return mean, var


def p_sample(sched: DDPMSchedule, key: jax.Array, xt: jnp.ndarray,
             eps_pred: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """One ancestral reverse step (reference DDPM.py:28-36). Noise is always
    added, including at t=0, matching the reference exactly."""
    mean, var = p_sample_mean_var(sched, xt, eps_pred, t)
    eps = jax.random.normal(key, xt.shape, dtype=xt.dtype)
    return mean + jnp.sqrt(var) * eps


def ddim_step(sched: DDPMSchedule, xt: jnp.ndarray, eps_pred: jnp.ndarray,
              t: jnp.ndarray, t_prev: jnp.ndarray) -> jnp.ndarray:
    """One deterministic DDIM update t -> t_prev (eta=0; Song et al.,
    arXiv 2010.02502 eq. 12). Shares the training schedule with the
    ancestral sampler, but admits an arbitrary timestep SUBSET: S
    sampling steps over a T-step schedule = T/S fewer model evals.
    ``t_prev < 0`` denotes the terminal step (alpha_bar_prev = 1), which
    returns the predicted x0 exactly."""
    a_bar = _gather(sched.alpha_bar, t, xt.ndim)
    a_prev = jnp.where(t_prev >= 0, sched.alpha_bar[jnp.maximum(t_prev, 0)],
                       jnp.ones(()))
    a_prev = a_prev.reshape(a_bar.shape)
    x0 = (xt - jnp.sqrt(1.0 - a_bar) * eps_pred) / jnp.sqrt(a_bar)
    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps_pred


def ddim_timesteps(total_steps: int, sample_steps: int):
    """Evenly spaced sub-schedule (descending): returns (t_cur, t_prev)
    int32 arrays of length <= ``sample_steps`` with t_prev[-1] = -1
    (rounding duplicates collapse, so the effective count can be
    slightly lower when sample_steps approaches total_steps)."""
    import numpy as np
    if not 1 <= sample_steps <= total_steps:
        raise ValueError(f"sample_steps {sample_steps} must be in "
                         f"[1, {total_steps}]")
    # descending from T-1 so the FIRST step always denoises from the
    # max noise level (linspace(0, T-1, 1) would start at t=0 and
    # return the input noise essentially unchanged)
    ts = np.round(np.linspace(total_steps - 1, 0,
                              sample_steps)).astype(np.int64)
    ts = np.unique(ts)[::-1]                       # dedupe, keep descending
    prev = np.concatenate([ts[1:], [-1]])
    return ts.astype("int32"), prev.astype("int32")


def loss(eps_pred: jnp.ndarray, eps_gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(eps_pred - eps_gt))
