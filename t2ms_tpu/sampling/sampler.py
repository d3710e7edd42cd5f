"""CFG sampling as a single compiled lax.scan — the serving path.

Reference loop (infer.py:65-110, myinfer.py:156-219): a Python loop over
``total_step`` with TWO forwards per step (uncond + cond), then
``pred = uncond + cfg_scale * (cond - uncond)`` and an Euler / ancestral
update; flow time runs forward t = j/step, DDPM runs backward
t = step-1-j (infer.py:78,84).

TPU-native re-design (the headline-perf component):
  * the whole denoise loop is ONE ``lax.scan`` inside ONE ``jit`` — zero
    Python dispatch per step;
  * cond and uncond are FUSED into a single forward of batch 2B by stacking
    on the batch axis, the uncond half selected by a per-sample text_mask
    that reproduces text=None exactly for every denoiser (see
    _fused_cfg_forward);
  * the latent trajectory is (optionally) collected by scan and decoded in
    ONE batched VAE decode afterwards — the reference decodes per step on
    host for its diffusion GIF (infer.py:90-93);
  * final decode at the requested output length (static per bucket).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from t2ms_tpu.models.backbones import ddpm as ddpm_lib
from t2ms_tpu.models.backbones import rectified_flow as rf

__all__ = ["SamplerOutput", "make_cfg_sampler", "decode_trajectory"]


class SamplerOutput(NamedTuple):
    series: jnp.ndarray            # decoded (B, ...) at output length
    latent: jnp.ndarray            # final latent x_t
    latent_enc: jnp.ndarray        # VAE-encoded ground-truth latent
    trajectory: Optional[jnp.ndarray]  # (steps, B, ...) latents or None


def _serving_forward(denoiser):
    """Pick the serving forward: the fused-stack Pallas path for the DiT
    on TPU when the geometry qualifies (whole transformer stack per
    program, ops/dit_block.py — same param tree), flax apply otherwise.
    An explicit ``attention_impl`` other than 'auto' opts OUT: the user
    asked for a specific path (oracle runs, kernel A/B benches), so the
    sampler must not reroute it to the megakernel (the shared
    fused_path_eligible gate, same as the trainer's)."""
    from t2ms_tpu.models.denoisers.dit_fast import (
        fast_dit_forward, fast_forward_supported, fused_path_eligible,
        split_dit_forward, split_forward_supported)
    if fused_path_eligible(denoiser):
        if fast_forward_supported(denoiser):
            return lambda params, x, t, e, m: fast_dit_forward(
                denoiser, params, x, t, e, m)
        if split_forward_supported(denoiser):
            # scaled geometry (whole-block set over VMEM): three
            # q-blocked kernels per block instead of one program
            return lambda params, x, t, e, m: split_dit_forward(
                denoiser, params, x, t, e, m)
    return lambda params, x, t, e, m: denoiser.apply(params, x, t, e, m)


def _fused_cfg_forward(denoiser, params, x_t, t, text_emb, cfg_scale,
                       forward=None):
    """One 2B-batch forward for the CFG pair.

    The uncond half is selected with a per-sample ``text_mask`` of zeros
    rather than a zeroed embedding: for the DiT the two are identical
    (additive conditioning), but the MLP denoiser's cross-attention has
    biased key/value/proj layers, so only the mask path reproduces the
    reference's text_input=None skip (infer.py:79-88, mlp.py:77) exactly."""
    if forward is None:
        forward = lambda p, x, t, e, m: denoiser.apply(p, x, t, e, m)
    B = x_t.shape[0]
    x2 = jnp.concatenate([x_t, x_t], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    e2 = jnp.concatenate([text_emb, text_emb], axis=0)
    m2 = jnp.concatenate([jnp.zeros((B,), x_t.dtype),
                          jnp.ones((B,), x_t.dtype)], axis=0)
    pred2 = forward(params, x2, t2, e2, m2)
    uncond, cond = pred2[:B], pred2[B:]
    return uncond + cfg_scale * (cond - uncond)


def _validate_solver(backbone: str, solver: str,
                     sample_steps: Optional[int]) -> None:
    """Shared backbone/solver pairing rules (offline + serving samplers)."""
    if backbone not in ("flowmatching", "ddpm"):
        raise ValueError(f"Unsupported backbone type: {backbone}")
    if solver not in ("euler", "heun", "midpoint", "ddim"):
        raise ValueError(f"Unsupported solver: {solver}")
    if solver in ("heun", "midpoint") and backbone != "flowmatching":
        raise ValueError("higher-order solvers integrate the flow ODE; "
                         "ddpm sampling is ancestral (euler) or ddim")
    if solver == "ddim" and backbone != "ddpm":
        raise ValueError("ddim subsamples the DDPM schedule; flow "
                         "sampling takes solver=euler|heun|midpoint")
    if sample_steps is not None and solver != "ddim":
        raise ValueError("sample_steps only applies to solver='ddim' "
                         "(other solvers run total_step steps)")


def _flow_body(solver: str, vel: Callable, dt: float, total_step: int,
               collect: bool) -> Callable:
    """Scan body for one flow-ODE integrator step. ``vel(x, t_scalar)``
    is the CFG-combined velocity; shared by the offline and serving
    samplers so the step math cannot diverge between them."""
    def out(x_next):
        return x_next if collect else None

    if solver == "euler":
        def body(x_t, j):
            x_next = rf.euler(x_t, vel(x_t, j / total_step), dt)
            return x_next, out(x_next)
    elif solver == "heun":
        def body(x_t, j):
            # explicit trapezoid: v at both interval ends, order-2
            t0 = j / total_step
            v1 = vel(x_t, t0)
            v2 = vel(rf.euler(x_t, v1, dt), t0 + dt)
            x_next = x_t + (0.5 * dt) * (v1 + v2)
            return x_next, out(x_next)
    else:                                   # midpoint
        def body(x_t, j):
            t0 = j / total_step
            v1 = vel(x_t, t0)
            v2 = vel(rf.euler(x_t, v1, 0.5 * dt), t0 + 0.5 * dt)
            x_next = x_t + dt * v2
            return x_next, out(x_next)
    return body


def _ddim_scan_body(sched, cfg_fwd: Callable, batch: int,
                    collect: bool) -> Callable:
    """Scan body for one deterministic DDIM step over (t_cur, t_prev)
    pairs from ``ddpm.ddim_timesteps`` (shared offline + serving)."""
    def body(x_t, tp):
        t_cur, t_prev = tp
        t = jnp.full((batch,), t_cur, dtype=jnp.int32)
        x_next = ddpm_lib.ddim_step(
            sched, x_t, cfg_fwd(x_t, t), t,
            jnp.full((batch,), t_prev, jnp.int32))
        return x_next, (x_next if collect else None)
    return body


def make_cfg_sampler(
    denoiser,
    vae_model,
    backbone: str = "flowmatching",
    total_step: int = 100,
    cfg_scale: float = 7.0,
    out_length: int = 96,
    collect_trajectory: bool = False,
    solver: str = "euler",
    sample_steps: Optional[int] = None,
) -> Callable:
    """Build the jitted sampler.

    Returned signature: sample(params, vae_params, key, x_1, text_emb)
    -> SamplerOutput. ``x_1`` is the conditioning ground-truth batch (used
    only for the latent SHAPE and the encoded-latent diagnostic, mirroring
    infer.py:73-75).

    ``solver`` selects the integrator. Flowmatching (reference has Euler
    alone, infer.py:84): 'euler' (1 model eval/step, exact reference
    parity), or the 2nd-order 'heun' / 'midpoint' (2 evals/step) —
    order-2 convergence lets total_step drop ~4x at matched endpoint
    error, i.e. ~2x fewer model evals for the same quality. DDPM:
    'euler' = the reference's ancestral loop (infer.py:84 backward t),
    or 'ddim' = the deterministic eta=0 sampler (arXiv 2010.02502) over
    a ``sample_steps``-long evenly spaced sub-schedule of the
    ``total_step`` TRAINING schedule — total_step/sample_steps fewer
    model evals. ``sample_steps`` is only meaningful with 'ddim'.
    """
    _validate_solver(backbone, solver, sample_steps)
    sched = (ddpm_lib.make_schedule(total_step)
             if backbone == "ddpm" else None)
    forward = _serving_forward(denoiser)

    @jax.jit
    def sample(params, vae_params, key, x_1, text_emb):
        z_enc, _ = vae_model.apply(vae_params, x_1, method=vae_model.encode)
        x_t0 = jax.random.normal(key, z_enc.shape, dtype=z_enc.dtype)
        B = x_t0.shape[0]

        def cfg_fwd(x_t, t):
            return _fused_cfg_forward(denoiser, params, x_t, t, text_emb,
                                      cfg_scale, forward)

        def vel(x_t, t_scalar):
            return cfg_fwd(x_t, jnp.full((B,), t_scalar, x_t0.dtype))

        def ddpm_step(x_t, j):
            t = jnp.full((B,), total_step - 1 - j, dtype=jnp.int32)
            step_key = jax.random.fold_in(key, j)
            x_next = ddpm_lib.p_sample(sched, step_key, x_t,
                                       cfg_fwd(x_t, t), t)
            return x_next, (x_next if collect_trajectory else None)

        if backbone == "ddpm" and solver == "ddim":
            ts, prev = ddpm_lib.ddim_timesteps(
                total_step, sample_steps or total_step)
            body = _ddim_scan_body(sched, cfg_fwd, B, collect_trajectory)
            xs = (jnp.asarray(ts), jnp.asarray(prev))
        elif backbone == "ddpm":
            body, xs = ddpm_step, jnp.arange(total_step)
        else:
            body = _flow_body(solver, vel, 1.0 / total_step, total_step,
                              collect_trajectory)
            xs = jnp.arange(total_step)
        x_t, traj = jax.lax.scan(body, x_t0, xs)
        series, _ = vae_model.apply(vae_params, x_t, out_length,
                                    method=vae_model.decode)
        return SamplerOutput(series=series, latent=x_t, latent_enc=z_enc,
                             trajectory=traj)

    return sample


def decode_trajectory(vae_model, vae_params, trajectory: jnp.ndarray,
                      out_length: int, sample_index: int = 0) -> jnp.ndarray:
    """Decode one sample's whole latent trajectory in a single batched VAE
    decode (replaces the reference's per-step host decode for the diffusion
    GIF, infer.py:90-93). trajectory: (steps, B, C, L) -> (steps, ...)."""
    lat = trajectory[:, sample_index]
    series, _ = vae_model.apply(vae_params, lat, out_length,
                                method=vae_model.decode)
    return series
