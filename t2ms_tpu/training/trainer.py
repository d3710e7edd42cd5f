"""Denoiser training: one jitted step, bucket-aware, DP-sharded.

Reference loop (train.py:52-136, mytrain.py:56-97):
  batch -> frozen VAE encode -> sample t -> noise (flow interpolant or DDPM
  q_sample) -> CFG text-drop (one Bernoulli(0.3) per step, train.py:80-82)
  -> denoiser forward -> MSE -> AdamW/OneCycle step.

TPU-native re-design:
  * the whole step (encode + noising + fwd + bwd + update) is ONE jitted,
    donated function — no Python in the hot path;
  * the VAE encoder is explicit frozen params under stop_gradient, not a
    module graft (reference train.py:30 'model.encoder = ...');
  * CFG drop passes a single Bernoulli text_mask into the denoiser, which
    suppresses conditioning exactly like the reference's text=None (for
    the MLP denoiser this skips the biased cross-attn residual);
  * length buckets produce one compiled program each (shapes are static);
  * batch arrays are sharded over the 'data' mesh axis — XLA all-reduces
    grads over ICI; params replicated.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from t2ms_tpu.models.backbones import ddpm as ddpm_lib
from t2ms_tpu.models.backbones import rectified_flow as rf
from t2ms_tpu.utils.prng import named_fold

__all__ = ["TrainState", "make_denoiser_train_step", "make_vae_train_step",
           "encode_with_vae", "precompute_latent_buckets"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def encode_with_vae(vae_model, vae_params, x):
    """Frozen VAE encode (gradient-blocked)."""
    z, before = vae_model.apply(vae_params, x, method=vae_model.encode)
    return jax.lax.stop_gradient(z), jax.lax.stop_gradient(before)


def _training_forward(denoiser):
    """Pick the training forward: the per-block fused custom-VJP path for
    the DiT on TPU when its geometry fits the block-VJP VMEM envelope
    (whole block fwd AND bwd each one Pallas program — see
    ops/dit_block.py), flax apply otherwise. Same opt-out contract as the
    sampler's _serving_forward: the shared fused_path_eligible gate
    (explicit attention_impl disables it)."""
    from t2ms_tpu.models.denoisers.dit_fast import (
        fast_dit_train_forward, fused_path_eligible,
        train_forward_supported)
    if fused_path_eligible(denoiser):
        if train_forward_supported(denoiser):
            return lambda params, x, t, e, m: fast_dit_train_forward(
                denoiser, params, x, t, e, m)
    return lambda params, x, t, e, m: denoiser.apply(params, x, t, e, m)


def make_denoiser_train_step(
    denoiser,
    vae_model,
    optimizer: optax.GradientTransformation,
    backbone: str = "flowmatching",
    total_step: int = 100,
    cfg_drop_prob: float = 0.3,
    donate: bool = True,
    nan_guard: bool = False,
    accum_steps: int = 1,
    precoded: bool = False,
) -> Callable:
    """Build the jitted train step.

    Returned signature: step_fn(state, vae_params, key, x, text_emb)
    -> (state, loss). One compiled program per distinct x shape (bucket).
    ``nan_guard`` (or T2MS_NAN_CHECK=1) skips the parameter update and
    prints a device-side warning when the loss goes non-finite —
    the rebuild's sanitizer hook (SURVEY.md §5 'race detection/sanitizers').
    ``accum_steps`` > 1 splits the batch into microbatches scanned with
    gradient accumulation — required for the reference's T2S default batch
    9216, whose attention score tensor alone (9216x4x480x480) exceeds one
    chip's HBM.
    ``precoded`` means x is ALREADY the frozen-VAE latent (see
    precompute_latent_buckets): the encoder is frozen and deterministic
    (reference train.py:30,73 — model.encoder under requires_grad=False),
    so encoding each sample once per dataset instead of once per step is
    numerically identical and removes pure overhead from the hot loop.
    """
    from t2ms_tpu.config import env_flag
    nan_guard = nan_guard or env_flag("T2MS_NAN_CHECK")
    sched = (ddpm_lib.make_schedule(total_step)
             if backbone == "ddpm" else None)
    if backbone not in ("flowmatching", "ddpm"):
        raise ValueError(f"Unsupported backbone type: {backbone}")
    denoiser_forward = _training_forward(denoiser)

    def loss_fn(params, vae_params, key, cfg_key, x, text_emb):
        if precoded:
            z = jax.lax.stop_gradient(x)
        else:
            z, _ = encode_with_vae(vae_model, vae_params, x)
        if backbone == "flowmatching":
            t = rf.sample_t(named_fold(key, "t"), z.shape[0], total_step)
            x_t, x_0 = rf.create_flow(named_fold(key, "noise"), z, t)
            target = z - x_0
        else:
            t = jnp.floor(jax.random.uniform(
                named_fold(key, "t"), (z.shape[0],)) * total_step
            ).astype(jnp.int32)
            eps = jax.random.normal(named_fold(key, "noise"), z.shape,
                                    dtype=z.dtype)
            x_t, _ = ddpm_lib.q_sample(sched, z, t, eps)
            target = eps
        # one Bernoulli per OPTIMIZER step, whole batch drops together
        # (train.py:80) — cfg_key is drawn once in step_fn and shared by
        # every accumulation microbatch, so the reference's
        # all-conditioned-or-all-dropped update semantics survive
        # accum_steps > 1. The drop is a text_mask, not a zeroed
        # embedding: for the MLP denoiser only the mask path skips the
        # biased cross-attn residual exactly like the reference's
        # text_input=None (mlp.py:77).
        keep = (jax.random.uniform(cfg_key, ())
                >= cfg_drop_prob).astype(x_t.dtype)
        mask = jnp.broadcast_to(keep, (z.shape[0],))
        pred = denoiser_forward(params, x_t, t, text_emb, mask)
        return jnp.mean(jnp.square(pred - target))

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_fn(state: TrainState, vae_params, key, x, text_emb):
        cfg_key = named_fold(key, "cfg")
        if accum_steps > 1:
            B = x.shape[0]
            if B % accum_steps != 0:
                raise ValueError(f"batch {B} % accum_steps {accum_steps}")
            mb = B // accum_steps
            xs = x.reshape(accum_steps, mb, *x.shape[1:])
            es = text_emb.reshape(accum_steps, mb, *text_emb.shape[1:])

            def micro(carry, inp):
                loss_acc, grad_acc, i = carry
                xm, em = inp
                l, g = jax.value_and_grad(loss_fn)(
                    state.params, vae_params, jax.random.fold_in(key, i),
                    cfg_key, xm, em)
                grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, g)
                return (loss_acc + l, grad_acc, i + 1), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads, _), _ = jax.lax.scan(
                micro, (jnp.zeros(()), zero_g, 0), (xs, es))
            loss = loss / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, vae_params, key, cfg_key, x, text_emb)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        if nan_guard:
            # skip the WHOLE update on a non-finite loss: params and
            # opt_state both keep their previous values (zeroing only the
            # grads would still apply decayed AdamW momentum/weight decay
            # and advance the moments).
            # No jax.debug.print here: the axon TPU backend does not
            # support host callbacks; the returned non-finite loss is the
            # host-visible signal (the CLIs log it).
            # Updates are checked too: a bf16 overflow confined to the
            # backward (finite loss, inf/NaN grads -> NaN Adam updates)
            # would otherwise slip past a loss-only check and poison
            # params unrecoverably. state.step still counts ATTEMPTED
            # steps so schedules/logging stay monotonic.
            ok = jnp.isfinite(loss) & jax.tree_util.tree_reduce(
                lambda a, u: a & jnp.all(jnp.isfinite(u)),
                updates, jnp.asarray(True))
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old),
                params, state.params)
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old),
                opt_state, state.opt_state)
        return TrainState(params, opt_state, state.step + 1), loss

    return step_fn


def precompute_latent_buckets(vae_model, vae_params, batcher,
                              chunk: int = 4096,
                              max_bytes: int = 4 * 2 ** 30):
    """One-shot frozen-VAE encode of every bucket's series: returns a new
    BucketBatcher whose ``x`` columns are the (N, C, latent_len) latents,
    to be consumed by a ``precoded=True`` train step.

    The reference re-encodes the batch through the frozen encoder every
    step (train.py:73 ``model.encoder(x_1)``); the encoder is
    deterministic and per-sample (convs over time, no cross-batch state),
    so encoding the dataset once is numerically identical — at 20000
    epochs over the same rows the per-step encode is pure overhead.
    Fixed-shape chunks keep it to one compiled program per bucket (the
    tail is wrap-padded then trimmed). Falls back to the caller keeping
    the in-step encode (returns None) when the f32 latent store would
    exceed ``max_bytes`` of host RAM."""
    import numpy as np

    from t2ms_tpu.data.loaders import BucketBatcher

    enc = jax.jit(lambda p, xb: vae_model.apply(
        p, xb, method=vae_model.encode)[0])
    probe = next(iter(batcher.buckets.values()))["x"]
    z0 = enc(vae_params, jnp.asarray(probe[:1]))
    per_row = int(np.prod(z0.shape[1:])) * 4
    total = sum(d["x"].shape[0] for d in batcher.buckets.values()) * per_row
    if total > max_bytes:
        return None
    new_buckets = {}
    for length, data in batcher.buckets.items():
        x = np.asarray(data["x"])
        n = x.shape[0]
        c = min(chunk, n)
        n_pad = -(-n // c) * c
        xp = x[np.arange(n_pad) % n]          # wrap-pad to a chunk multiple
        zs = [np.asarray(enc(vae_params, jnp.asarray(xp[s:s + c])))
              for s in range(0, n_pad, c)]
        new_buckets[length] = dict(data, x=np.concatenate(zs)[:n])
    return BucketBatcher(new_buckets, batcher.batch_size, batcher.seed,
                         batcher.drop_last, batcher.process_index,
                         batcher.process_count)


def make_vae_train_step(vae_model, optimizer: optax.GradientTransformation,
                        donate: bool = True) -> Callable:
    """Jitted LA-VAE pretraining step (reference shared_eval 'train',
    vqvae.py:118-127). Returns (state, (loss, recon_error))."""
    from t2ms_tpu.models.vae.lavae import lavae_loss

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_fn(state: TrainState, x):
        (loss, (recon_err, _, _)), grads = jax.value_and_grad(
            lambda p: lavae_loss(vae_model, p, x), has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1),
                (loss, recon_err))

    return step_fn
