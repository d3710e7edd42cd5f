"""Serving-path DiT forward over the SAME flax param tree, with the WHOLE
transformer stack executed by one Pallas program per batch element
(ops/dit_block.fused_dit_stack) — activations never round-trip HBM
between layers.

This is a pure function mirroring models/denoisers/dit.DiT.__call__
(reference transformer.py:94-204) — patchify, sinusoidal positions, time +
text conditioning, depth x adaLN-zero blocks, final LN + un-patchify — so
checkpoints, weight transplants and the training path are untouched; the
CFG sampler swaps this in when the geometry qualifies. Parity with
DiT.apply is pinned by tests/test_dit_fast.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from t2ms_tpu.models.denoisers.dit import (sinusoidal_positions,
                                           time_embedding)
from t2ms_tpu.ops.dit_block import (block_vjp_supported,
                                    fused_dit_block_diffable,
                                    fused_dit_block_split, fused_dit_stack,
                                    split_block_q)

__all__ = ["fast_dit_forward", "fast_forward_supported",
           "fast_dit_train_forward", "train_forward_supported",
           "split_dit_forward", "split_forward_supported",
           "fused_path_eligible"]


def fused_path_eligible(denoiser) -> bool:
    """THE opt-in gate for every fused Pallas forward (serving stack,
    split, training block-VJP), in one place so trainer and sampler can't
    drift: the denoiser is a DiT, its attention_impl is 'auto' (an
    explicit impl is an opt-out — oracle runs and kernel A/B benches must
    not be rerouted to the megakernels), and we're on an accelerator.
    Geometry fit is checked separately per path (the *_supported fns)."""
    from t2ms_tpu.models.denoisers.dit import DiT
    return (isinstance(denoiser, DiT)
            and getattr(denoiser, "attention_impl", "auto") == "auto"
            and jax.default_backend() not in ("cpu",))


def fast_forward_supported(dit) -> bool:
    """The fused block kernel wants a lane-aligned mid-range token count
    AND a per-program working set that fits VMEM (~16 MB/core): weights +
    activations + one head's f32 scores. The reference-scale DiT (d=128,
    480-1024 tokens) uses ~5 MB; a scaled d=512 DiT would blow the budget
    and must take the flax path (flash attention beyond 1024 tokens)."""
    pc = (dit.latent_len // dit.patch_size) * (dit.latent_dim
                                               // dit.patch_size)
    if not (128 <= pc <= 1024 and pc % 8 == 0
            and dit.d_model % dit.num_heads == 0):
        return False
    D = dit.d_model
    hidden = int(D * dit.mlp_ratio)
    bpe = jnp.dtype(dit.compute_dtype).itemsize
    # the stack kernel keeps ALL layers' weights VMEM-resident
    weights = dit.depth * (D * 3 * D + D * D + D * hidden
                           + hidden * D) * bpe
    acts = (pc * D * 4 + pc * 3 * D + pc * hidden) * bpe   # x,y,attn,res + qkv + h1
    scores = pc * pc * 4 * 2            # one head's f32 scores + exp copy
    return weights + acts + scores < 12 * 2 ** 20   # head-room under 16 MB


def split_forward_supported(dit) -> bool:
    """Gate for the SPLIT serving path (three q-blocked kernels per
    block, ops.dit_block.fused_dit_block_split) — the scaled-geometry
    fallback when the whole-block working set exceeds VMEM. Strictly
    weaker fusion than the stack kernel, so only consulted when
    fast_forward_supported fails."""
    pc = (dit.latent_len // dit.patch_size) * (dit.latent_dim
                                               // dit.patch_size)
    if dit.d_model % dit.num_heads:
        return False
    return split_block_q(pc, dit.d_model, int(dit.d_model * dit.mlp_ratio),
                         dit.num_heads,
                         jnp.dtype(dit.compute_dtype).itemsize) > 0


def train_forward_supported(dit) -> bool:
    """Gate for the TRAINING fast path (per-block custom VJP): the
    backward kernel's vjp residuals are much fatter than the serving
    stack's live set, so the envelope is its own
    (ops.dit_block.block_vjp_supported)."""
    pc = (dit.latent_len // dit.patch_size) * (dit.latent_dim
                                               // dit.patch_size)
    # the attention_impl opt-out is ALSO in fused_path_eligible (the
    # trainer checks both); repeated here so direct callers of this gate
    # alone can't reroute an explicitly-configured oracle run
    if dit.d_model % dit.num_heads or getattr(dit, "attention_impl",
                                              "auto") != "auto":
        return False
    return block_vjp_supported(pc, dit.d_model,
                               int(dit.d_model * dit.mlp_ratio),
                               dit.num_heads,
                               jnp.dtype(dit.compute_dtype).itemsize)


def fast_dit_train_forward(dit, params, x: jnp.ndarray, t: jnp.ndarray,
                           text_emb: Optional[jnp.ndarray] = None,
                           text_mask: Optional[jnp.ndarray] = None,
                           interpret: bool = False) -> jnp.ndarray:
    """Differentiable twin of fast_dit_forward for the TRAINING step:
    same pure-function mirror of DiT.__call__ over the same param tree,
    but each transformer block is a fused_dit_block_diffable whose
    forward AND backward are single Pallas programs (ops/dit_block.py) —
    attacking the train-step profile's long tail of small XLA fusions
    (TODO.md round-2 pointer). Patchify/unpatch/final-LN/conditioning
    are the SAME _embed/_finalize the serving paths use (differentiable
    jnp ops; measured MXU-hostile in-kernel) — one numerics recipe for
    every path."""
    p = params["params"]
    B = x.shape[0]
    h, silu_c, dense = _embed(dit, p, x, t, text_emb, text_mask)
    for i in range(dit.depth):
        bp = p[f"block_{i}"]
        mod = dense(silu_c, bp["adaLN_modulation"]).reshape(B, 6,
                                                            dit.d_model)
        a, m = bp["attn"], bp["mlp"]
        h = fused_dit_block_diffable(
            h, mod, a["qkv"]["kernel"], a["qkv"]["bias"],
            a["proj"]["kernel"], a["proj"]["bias"],
            m["fc1"]["kernel"], m["fc1"]["bias"],
            m["fc2"]["kernel"], m["fc2"]["bias"],
            dit.num_heads, interpret)
    return _finalize(dit, p, h, dense, x.dtype)


def _embed(dit, p, x, t, text_emb, text_mask):
    """Shared front half of the serving forwards: patchify + positions
    + time/text conditioning. Returns (h, silu_c, dense)."""
    B = x.shape[0]
    H, W, pz = dit.latent_len, dit.latent_dim, dit.patch_size
    nh, nw = H // pz, W // pz
    pc = nh * nw
    dtype = dit.compute_dtype

    def dense(h, q):
        return h @ q["kernel"].astype(dtype) + q["bias"].astype(dtype)

    img = x.astype(dtype).transpose(0, 2, 1)
    patches = img.reshape(B, nh, pz, nw, pz).transpose(0, 1, 3, 2, 4)
    patches = patches.reshape(B, pc, pz * pz)
    h = dense(dense(patches, p["patch_conv"]), p["patch_emb"])
    h = h + sinusoidal_positions(pc, dit.d_model).astype(dtype)[None]

    c = time_embedding(t, dit.d_model).astype(dtype)
    if text_emb is not None:
        te = text_emb.astype(dtype)
        if text_mask is not None:
            te = te * text_mask[:, None].astype(dtype)
        c = c + te
    return h, jax.nn.silu(c), dense


def _finalize(dit, p, h, dense, out_dtype):
    """Shared back half: final LN (learned scale/bias, eps 1e-5) +
    linear un-patchify back to the (B, W, H) latent layout."""
    B = h.shape[0]
    H, W, pz = dit.latent_len, dit.latent_dim, dit.patch_size
    nh, nw = H // pz, W // pz
    hf = h.astype(jnp.float32)
    mu = jnp.mean(hf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(hf - mu), axis=-1, keepdims=True)
    hf = (hf - mu) * jax.lax.rsqrt(var + 1e-5)
    h = (hf * p["final_ln"]["scale"].astype(jnp.float32)
         + p["final_ln"]["bias"].astype(jnp.float32)).astype(
             dit.compute_dtype)
    h = dense(h, p["unpatch"])                              # (B, pc, p*p)
    out = h.reshape(B, nh, nw, pz, pz).transpose(0, 1, 3, 2, 4)
    out = out.reshape(B, H, W).transpose(0, 2, 1)           # (B, W, H)
    return out.astype(out_dtype)


def fast_dit_forward(dit, params, x: jnp.ndarray, t: jnp.ndarray,
                     text_emb: Optional[jnp.ndarray] = None,
                     text_mask: Optional[jnp.ndarray] = None,
                     interpret: bool = False) -> jnp.ndarray:
    p = params["params"]
    B = x.shape[0]
    h, silu_c, dense = _embed(dit, p, x, t, text_emb, text_mask)

    blocks = [p[f"block_{i}"] for i in range(dit.depth)]
    mods = jnp.stack([
        dense(silu_c, bp["adaLN_modulation"]).reshape(B, 6, dit.d_model)
        for bp in blocks], axis=1)                      # (B, L, 6, D)
    stack = lambda path: jnp.stack(
        [functools.reduce(lambda q, k: q[k], path, bp) for bp in blocks])
    h = fused_dit_stack(
        h, mods,
        stack(("attn", "qkv", "kernel")), stack(("attn", "qkv", "bias")),
        stack(("attn", "proj", "kernel")), stack(("attn", "proj", "bias")),
        stack(("mlp", "fc1", "kernel")), stack(("mlp", "fc1", "bias")),
        stack(("mlp", "fc2", "kernel")), stack(("mlp", "fc2", "bias")),
        dit.num_heads, interpret=interpret)
    return _finalize(dit, p, h, dense, x.dtype)


def split_dit_forward(dit, params, x: jnp.ndarray, t: jnp.ndarray,
                      text_emb: Optional[jnp.ndarray] = None,
                      text_mask: Optional[jnp.ndarray] = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Serving forward for SCALED geometries (whole-block working set
    over VMEM): each block runs as three q-blocked Pallas kernels
    (ops.dit_block.fused_dit_block_split), claiming the f32-LN
    convert+reduce fusions and glue that dominated the scaled-serve
    profile. Same param tree / semantics as DiT.apply."""
    p = params["params"]
    B = x.shape[0]
    h, silu_c, dense = _embed(dit, p, x, t, text_emb, text_mask)
    for i in range(dit.depth):
        bp = p[f"block_{i}"]
        mod = dense(silu_c, bp["adaLN_modulation"]).reshape(B, 6,
                                                            dit.d_model)
        a, m = bp["attn"], bp["mlp"]
        h = fused_dit_block_split(
            h, mod, a["qkv"]["kernel"], a["qkv"]["bias"],
            a["proj"]["kernel"], a["proj"]["bias"],
            m["fc1"]["kernel"], m["fc1"]["bias"],
            m["fc2"]["kernel"], m["fc2"]["bias"],
            dit.num_heads, interpret=interpret)
    return _finalize(dit, p, h, dense, x.dtype)
