"""T2S-DiT denoiser, parametric from day one.

Reference: model/denoiser/transformer.py (H hardcoded 30 at :132) and
model/denoiser/mytransformer.py (H = flow_dim arg at :128-132). One module
subsumes both: ``latent_len`` is the H axis, ``latent_dim`` the W axis.

Architecture (reference transformer.py:94-204):
  latent (B, C=latent_dim, L=latent_len) -> permute -> 1xHxW "image"
  -> 2x2 patchify -> linear to d_model -> +sinusoidal pos-emb
  -> depth x adaLN-zero DiT blocks conditioned on c = TimeEmb(t) + text_emb
  -> LN -> linear un-patchify -> inverse reshape.

TPU-native re-design decisions:
  * patchify conv (k=stride=2) is algebraically a per-patch linear map; we
    implement it as reshape + two dots (4->4 "conv" then 4->d_model) —
    pure MXU work, no conv lowering.
  * the CFG pair (uncond, cond) is run as ONE batched forward: text enters
    the network only additively via c (transformer.py:176-178), so
    text=None == text=0. Callers pass a per-sample text_mask (0 for the
    uncond rows) and stack on batch.
  * attention is jnp.einsum-based (sequence <= ~1k tokens at reference
    scale); a Pallas flash path can be swapped in for long-series mode.
  * dtype policy: params f32, activations/matmuls in ``compute_dtype``.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["DiT", "sinusoidal_positions", "time_embedding"]


def sinusoidal_positions(num_positions: int, d_model: int) -> jnp.ndarray:
    """Interleaved sin/cos table (reference transformer.py:14-23).

    Computed in float64 numpy at trace time (the table is static) so the
    trig is accurately rounded — f32 sin on accelerators loses precision in
    argument reduction at large positions."""
    import numpy as np
    position = np.arange(num_positions, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                      * -(math.log(10000.0) / d_model))[None, :]
    pe = np.zeros((num_positions, d_model), np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe.astype(np.float32))


def time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Diffusion-time embedding with the reference's t*100 scaling and
    10000**linspace frequency table (transformer.py:25-40)."""
    t = t.astype(jnp.float32) * 100.0
    freqs = jnp.power(10000.0, jnp.linspace(0.0, 1.0, dim // 2))
    ang = t[:, None] / freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _xavier() -> nn.initializers.Initializer:
    return nn.initializers.xavier_uniform()


class _Attention(nn.Module):
    """timm-style MHA: fused qkv (bias), scaled dot-product, out proj
    (reference transformer.py:104 uses timm Attention(d, heads=4,
    qkv_bias=True)). The score computation dispatches through
    ops.attention (einsum for short sequences, Pallas flash attention for
    the long-series mode)."""
    d_model: int
    num_heads: int
    compute_dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        from t2ms_tpu.ops.attention import attention as _attn_dispatch
        from t2ms_tpu.ops.attention import fused_heads_diffable
        B, N, D = x.shape
        h = self.num_heads
        hd = D // h
        qkv = nn.Dense(3 * D, kernel_init=_xavier(), dtype=self.compute_dtype,
                       name="qkv")(x)
        impl = self.attention_impl
        if impl == "auto" and jax.default_backend() not in ("cpu",):
            from t2ms_tpu.ops.attention import fused_heads_block_q
            bpe = jnp.dtype(self.compute_dtype).itemsize
            if fused_heads_block_q(N, D, bpe):
                # covers both the serving mid-range (whole-row scores in
                # VMEM) and the long-series regime (blocked q vs full
                # VMEM K/V, exact softmax) — see fused_heads_attention
                impl = "fused"
        if impl == "fused":
            # serving-shape path: the qkv projection's feature order is
            # already [q|k|v] x [head-major], so head h of q is the lane
            # slice qkv[..., h*hd:(h+1)*hd] — no 5-D transpose copies, and
            # the kernel emits the merged (B, N, D) layout proj consumes
            # (profiled ~2.5x attention-phase win, BASELINE.md).
            y = fused_heads_diffable(qkv[..., :D], qkv[..., D:2 * D],
                                     qkv[..., 2 * D:], h)
        else:
            q, k, v = jnp.split(qkv.reshape(B, N, 3, h, hd)
                                .transpose(2, 0, 3, 1, 4), 3, axis=0)
            q, k, v = q[0], k[0], v[0]                  # (B, h, N, hd)
            y = _attn_dispatch(q, k, v, impl=impl)
            y = y.transpose(0, 2, 1, 3).reshape(B, N, D)
        y = y.astype(self.compute_dtype)
        return nn.Dense(D, kernel_init=_xavier(), dtype=self.compute_dtype,
                        name="proj")(y)


class _Mlp(nn.Module):
    """timm Mlp with tanh-approximated GELU (transformer.py:100,105)."""
    d_model: int
    hidden: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=_xavier(),
                     dtype=self.compute_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        return nn.Dense(self.d_model, kernel_init=_xavier(),
                        dtype=self.compute_dtype, name="fc2")(x)


def _modulate(x, shift, scale):
    """x * (1 + scale) + shift with (B, D) broadcast over tokens
    (transformer.py:7-8)."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _make_mod_ln(block: "DiTBlock", n: int, d: int):
    """Pick the block's LN+modulate implementation: the fused Pallas
    custom-VJP kernel (ops.dit_block.mod_ln_diffable — one read + one
    write of x per direction; the f32 LN stats/copies stay in VMEM) on
    TPU when the geometry fits its envelope, the flax LayerNorm + eager
    modulate otherwise. The block LNs are parameter-free (use_bias=False,
    use_scale=False), so both paths share ONE param tree. attention_impl
    != 'auto' opts out (same contract as every fused kernel: explicit
    impls are oracle/A-B runs); T2MS_FUSED_MOD_LN=0 force-disables,
    =1 force-enables in interpret mode on CPU (tests)."""
    import os
    flag = os.environ.get("T2MS_FUSED_MOD_LN", "")
    on_tpu = jax.default_backend() not in ("cpu",)
    if (flag != "0" and block.attention_impl == "auto"
            and (on_tpu or flag == "1")):
        from t2ms_tpu.ops.dit_block import mod_ln_block_q, mod_ln_diffable
        bpe = jnp.dtype(block.compute_dtype).itemsize
        if mod_ln_block_q(n, d, bpe) or not on_tpu:
            interp = not on_tpu
            return lambda y, sh, sc: mod_ln_diffable(
                y, jnp.stack([sh, sc], axis=1), 1e-6, 0, interp)
    ln = lambda y: nn.LayerNorm(use_bias=False, use_scale=False,
                                epsilon=1e-6, dtype=block.compute_dtype)(y)
    return lambda y, sh, sc: _modulate(ln(y), sh, sc)


# Flipped True 2026-08-19: kernel_smoke 4/4 green at the largest
# geometries (.onchip_r04_resln_smoke.log, corr>=0.999995 at 1024/d512
# and 4096/d128) and the scaled-train A/B confirmed the win (49.0% MFU
# with the kernel vs 48.0% mod_ln-only vs 46.7% eager —
# .onchip_r04_scaled_resln.log). T2MS_FUSED_RES_LN=0 still
# force-disables for oracle runs.
_RES_LN_DEFAULT_ON = True


def _res_mod_ln_enabled(compute_dtype, attention_impl: str, n: int,
                        d: int) -> bool:
    """Gate for the fused gated-residual + LN + modulate custom-VJP kernel
    (ops.dit_block.res_mod_ln_diffable): same contract as _make_mod_ln —
    attention_impl != 'auto' opts out (explicit impls are oracle/A-B
    runs); T2MS_FUSED_RES_LN=0 force-disables, =1 force-enables (interpret
    mode on CPU — tests); otherwise TPU + envelope fit when the default is
    on."""
    import os
    flag = os.environ.get("T2MS_FUSED_RES_LN", "")
    if flag == "0" or attention_impl != "auto":
        return False
    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:
        return flag == "1"
    if flag != "1" and not _RES_LN_DEFAULT_ON:
        return False
    from t2ms_tpu.ops.dit_block import res_mod_ln_block_q
    bpe = jnp.dtype(compute_dtype).itemsize
    return bool(res_mod_ln_block_q(n, d, bpe))


def _make_res_mod_ln(block: "DiTBlock", n: int, d: int):
    """The fused boundary op as a callable, or None when the gate says
    keep the eager residual + modln composition. Round-4 motivation: the
    scaled-train profile's ~15 ms/step of XLA block-boundary glue
    (gated-residual multiply_adds, dgate multiply_reduces, copies) —
    see ops.dit_block.res_mod_ln_diffable."""
    if not _res_mod_ln_enabled(block.compute_dtype, block.attention_impl,
                               n, d):
        return None
    from t2ms_tpu.ops.dit_block import res_mod_ln_diffable
    interp = jax.default_backend() in ("cpu",)

    def apply(x, h, gate, sh, sc):
        out, y = res_mod_ln_diffable(
            x, h, jnp.stack([gate, sh, sc], axis=1), 1e-6, 0, interp)
        return out, y

    return apply


class DiTBlock(nn.Module):
    """adaLN-zero transformer block (transformer.py:94-124).

    ``defer_residual`` (DiT's internal fused-boundary mode): the trailing
    gated MLP residual is NOT applied here — the block returns
    ``(stream, mlp_out, gate_mlp)`` and the caller either fuses the
    pending triple into the NEXT block's leading LN+modulate (one Pallas
    program instead of an XLA residual fusion + a separate LN kernel —
    see ops.dit_block.res_mod_ln_diffable) or applies it eagerly. The
    plain ``__call__(x, c)`` contract (pp.py stages, tests) and the param
    tree are unchanged."""
    d_model: int
    num_heads: int
    mlp_ratio: float
    compute_dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    defer_residual: bool = False

    @nn.compact
    def __call__(self, x, c, pending=None):
        mod = nn.Dense(6 * self.d_model,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       dtype=self.compute_dtype,
                       name="adaLN_modulation")(nn.silu(c))
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=-1)
        modln = _make_mod_ln(self, x.shape[1], x.shape[2])
        resln = _make_res_mod_ln(self, x.shape[1], x.shape[2])
        if pending is not None:
            br, gp = pending       # previous block's (mlp_out, gate_mlp)
            if resln is not None:
                z, x = resln(x, br, gp, sh_a, sc_a)
            else:
                x = x + gp[:, None, :] * br
                z = modln(x, sh_a, sc_a)
        else:
            z = modln(x, sh_a, sc_a)
        attn_out = _Attention(
            self.d_model, self.num_heads, self.compute_dtype,
            self.attention_impl, name="attn")(z)
        if resln is not None:
            z2, x = resln(x, attn_out, g_a, sh_m, sc_m)
        else:
            x = x + g_a[:, None, :] * attn_out
            z2 = modln(x, sh_m, sc_m)
        mlp_out = _Mlp(
            self.d_model, int(self.d_model * self.mlp_ratio),
            self.compute_dtype, name="mlp")(z2)
        if self.defer_residual:
            return x, mlp_out, g_m
        return x + g_m[:, None, :] * mlp_out


class DiT(nn.Module):
    """Parametric-H DiT denoiser.

    I/O contract matches the reference: ``__call__(x, t, text_emb)`` with
    x (B, latent_dim, latent_len), t (B,) float (flow time) or int (DDPM
    step), text_emb (B, d_model) or None; returns same shape as x.
    """
    latent_len: int = 30          # H (30 for T2S, flow_dim for T2MS)
    latent_dim: int = 64          # W (VAE embedding channels)
    d_model: int = 128
    depth: int = 4
    num_heads: int = 4
    mlp_ratio: float = 2.0
    patch_size: int = 2
    compute_dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"   # einsum | flash | auto (long-series)

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 text_emb: Optional[jnp.ndarray] = None,
                 text_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``text_mask`` (B,) of {0,1}: per-sample conditioning switch.
        Text enters the DiT purely additively (transformer.py:176-178), so
        masking the embedding is exactly the reference's text=None; the
        argument exists so all denoisers share one fused-CFG contract."""
        B = x.shape[0]
        H, W, p = self.latent_len, self.latent_dim, self.patch_size
        if x.shape[1] != W or x.shape[2] != H:
            raise ValueError(f"expected latent (B,{W},{H}), got {x.shape}")
        nh, nw = H // p, W // p
        pc = nh * nw
        dtype = self.compute_dtype

        # permute to (B, H, W) then patchify via reshape: the 2x2 stride-2
        # conv (transformer.py:137) is exactly a 4->4 linear per patch.
        img = x.astype(dtype).transpose(0, 2, 1)              # (B, H, W)
        patches = img.reshape(B, nh, p, nw, p).transpose(0, 1, 3, 2, 4)
        patches = patches.reshape(B, pc, p * p)               # (B, pc, 4)
        # the reference's patchify Conv2d keeps torch's DEFAULT conv init
        # (initialize_weights re-inits only nn.Linear, transformer.py:
        # 194-200): kaiming_uniform(a=sqrt(5)) at fan_in=in*k*k equals
        # the torch-Linear bounds, so reuse that helper for from-scratch
        # training-dynamics parity (transplant tests are init-neutral)
        from t2ms_tpu.models.denoisers.mlp import _torch_linear
        h = nn.Dense(p * p, dtype=dtype, name="patch_conv",
                     **_torch_linear(p * p))(patches)         # conv-equivalent
        h = nn.Dense(self.d_model, kernel_init=_xavier(), dtype=dtype,
                     name="patch_emb")(h)
        h = h + sinusoidal_positions(pc, self.d_model).astype(dtype)[None]

        c = time_embedding(t, self.d_model).astype(dtype)
        if text_emb is not None:
            te = text_emb.astype(dtype)
            if text_mask is not None:
                te = te * text_mask[:, None].astype(dtype)
            c = c + te

        # fused block boundaries: when the res_mod_ln kernel is engaged,
        # each trailing gated residual defers into the next block's
        # leading LN+modulate Pallas program (the final one feeds the
        # affine final_ln, so it stays eager — 1 of 2*depth boundaries)
        fuse = _res_mod_ln_enabled(dtype, self.attention_impl, pc,
                                   self.d_model)
        pending = None
        for i in range(self.depth):
            blk = DiTBlock(self.d_model, self.num_heads, self.mlp_ratio,
                           dtype, self.attention_impl,
                           defer_residual=fuse, name=f"block_{i}")
            if fuse:
                h, br, g = blk(h, c, pending)
                pending = (br, g)
            else:
                h = blk(h, c)
        if fuse:
            h = h + pending[1][:, None, :] * pending[0]

        h = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="final_ln")(h)
        h = nn.Dense(p * p, kernel_init=_xavier(), dtype=dtype,
                     name="unpatch")(h)                        # (B, pc, 4)
        # inverse of the patch extraction (transformer.py:184-190)
        out = h.reshape(B, nh, nw, p, p).transpose(0, 1, 3, 2, 4)
        out = out.reshape(B, H, W).transpose(0, 2, 1)          # (B, W, H)
        return out.astype(x.dtype)
