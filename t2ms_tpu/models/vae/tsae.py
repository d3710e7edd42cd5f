"""Attention-based seq2seq autoencoder (the T2MS alternative VAE).

Reference: model/pretrained/TSae.py — transformer encoder over (B, T, n_f)
with sinusoidal positions (:93-187), a condition-fusion module with AdaLN
and a variable-input text projection (:189-274), and a causal transformer
decoder trained with teacher forcing (:356-389) / slow autoregressive
``generate`` at inference (:391-421). Used by pretrained_mylavae.py:185.

TPU-native notes:
  * pre-norm encoder/decoder blocks built from the same einsum attention
    as the DiT (ops reuse); all shapes static;
  * teacher-forced training is one fused forward (as in the reference);
  * autoregressive generation is a lax.scan over a fixed-length KV-free
    re-encode (faithful to the reference's simple re-run-decoder loop,
    but compiled once instead of re-traced per step).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TSae", "TSaeDiffusion", "tsae_adapter_loss", "tsae_loss"]


def _positional_encoding(T: int, d: int) -> jnp.ndarray:
    """Classic interleaved table (reference PositionalEncoding :19-37)."""
    pos = np.arange(T, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64)
                 * -(np.log(10000.0) / d))
    pe = np.zeros((T, d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)[:, : d // 2]
    return jnp.asarray(pe, jnp.float32)


class _MHA(nn.Module):
    """torch nn.MultiheadAttention equivalent, incl. its dropout on the
    attention PROBABILITIES (TransformerEncoder/DecoderLayer pass their
    ``dropout`` straight into MHA)."""
    d_model: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q_in, kv_in, mask=None, deterministic=True):
        B, Tq, D = q_in.shape
        Tk = kv_in.shape[1]
        h = self.num_heads
        hd = D // h
        q = nn.Dense(D, name="q")(q_in).reshape(B, Tq, h, hd)
        k = nn.Dense(D, name="k")(kv_in).reshape(B, Tk, h, hd)
        v = nn.Dense(D, name="v")(kv_in).reshape(B, Tk, h, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
        if mask is not None:
            att = jnp.where(mask, -1e30, att)
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, Tq, D)
        return nn.Dense(D, name="out")(out)


class _EncoderLayer(nn.Module):
    """Pre-norm transformer encoder layer (norm_first=True in the
    reference, TSae.py:138-145), with torch's three dropout sites:
    after self-attention (dropout1), inside the FF after the activation,
    and after the FF output (dropout2)."""
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        drop = lambda h: nn.Dropout(self.dropout)(
            h, deterministic=deterministic)
        h = nn.LayerNorm()(x)
        x = x + drop(_MHA(self.d_model, self.num_heads, self.dropout,
                          name="self_attn")(h, h,
                                            deterministic=deterministic))
        h = nn.LayerNorm()(x)
        h = drop(nn.relu(nn.Dense(self.d_ff)(h)))
        return x + drop(nn.Dense(self.d_model)(h))


class _DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, memory, causal_mask, deterministic=True):
        drop = lambda h: nn.Dropout(self.dropout)(
            h, deterministic=deterministic)
        h = nn.LayerNorm()(x)
        x = x + drop(_MHA(self.d_model, self.num_heads, self.dropout,
                          name="self_attn")(h, h, causal_mask,
                                            deterministic=deterministic))
        h = nn.LayerNorm()(x)
        x = x + drop(_MHA(self.d_model, self.num_heads, self.dropout,
                          name="cross_attn")(h, memory,
                                             deterministic=deterministic))
        h = nn.LayerNorm()(x)
        h = drop(nn.relu(nn.Dense(self.d_ff)(h)))
        return x + drop(nn.Dense(self.d_model)(h))


class _AdaLN(nn.Module):
    """LN modulated by a condition vector (reference AdaLN :52-91; torch
    nn.GELU() default is the EXACT gelu, not the tanh approximation)."""
    d_model: int

    @nn.compact
    def __call__(self, x, condition):
        x_ln = nn.LayerNorm()(x)
        gb = nn.Dense(2 * self.d_model)(nn.gelu(
            nn.Dense(4 * self.d_model)(condition), approximate=False))
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return gamma[:, None, :] * x_ln + beta[:, None, :]


class TSae(nn.Module):
    """AttentionSeq2SeqAutoencoder (reference TSae.py:428-579).

    n_features=input_dim, flow_dim=d_model; encoder/decoder layer counts and
    d_ff/num_heads from the per-sport vae config (config.yaml:50-55).
    """
    n_features: int = 10
    flow_dim: int = 64
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    d_ff: int = 128
    num_heads: int = 8
    max_text_dim: int = 128
    dropout: float = 0.1     # reference default everywhere (TSae.py:114)

    def setup(self):
        self.value_embedding = nn.Dense(self.flow_dim)
        self.embedding_dropout = nn.Dropout(self.dropout)
        self.embedding_ln = nn.LayerNorm()
        self.pe_dropout = nn.Dropout(self.dropout)
        self.dec_pe_dropout = nn.Dropout(self.dropout)
        self.enc_layers = [
            _EncoderLayer(self.flow_dim, self.num_heads, self.d_ff,
                          self.dropout, name=f"enc_{i}")
            for i in range(self.num_encoder_layers)]
        self.text_projection = nn.Dense(self.flow_dim)
        self.condition_projection = nn.Dense(self.flow_dim)
        self.fusion_fc1 = nn.Dense(self.flow_dim * 4)
        self.fusion_dropout = nn.Dropout(self.dropout)
        self.fusion_fc2 = nn.Dense(self.flow_dim)
        self.fusion_ln = nn.LayerNorm()
        self.ada_ln = _AdaLN(self.flow_dim)
        self.input_projection = nn.Dense(self.flow_dim)
        self.output_projection = nn.Dense(self.n_features)
        self.dec_layers = [
            _DecoderLayer(self.flow_dim, self.num_heads, self.d_ff,
                          self.dropout, name=f"dec_{i}")
            for i in range(self.num_decoder_layers)]

    # -- pieces ------------------------------------------------------------

    def encode(self, series: jnp.ndarray,
               train: bool = False) -> jnp.ndarray:
        """(B, T, n_f) -> (B, T, flow_dim) memory. Dropout sites mirror
        the reference (TSae.py:127,131-135,170-180): embedding dropout
        BEFORE the LN, positional-encoding dropout on the summed input,
        and the torch TransformerEncoderLayer dropouts inside each
        layer."""
        det = not train
        h = self.embedding_dropout(self.value_embedding(series),
                                   deterministic=det)
        h = self.embedding_ln(h)
        T = h.shape[1]
        h = self.pe_dropout(
            h + _positional_encoding(T, self.flow_dim)[None],
            deterministic=det)
        for layer in self.enc_layers:
            h = layer(h, deterministic=det)
        return h

    def fuse_condition(self, memory: jnp.ndarray, text_emb: jnp.ndarray,
                       train: bool = False) -> jnp.ndarray:
        """Text fusion + AdaLN (reference ConditionFusionModule :245-274;
        dropout between the fusion MLP's ReLU and its second Linear)."""
        B, T, _ = memory.shape
        text_cond = self.text_projection(text_emb.reshape(B, -1))
        expanded = jnp.broadcast_to(text_cond[:, None, :],
                                    (B, T, self.flow_dim))
        fused = jnp.concatenate([memory, expanded], axis=-1)
        fused = self.fusion_fc2(self.fusion_dropout(
            nn.relu(self.fusion_fc1(fused)), deterministic=not train))
        fused = self.fusion_ln(fused + memory)
        return self.ada_ln(fused, self.condition_projection(text_cond))

    def decode_teacher_forced(self, memory: jnp.ndarray,
                              target_seq: jnp.ndarray,
                              train: bool = False) -> jnp.ndarray:
        """Shifted-right teacher forcing with causal mask (reference
        TimeSeriesDecoder.forward :356-389)."""
        det = not train
        B, T, _ = target_seq.shape
        emb = self.input_projection(target_seq)
        bos = jnp.zeros((B, 1, self.flow_dim), emb.dtype)
        dec_in = jnp.concatenate([bos, emb[:, :-1]], axis=1)
        dec_in = self.dec_pe_dropout(
            dec_in + _positional_encoding(T, self.flow_dim)[None],
            deterministic=det)
        causal = jnp.triu(jnp.ones((T, T), bool), k=1)[None, None]
        h = dec_in
        for layer in self.dec_layers:
            h = layer(h, memory, causal, deterministic=det)
        return self.output_projection(h)

    def generate(self, memory: jnp.ndarray) -> jnp.ndarray:
        """Autoregressive generation of len(memory) steps (reference
        :391-421) as a lax.scan over a fixed-size decoder input buffer."""
        B, T, _ = memory.shape
        pe = _positional_encoding(T, self.flow_dim)

        def run_decoder(buf, upto):
            h = buf + pe[None]
            idx = jnp.arange(T)
            causal = jnp.triu(jnp.ones((T, T), bool), k=1)
            pad = idx[None, :] > upto           # positions beyond current
            mask = (causal | pad)[None, None]
            for layer in self.dec_layers:
                h = layer(h, memory, mask)
            return h

        def step(carry, i):
            h = run_decoder(carry, i)
            pred = self.output_projection(h[:, i])      # (B, n_f)
            nxt = self.input_projection(pred)
            written = jax.lax.dynamic_update_slice_in_dim(
                carry, nxt[:, None, :], jnp.minimum(i + 1, T - 1), axis=1)
            # the last step produces no further input — keep carry then
            buf = jnp.where(i + 1 < T, written, carry)
            return buf, pred

        buf0 = jnp.zeros((B, T, self.flow_dim), memory.dtype)
        _, preds = jax.lax.scan(step, buf0, jnp.arange(T))
        return preds.transpose(1, 0, 2)                 # (B, T, n_f)

    # -- entry points ------------------------------------------------------

    def __call__(self, series, text_emb, train: bool = False):
        """Teacher-forced conditional reconstruction (reference forward
        :476-521)."""
        mem = self.encode(series, train)
        mem = self.fuse_condition(mem, text_emb, train)
        return self.decode_teacher_forced(mem, series, train)

    def reconstruct_teacher_forced(self, series, train: bool = False):
        """Unconditioned teacher-forced path used by shared_eval 'train'
        (reference :556-571, fusion commented out there)."""
        mem = self.encode(series, train)
        return self.decode_teacher_forced(mem, series, train)

    def reconstruct_autoregressive(self, series):
        """Inference path (reference forward_inference :523-554)."""
        mem = self.encode(series)
        return self.generate(mem)


class TSaeDiffusion:
    """LAVAE-interface adapter over a TSae: exposes ``encode(x) ->
    (z, aux)`` / ``decode(z, length) -> (x, aux)`` in the conv-VAE's
    (B, F, T) channel-first layout so the TSae can stand in anywhere a
    LAVAE feeds the diffusion stack (make_denoiser_train_step,
    make_cfg_sampler, make_cfg_sampler's one-shot final decode).

    Beyond-reference wiring, deliberately: the reference pretrains TSae
    as the T2MS VAE default (pretrained_mylavae.py:185) but its
    mytrain.py hard-imports the conv vqvae encoder (mytrain.py:9,29), so
    TSae latents never actually reach the reference denoiser. This
    adapter closes that loop the TPU-native way — latent z is the
    encoder memory transposed to (B, flow_dim, T); decode runs the
    scanned autoregressive generator (TSae.py:391-421 semantics).
    The latent length equals the series length T (no resize-to-grid —
    the TSae has no length adaptation stage).

    NOT an nn.Module: flax's lifted machinery rejects ``lax.scan``-over-
    submodules when the scanning method is re-entered through a wrapper
    module (UnexpectedTracerError, observed for both composition and
    subclassing), so this is a plain object that duck-types the exact
    surface the trainer/sampler use — ``init`` and
    ``apply(params, *args, method=...)`` — and routes every method to a
    TOP-LEVEL ``TSae.apply`` where the scan is proven to trace. The
    param tree is the TSae's own, so cli.pretrain_mylavae checkpoints
    load directly."""

    def __init__(self, n_features: int = 10, flow_dim: int = 64,
                 num_encoder_layers: int = 3, num_decoder_layers: int = 3,
                 d_ff: int = 128, num_heads: int = 8,
                 dropout: float = 0.1):
        self.n_features = n_features
        self.flow_dim = flow_dim
        self.tsae = TSae(n_features=n_features, flow_dim=flow_dim,
                         num_encoder_layers=num_encoder_layers,
                         num_decoder_layers=num_decoder_layers,
                         d_ff=d_ff, num_heads=num_heads, dropout=dropout)

    # marker methods: identity targets for apply(method=...) and the
    # layout adapters themselves
    def _to_series(self, x):
        if x.ndim == 2:                   # univariate (B, T) -> (B, T, 1)
            return x[:, :, None]
        return x.transpose(0, 2, 1)       # (B, F, T) -> (B, T, F)

    def _from_series(self, r, squeeze: bool):
        if squeeze:
            return r[:, :, 0]             # (B, T)
        return r.transpose(0, 2, 1)       # (B, F, T)

    def init(self, key, x):
        s = self._to_series(x)
        return self.tsae.init(key, s, jnp.zeros((s.shape[0], 128)))

    def encode(self, params, x):
        mem = self.tsae.apply(params, self._to_series(x),
                              method=self.tsae.encode)   # (B, T, flow)
        return mem.transpose(0, 2, 1), mem               # z: (B, flow, T)

    def decode(self, params, z, length: int):
        mem = z.transpose(0, 2, 1)                       # (B, T, flow)
        out = self.tsae.apply(params, mem,
                              method=self.tsae.generate)  # (B, T, n_f)
        return self._from_series(out, self.n_features == 1), mem

    def reconstruct_teacher_forced(self, params, x, dropout_key=None):
        """Channel-first teacher-forced reconstruction (pretraining
        target, reference shared_eval TSae.py:556-571)."""
        s = self._to_series(x)
        loss, recon = tsae_loss(self.tsae, params, s,
                                dropout_key=dropout_key)
        return self._from_series(recon, x.ndim == 2)

    def reconstruct_autoregressive(self, params, x):
        z, _ = self.encode(params, x)
        out, _ = self.decode(params, z, x.shape[-1])
        return out

    def apply(self, params, *args, method=None, **kwargs):
        """flax-Module-shaped dispatch: ``method`` is one of this
        object's bound methods (the trainer/sampler pass
        ``method=vae.encode`` / ``vae.decode``)."""
        fn = getattr(self, method.__name__) if method is not None \
            else self.__call__
        return fn(params, *args, **kwargs)

    def __call__(self, params, x):
        z, mem = self.encode(params, x)
        recon, after = self.decode(params, z, x.shape[-1])
        return recon, z, mem, after


def tsae_adapter_loss(model: TSaeDiffusion, params, batch: jnp.ndarray,
                      dropout_key=None):
    """Teacher-forced MSE through the adapter, channel-first layout —
    drop-in for lavae_loss in pretraining loops. Returns
    (loss, (recon_error, recon)) like the LAVAE loss."""
    recon = model.reconstruct_teacher_forced(params, batch,
                                             dropout_key=dropout_key)
    loss = jnp.mean(jnp.square(recon - batch))
    return loss, (loss, recon)


def tsae_loss(model: TSae, params, series: jnp.ndarray,
              dropout_key=None):
    """Teacher-forced MSE (reference shared_eval :556-571). With a
    ``dropout_key`` the forward runs in train mode with the reference's
    p=0.1 dropout everywhere; without one it is deterministic (eval)."""
    if dropout_key is not None:
        recon = model.apply(params, series, train=True,
                            method=model.reconstruct_teacher_forced,
                            rngs={"dropout": dropout_key})
    else:
        recon = model.apply(params, series,
                            method=model.reconstruct_teacher_forced)
    return jnp.mean(jnp.square(recon - series)), recon
