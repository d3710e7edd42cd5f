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

__all__ = ["TSae"]


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
