"""TS2Vec in JAX/flax — the contrastive encoder behind C-FID.

Reference: evaluate/ts2vec.py (618 LoC torch) — dilated-conv encoder
(:352-450), hierarchical instance+temporal contrastive loss (:452-497),
SWA-averaged network (:64-65), random-crop training (:127-141), and
``encode(..., encoding_window='full_series')`` max-pooling (:175-217).
``initialize_ts2vec`` (:12-21) trains it on the eval data itself
(batch 8, lr 1e-3, output_dims 100).

TPU-native re-design:
  * the train step (two encoder passes + hierarchical loss + AdamW + SWA
    update) is ONE jitted, shape-stable function;
  * random crops keep the reference's sampling *structure* but are
    materialized as fixed-length NaN-padded windows (the encoder's NaN
    masking zeroes padding exactly like the short-window zero padding the
    torch version sees, so encoder outputs at real positions are
    identical), and the overlap length ``crop_l`` is quantized to powers
    of two — bounding XLA compilations to ~log2(T) programs instead of
    O(T^2) dynamic shapes;
  * SWA is a jnp running average updated inside the step (torch
    AveragedModel semantics: avg += (p - avg)/(n+1)).
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["TS2Vec", "initialize_ts2vec", "TSEncoder",
           "hierarchical_contrastive_loss"]

_DN = ("NCH", "OIH", "NCH")


class _SamePadConv(nn.Module):
    """k=3 dilated conv with same padding (reference SamePadConv :401-418;
    receptive field (k-1)*d+1 is odd for k=3, so no tail trim)."""
    features: int
    dilation: int

    @nn.compact
    def __call__(self, x):  # x: (B, C, T)
        w = self.param("kernel",
                       nn.initializers.variance_scaling(1 / 3, "fan_in",
                                                        "uniform"),
                       (self.features, x.shape[1], 3))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1,),
            padding=[(self.dilation, self.dilation)],
            rhs_dilation=(self.dilation,), dimension_numbers=_DN)
        return y + b.astype(y.dtype)[None, :, None]


class _ConvBlock(nn.Module):
    """gelu->conv->gelu->conv with residual/projector (reference ConvBlock
    :420-433). ``pad_keep`` re-zeroes NaN-padded positions after every
    affine op so a padded buffer computes exactly what the short window
    would (conv zero-padding must stay zero, not leak biases)."""
    features: int
    dilation: int
    final: bool = False

    @nn.compact
    def __call__(self, x, pad_keep=None):
        def mask(h):
            return h if pad_keep is None else jnp.where(pad_keep, h, 0.0)
        need_proj = x.shape[1] != self.features or self.final
        residual = (mask(nn.Dense(self.features, name="projector")(
            x.transpose(0, 2, 1)).transpose(0, 2, 1)) if need_proj else x)
        h = nn.gelu(x, approximate=False)
        h = mask(_SamePadConv(self.features, self.dilation, name="conv1")(h))
        h = nn.gelu(h, approximate=False)
        h = mask(_SamePadConv(self.features, self.dilation, name="conv2")(h))
        return h + residual


class TSEncoder(nn.Module):
    """input fc -> binomial mask -> dilated conv stack -> dropout
    (reference TSEncoder :352-399)."""
    input_dims: int
    output_dims: int = 320
    hidden_dims: int = 64
    depth: int = 10

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 mask_rng: Optional[jax.Array] = None,
                 dropout_rng: Optional[jax.Array] = None):
        # x: (B, T, input_dims), may contain NaN padding
        nan_mask = ~jnp.isnan(x).any(axis=-1)          # (B, T)
        x = jnp.where(jnp.isnan(x), 0.0, x)
        h = nn.Dense(self.hidden_dims, name="input_fc")(x)
        if train and mask_rng is not None:
            mask = jax.random.bernoulli(mask_rng, 0.5, h.shape[:2])
        else:
            mask = jnp.ones(h.shape[:2], bool)
        mask = mask & nan_mask
        h = jnp.where(mask[:, :, None], h, 0.0)
        h = h.transpose(0, 2, 1)                        # (B, C, T)
        pad_keep = nan_mask[:, None, :]                 # (B, 1, T)
        channels = [self.hidden_dims] * self.depth + [self.output_dims]
        for i, ch in enumerate(channels):
            h = _ConvBlock(ch, 2 ** i, final=(i == len(channels) - 1),
                           name=f"block_{i}")(h, pad_keep)
        h = h.transpose(0, 2, 1)                        # (B, T, Co)
        if train and dropout_rng is not None:
            keep = jax.random.bernoulli(dropout_rng, 0.9, h.shape)
            h = jnp.where(keep, h / 0.9, 0.0)
        return h


def _off_diagonal_logsoftmax_loss(z: jnp.ndarray) -> jnp.ndarray:
    """Shared core of both contrastive losses: z (G, 2M, C) -> mean NCE loss
    pairing row i with row M+i (reference :470-497)."""
    G, twoM, C = z.shape
    M = twoM // 2
    sim = jnp.einsum("gic,gjc->gij", z, z)
    tril = jnp.tril(sim, k=-1)[:, :, :-1]
    triu = jnp.triu(sim, k=1)[:, :, 1:]
    logits = -jax.nn.log_softmax(tril + triu, axis=-1)
    i = jnp.arange(M)
    a = logits[:, i, M + i - 1].mean()
    b = logits[:, M + i, i].mean()
    return (a + b) / 2


def instance_contrastive_loss(z1, z2):
    B = z1.shape[0]
    if B == 1:
        return jnp.asarray(0.0, z1.dtype)
    z = jnp.concatenate([z1, z2], axis=0)       # (2B, T, C)
    return _off_diagonal_logsoftmax_loss(z.transpose(1, 0, 2))


def temporal_contrastive_loss(z1, z2):
    T = z1.shape[1]
    if T == 1:
        return jnp.asarray(0.0, z1.dtype)
    z = jnp.concatenate([z1, z2], axis=1)       # (B, 2T, C)
    return _off_diagonal_logsoftmax_loss(z)


def hierarchical_contrastive_loss(z1, z2, alpha=0.5, temporal_unit=0):
    """Multi-scale loss halving T by max-pool each level (reference
    :452-468). T is static under jit, so the level loop unrolls."""
    loss = jnp.asarray(0.0, z1.dtype)
    d = 0
    while z1.shape[1] > 1:
        if alpha != 0:
            loss = loss + alpha * instance_contrastive_loss(z1, z2)
        if d >= temporal_unit and 1 - alpha != 0:
            loss = loss + (1 - alpha) * temporal_contrastive_loss(z1, z2)
        d += 1
        T2 = (z1.shape[1] // 2) * 2
        z1 = z1[:, :T2].reshape(z1.shape[0], -1, 2, z1.shape[2]).max(axis=2)
        z2 = z2[:, :T2].reshape(z2.shape[0], -1, 2, z2.shape[2]).max(axis=2)
    if z1.shape[1] == 1:
        if alpha != 0:
            loss = loss + alpha * instance_contrastive_loss(z1, z2)
        d += 1
    return loss / d


def _prev_pow2(n: int) -> int:
    return 1 << (int(n).bit_length() - 1)


class TS2Vec:
    """fit/encode driver (reference TS2Vec :23-331)."""

    def __init__(self, input_dims, output_dims=320, hidden_dims=64,
                 depth=10, device=None, lr=0.001, batch_size=16,
                 max_train_length=None, temporal_unit=0, seed=0):
        import optax
        self.encoder = TSEncoder(input_dims, output_dims, hidden_dims, depth)
        self.lr = lr
        self.batch_size = batch_size
        self.max_train_length = max_train_length
        self.temporal_unit = temporal_unit
        self.rng = np.random.default_rng(seed)
        self._jkey = jax.random.key(seed)
        self.optimizer = optax.adamw(lr)
        self.params = None
        self.swa_params = None
        self.swa_n = 0
        self.n_iters = 0
        self._step_cache = {}

    # -- training ----------------------------------------------------------

    def _make_step(self, crop_l: int):
        if crop_l in self._step_cache:
            return self._step_cache[crop_l]

        @jax.jit
        def step(params, opt_state, swa_params, swa_n, key,
                 w1, w2, s1, s2):
            """w1/w2: NaN-padded fixed-length windows; s1/s2: per-row start
            of the overlap region inside each window."""
            k1, k2, k3, k4 = jax.random.split(key, 4)

            def loss_fn(p):
                o1 = self.encoder.apply(p, w1, train=True, mask_rng=k1,
                                        dropout_rng=k2)
                o2 = self.encoder.apply(p, w2, train=True, mask_rng=k3,
                                        dropout_rng=k4)
                c1 = jax.vmap(lambda o, s: lax.dynamic_slice_in_dim(
                    o, s, crop_l, axis=0))(o1, s1)
                c2 = jax.vmap(lambda o, s: lax.dynamic_slice_in_dim(
                    o, s, crop_l, axis=0))(o2, s2)
                return hierarchical_contrastive_loss(
                    c1, c2, temporal_unit=self.temporal_unit)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            import optax
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            swa_params = jax.tree_util.tree_map(
                lambda a, p: a + (p - a) / (swa_n + 1), swa_params, params)
            return params, opt_state, swa_params, loss

        self._step_cache[crop_l] = step
        return step

    def fit(self, train_data: np.ndarray, n_epochs=None, n_iters=None,
            verbose=False):
        assert train_data.ndim == 3
        import optax
        if n_iters is None and n_epochs is None:
            n_iters = 200 if train_data.size <= 100000 else 600

        if self.max_train_length is not None:
            sections = train_data.shape[1] // self.max_train_length
            if sections >= 2:
                splits = np.array_split(train_data, sections, axis=1)
                L = splits[0].shape[1]
                padded = [np.pad(s, ((0, 0), (0, L - s.shape[1]), (0, 0)),
                                 constant_values=np.nan) for s in splits]
                train_data = np.concatenate(padded, axis=0)
        train_data = train_data[
            ~np.isnan(train_data).all(axis=2).all(axis=1)]

        n = train_data.shape[0]
        ts_l = train_data.shape[1]
        bs = min(self.batch_size, n)

        if self.params is None:
            self.params = self.encoder.init(
                jax.random.key(0), jnp.zeros((1, ts_l, train_data.shape[2])))
            self.swa_params = self.params
            self.opt_state = self.optimizer.init(self.params)

        loss_log = []
        it = 0
        target = n_iters if n_iters is not None else 10 ** 9
        epoch = 0
        while it < target:
            order = self.rng.permutation(n)
            cum, cnt = 0.0, 0
            for b0 in range(0, n - bs + 1, bs):
                if it >= target:
                    break
                batch = train_data[order[b0:b0 + bs]]
                # reference crop sampling (:127-133), crop_l quantized to a
                # power of two for shape stability
                crop_l = int(self.rng.integers(
                    2 ** (self.temporal_unit + 1), ts_l + 1))
                crop_l = max(2, _prev_pow2(crop_l))
                crop_left = int(self.rng.integers(ts_l - crop_l + 1))
                crop_right = crop_left + crop_l
                crop_eleft = int(self.rng.integers(crop_left + 1))
                crop_eright = int(self.rng.integers(crop_right, ts_l + 1))
                offsets = self.rng.integers(-crop_eleft,
                                            ts_l - crop_eright + 1, size=bs)
                w1, s1 = _window(batch, offsets + crop_eleft,
                                 crop_right - crop_eleft, ts_l)
                # overlap is the LAST crop_l of window1
                s1 = s1 + (crop_right - crop_eleft) - crop_l
                w2, s2 = _window(batch, offsets + crop_left,
                                 crop_eright - crop_left, ts_l)
                # overlap is the FIRST crop_l of window2 (s2 already 0-based)

                step = self._make_step(crop_l)
                self._jkey, sub = jax.random.split(self._jkey)
                self.params, self.opt_state, self.swa_params, loss = step(
                    self.params, self.opt_state, self.swa_params,
                    jnp.asarray(self.swa_n, jnp.float32), sub, w1, w2,
                    jnp.asarray(s1, jnp.int32), jnp.asarray(s2, jnp.int32))
                self.swa_n += 1
                cum += float(loss)
                cnt += 1
                it += 1
                self.n_iters += 1
            if cnt:
                loss_log.append(cum / cnt)
                if verbose:
                    print(f"Epoch #{epoch}: loss={cum / cnt}")
            epoch += 1
            if n_epochs is not None and epoch >= n_epochs:
                break
        return loss_log

    # -- inference ---------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,))
    def _encode_full_series(self, params, x):
        out = self.encoder.apply(params, x, train=False)
        return out.max(axis=1)                      # full-series max pool

    def encode(self, data: np.ndarray, mask=None, encoding_window=None,
               batch_size=None) -> np.ndarray:
        assert self.swa_params is not None, "please train or load a net first"
        assert data.ndim == 3
        bs = batch_size or self.batch_size
        outs = []
        for b0 in range(0, data.shape[0], bs):
            x = jnp.asarray(data[b0:b0 + bs], jnp.float32)
            if encoding_window == "full_series":
                outs.append(np.asarray(self._encode_full_series(
                    self.swa_params, x)))
            else:
                outs.append(np.asarray(self.encoder.apply(
                    self.swa_params, x, train=False)))
        return np.concatenate(outs, axis=0)

    def save(self, fn: str):
        import pickle
        with open(fn, "wb") as f:
            pickle.dump(jax.device_get(self.swa_params), f)

    def load(self, fn: str):
        import pickle
        with open(fn, "rb") as f:
            self.swa_params = pickle.load(f)


def _window(batch: np.ndarray, starts: np.ndarray, length: int, ts_l: int):
    """Materialize per-row windows [start, start+length) as fixed-length
    (ts_l) NaN-padded arrays; returns (windows, overlap_base) where
    overlap_base is 0 (content is left-aligned)."""
    B, T, D = batch.shape
    out = np.full((B, ts_l, D), np.nan, np.float32)
    for i, s in enumerate(starts):
        s = int(s)
        out[i, :length] = batch[i, s:s + length]
    return jnp.asarray(out), np.zeros(B, np.int64)


def initialize_ts2vec(X_train: np.ndarray, device=None) -> TS2Vec:
    """Train the C-FID feature extractor on the eval data (reference
    :12-21: batch 8, lr 1e-3, output_dims 100, max_train_length 3000)."""
    model = TS2Vec(input_dims=X_train.shape[-1], device=device,
                   batch_size=8, lr=0.001, output_dims=100,
                   max_train_length=3000)
    model.fit(X_train, verbose=False)
    return model
