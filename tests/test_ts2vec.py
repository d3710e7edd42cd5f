"""TS2Vec tests: encoder shapes/NaN handling, contrastive-loss oracles vs an
inline torch formulation, a short fit run, and the C-FID pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from t2ms_tpu.evaluate.fid import calculate_fid
from t2ms_tpu.evaluate.ts2vec import (TS2Vec, TSEncoder,
                                      hierarchical_contrastive_loss,
                                      instance_contrastive_loss,
                                      temporal_contrastive_loss)


def test_encoder_shapes_and_nan_padding_equivalence():
    enc = TSEncoder(input_dims=3, output_dims=16, hidden_dims=8, depth=3)
    x = np.random.default_rng(0).standard_normal((2, 24, 3)).astype(np.float32)
    params = enc.init(jax.random.key(0), jnp.asarray(x))
    out = enc.apply(params, jnp.asarray(x), train=False)
    assert out.shape == (2, 24, 16)

    # NaN-padded long buffer must equal the short window at real positions
    short = x[:, :10]
    padded = np.full_like(x, np.nan)
    padded[:, :10] = short
    o_short = enc.apply(params, jnp.asarray(short), train=False)
    o_pad = enc.apply(params, jnp.asarray(padded), train=False)
    np.testing.assert_allclose(np.asarray(o_pad[:, :10]),
                               np.asarray(o_short), rtol=1e-4, atol=1e-5)


def _torch_pair_loss(z_t):
    sim = torch.matmul(z_t, z_t.transpose(1, 2))
    logits = torch.tril(sim, diagonal=-1)[:, :, :-1]
    logits = logits + torch.triu(sim, diagonal=1)[:, :, 1:]
    logits = -F.log_softmax(logits, dim=-1)
    return logits


def test_instance_loss_matches_torch():
    rng = np.random.default_rng(1)
    z1 = rng.standard_normal((4, 6, 8)).astype(np.float32)
    z2 = rng.standard_normal((4, 6, 8)).astype(np.float32)
    got = float(instance_contrastive_loss(jnp.asarray(z1), jnp.asarray(z2)))
    z = torch.cat([torch.tensor(z1), torch.tensor(z2)], dim=0).transpose(0, 1)
    logits = _torch_pair_loss(z)
    B = 4
    i = torch.arange(B)
    want = float((logits[:, i, B + i - 1].mean()
                  + logits[:, B + i, i].mean()) / 2)
    assert got == pytest.approx(want, rel=1e-5)


def test_temporal_loss_matches_torch():
    rng = np.random.default_rng(2)
    z1 = rng.standard_normal((3, 5, 8)).astype(np.float32)
    z2 = rng.standard_normal((3, 5, 8)).astype(np.float32)
    got = float(temporal_contrastive_loss(jnp.asarray(z1), jnp.asarray(z2)))
    z = torch.cat([torch.tensor(z1), torch.tensor(z2)], dim=1)
    logits = _torch_pair_loss(z)
    T = 5
    t = torch.arange(T)
    want = float((logits[:, t, T + t - 1].mean()
                  + logits[:, T + t, t].mean()) / 2)
    assert got == pytest.approx(want, rel=1e-5)


def test_hierarchical_loss_finite_and_positive():
    rng = np.random.default_rng(3)
    z1 = jnp.asarray(rng.standard_normal((4, 8, 16)), jnp.float32)
    z2 = jnp.asarray(rng.standard_normal((4, 8, 16)), jnp.float32)
    v = float(hierarchical_contrastive_loss(z1, z2))
    assert np.isfinite(v) and v > 0
    assert np.isfinite(float(hierarchical_contrastive_loss(z1[:1], z2[:1])))


def test_fit_runs_and_cfid_discriminates():
    """Short fit; C-FID(self) must be far below C-FID(shifted data)."""
    rng = np.random.default_rng(4)
    tt = np.linspace(0, 1, 24)
    data = np.stack([np.sin(2 * np.pi * f * tt) for f in
                     rng.uniform(1, 3, 24)])[:, :, None].astype(np.float32)
    model = TS2Vec(input_dims=1, output_dims=16, hidden_dims=8, depth=3,
                   batch_size=8, seed=0)
    log = model.fit(data, n_iters=12)
    assert len(log) >= 1 and all(np.isfinite(v) for v in log)

    repr_self = model.encode(data, encoding_window="full_series")
    assert repr_self.shape == (24, 16)
    other = data + 5.0
    repr_other = model.encode(other, encoding_window="full_series")
    fid_self = calculate_fid(repr_self,
                             model.encode(data, encoding_window="full_series"))
    fid_other = calculate_fid(repr_self, repr_other)
    assert abs(fid_self) < 1e-6
    assert fid_other > 1e-3


def test_encode_requires_fit():
    model = TS2Vec(input_dims=1)
    with pytest.raises(AssertionError):
        model.encode(np.zeros((2, 8, 1), np.float32))


def test_ts2vec_save_load(tmp_path):
    rng = np.random.default_rng(5)
    data = rng.standard_normal((16, 16, 1)).astype(np.float32)
    m = TS2Vec(input_dims=1, output_dims=8, hidden_dims=8, depth=2,
               batch_size=8, seed=1)
    m.fit(data, n_iters=4)
    r1 = m.encode(data, encoding_window="full_series")
    fn = str(tmp_path / "ts2vec.pkl")
    m.save(fn)
    m2 = TS2Vec(input_dims=1, output_dims=8, hidden_dims=8, depth=2)
    m2.load(fn)
    r2 = m2.encode(data, encoding_window="full_series")
    np.testing.assert_allclose(r1, r2, rtol=1e-5)


@pytest.mark.parametrize("crop_l", [2, 3, 5, 6, 7, 8, 13, 24])
def test_masked_hierarchical_loss_equals_exact(crop_l):
    """The masked loss (traced crop length, fixed T_max buffer) must equal
    the exact-shape loss for EVERY crop length — this is what lets the
    single-program fit use the reference's exact (un-quantized) crop
    distribution (reference evaluate/ts2vec.py:127-141,452-468)."""
    from t2ms_tpu.evaluate.ts2vec import hierarchical_contrastive_loss_masked
    rng = np.random.default_rng(crop_l)
    T_max = 24
    z1 = rng.standard_normal((4, T_max, 8)).astype(np.float32)
    z2 = rng.standard_normal((4, T_max, 8)).astype(np.float32)
    # garbage beyond crop_l must not influence the result
    z1[:, crop_l:] = 1e6
    z2[:, crop_l:] = -1e6
    want = float(hierarchical_contrastive_loss(
        jnp.asarray(z1[:, :crop_l]), jnp.asarray(z2[:, :crop_l])))
    got = float(jax.jit(hierarchical_contrastive_loss_masked)(
        jnp.asarray(z1), jnp.asarray(z2), jnp.asarray(crop_l)))
    assert got == pytest.approx(want, rel=1e-4, abs=1e-5)


def test_masked_hierarchical_loss_gradients_finite():
    from t2ms_tpu.evaluate.ts2vec import hierarchical_contrastive_loss_masked
    rng = np.random.default_rng(0)
    z1 = jnp.asarray(rng.standard_normal((2, 16, 4)), jnp.float32)
    z2 = jnp.asarray(rng.standard_normal((2, 16, 4)), jnp.float32)
    g = jax.grad(lambda a: hierarchical_contrastive_loss_masked(
        a, z2, jnp.asarray(5)))(z1)
    assert np.isfinite(np.asarray(g)).all()
    # positions beyond the crop must receive zero gradient
    assert np.abs(np.asarray(g)[:, 5:]).max() == 0.0


def test_fit_is_single_program_and_cumulative():
    """fit targets are CUMULATIVE like the reference's persistent
    self.n_iters counter (ts2vec.py:110-117): a second fit with an
    already-reached target is a no-op, a higher target trains the
    difference. swa_n counts the init snapshot (reference :64-65)."""
    rng = np.random.default_rng(9)
    data = rng.standard_normal((16, 16, 1)).astype(np.float32)
    m = TS2Vec(input_dims=1, output_dims=8, hidden_dims=8, depth=2,
               batch_size=8, seed=3)
    log1 = m.fit(data, n_iters=4)
    p1 = jax.tree_util.tree_leaves(m.params)[0].copy()
    assert m.swa_n == 5 and len(log1) == 2    # init snapshot + 4 iters
    assert m.fit(data, n_iters=4) == []       # target already reached
    p1b = jax.tree_util.tree_leaves(m.params)[0]
    assert np.allclose(np.asarray(p1), np.asarray(p1b))
    log2 = m.fit(data, n_iters=6)             # 2 more iters = 1 epoch
    assert m.swa_n == 7 and len(log2) == 1
    p2 = jax.tree_util.tree_leaves(m.params)[0]
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_fit_recrops_long_series_to_max_train_length():
    """When the (possibly split) buffer still exceeds max_train_length,
    every batch is re-cropped to a random mtl window (reference
    :120-122): all sampled crop windows must fit inside ts_l and have
    length <= mtl."""
    rng = np.random.default_rng(4)
    data = rng.standard_normal((10, 40, 1)).astype(np.float32)
    m = TS2Vec(input_dims=1, output_dims=8, hidden_dims=8, depth=2,
               batch_size=4, max_train_length=24, seed=5)
    # 40 // 24 = 1 section -> no split; the re-crop path must bound crops
    log = m.fit(data, n_iters=6)
    assert len(log) >= 1 and all(np.isfinite(log))


def test_fit_centerizes_nan_padded_buffers():
    """Rows with trailing all-NaN padding (e.g. from the uneven
    max_train_length split) are re-centered like the reference's
    centerize_vary_length_series before training."""
    from t2ms_tpu.evaluate.ts2vec import _centerize_vary_length_series
    x = np.full((2, 8, 1), np.nan, np.float32)
    x[0, :4, 0] = [1, 2, 3, 4]            # leading data, trailing NaN
    x[1, 2:8, 0] = [5, 6, 7, 8, 9, 10]    # offset data
    c = _centerize_vary_length_series(x)
    # row 0: 4 valid of 8 -> centered with 2 NaN each side
    assert np.isnan(c[0, :2, 0]).all() and np.isnan(c[0, 6:, 0]).all()
    np.testing.assert_array_equal(c[0, 2:6, 0], [1, 2, 3, 4])
    # row 1 already ends at the boundary: 2 leading NaNs -> split 1/1
    assert np.isnan(c[1, 0, 0]) and np.isnan(c[1, 7, 0])
    np.testing.assert_array_equal(c[1, 1:7, 0], [5, 6, 7, 8, 9, 10])
