"""Metric golden tests. Oracles are independent torch/scipy formulations of
the reference semantics (evaluation.py / evaluate/feature_based_measures.py)
computed inline — the implementations under test are numpy/JAX."""

import numpy as np
import pytest
import torch

from t2ms_tpu.evaluate import (calculate_acd, calculate_correlational_score,
                               calculate_crps, calculate_dtw, calculate_ed,
                               calculate_fid, calculate_kd, calculate_mdd,
                               calculate_mrr, calculate_mse, calculate_sd,
                               calculate_wape, dtw_jax_batch, dtw_native,
                               dtw_numpy, mrr_at_10, normalize_per_row)


RNG = np.random.default_rng(0)
ORI = RNG.standard_normal((6, 24, 3))
GEN = ORI + 0.3 * RNG.standard_normal((6, 24, 3))
GEN_MULTI = np.stack([ORI + 0.2 * RNG.standard_normal(ORI.shape)
                      for _ in range(5)], axis=-1)


def test_mse_wape_ed_loop_equivalence():
    """Vectorized metrics equal the reference's loop formulation."""
    mse_loop = np.mean([np.mean([np.mean((ORI[i, :, j] - GEN[i, :, j]) ** 2)
                                 for j in range(3)]) for i in range(6)])
    np.testing.assert_allclose(calculate_mse(ORI, GEN), mse_loop, rtol=1e-12)

    wape_loop = []
    for i in range(6):
        num = sum(np.sum(np.abs(ORI[i, :, j] - GEN[i, :, j]))
                  for j in range(3))
        den = sum(np.sum(np.abs(ORI[i, :, j])) for j in range(3))
        wape_loop.append(num / den)
    np.testing.assert_allclose(calculate_wape(ORI, GEN),
                               np.mean(wape_loop), rtol=1e-12)

    ed_loop = np.mean([np.mean([np.linalg.norm(ORI[i, :, j] - GEN[i, :, j])
                                for j in range(3)]) for i in range(6)])
    np.testing.assert_allclose(calculate_ed(ORI, GEN), ed_loop, rtol=1e-12)


def test_crps_loop_equivalence():
    from scipy.stats import norm
    vals = []
    for i in range(6):
        tot = 0.0
        for j in range(3):
            cl = []
            for g in range(5):
                m = GEN_MULTI[i, :, j, g].mean()
                s = GEN_MULTI[i, :, j, g].std() or 1e-8
                obs = ORI[i, :, j]
                cdf_obs = np.where(obs < m, 0, 1)
                cl.append(np.mean((cdf_obs - norm.cdf(obs, m, s)) ** 2))
            tot += np.mean(cl)
        vals.append(tot / 3)
    np.testing.assert_allclose(calculate_crps(ORI, GEN_MULTI),
                               np.mean(vals), rtol=1e-10)


def test_mrr_ranges_and_perfect_match():
    v = calculate_mrr(ORI, GEN_MULTI)
    assert 0.0 <= v <= 1.0
    # rows clustered around a common positive direction -> mean pairwise
    # cosine ~1 for the matching generation, ~0 for the orthogonal one
    base = np.abs(RNG.standard_normal((1, 1, 3))) + 1.0
    ori = base + 0.01 * RNG.standard_normal((4, 24, 3))
    good = ori + 0.01 * RNG.standard_normal(ori.shape)
    bad = RNG.standard_normal(ori.shape) * 0.01 \
        + np.array([1.0, -1.0, 0.0])[None, None, :] * 5
    gen = np.stack([good, bad], axis=-1)
    assert calculate_mrr(ori, gen) == 1.0
    only_bad = np.stack([bad, bad], axis=-1)
    assert calculate_mrr(ori, only_bad) == 0.0


def test_mrr_at_10():
    y = RNG.standard_normal((4, 16))
    gens = np.stack([y + 1e-3 * RNG.standard_normal((4, 16))
                     for _ in range(10)], axis=1)
    assert mrr_at_10(y, gens, threshold=0.9) == 1.0
    assert mrr_at_10(y, -gens, threshold=0.9) == 0.0


def test_correlational_score_self_is_one():
    assert calculate_correlational_score(ORI, ORI) == pytest.approx(1.0)
    assert calculate_correlational_score(ORI, GEN) < 1.0


def test_fid_zero_for_identical():
    act = RNG.standard_normal((40, 10))
    assert abs(calculate_fid(act, act)) < 1e-6
    shifted = act + 3.0
    assert calculate_fid(act, shifted) == pytest.approx(10 * 9.0, rel=0.05)


# --- DTW ------------------------------------------------------------------

def test_dtw_native_matches_numpy_and_jax():
    a = RNG.standard_normal((20, 3))
    b = RNG.standard_normal((25, 3))
    ref = dtw_numpy(a, b)
    assert dtw_native(a, b) == pytest.approx(ref, rel=1e-9)
    got = float(dtw_jax_batch(a[None].astype(np.float32),
                              b[None, :20].astype(np.float32))[0])
    assert got == pytest.approx(dtw_numpy(a, b[:20]), rel=1e-4)


def test_dtw_identity_zero_and_known_value():
    a = RNG.standard_normal((15, 2))
    assert dtw_native(a, a) == pytest.approx(0.0, abs=1e-12)
    # simple 1-D known case
    s1 = np.array([[0.0], [1.0], [2.0]])
    s2 = np.array([[0.0], [2.0]])
    # optimal path cost: (0-0)^2 + (1-2)^2 + (2-2)^2 = 1
    assert dtw_native(s1, s2) == pytest.approx(1.0)


def test_calculate_dtw_batch_mean():
    got = calculate_dtw(ORI, GEN)
    want = np.mean([dtw_numpy(ORI[i], GEN[i]) for i in range(6)])
    assert got == pytest.approx(want, rel=1e-9)


def test_dtw_matches_dtaidistance_definition():
    """Cross-check against torch-free reference DP with per-frame squared
    euclidean accumulation (reference evaluate/metrics.py:139-170)."""
    a = RNG.standard_normal((12, 4))
    b = RNG.standard_normal((17, 4))
    T1, T2 = 12, 17
    D = np.full((T1 + 1, T2 + 1), np.inf)
    D[0, 0] = 0
    for i in range(1, T1 + 1):
        for j in range(1, T2 + 1):
            c = np.sum((a[i - 1] - b[j - 1]) ** 2)
            D[i, j] = c + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    assert dtw_native(a, b) == pytest.approx(np.sqrt(D[T1, T2]), rel=1e-12)


# --- feature measures (torch oracles) ------------------------------------

def _torch_acf(x, max_lag):
    x = torch.tensor(x)
    x = x - x.mean((0, 1))
    std = torch.var(x, unbiased=False, dim=(0, 1))
    accs = []
    for i in range(max_lag):
        y = x[:, i:] * x[:, :-i] if i > 0 else torch.pow(x, 2)
        accs.append(torch.mean(y, (0, 1)) / std)
    return torch.stack(accs)


def test_acd_matches_torch_oracle():
    L = min(64, ORI.shape[1])
    diff = _torch_acf(GEN, L) - _torch_acf(ORI, L)
    want = float(torch.sqrt(torch.pow(diff, 2).sum(0)).mean())
    assert calculate_acd(ORI, GEN) == pytest.approx(want, rel=1e-6)


def test_sd_matches_torch_oracle():
    def torch_skew(x):
        x = torch.tensor(x)
        x = x - x.mean((0, 1), keepdims=True)
        x3 = torch.pow(x, 3).mean((0, 1), keepdims=True)
        s3 = torch.pow(x.std((0, 1), unbiased=True, keepdims=True), 3)
        return (x3 / s3)[0, 0]
    want = float(torch.abs(torch_skew(GEN) - torch_skew(ORI)).mean())
    assert calculate_sd(ORI, GEN) == pytest.approx(want, rel=1e-6)


def test_kd_matches_torch_oracle():
    def torch_kurt(x):
        x = torch.tensor(x)
        x = x - x.mean((0, 1), keepdims=True)
        x4 = torch.pow(x, 4).mean((0, 1), keepdims=True)
        v2 = torch.pow(torch.var(x, dim=(0, 1), unbiased=False,
                                 keepdims=True), 2)
        return (x4 / v2 - 3)[0, 0]
    want = float(torch.abs(torch_kurt(GEN) - torch_kurt(ORI)).mean())
    assert calculate_kd(ORI, GEN) == pytest.approx(want, rel=1e-6)


def test_mdd_matches_torch_oracle():
    def torch_mdd(real, fake, n_bins=50):
        real = torch.tensor(real)
        fake = torch.tensor(fake)
        losses = []
        for i in range(real.shape[2]):
            for t in range(real.shape[1]):
                x = real[:, t, i].reshape(-1, 1)
                a, b = x.min().item(), x.max().item()
                b = b + 1e-5 if b == a else b
                bins = torch.linspace(a, b, n_bins + 1)
                delta = bins[1] - bins[0]
                count = torch.histc(x, bins=n_bins, min=a, max=b).float()
                density = count / delta / float(x.shape[0] * x.shape[1])
                loc = 0.5 * (bins[1:] + bins[:-1])
                xf = fake[:, t, i].reshape(-1, 1).repeat(1, n_bins)
                dist = torch.abs(xf - loc.view(1, -1))
                counter = ((delta / 2.0 - dist).clamp(min=0) > 0).float()
                df = counter.mean(0) / delta
                losses.append(torch.abs(df - density).mean())
        return float(torch.stack(losses).mean())
    want = torch_mdd(ORI, GEN)
    assert calculate_mdd(ORI, GEN) == pytest.approx(want, rel=1e-5)


def test_normalize_per_row():
    x = RNG.standard_normal((3, 50))
    y = normalize_per_row(x)
    np.testing.assert_allclose(y.min(axis=1), 0, atol=1e-6)
    np.testing.assert_allclose(y.max(axis=1), 1, atol=1e-3)
