"""Golden tests: resize-as-matmul numerics vs torch F.interpolate /
F.adaptive_avg_pool1d — the length-adaptive core must match bit-carefully."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from t2ms_tpu.ops import resize


LENGTH_PAIRS = [
    (24, 6), (48, 12), (96, 24), (2048, 512),   # encoder T/4 paths
    (6, 30), (12, 30), (24, 30), (512, 30),     # latent -> fixed grid 30
    (30, 6), (30, 12), (30, 24), (30, 512),     # decoder grid -> length/4
    (25, 64), (64, 25), (50, 50), (7, 1), (1, 7),
    (36, 144), (144, 36), (100, 36),
]


@pytest.mark.parametrize("in_len,out_len", LENGTH_PAIRS)
def test_linear_resize_matches_torch(in_len, out_len):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 5, in_len)).astype(np.float32)
    got = np.asarray(resize.linear_resize(x, out_len))
    want = F.interpolate(torch.from_numpy(x), size=out_len, mode="linear",
                         align_corners=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)


@pytest.mark.parametrize("in_len,out_len", [(p, q) for p, q in LENGTH_PAIRS
                                            if p >= q])
def test_adaptive_avg_pool_matches_torch(in_len, out_len):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, in_len)).astype(np.float32)
    got = np.asarray(resize.adaptive_avg_pool1d(x, out_len))
    want = F.adaptive_avg_pool1d(torch.from_numpy(x), out_len).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)


def test_resize_time_axis_rule():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, 100)).astype(np.float32)
    down = np.asarray(resize.resize_time_axis(x, 36))
    want_down = F.adaptive_avg_pool1d(torch.from_numpy(x), 36).numpy()
    np.testing.assert_allclose(down, want_down, rtol=1e-4, atol=3e-5)

    x2 = rng.standard_normal((1, 3, 40)).astype(np.float32)
    up = np.asarray(resize.resize_time_axis(x2, 72))
    want_up = F.interpolate(torch.from_numpy(x2), size=72, mode="linear",
                            align_corners=True).numpy()
    np.testing.assert_allclose(up, want_up, rtol=1e-4, atol=3e-5)


def test_identity_passthrough():
    x = np.ones((2, 3, 16), np.float32)
    assert resize.linear_resize(x, 16) is x
    assert resize.adaptive_avg_pool1d(x, 16) is x


def test_matrices_are_row_stochastic():
    for in_len, out_len in [(25, 64), (64, 25), (30, 6)]:
        m = np.asarray(resize.linear_resize_matrix(in_len, out_len))
        np.testing.assert_allclose(m.sum(0), np.ones(out_len), atol=1e-6)
        p = np.asarray(resize.adaptive_avg_pool_matrix(in_len, out_len))
        np.testing.assert_allclose(p.sum(0), np.ones(out_len), atol=1e-6)
