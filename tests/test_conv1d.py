"""Golden tests: Conv1d / ConvTranspose1d primitives vs torch with shared
weights — the VAE stacks are built from these."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from t2ms_tpu.ops.conv1d import Conv1d, ConvTranspose1d


@pytest.mark.parametrize("k,s,p,T", [(4, 2, 1, 24), (4, 2, 1, 96),
                                     (3, 1, 1, 25), (1, 1, 0, 30)])
def test_conv1d_matches_torch(k, s, p, T):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, T)).astype(np.float32)
    w = rng.standard_normal((7, 5, k)).astype(np.float32)
    b = rng.standard_normal(7).astype(np.float32)
    mod = Conv1d(7, k, s, p)
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    want = F.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), stride=s, padding=p).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,s,p,T", [(4, 2, 1, 6), (4, 2, 1, 24),
                                     (4, 2, 1, 9), (3, 1, 1, 12)])
def test_conv_transpose1d_matches_torch(k, s, p, T):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, T)).astype(np.float32)
    w = rng.standard_normal((5, 7, k)).astype(np.float32)  # (in, out, k)
    b = rng.standard_normal(7).astype(np.float32)
    mod = ConvTranspose1d(7, k, s, p)
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    want = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                              torch.from_numpy(b), stride=s,
                              padding=p).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_init_bounds_match_torch_defaults():
    """From-scratch init must match torch's kaiming_uniform(a=sqrt(5))
    bounds, including torch's fan_in = weight.size(1)*k convention (out*k
    for ConvTranspose). flax variance_scaling's default axes computed
    fan_in = in*out on these layouts (4x under-scaled for 1->64, k=4)."""
    import torch.nn as tnn

    conv = Conv1d(features=64, kernel_size=4)
    p = conv.init(jax.random.key(0), jnp.ones((1, 1, 32)))["params"]
    ref = tnn.Conv1d(1, 64, 4)
    bound = 1.0 / (1 * 4) ** 0.5                     # = 0.5
    assert abs(float(ref.weight.abs().max()) - bound) < 0.05
    for name in ("kernel", "bias"):
        w = np.asarray(p[name])
        assert w.max() <= bound and w.min() >= -bound
        assert w.max() > 0.9 * bound, f"{name} under-scaled: {w.max()}"

    convt = ConvTranspose1d(features=3, kernel_size=4)
    pt = convt.init(jax.random.key(1), jnp.ones((1, 64, 32)))["params"]
    reft = tnn.ConvTranspose1d(64, 3, 4)
    bound_t = 1.0 / (3 * 4) ** 0.5                   # torch: size(1)*k
    assert abs(float(reft.weight.abs().max()) - bound_t) < 0.05
    w = np.asarray(pt["kernel"])
    assert w.max() <= bound_t and w.max() > 0.9 * bound_t
