"""Full-roundtrip numerical parity: flax LA-VAE vs the reference
computation chain built from torch functional ops with transplanted
weights (encoder convs -> residual stack -> 1x1 -> resize-to-grid;
decoder resize -> convs -> transposed convs)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from t2ms_tpu.models.vae import LAVAE


def _t(x):
    return torch.tensor(np.asarray(x))


def _res_stack(x, p, n_layers):
    # reference quirk: ReLU(inplace=True) in the unit's Sequential mutates
    # the skip operand (vqvae.py:11,22), so the trunk is relu'd every unit
    for i in range(n_layers):
        x = F.relu(x)
        h = F.conv1d(x, _t(p[f"res{i}_conv3"]["kernel"]), None, padding=1)
        h = F.relu(h)
        h = F.conv1d(h, _t(p[f"res{i}_conv1"]["kernel"]), None)
        x = x + h
    return F.relu(x)


def _torch_forward(params, x, latent_grid, length, n_res):
    p = params["params"]
    enc, dec = p["encoder"], p["decoder"]
    h = F.relu(F.conv1d(x, _t(enc["conv1"]["kernel"]),
                        _t(enc["conv1"]["bias"]), stride=2, padding=1))
    h = F.relu(F.conv1d(h, _t(enc["conv2"]["kernel"]),
                        _t(enc["conv2"]["bias"]), stride=2, padding=1))
    h = F.conv1d(h, _t(enc["conv3"]["kernel"]), _t(enc["conv3"]["bias"]),
                 padding=1)
    h = _res_stack(h, enc["res_stack"], n_res)
    before = F.conv1d(h, _t(enc["pre_vq"]["kernel"]),
                      _t(enc["pre_vq"]["bias"]))
    z = F.interpolate(before, size=latent_grid, mode="linear",
                      align_corners=True)

    d = F.interpolate(z, size=int(length / 4), mode="linear",
                      align_corners=True)
    after = d
    d = F.conv1d(d, _t(dec["conv1"]["kernel"]), _t(dec["conv1"]["bias"]),
                 padding=1)
    d = _res_stack(d, dec["res_stack"], n_res)
    d = F.relu(F.conv_transpose1d(d, _t(dec["convt1"]["kernel"]),
                                  _t(dec["convt1"]["bias"]), stride=2,
                                  padding=1))
    d = F.conv_transpose1d(d, _t(dec["convt2"]["kernel"]),
                           _t(dec["convt2"]["bias"]), stride=2, padding=1)
    return z, before, after, d


def test_lavae_roundtrip_matches_torch_chain():
    n_res = 2
    model = LAVAE(in_channels=3, num_hiddens=32, num_residual_layers=n_res,
                  num_residual_hiddens=16, embedding_dim=8, latent_grid=30,
                  exact_length_output=False)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 48)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))
    recon, z, before, after = model.apply(params, jnp.asarray(x))

    with torch.no_grad():
        tz, tbefore, tafter, trecon = _torch_forward(
            params, torch.tensor(x), 30, 48, n_res)
    np.testing.assert_allclose(np.asarray(z), tz.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(before), tbefore.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(after), tafter.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(recon), trecon.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_lavae_sushi_length_2048():
    """SUSHI-scale series (len 2048) roundtrip through the fixed grid."""
    model = LAVAE(in_channels=1, latent_grid=30, num_hiddens=32,
                  num_residual_hiddens=16, embedding_dim=8)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 2048)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    recon, z, before, after = model.apply(params, x)
    assert z.shape == (2, 8, 30)
    assert before.shape == (2, 8, 512)
    assert recon.shape == (2, 2048)
    assert bool(jnp.isfinite(recon).all())
