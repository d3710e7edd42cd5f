"""LA-VAE tests: shape contracts across the three length buckets for both
tracks, cross-loss identity at the native grid, loss/grad sanity, and a
short overfit run proving the module can learn."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from t2ms_tpu.models.vae import LAVAE, lavae_loss, smooth_l1_temporal_loss


def _t2s_vae():
    return LAVAE(in_channels=1, latent_grid=30, exact_length_output=False)


def _motion_vae(input_dim=10, flow_dim=64):
    return LAVAE(in_channels=input_dim, num_residual_layers=3,
                 latent_grid=flow_dim, exact_length_output=True)


@pytest.mark.parametrize("T", [24, 48, 96])
def test_t2s_roundtrip_shapes(T):
    model = _t2s_vae()
    x = jnp.ones((4, T))
    params = model.init(jax.random.key(0), x)
    recon, z, before, after = model.apply(params, x)
    assert z.shape == (4, 64, 30)
    assert before.shape == (4, 64, T // 4)
    assert after.shape == (4, 64, T // 4)
    assert recon.shape == (4, T)


@pytest.mark.parametrize("T,nf,fd", [(36, 10, 64), (72, 10, 64),
                                     (144, 10, 64), (48, 7, 50),
                                     (96, 7, 50), (192, 7, 50)])
def test_motion_roundtrip_shapes(T, nf, fd):
    model = _motion_vae(nf, fd)
    x = jnp.ones((2, nf, T))
    params = model.init(jax.random.key(0), x)
    recon, z, before, after = model.apply(params, x)
    assert z.shape == (2, 64, fd)
    assert recon.shape == (2, nf, T)


def test_cross_latent_identity_at_native_grid():
    """When length/4 == latent_grid the decoder-side resize is identity, so
    after == z exactly."""
    model = _t2s_vae()
    x = jnp.ones((2, 120))  # 120/4 == 30 == grid
    params = model.init(jax.random.key(0), x)
    _, z, _, after = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(after), np.asarray(z), atol=1e-6)


def test_encode_decode_different_lengths():
    """The LA property: encode at one length, decode at another."""
    model = _t2s_vae()
    params = model.init(jax.random.key(0), jnp.ones((2, 48)))
    z, _ = model.apply(params, jnp.ones((2, 48)), method=model.encode)
    out, _ = model.apply(params, z, 96, method=model.decode)
    assert out.shape == (2, 96)


def test_loss_and_grads_finite():
    model = _t2s_vae()
    x = jax.random.normal(jax.random.key(1), (8, 24))
    params = model.init(jax.random.key(0), x)
    (loss, (recon_err, recon, z)), grads = jax.value_and_grad(
        lambda p: lavae_loss(model, p, x), has_aux=True)(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_vae_overfits_tiny_batch():
    """100 AdamW steps on 4 fixed series must cut the loss by >5x —
    end-to-end learnability check."""
    model = _t2s_vae()
    key = jax.random.key(2)
    tt = jnp.linspace(0, 1, 24)
    x = jnp.stack([jnp.sin(2 * jnp.pi * (i + 1) * tt) for i in range(4)])
    params = model.init(key, x)
    opt = optax.adamw(1e-3, weight_decay=1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        (loss, _), grads = jax.value_and_grad(
            lambda p: lavae_loss(model, p, x), has_aux=True)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    first = None
    for i in range(100):
        params, state, loss = step(params, state)
        if first is None:
            first = float(loss)
    assert float(loss) < first / 5, (first, float(loss))


def test_smooth_l1_temporal_loss():
    x = jnp.zeros((2, 3, 10))
    y = jnp.ones((2, 3, 10)) * 0.5
    v = float(smooth_l1_temporal_loss(x, y))
    assert v > 0
    assert float(smooth_l1_temporal_loss(x, x)) == 0.0
