"""TSaeDiffusion adapter: TSae latents feeding the full diffusion stack
(beyond-reference wiring — the reference pretrains TSae as the T2MS VAE
default, pretrained_mylavae.py:185, but its mytrain.py hard-imports the
conv vqvae encoder, mytrain.py:9,29, so TSae latents never reach its
denoiser; here they do, through the standard trainer and sampler)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from t2ms_tpu.models.denoisers import DiT
from t2ms_tpu.models.vae import TSae, TSaeDiffusion, tsae_adapter_loss
from t2ms_tpu.sampling import make_cfg_sampler
from t2ms_tpu.training.trainer import TrainState, make_denoiser_train_step


@pytest.fixture(scope="module")
def setup():
    T, F = 16, 5
    vae = TSaeDiffusion(n_features=F, flow_dim=32, num_encoder_layers=1,
                        num_decoder_layers=1, d_ff=32, num_heads=4)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, F, T)),
                    jnp.float32)
    vp = vae.init(jax.random.key(0), x)
    return vae, vp, x, T, F


def test_adapter_interface_shapes(setup):
    vae, vp, x, T, F = setup
    z, mem = vae.apply(vp, x, method=vae.encode)
    assert z.shape == (4, 32, T)          # (B, flow_dim, T) latent
    out, _ = vae.apply(vp, z, T, method=vae.decode)
    assert out.shape == x.shape


def test_adapter_params_are_plain_tsae(setup):
    """The adapter's tree must equal a TSae's own — pretrained
    checkpoints from cli.pretrain_mylavae load directly."""
    vae, vp, x, T, F = setup
    base = TSae(n_features=F, flow_dim=32, num_encoder_layers=1,
                num_decoder_layers=1, d_ff=32, num_heads=4)
    pb = base.init(jax.random.key(0), jnp.transpose(x, (0, 2, 1)),
                   jnp.zeros((4, 128)))
    ka = jax.tree_util.tree_structure(vp)
    kb = jax.tree_util.tree_structure(pb)
    assert ka == kb


def test_adapter_loss_trains(setup):
    vae, vp, x, T, F = setup
    opt = optax.adam(1e-3)
    st = opt.init(vp)
    p = vp
    losses = []
    for i in range(3):
        (loss, _), g = jax.value_and_grad(
            lambda q: tsae_adapter_loss(vae, q, x,
                                        dropout_key=jax.random.key(i)),
            has_aux=True)(p)
        u, st = opt.update(g, st, p)
        p = optax.apply_updates(p, u)
        losses.append(float(loss))
    assert np.isfinite(losses).all()


def test_denoiser_train_step_on_tsae_latents(setup):
    vae, vp, x, T, F = setup
    dit = DiT(latent_len=T, latent_dim=32, d_model=128, depth=1,
              num_heads=4, attention_impl="einsum")
    emb = jnp.zeros((4, 128))
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(1), z, jnp.zeros(4), emb)
    opt = optax.adamw(1e-4)
    st = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
    step = make_denoiser_train_step(dit, vae, opt, "flowmatching", 10,
                                    donate=False)
    st2, loss = step(st, vp, jax.random.key(2), x, emb)
    assert np.isfinite(float(loss))
    # params actually moved
    d0 = jax.tree_util.tree_leaves(st.params)[0]
    d1 = jax.tree_util.tree_leaves(st2.params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_cfg_sampler_through_tsae_decoder(setup):
    vae, vp, x, T, F = setup
    dit = DiT(latent_len=T, latent_dim=32, d_model=128, depth=1,
              num_heads=4, attention_impl="einsum")
    emb = jnp.zeros((4, 128))
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(1), z, jnp.zeros(4), emb)
    sampler = make_cfg_sampler(dit, vae, "flowmatching", total_step=4,
                               cfg_scale=2.0, out_length=T)
    out = sampler(dp, vp, jax.random.key(3), x, emb)
    assert out.series.shape == x.shape
    assert np.isfinite(np.asarray(out.series)).all()
