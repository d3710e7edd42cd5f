"""Denoiser tests: shapes across length buckets, golden embeddings vs the
reference formulas (torch oracle), adaLN-zero init property, jit+grad."""

import jax
import jax.numpy as jnp
import math
import numpy as np
import pytest
import torch

from t2ms_tpu.models.denoisers import DiT, MLPDenoiser, sinusoidal_positions, time_embedding


# --- golden: positional & time embeddings vs reference torch formulas -----

def _torch_sinusoidal(num_positions, d_model):
    position = torch.arange(num_positions).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d_model, 2)
                         * -(math.log(10000.0) / d_model)).unsqueeze(0)
    pe = torch.zeros(num_positions, d_model)
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    return pe.numpy()


def _torch_time_embedding(t, dim):
    t = torch.as_tensor(t) * 100.0
    t = t.unsqueeze(-1)
    freqs = torch.pow(10000, torch.linspace(0, 1, dim // 2))
    sin_emb = torch.sin(t[:, None] / freqs)
    cos_emb = torch.cos(t[:, None] / freqs)
    return torch.cat([sin_emb, cos_emb], dim=-1).squeeze(1).numpy()


def test_sinusoidal_positions_golden():
    got = np.asarray(sinusoidal_positions(480, 128))
    want = _torch_sinusoidal(480, 128)
    # ours is float64-accurate; torch's f32 argument reduction drifts ~3e-5
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_time_embedding_golden():
    t = np.array([0.0, 0.01, 0.5, 0.99, 1.0], np.float32)
    got = np.asarray(time_embedding(jnp.asarray(t), 128))
    want = _torch_time_embedding(t, 128)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --- DiT ------------------------------------------------------------------

@pytest.mark.parametrize("latent_len", [30, 50, 64])
def test_dit_shapes(latent_len):
    model = DiT(latent_len=latent_len, latent_dim=64)
    x = jnp.ones((2, 64, latent_len))
    t = jnp.array([0.1, 0.9])
    text = jnp.ones((2, 128))
    params = model.init(jax.random.key(0), x, t, text)
    out = model.apply(params, x, t, text)
    assert out.shape == x.shape


def test_dit_adaln_zero_init_conditioning_silent():
    """With zero-initialized adaLN heads, blocks are identity at init, so
    the output is independent of t and text (transformer.py:201-204)."""
    model = DiT(latent_len=30, latent_dim=64)
    x = jax.random.normal(jax.random.key(1), (2, 64, 30))
    params = model.init(jax.random.key(0), x, jnp.zeros(2), None)
    o1 = model.apply(params, x, jnp.array([0.0, 0.0]), None)
    o2 = model.apply(params, x, jnp.array([0.7, 0.3]), jnp.ones((2, 128)))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)


def test_dit_text_changes_output_after_perturbation():
    """Perturb adaLN weights away from zero: text must now matter."""
    model = DiT(latent_len=30, latent_dim=64)
    x = jax.random.normal(jax.random.key(2), (2, 64, 30))
    params = model.init(jax.random.key(0), x, jnp.zeros(2), None)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.key(3), p.shape),
        params)
    o_uncond = model.apply(params, x, jnp.full(2, 0.5), None)
    o_cond = model.apply(params, x, jnp.full(2, 0.5), jnp.ones((2, 128)))
    assert not np.allclose(np.asarray(o_uncond), np.asarray(o_cond))
    # text=None is exactly text=zeros (additive conditioning)
    o_zeros = model.apply(params, x, jnp.full(2, 0.5), jnp.zeros((2, 128)))
    np.testing.assert_allclose(np.asarray(o_uncond), np.asarray(o_zeros),
                               rtol=1e-5, atol=1e-5)


def test_dit_jit_and_grad():
    model = DiT(latent_len=30, latent_dim=64)
    x = jax.random.normal(jax.random.key(4), (4, 64, 30))
    t = jnp.linspace(0, 1, 4)
    text = jax.random.normal(jax.random.key(5), (4, 128))
    params = model.init(jax.random.key(0), x, t, text)

    @jax.jit
    def loss_fn(p):
        return jnp.mean(jnp.square(model.apply(p, x, t, text) - x))

    g = jax.grad(loss_fn)(params)
    norms = [float(jnp.linalg.norm(leaf)) for leaf in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms))
    assert any(n > 0 for n in norms)


def test_dit_param_count_matches_reference_scale():
    """~0.8M params at reference config (SURVEY.md §6: 4 blocks, d=128,
    4 heads, mlp x2)."""
    model = DiT(latent_len=30, latent_dim=64)
    params = model.init(jax.random.key(0), jnp.ones((1, 64, 30)),
                        jnp.zeros(1), None)
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    assert 0.5e6 < n < 1.2e6, n


# --- MLP ------------------------------------------------------------------

def test_mlp_shapes_and_cond():
    model = MLPDenoiser(feat_dim=64, latent_len=6)
    x = jax.random.normal(jax.random.key(6), (3, 64, 6))
    t = jnp.array([0.1, 0.5, 0.9])
    text = jax.random.normal(jax.random.key(7), (3, 128))
    params = model.init(jax.random.key(0), x, t, text)
    out_c = model.apply(params, x, t, text)
    out_u = model.apply(params, x, t, None)
    assert out_c.shape == x.shape
    assert not np.allclose(np.asarray(out_c), np.asarray(out_u))


def test_mlp_parametric_latent_len():
    model = MLPDenoiser(feat_dim=64, latent_len=30)
    x = jnp.ones((2, 64, 30))
    params = model.init(jax.random.key(0), x, jnp.zeros(2), None)
    assert model.apply(params, x, jnp.zeros(2), None).shape == x.shape
