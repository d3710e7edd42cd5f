"""MLP denoiser parity vs an inline torch formulation of the reference
layer math (mlp.py:49-94) with transplanted weights."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from t2ms_tpu.models.denoisers import MLPDenoiser


def _torch_time_emb(t, dim):
    t = torch.as_tensor(t) * 100.0
    freqs = torch.pow(10000, torch.linspace(0, 1, dim // 2))
    ang = t.unsqueeze(-1) / freqs
    return torch.cat([ang.sin(), ang.cos()], -1)


def test_mlp_layer_parity():
    model = MLPDenoiser(feat_dim=64, latent_len=6, depth=2)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 64, 6)).astype(np.float32)
    t = np.array([0.1, 0.5, 0.9], np.float32)
    text = rng.standard_normal((3, 128)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t),
                        jnp.asarray(text))
    ours = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(t),
                                  jnp.asarray(text)))

    h = torch.tensor(x)
    with torch.no_grad():
        for i in range(2):
            lp = params["params"][f"layer_{i}"]

            def lin(name, hh, lp=lp):
                node = lp[name] if name in lp else lp["cross_attn"][name]
                return hh @ torch.tensor(np.asarray(node["kernel"])) + \
                    torch.tensor(np.asarray(node["bias"]))

            # time emb broadcast over tokens (mlp.py:73-75)
            temb = _torch_time_emb(torch.tensor(t), 64)
            hh = h + temb.unsqueeze(-1)
            hl = hh.transpose(1, 2)                 # (B, L, feat)
            # text cross-attention (mlp.py:34-47,77-80)
            tokens = torch.tensor(text).unsqueeze(1).repeat(1, 6, 1)
            B, T, C = hl.shape
            hd = C // 4
            q = lin("query", hl).view(B, T, 4, hd).transpose(1, 2)
            k = lin("key", tokens).view(B, 6, 4, hd).transpose(1, 2)
            v = lin("value", tokens).view(B, 6, 4, hd).transpose(1, 2)
            att = F.softmax((q @ k.transpose(-2, -1)) * (hd ** -0.5), -1)
            y = (att @ v).transpose(1, 2).contiguous().view(B, T, C)
            hl = hl + lin("proj", y)
            # LN + feature MLP with residual (mlp.py:81-82)
            norm = lp["norm"]
            hl = F.layer_norm(hl, (64,),
                              torch.tensor(np.asarray(norm["scale"])),
                              torch.tensor(np.asarray(norm["bias"])))
            m = lin("mlp_fc1", hl).relu()
            hl = hl + lin("mlp_fc2", m)
            # token-axis MLP (mlp.py:83-85)
            hh = hl.transpose(1, 2)
            m2 = lin("mlp2_fc1", hh).relu()
            h = lin("mlp2_fc2", m2)

    np.testing.assert_allclose(ours, h.numpy(), rtol=2e-3, atol=2e-4)


def test_mlp_uncond_mask_equals_text_none():
    """text_mask=0 must reproduce the reference's text_input=None skip of
    cross-attention (mlp.py:77, infer.py:79) EXACTLY — zeroing the text
    embedding would not, because key/value/proj have biases."""
    model = MLPDenoiser(feat_dim=64, latent_len=6, depth=2)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 64, 6)).astype(np.float32)
    t = np.array([0.2, 0.4, 0.8], np.float32)
    text = rng.standard_normal((3, 128)).astype(np.float32)
    params = model.init(jax.random.key(1), jnp.asarray(x), jnp.asarray(t),
                        jnp.asarray(text))
    # a trained model has nonzero biases; fresh init is all-zero, which
    # would mask the bug this test guards against
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    params = jax.tree_util.tree_unflatten(
        treedef,
        [v + 0.05 if path[-1].key == "bias" else v
         for path, v in leaves])
    masked = np.asarray(model.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(text),
        jnp.zeros((3,), jnp.float32)))
    none = np.asarray(model.apply(
        params, jnp.asarray(x), jnp.asarray(t), None))
    np.testing.assert_array_equal(masked, none)
    # and zero-text is NOT equivalent (the biased branch still fires)
    zero_text = np.asarray(model.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.zeros_like(text)))
    assert np.abs(zero_text - none).max() > 1e-3


def test_mlp_fused_cfg_matches_two_pass():
    """The single 2B fused CFG forward must equal the reference's two
    separate forwards (infer.py:79-81) for the MLP denoiser."""
    from t2ms_tpu.sampling.sampler import _fused_cfg_forward

    model = MLPDenoiser(feat_dim=64, latent_len=6, depth=2)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 64, 6)).astype(np.float32))
    t = jnp.asarray(np.full((4,), 0.3, np.float32))
    text = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    params = model.init(jax.random.key(2), x, t, text)
    cfg_scale = 7.0
    fused = np.asarray(_fused_cfg_forward(model, params, x, t, text,
                                          cfg_scale))
    uncond = model.apply(params, x, t, None)
    cond = model.apply(params, x, t, text)
    two_pass = np.asarray(uncond + cfg_scale * (cond - uncond))
    np.testing.assert_allclose(fused, two_pass, rtol=1e-5, atol=1e-5)
