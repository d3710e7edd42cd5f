"""Full-forward numerical parity: flax DiT vs an independent torch
formulation of the reference architecture (scripts/measure_torch_baseline.py
TorchDiT), with weights transplanted from the flax tree.

This pins the end-to-end architecture (patchify linear pair, pos-emb, time
embedding, adaLN blocks, unpatchify) to the reference computation, not just
individual pieces."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from t2ms_tpu.models.denoisers import DiT


def _load_torch_dit():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "torch_baseline",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts",
            "measure_torch_baseline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.TorchDiT


def _transplant(flax_params, tmodel):
    """Copy flax kernels (in, out) -> torch weights (out, in)."""
    p = flax_params["params"]

    def setw(tlin, node):
        tlin.weight.data = torch.tensor(np.asarray(node["kernel"]).T)
        tlin.bias.data = torch.tensor(np.asarray(node["bias"]))

    setw(tmodel.patch, p["patch_conv"])
    setw(tmodel.embed, p["patch_emb"])
    setw(tmodel.out, p["unpatch"])
    tmodel.ln.weight.data = torch.tensor(np.asarray(p["final_ln"]["scale"]))
    tmodel.ln.bias.data = torch.tensor(np.asarray(p["final_ln"]["bias"]))
    for i, blk in enumerate(tmodel.blocks):
        b = p[f"block_{i}"]
        setw(blk.qkv, b["attn"]["qkv"])
        setw(blk.proj, b["attn"]["proj"])
        setw(blk.fc1, b["mlp"]["fc1"])
        setw(blk.fc2, b["mlp"]["fc2"])
        setw(blk.mod, b["adaLN_modulation"])


def test_dit_forward_matches_torch_formulation():
    dit = DiT(latent_len=30, latent_dim=64, attention_impl="einsum")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 64, 30)).astype(np.float32)
    t = np.array([0.1, 0.5, 0.9], np.float32)
    emb = rng.standard_normal((3, 128)).astype(np.float32)

    params = dit.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(emb))
    # move adaLN away from zero so the blocks actually transform
    params = jax.tree_util.tree_map(
        lambda p: p + 0.03 * jax.random.normal(jax.random.key(1), p.shape),
        params)
    ours = np.asarray(dit.apply(params, jnp.asarray(x), jnp.asarray(t),
                                jnp.asarray(emb)))

    TorchDiT = _load_torch_dit()
    tmodel = TorchDiT(H=30, W=64, d=128, depth=4).eval()
    _transplant(params, tmodel)
    with torch.no_grad():
        theirs = tmodel(torch.tensor(x), torch.tensor(t),
                        torch.tensor(emb)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)

    # and the unconditioned path (text=None == zeros)
    ours_u = np.asarray(dit.apply(params, jnp.asarray(x), jnp.asarray(t),
                                  None))
    with torch.no_grad():
        theirs_u = tmodel(torch.tensor(x), torch.tensor(t), None).numpy()
    np.testing.assert_allclose(ours_u, theirs_u, rtol=2e-3, atol=2e-4)
