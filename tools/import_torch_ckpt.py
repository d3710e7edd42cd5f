"""Import reference (torch) checkpoints into t2ms_tpu flax param trees.

The reference persists three formats (SURVEY.md §5 'checkpoint/resume'):
  * whole-pickled VAE modules — torch.save(model), loaded with
    torch.load(weights_only=False) (infer.py:39-41,
    pretrained_lavae_unified.py:156-158);
  * plain state_dicts (pretrained_mylavae.py:233, mytrain.py:29-30);
  * train-loop dicts {model, optimizer, epoch, loss_list}
    (train.py:92-95), where 'model' may include the grafted frozen
    encoder.* keys (train.py:30).

This tool reads any of them (unpickling module pickles WITHOUT the
reference package via shim classes) and maps the weights onto our module
layouts:
  * DiT        <- model/denoiser/transformer.py keys (conv, patch_emb, ln,
                  linear_emb_to_patch, layers.{i}.*); the reference's dead
                  `unpatch` (InverseLatentEmbedding — constructed but never
                  called in forward, transformer.py:150,182-190) and the
                  non-trainable pos_embed are skipped.
  * MLPDenoiser<- model/denoiser/mlp.py keys (layers.{i}.cross_attn/
                  norm2/mlp/mlp2); unused norm1/norm3/pos_emb/self_attn*
                  (defined but never called, mlp.py:53-60,71-85) skipped.
  * LAVAE      <- model/pretrained/vqvae.py / myvqvae.py keys
                  (encoder._conv_{1,2,3}, _residual_stack, _pre_vq_conv;
                  decoder._conv_1, _conv_trans_{1,2}).

Linear weights transpose (torch (out,in) -> flax (in,out)); Conv1d weights
copy directly (both (out,in,k)); ConvTranspose1d weights copy directly
(both (in,out,k)); the patchify Conv2d(1->4,k=2,s=2) folds into our
patch-linear as weight.reshape(4,4).T (pixel order (ph,pw) row-major on
both sides).

CLI:
  python tools/import_torch_ckpt.py --kind {dit,mlp,vae} \
      --input ref_ckpt.pth --output out_dir [--name final_model] \
      [--latent_len 30] [--feat_dim 64 ...]
writes an Orbax params checkpoint loadable by t2ms_tpu.training.checkpoints.
"""

from __future__ import annotations

import argparse
import io
import os
import pickle
import sys

import numpy as np

__all__ = ["load_torch_file", "dit_params_from_state_dict",
           "mlp_params_from_state_dict", "lavae_params_from_state_dict"]


# ---------------------------------------------------------------- loading

def _shim_torch_load(path: str):
    """torch.load(weights_only=False) without the reference package on the
    import path: unknown classes under model.*/utils resolve to shim
    nn.Module subclasses, so pickled whole modules restore their parameter
    tree and expose a working state_dict()."""
    import torch

    class _ShimUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                shim = type(name, (torch.nn.Module,), {})
                shim.__module__ = module
                return shim

    class _PickleShim:
        Unpickler = _ShimUnpickler
        load = staticmethod(lambda f, **kw: _ShimUnpickler(f).load())
        loads = staticmethod(
            lambda b, **kw: _ShimUnpickler(io.BytesIO(b)).load())

    return torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=_PickleShim)


def load_torch_file(path: str) -> dict:
    """Return a flat name->np.ndarray state_dict from any reference
    checkpoint format (whole module / state_dict / train-loop dict)."""
    import torch

    obj = _shim_torch_load(path)
    if isinstance(obj, dict) and "model" in obj and hasattr(
            obj["model"], "keys"):
        obj = obj["model"]                       # train-loop dict
    if isinstance(obj, torch.nn.Module):
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        raise ValueError(f"unrecognized checkpoint object: {type(obj)}")
    return {k: np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)
            for k, v in obj.items()
            if hasattr(v, "shape")}


# ---------------------------------------------------------------- mappers

def _lin(sd, key):
    out = {"kernel": sd[f"{key}.weight"].T}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _conv(sd, key, bias=True):
    out = {"kernel": sd[f"{key}.weight"]}
    if bias and f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def dit_params_from_state_dict(sd: dict, depth: int = 4) -> dict:
    """Map reference Transformer/mytransformer state_dict -> DiT params."""
    p = {
        "patch_conv": {
            "kernel": sd["conv.weight"].reshape(
                sd["conv.weight"].shape[0], -1).T,
            "bias": sd["conv.bias"],
        },
        "patch_emb": _lin(sd, "patch_emb"),
        "final_ln": _ln(sd, "ln"),
        "unpatch": _lin(sd, "linear_emb_to_patch"),
    }
    for i in range(depth):
        r = f"layers.{i}"
        p[f"block_{i}"] = {
            "attn": {"qkv": _lin(sd, f"{r}.attn.qkv"),
                     "proj": _lin(sd, f"{r}.attn.proj")},
            "mlp": {"fc1": _lin(sd, f"{r}.mlp.fc1"),
                    "fc2": _lin(sd, f"{r}.mlp.fc2")},
            "adaLN_modulation": _lin(sd, f"{r}.adaLN_modulation.1"),
        }
    return {"params": p}


def mlp_params_from_state_dict(sd: dict, depth: int = 8) -> dict:
    """Map reference MLP state_dict -> MLPDenoiser params."""
    p = {}
    for i in range(depth):
        r = f"layers.{i}"
        p[f"layer_{i}"] = {
            "cross_attn": {n: _lin(sd, f"{r}.cross_attn.{n}")
                           for n in ("key", "query", "value", "proj")},
            "norm": _ln(sd, f"{r}.norm2"),
            "mlp_fc1": _lin(sd, f"{r}.mlp.0"),
            "mlp_fc2": _lin(sd, f"{r}.mlp.2"),
            "mlp2_fc1": _lin(sd, f"{r}.mlp2.0"),
            "mlp2_fc2": _lin(sd, f"{r}.mlp2.2"),
        }
    return {"params": p}


def _res_stack(sd, root: str, n_layers: int) -> dict:
    out = {}
    for i in range(n_layers):
        blk = f"{root}._residual_stack._layers.{i}._block"
        out[f"res{i}_conv3"] = _conv(sd, f"{blk}.1", bias=False)
        out[f"res{i}_conv1"] = _conv(sd, f"{blk}.3", bias=False)
    return out


def lavae_params_from_state_dict(sd: dict, num_residual_layers: int = 2,
                                 prefix: str = "") -> dict:
    """Map reference vqvae/myvqvae state_dict -> LAVAE params. ``prefix``
    handles grafted keys (e.g. 'encoder.' inside a denoiser state_dict
    only yields the encoder half)."""
    def has(k):
        return f"{prefix}{k}" in sd

    s = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    p = {}
    if has("encoder._conv_1.weight"):
        enc = {f"conv{j}": _conv(s, f"encoder._conv_{j}")
               for j in (1, 2, 3)}
        enc["pre_vq"] = _conv(s, "encoder._pre_vq_conv")
        enc["res_stack"] = _res_stack(s, "encoder", num_residual_layers)
        p["encoder"] = enc
    if has("decoder._conv_1.weight"):
        dec = {"conv1": _conv(s, "decoder._conv_1"),
               "convt1": _conv(s, "decoder._conv_trans_1"),
               "convt2": _conv(s, "decoder._conv_trans_2"),
               "res_stack": _res_stack(s, "decoder", num_residual_layers)}
        p["decoder"] = dec
    if not p:
        raise ValueError("no vqvae keys found "
                         f"(prefix={prefix!r}, keys={sorted(sd)[:8]}...)")
    return {"params": p}


# -------------------------------------------------------------------- CLI

def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--kind", choices=("dit", "mlp", "vae"), required=True)
    ap.add_argument("--input", required=True, help="reference .pth")
    ap.add_argument("--output", required=True, help="Orbax output dir")
    ap.add_argument("--name", default="final_model")
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--num_residual_layers", type=int, default=2)
    args = ap.parse_args(argv)

    sd = load_torch_file(args.input)
    if args.kind == "dit":
        params = dit_params_from_state_dict(sd, args.depth or 4)
    elif args.kind == "mlp":
        params = mlp_params_from_state_dict(sd, args.depth or 8)
    else:
        params = lavae_params_from_state_dict(sd, args.num_residual_layers)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))     # repo root, cwd-independent
    from t2ms_tpu.training.checkpoints import save_params
    path = save_params(args.output, params, args.name)
    n = sum(v.size for v in _leaves(params))
    print(f"imported {args.kind} ({n} params) -> {path}")
    return path


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
