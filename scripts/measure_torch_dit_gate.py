"""Like-for-like torch measurement of the reference DiT on the quality-gate
task (VERDICT r4 #2): prove the flagship's TRAINING DYNAMICS match the
reference, the way scripts/measure_torch_mlp_gate.py proved the MLP's.

The forward is already pinned by weight-transplant goldens
(tests/test_dit_torch_parity.py); what has never been measured is a torch
DiT TRAINED from scratch with the reference recipe on the identical gate.
This script trains the clean-room TorchDiT (measure_torch_baseline.py —
reference transformer.py:94-204 architecture) with the reference init
(transformer.py:196-204: xavier_uniform on every nn.Linear + zero bias,
adaLN zeroed; the patchify conv keeps torch's default init — _basic_init
touches only nn.Linear) and the reference train recipe (train.py:37-38,
80-87: AdamW lr 1e-4 wd 0.0 + OneCycleLR, batch-level CFG drop 0.3,
rectified flow t = round(rand*T)/T, target x1 - x0), on the SAME gate as
scripts/quality_gate.py: identical per-call-seeded corpus, same-recipe
LA-VAE latents, the reference CFG sampling loop (infer.py:65-110), the
same MSE/C-FID scoring.

Partner run (the t2ms_tpu side of the table):
    python scripts/quality_gate.py --steps <N> --batch 64 --f32 \
        --eval_cfid --cfg_scale 3.0
Both corpora are bit-identical by construction (per-call seeds).

Default batch is 64, not the gate's 256: the torch arm runs on this
host's single CPU core at ~25 s/step at batch 256 (measured) vs ~6.5 at
64 — the reference recipe is batch-size-agnostic and BOTH arms use the
same batch, so the comparison stays like-for-like.

Prints one JSON line; record the result in BASELINE.md.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_batch(key_i, n, T=96, n_classes=8):
    """EXACTLY quality_gate.py's univariate generator (per-call seeded so
    torch/jax arms and any --steps are comparable)."""
    rng = np.random.default_rng((7, key_i, T))
    tt = np.linspace(0, 1, T)
    cls = rng.integers(0, n_classes, n)
    freqs = 1.0 + cls * 0.5
    phase = (cls * 0.7)[:, None]
    x = np.sin(2 * np.pi * freqs[:, None] * tt[None] + phase)
    x = (x + 1) / 2 + 0.02 * rng.standard_normal((n, T))
    emb = np.zeros((n, 128), np.float32)
    emb[np.arange(n), cls] = 1.0
    return x.astype(np.float32), emb


def _load_torch_dit():
    spec = importlib.util.spec_from_file_location(
        "torch_baseline",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "measure_torch_baseline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.TorchDiT


def reference_init(model):
    """transformer.py:196-204: xavier_uniform + zero bias on every
    nn.Linear, then zero the adaLN projection. The patchify conv
    (TorchDiT.patch, the linear equivalent of the reference's Conv2d —
    identical default init, same fan_in) is NOT re-initialized."""
    import torch
    import torch.nn as nn

    for name, m in model.named_modules():
        if isinstance(m, nn.Linear) and name != "patch":
            nn.init.xavier_uniform_(m.weight)
            if m.bias is not None:
                nn.init.constant_(m.bias, 0)
    for blk in model.blocks:
        nn.init.constant_(blk.mod.weight, 0)
        nn.init.constant_(blk.mod.bias, 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--vae_steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cfg_scale", type=float, default=3.0)
    ap.add_argument("--sample_steps", type=int, default=100)
    ap.add_argument("--eval_cfid", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from t2ms_tpu.models.vae import LAVAE
    from t2ms_tpu.training.optim import warmup_cosine_adamw
    from t2ms_tpu.training.trainer import TrainState, make_vae_train_step
    from t2ms_tpu.evaluate import calculate_mse

    torch.manual_seed(0)
    T = 96
    B = args.batch

    # --- identical VAE pretrain (quality_gate recipe, same keys) ---
    vae = LAVAE(in_channels=1, latent_grid=30)
    x0, _ = make_batch(0, B)
    vp = vae.init(jax.random.key(0), jnp.asarray(x0))
    opt_v = warmup_cosine_adamw(1e-3, warmup_steps=100, cosine_period=600)
    sv = TrainState(vp, opt_v.init(vp), jnp.zeros((), jnp.int32))
    vstep = make_vae_train_step(vae, opt_v)
    for i in range(args.vae_steps):
        x, _ = make_batch(i, B)
        sv, (vloss, recon_err) = vstep(sv, jnp.asarray(x))
    vp = sv.params
    print(f"VAE recon error: {float(recon_err):.5f}", file=sys.stderr)

    encode = jax.jit(lambda x: vae.apply(vp, x, method=vae.encode)[0])
    decode = jax.jit(lambda z: vae.apply(vp, z, T, method=vae.decode)[0])

    # --- torch reference-DiT training (train.py:37-38,80-87 recipe) ---
    TorchDiT = _load_torch_dit()
    model = TorchDiT(H=30, W=64, d=128, depth=4)
    reference_init(model)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=0.0)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=1e-4, total_steps=args.steps)
    t0 = time.time()
    for i in range(args.steps):
        x, e = make_batch(1000 + i, B)
        z = torch.tensor(np.asarray(encode(jnp.asarray(x))))   # (B, 64, 30)
        t = torch.round(torch.rand(z.shape[0]) * args.sample_steps) \
            / args.sample_steps
        noise = torch.randn_like(z)
        x_t = t[:, None, None] * z + (1 - t[:, None, None]) * noise
        target = z - noise
        # batch-level CFG drop, p=0.3 (train.py:81-83)
        text = None if bool(torch.rand(1) < 0.3) else torch.tensor(e)
        pred = model(x_t, t, text)
        loss = torch.mean((pred - target) ** 2)
        opt.zero_grad(); loss.backward(); opt.step(); sched.step()
        if i % 100 == 0:
            print(f"torch DiT step {i}: loss {loss.item():.4f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
    final_loss = loss.item()

    # --- reference CFG sampling loop (infer.py:65-110, euler) ---
    n_eval = 128
    x_gt, e_gt = make_batch(99999 + T, n_eval)      # quality_gate eval key
    z_shape = np.asarray(encode(jnp.asarray(x_gt[:2]))).shape[1:]
    model.eval()
    with torch.no_grad():
        x_t = torch.randn((n_eval,) + z_shape)
        text = torch.tensor(e_gt)
        for j in range(args.sample_steps):
            t = torch.full((n_eval,), j / args.sample_steps)
            uncond = model(x_t, t, None)
            cond = model(x_t, t, text)
            pred = uncond + args.cfg_scale * (cond - uncond)
            x_t = x_t + pred / args.sample_steps
    gen = np.asarray(decode(jnp.asarray(x_t.numpy())))

    ntd_gt = x_gt[:, :, None]
    ntd_gen = gen[:, :, None]
    mse = calculate_mse(ntd_gt, ntd_gen)
    noise_floor = calculate_mse(
        ntd_gt, np.random.default_rng((8, T)).uniform(0, 1, ntd_gen.shape))
    res = {
        "torch_dit_final_train_loss": round(final_loss, 4),
        "torch_dit_MSE": round(float(mse), 4),
        "MSE_noise_floor": round(float(noise_floor), 4),
        "steps": args.steps, "cfg_scale": args.cfg_scale,
        "train_seconds": round(time.time() - t0, 1),
    }
    if args.eval_cfid:
        from t2ms_tpu.evaluate import calculate_fid, initialize_ts2vec
        m = initialize_ts2vec(ntd_gt.astype(np.float32), None)
        r1 = m.encode(ntd_gt.astype(np.float32),
                      encoding_window="full_series")
        r2 = m.encode(ntd_gen.astype(np.float32),
                      encoding_window="full_series")
        res["torch_dit_C-FID"] = round(float(calculate_fid(r1, r2)), 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
