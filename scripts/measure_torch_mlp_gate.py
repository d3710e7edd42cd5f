"""Like-for-like torch measurement of the reference MLP denoiser on the
quality-gate task (VERDICT r1 #3): is the MLP's failure ours, or inherent
to the reference architecture?

Clean-room torch implementation of the reference MLP (mlp.py:49-94:
8 layers of time-add -> cross-attn over 6 tokens -> LayerNorm -> MLP ->
per-feature mlp2; dead modules norm1/norm3/pos_emb/self_attn omitted — they
do not contribute to forward), trained with the reference recipe
(train.py:37-38: AdamW lr 1e-4 + OneCycleLR, batch-level CFG drop 0.3,
rectified-flow objective) on the SAME gate: identical synthetic sine
corpus, identical trained LA-VAE latents (encoded with JAX on the fly),
identical reference CFG sampling loop (infer.py:65-110), decoded by the
same VAE, scored with the same MSE.

Prints one JSON line; record the result in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corpus_fn(track_T=96, n_classes=8):
    rng = np.random.default_rng(0)
    tt = np.linspace(0, 1, track_T)

    def make_batch(n):
        cls = rng.integers(0, n_classes, n)
        freqs = 1.0 + cls * 0.5
        phase = (cls * 0.7)[:, None]
        x = np.sin(2 * np.pi * freqs[:, None] * tt[None] + phase)
        x = (x + 1) / 2 + 0.02 * rng.standard_normal((n, track_T))
        emb = np.zeros((n, 128), np.float32)
        emb[np.arange(n), cls] = 1.0
        return x.astype(np.float32), emb

    return make_batch, rng


def build_torch_mlp(latent_len=6, dim=64, cond=128, depth=8, heads=4):
    import torch
    import torch.nn as nn

    class TimeEmb(nn.Module):
        def forward(self, t):
            t = t * 100.0
            freqs = torch.pow(10000, torch.linspace(0, 1, dim // 2))
            ang = t.unsqueeze(-1) / freqs
            return torch.cat([ang.sin(), ang.cos()], -1)

    class CrossAttn(nn.Module):
        def __init__(self):
            super().__init__()
            self.key = nn.Linear(cond, dim)
            self.query = nn.Linear(dim, dim)
            self.value = nn.Linear(cond, dim)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x, enc):
            B, T, _ = x.shape
            TE = enc.shape[1]
            hd = dim // heads
            k = self.key(enc).view(B, TE, heads, hd).transpose(1, 2)
            q = self.query(x).view(B, T, heads, hd).transpose(1, 2)
            v = self.value(enc).view(B, TE, heads, hd).transpose(1, 2)
            att = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
            att = att.softmax(-1)
            y = (att @ v).transpose(1, 2).reshape(B, T, dim)
            return self.proj(y)

    class Layer(nn.Module):
        def __init__(self):
            super().__init__()
            self.time_emb = TimeEmb()
            self.norm2 = nn.LayerNorm(dim)
            self.cross_attn = CrossAttn()
            self.mlp = nn.Sequential(nn.Linear(dim, 256), nn.ReLU(),
                                     nn.Linear(256, dim))
            self.mlp2 = nn.Sequential(nn.Linear(latent_len, 256), nn.ReLU(),
                                      nn.Linear(256, latent_len))

        def forward(self, x, t, text):
            te = self.time_emb(t).unsqueeze(-1)
            x = (x + te).permute(0, 2, 1)
            if text is not None:
                enc = text.unsqueeze(1).repeat(1, latent_len, 1)
                x = x + self.cross_attn(x, enc)
            x = self.norm2(x)
            x = x + self.mlp(x)
            return self.mlp2(x.permute(0, 2, 1))

    class MLP(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.ModuleList([Layer() for _ in range(depth)])

        def forward(self, x, t, text):
            for l in self.layers:
                x = l(x, t, text)
            return x

    return MLP()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--vae_steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--latent_grid", type=int, default=6)
    ap.add_argument("--cfg_scale", type=float, default=3.0)
    ap.add_argument("--sample_steps", type=int, default=100)
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
    make_batch, rng = make_corpus_fn(T)

    # --- identical VAE pretrain (gate recipe) ---
    vae = LAVAE(in_channels=1, latent_grid=args.latent_grid)
    x0, e0 = make_batch(args.batch)
    vp = vae.init(jax.random.key(0), jnp.asarray(x0))
    opt_v = warmup_cosine_adamw(1e-3, warmup_steps=100, cosine_period=600)
    sv = TrainState(vp, opt_v.init(vp), jnp.zeros((), jnp.int32))
    vstep = make_vae_train_step(vae, opt_v)
    for i in range(args.vae_steps):
        x, _ = make_batch(args.batch)
        sv, (vloss, recon_err) = vstep(sv, jnp.asarray(x))
    vp = sv.params
    print(f"VAE recon error: {float(recon_err):.5f}", file=sys.stderr)

    encode = jax.jit(lambda x: vae.apply(vp, x, method=vae.encode)[0])
    decode = jax.jit(lambda z: vae.apply(vp, z, T, method=vae.decode)[0])

    # --- torch reference-MLP training on the identical objective ---
    model = build_torch_mlp(latent_len=args.latent_grid)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=0.0)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=1e-4, total_steps=args.steps)
    t0 = time.time()
    for i in range(args.steps):
        x, e = make_batch(args.batch)
        z = torch.tensor(np.asarray(encode(jnp.asarray(x))))   # (B, 64, L)
        t = torch.round(torch.rand(z.shape[0]) * args.sample_steps) \
            / args.sample_steps
        noise = torch.randn_like(z)
        x_t = t[:, None, None] * z + (1 - t[:, None, None]) * noise
        target = z - noise
        text = None if np.random.default_rng(10_000 + i).uniform() < 0.3 \
            else torch.tensor(e)
        pred = model(x_t, t, text)
        loss = torch.mean((pred - target) ** 2)
        opt.zero_grad(); loss.backward(); opt.step(); sched.step()
        if i % 100 == 0:
            print(f"torch MLP step {i}: loss {loss.item():.4f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
    final_loss = loss.item()

    # --- reference CFG sampling loop (infer.py:65-110) ---
    n_eval = 128
    x_gt, e_gt = make_batch(n_eval)
    z_shape = np.asarray(encode(jnp.asarray(x_gt))).shape
    with torch.no_grad():
        x_t = torch.randn(z_shape)
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
    noise_floor = calculate_mse(ntd_gt, rng.uniform(0, 1, ntd_gen.shape))
    print(json.dumps({
        "torch_mlp_final_train_loss": round(final_loss, 4),
        "torch_mlp_MSE": round(float(mse), 4),
        "MSE_noise_floor": round(float(noise_floor), 4),
        "steps": args.steps, "latent_grid": args.latent_grid,
    }))


if __name__ == "__main__":
    main()
