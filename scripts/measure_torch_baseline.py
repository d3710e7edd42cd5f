"""Measure the torch reference-equivalent sampling throughput on this host.

The reference repo can't be executed directly here (its DiT imports timm,
which is not installed, and it needs downloaded checkpoints/data), so this
is a clean-room torch implementation of the *same* serving computation at
the same scale: a 4-block adaLN DiT (d=128, 4 heads, mlp x2) over 480
patch tokens + conv LA-VAE decode, driven by the reference's sampling
structure — a Python loop over total_step with TWO forwards per step
(uncond + cond CFG) and an Euler update (infer.py:76-93).

Writes BASELINE_MEASURED.json for bench.py's vs_baseline.

Usage: python scripts/measure_torch_baseline.py [--batch 256 --steps 100]
"""

import argparse
import json
import math
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class AdaLNBlock(nn.Module):
    def __init__(self, d=128, heads=4, mlp_ratio=2.0):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(d, 3 * d)
        self.proj = nn.Linear(d, d)
        self.fc1 = nn.Linear(d, int(d * mlp_ratio))
        self.fc2 = nn.Linear(int(d * mlp_ratio), d)
        self.mod = nn.Linear(d, 6 * d)

    def forward(self, x, c):
        B, N, D = x.shape
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = self.mod(F.silu(c)).chunk(6, -1)
        h = F.layer_norm(x, (D,), eps=1e-6) * (1 + sc_a[:, None]) + sh_a[:, None]
        qkv = self.qkv(h).view(B, N, 3, self.heads, D // self.heads)
        q, k, v = qkv.unbind(2)
        a = F.scaled_dot_product_attention(q.transpose(1, 2),
                                           k.transpose(1, 2),
                                           v.transpose(1, 2))
        x = x + g_a[:, None] * self.proj(
            a.transpose(1, 2).reshape(B, N, D))
        h = F.layer_norm(x, (D,), eps=1e-6) * (1 + sc_m[:, None]) + sh_m[:, None]
        x = x + g_m[:, None] * self.fc2(F.gelu(self.fc1(h), approximate="tanh"))
        return x


class TorchDiT(nn.Module):
    def __init__(self, H=30, W=64, d=128, depth=4):
        super().__init__()
        self.H, self.W, self.d = H, W, d
        self.pc = (H // 2) * (W // 2)
        self.patch = nn.Linear(4, 4)
        self.embed = nn.Linear(4, d)
        self.blocks = nn.ModuleList(AdaLNBlock(d) for _ in range(depth))
        self.ln = nn.LayerNorm(d)       # affine, like reference transformer.py:141
        self.out = nn.Linear(d, 4)
        pos = torch.arange(self.pc).unsqueeze(1)
        div = torch.exp(torch.arange(0, d, 2) * -(math.log(1e4) / d))
        pe = torch.zeros(self.pc, d)
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe)

    def time_emb(self, t):
        freqs = torch.pow(1e4, torch.linspace(0, 1, self.d // 2))
        ang = (t * 100.0).unsqueeze(-1) / freqs
        return torch.cat([ang.sin(), ang.cos()], -1)

    def forward(self, x, t, emb):
        B = x.shape[0]
        H, W = self.H, self.W
        img = x.transpose(1, 2)                       # (B, H, W)
        p = img.view(B, H // 2, 2, W // 2, 2).permute(0, 1, 3, 2, 4)
        p = p.reshape(B, self.pc, 4)
        h = self.embed(self.patch(p)) + self.pe
        c = self.time_emb(t)
        if emb is not None:
            c = c + emb
        for blk in self.blocks:
            h = blk(h, c)
        h = self.out(self.ln(h))
        img = h.view(B, H // 2, W // 2, 2, 2).permute(0, 1, 3, 2, 4)
        return img.reshape(B, H, W).transpose(1, 2)


class TorchDecoder(nn.Module):
    def __init__(self, emb=64, hid=128, res_hid=256, n_res=2):
        super().__init__()
        self.c1 = nn.Conv1d(emb, hid, 3, 1, 1)
        self.res = nn.ModuleList(
            nn.Sequential(nn.ReLU(), nn.Conv1d(hid, res_hid, 3, 1, 1),
                          nn.ReLU(), nn.Conv1d(res_hid, hid, 1))
            for _ in range(n_res))
        self.t1 = nn.ConvTranspose1d(hid, hid // 2, 4, 2, 1)
        self.t2 = nn.ConvTranspose1d(hid // 2, 1, 4, 2, 1)

    def forward(self, z, length):
        x = F.interpolate(z, size=length // 4, mode="linear",
                          align_corners=True)
        x = self.c1(x)
        for r in self.res:
            x = x + r(x)
        x = F.relu(x)
        return self.t2(F.relu(self.t1(x))).squeeze(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cfg_scale", type=float, default=7.0)
    args = ap.parse_args()

    torch.manual_seed(0)
    device = "cuda" if torch.cuda.is_available() else "cpu"
    model = TorchDiT().to(device).eval()
    dec = TorchDecoder().to(device).eval()
    B, steps = args.batch, args.steps
    emb = torch.randn(B, 128, device=device)

    with torch.no_grad():
        # warmup
        x_t = torch.randn(B, 64, 30, device=device)
        t = torch.zeros(B, device=device)
        model(x_t, t, emb)

        t0 = time.perf_counter()
        for r in range(args.runs):
            x_t = torch.randn(B, 64, 30, device=device)
            for j in range(steps):
                t = torch.full((B,), j / steps, device=device)
                pu = model(x_t, t, None)
                pc = model(x_t, t, emb)
                pred = pu + args.cfg_scale * (pc - pu)
                x_t = x_t + pred / steps
            series = dec(x_t, 96)
        if device == "cuda":
            torch.cuda.synchronize()
        dt = time.perf_counter() - t0

    sps = B * args.runs / dt
    out = {
        "torch_sampler_series_per_sec_len96": round(sps, 3),
        "device": device,
        "batch": B,
        "steps": steps,
        "torch_threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
