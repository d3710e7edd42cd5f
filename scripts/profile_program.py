"""Profile a compiled t2ms_tpu program THROUGH the axon tunnel and print
the top device ops, with XLA `fusion.N` names mapped back to source ops.

Recipe (hard-won, see CLAUDE.md): jax.profiler.start_trace + run + host
transfer (block_until_ready does not block through the tunnel) +
stop_trace; sum `dur` of ph=="X" events in the profile's *.trace.json.gz;
then map fusion names via the compiled HLO's metadata.op_name.

Usage:
  python scripts/profile_program.py --what train [--batch 1024]
  python scripts/profile_program.py --what sample [--batch 256] [--steps 20]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_train(batch, scaled=False, precoded=False):
    import optax

    from t2ms_tpu.models.denoisers import DiT
    from t2ms_tpu.models.vae import LAVAE
    from t2ms_tpu.training.trainer import TrainState, make_denoiser_train_step

    if scaled:
        # the 56.7M-param compute-ceiling geometry of bench_scaled.py
        dit = DiT(latent_len=64, latent_dim=64, d_model=512, depth=12,
                  num_heads=8, mlp_ratio=4.0, compute_dtype=jnp.bfloat16)
        vae = LAVAE(in_channels=1, latent_grid=64)
    else:
        dit = DiT(latent_len=30, latent_dim=64, compute_dtype=jnp.bfloat16)
        vae = LAVAE(in_channels=1, latent_grid=30)
    x = jax.random.normal(jax.random.key(0), (batch, 96))
    emb = jax.random.normal(jax.random.key(1),
                            (batch, 512 if scaled else 128))
    vp = vae.init(jax.random.key(2), x[:2])
    z, _ = vae.apply(vp, x[:2], method=vae.encode)
    dp = dit.init(jax.random.key(3), z, jnp.zeros(2), emb[:2])
    opt = optax.adamw(1e-4)
    st = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
    step = make_denoiser_train_step(dit, vae, opt, "flowmatching", 100,
                                    donate=False, precoded=precoded)
    if precoded:
        # the latent-cache methodology (bench_scaled default): x is
        # already the frozen-VAE latent
        x, _ = vae.apply(vp, x, method=vae.encode)

    def run(n):
        nonlocal st
        out = None
        for i in range(n):
            st, out = step(st, vp, jax.random.key(10 + i), x, emb)
        np.asarray(out)

    lowered = jax.jit(lambda s, k: step(s, vp, k, x, emb)).lower(
        st, jax.random.key(0))
    return run, lowered


def build_sample(batch, steps, scaled=False):
    from t2ms_tpu.models.denoisers import DiT
    from t2ms_tpu.models.vae import LAVAE
    from t2ms_tpu.sampling import make_cfg_sampler

    if scaled:
        # the 56.7M-param compute-ceiling geometry of bench_scaled.py
        dit = DiT(latent_len=64, latent_dim=64, d_model=512, depth=12,
                  num_heads=8, mlp_ratio=4.0, compute_dtype=jnp.bfloat16)
        vae = LAVAE(in_channels=1, latent_grid=64)
    else:
        dit = DiT(latent_len=30, latent_dim=64, compute_dtype=jnp.bfloat16)
        vae = LAVAE(in_channels=1, latent_grid=30)
    x = jax.random.normal(jax.random.key(0), (batch, 96))
    emb = jax.random.normal(jax.random.key(1),
                            (batch, 512 if scaled else 128))
    vp = vae.init(jax.random.key(2), x)
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(3), z, jnp.zeros(batch), emb)
    sampler = make_cfg_sampler(dit, vae, "flowmatching", total_step=steps,
                               cfg_scale=7.0, out_length=96)

    def run(n):
        out = None
        for i in range(n):
            out = sampler(dp, vp, jax.random.key(5 + i), x, emb)
        np.asarray(out.series)

    lowered = jax.jit(lambda k: sampler(dp, vp, k, x, emb)).lower(
        jax.random.key(0))
    return run, lowered


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="train", choices=["train", "sample"])
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--scaled", action="store_true",
                    help="56.7M-param geometry (d=512, depth 12, heads 8, "
                         "mlp x4; default batch 64) instead of reference")
    ap.add_argument("--precoded", action="store_true",
                    help="train: profile the latent-cache step (x already "
                         "encoded, the bench_scaled/CLI default) instead "
                         "of the encode-in-step path")
    args = ap.parse_args()

    if args.what == "train":
        run, lowered = build_train(args.batch or (64 if args.scaled
                                                  else 1024), args.scaled,
                                   args.precoded)
    else:
        run, lowered = build_sample(args.batch or (16 if args.scaled
                                                   else 256),
                                    args.steps, args.scaled)

    run(1)  # compile + warmup
    tmp = tempfile.mkdtemp(prefix="t2ms_prof_")
    jax.profiler.start_trace(tmp)
    run(args.reps)
    jax.profiler.stop_trace()

    # fusion name -> source op mapping from the compiled HLO
    hlo = lowered.compile().as_text()
    op_src = {}
    for m in re.finditer(
            r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=.*?metadata=\{([^}]*)\}",
            hlo, re.M):
        name, meta = m.group(1), m.group(2)
        om = re.search(r'op_name="([^"]*)"', meta)
        if om:
            op_src.setdefault(name.split(".")[0] + "." +
                              name.split(".")[-1] if "." in name else name,
                              om.group(1))
            op_src.setdefault(name, om.group(1))

    durs = collections.Counter()
    counts = collections.Counter()
    for path in glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                          recursive=True):
        with gzip.open(path, "rt") as f:
            trace = json.load(f)
        events = trace.get("traceEvents", [])
        # keep DEVICE tracks only: host rows (np.asarray, profiler glue,
        # python frames) previously drowned the per-fusion breakdown.
        # pid -> process_name from the metadata events; fall back to all
        # events if no device-named process exists (robust across plugin
        # trace layouts).
        pname = {}
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pname[ev.get("pid")] = str(
                    ev.get("args", {}).get("name", ""))
        dev_pids = {p for p, n in pname.items()
                    if re.search(r"tpu|device|/vm", n, re.I)}
        for ev in events:
            if ev.get("ph") == "X" and "dur" in ev and (
                    not dev_pids or ev.get("pid") in dev_pids):
                durs[ev["name"]] += ev["dur"]
                counts[ev["name"]] += 1

    total = sum(durs.values())
    print(f"# total device-op time {total/1e3:.2f} ms over {args.reps} reps "
          f"({args.what}, trace in {tmp})")
    for name, d in durs.most_common(args.top):
        src = op_src.get(name, "")
        print(f"{d/1e3/args.reps:9.3f} ms  x{counts[name]//max(args.reps,1):<5}"
              f" {name[:60]:62s} {src[:70]}")

    # second view: aggregate by SOURCE OP (the metadata op_name path
    # tail), so the many small fusions stop hiding their common causes —
    # the serialized top list alone misattributed two round-4 levers
    # (mod_ln 21.5%, latent cache 17.6 ms; see BASELINE.md)
    by_src = collections.Counter()
    src_n = collections.Counter()
    for name, d in durs.items():
        src = op_src.get(name, "")
        key = ("/".join(src.split("/")[-2:]) if src
               else re.sub(r"[.\d]+$", "", name) or name)
        by_src[key] += d
        src_n[key] += counts[name]
    print(f"# by source op (top {args.top})")
    for key, d in by_src.most_common(args.top):
        print(f"{d/1e3/args.reps:9.3f} ms  x{src_n[key]//max(args.reps,1):<5}"
              f" {key[:120]}")


if __name__ == "__main__":
    main()
