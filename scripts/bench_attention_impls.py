"""Compare sampler throughput across attention impls at the serving
op-point (flagship bench.py stack). Whole-program timing only: per-dispatch
tunnel latency makes micro-benchmarks meaningless (CLAUDE.md).

Usage: python scripts/bench_attention_impls.py [impl ...]
  impl in {einsum, packed2, packed4, packed8, packed16}
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run(impl: str) -> float:
    from t2ms_tpu.models.denoisers import DiT
    from t2ms_tpu.models.vae import LAVAE
    from t2ms_tpu.ops import attention as A
    from t2ms_tpu.sampling import make_cfg_sampler

    base = impl
    if impl.startswith("packed") and impl != "packed":
        pack = int(impl[len("packed"):])
        A.packed_attention = functools.partial(
            packed_attention_orig, pack=pack)
        base = "packed"
    elif impl == "identity":
        # floor measurement: attention replaced by y=v — everything else
        # (qkv proj, head reshapes, out proj, MLP, adaLN, VAE, scan) intact
        A.einsum_attention = lambda q, k, v, scale=None: v
        base = "einsum"

    B, total_step, out_len = 256, 100, 96
    dit = DiT(latent_len=30, latent_dim=64, compute_dtype=jnp.bfloat16,
              attention_impl=base)
    vae = LAVAE(in_channels=1, latent_grid=30)
    x = jax.random.normal(jax.random.key(0), (B, out_len))
    emb = jax.random.normal(jax.random.key(1), (B, 128))
    vae_params = vae.init(jax.random.key(2), x)
    z, _ = vae.apply(vae_params, x, method=vae.encode)
    d_params = dit.init(jax.random.key(3), z, jnp.zeros(B), emb)
    sampler = make_cfg_sampler(dit, vae, "flowmatching",
                               total_step=total_step, cfg_scale=7.0,
                               out_length=out_len)
    out = sampler(d_params, vae_params, jax.random.key(4), x, emb)
    np.asarray(out.series)    # sync: block_until_ready lies via the tunnel
    # Sustained throughput: dispatch all runs, sync once at the end
    # (per-run transfers measure tunnel latency, not the chip).
    runs = 3
    t0 = time.perf_counter()
    outs = [sampler(d_params, vae_params, jax.random.key(5 + i), x, emb)
            for i in range(runs)]
    for o in outs:
        np.asarray(o.series)
    tput = B * runs / (time.perf_counter() - t0)
    A.packed_attention = packed_attention_orig
    A.einsum_attention = einsum_attention_orig
    return tput


if __name__ == "__main__":
    from t2ms_tpu.ops import attention as A
    packed_attention_orig = A.packed_attention
    einsum_attention_orig = A.einsum_attention
    impls = sys.argv[1:] or ["einsum", "packed2", "packed4", "packed8"]
    for impl in impls:
        print(f"{impl}: {run(impl):.2f} series/s", flush=True)
