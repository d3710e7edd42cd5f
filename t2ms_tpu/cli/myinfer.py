"""Motion-track (T2MS) inference CLI.

Reference: myinfer.py — per-batch live re-embedding through OpenAI
(:24-46,162; here a pluggable embedder with offline default), conv-VAE +
DiT(flow_dim) CFG loop (one lax.scan here), per-sample MSE (:205-207),
per-sample JSON + rear/top skeleton GIFs (save_result :102-111), stop
after batch 10 (:218-219), side-by-side panels + PCA/t-SNE (:221-222).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from t2ms_tpu.cli._common import build_denoiser, build_motion_vae
from t2ms_tpu.config import (denoiser_ckpt_dir, generation_dir, get_cfg,
                             motion_pretrained_dir)
from t2ms_tpu.data.embedder import get_embedder
from t2ms_tpu.data.provider import motion_loader_provider
from t2ms_tpu.evaluate import calculate_mse, normalize_per_row
from t2ms_tpu.sampling import make_cfg_sampler
from t2ms_tpu.training import checkpoints as ckpt
from t2ms_tpu.utils.prng import root_key, step_key
from t2ms_tpu.visualize.benchpress import (RearV_BenchpressAnimator,
                                           TopV_BenchpressAnimator)
from t2ms_tpu.visualize.diagnostics import (plot_pca_tsne,
                                            plot_side_by_side_comparison)


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Inference flow matching model")
    p.add_argument("--config", type=str, default="config.yaml")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--save_path", type=str,
                   default="./results/denoiser_results")
    p.add_argument("--cfg_scale", type=float, default=3)
    p.add_argument("--total_step", type=int, default=100)
    p.add_argument("--solver", type=str, default="euler",
                   choices=["euler", "heun", "midpoint", "ddim"],
                   help="integrator; euler = reference parity, "
                        "heun/midpoint order-2 flow, ddim = few-step "
                        "deterministic DDPM (see cli.infer)")
    p.add_argument("--sample_steps", type=int, default=0,
                   help="ddim only: sampling steps over the --total_step "
                        "schedule (0 = total_step)")
    p.add_argument("--checkpoint_id", type=int, default=2500)
    p.add_argument("--use_ema", type=lambda s: s not in ("0", "False"),
                   default=False,
                   help="sample from the EMA shadow (model_{id}_ema) "
                        "saved by cli.mytrain --ema_decay")
    p.add_argument("--dataset_name", type=str,
                   choices=["deadlift", "benchpress"], default="benchpress")
    p.add_argument("--run_time", type=int, default=1)
    p.add_argument("--embedder", type=str, default="precomputed",
                   choices=["precomputed", "fake", "openai"],
                   help="live text embedding provider (reference uses "
                        "openai; precomputed = offline dataset embeddings)")
    p.add_argument("--max_batches", type=int, default=10,
                   help="LAST batch index processed (inclusive, so N+1 "
                        "batches) — reproduces the reference's "
                        "'if batch == 10: break' AFTER processing "
                        "(myinfer.py:218-219); 0 = no cap. NOTE the "
                        "default thus writes sample_0..sample_10 while "
                        "myevaluation's --n_samples default reads only "
                        "sample_0..9, exactly like the reference pair")
    p.add_argument("--render_gifs", type=lambda s: s not in ("0", "False"),
                   default=True)
    p.add_argument("--compute_dtype", type=str, default="f32",
                   choices=["f32", "float32", "bf16", "bfloat16"],
                   help="denoiser activation dtype; bf16 is the measured "
                        "TPU serving config (BASELINE.md)")
    args = p.parse_args(argv)
    args = get_cfg(args)
    args.pretrainedvae_path = os.path.join(
        motion_pretrained_dir(args.split_base_num, args.dataset_name,
                              args.pretrained_epc), "final_model")
    args.checkpoint_path = os.path.join(
        denoiser_ckpt_dir(args.save_path, args.backbone, args.denoiser,
                          args.dataset_name, args.caption,
                          args.pretrained_epc),
        f"model_{args.checkpoint_id}")
    args.generation_save_path = generation_dir(
        args.save_path, args.backbone, args.denoiser, args.dataset_name,
        args.cfg_scale, args.total_step)
    return args


def save_result(root: str, features: dict, render_gifs: bool = True):
    """Per-sample artifact dump (reference save_result :102-111)."""
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "data.json"), "w") as f:
        json.dump(features, f, indent=4)
    if render_gifs:
        try:
            RearV_BenchpressAnimator(features).animate(
                os.path.join(root, "rear.gif"))
            TopV_BenchpressAnimator(features).animate(
                os.path.join(root, "top.gif"))
        except KeyError as e:
            print(f"skipping skeleton GIFs (missing feature {e})")


def _build_ctx(args):
    """Everything reusable across runs — loader, models, params, the
    per-length jitted samplers. --run_time 10 previously rebuilt and
    re-jitted every length bucket per run (minutes-scale compiles
    through the tunnel, CLAUDE.md); cli/infer.py uses the same pattern."""
    _, test_batcher = motion_loader_provider(args, "test")

    vae = build_motion_vae(args)
    probe = jnp.zeros((2, args.input_dim, args.split_base_num * 2))
    vae_params = vae.init(jax.random.key(0), probe)
    if os.path.exists(args.pretrainedvae_path):
        vae_params = ckpt.load_params(args.pretrainedvae_path, vae_params)
    else:
        print(f"WARNING: no pretrained VAE at {args.pretrainedvae_path}; "
              "using the deterministic random init (outputs are "
              "meaningless if a trained VAE was expected)")

    from t2ms_tpu.training.scaling import parse_dtype
    denoiser = build_denoiser(args.denoiser, latent_len=args.flow_dim,
                              latent_dim=args.embedding_dim,
                              compute_dtype=parse_dtype(
                                  getattr(args, "compute_dtype", "f32")))
    z, _ = vae.apply(vae_params, probe, method=vae.encode)
    d_params = denoiser.init(jax.random.key(1), z, jnp.zeros(2),
                             jnp.zeros((2, 128)))
    if os.path.exists(args.checkpoint_path):
        d_params = ckpt.load_train_ckpt(args.checkpoint_path, d_params,
                                        None)["params"]
    else:
        print(f"WARNING: no checkpoint at {args.checkpoint_path}; "
              "sampling from random weights")

    if getattr(args, "use_ema", False):
        from t2ms_tpu.training.ema import load_ema_for_inference
        d_params = load_ema_for_inference(args.checkpoint_path, d_params)

    embedder = (get_embedder(args.embedder)
                if args.embedder != "precomputed" else None)
    return dict(test_batcher=test_batcher, vae=vae, vae_params=vae_params,
                denoiser=denoiser, d_params=d_params, embedder=embedder,
                samplers={})


def infer(args, run_dir: str, seed_offset: int = 0, ctx=None):
    os.makedirs(run_dir, exist_ok=True)
    print(f"Inference config::Step: {args.total_step}\t"
          f"CFG Scale: {args.cfg_scale}")
    ctx = ctx if ctx is not None else _build_ctx(args)
    test_batcher, embedder = ctx["test_batcher"], ctx["embedder"]
    vae, vae_params = ctx["vae"], ctx["vae_params"]
    denoiser, d_params = ctx["denoiser"], ctx["d_params"]
    samplers = ctx["samplers"]
    key = root_key(args.general_seed + seed_offset)

    x1s, xts, mses, subjects = [], [], [], []
    feature_names = args.features[-args.input_dim:]
    for b, batch in enumerate(test_batcher.epoch(0)):
        if args.max_batches and b > args.max_batches:
            break
        print(f"Generating {b}th Batch TS...")
        length = batch.x.shape[-1]
        if length not in samplers:
            samplers[length] = make_cfg_sampler(
                denoiser, vae, args.backbone, args.total_step,
                args.cfg_scale, out_length=length,
                solver=getattr(args, "solver", "euler"),
                sample_steps=getattr(args, "sample_steps", 0) or None)
        emb = (embedder.embed(batch.texts) if embedder is not None
               else batch.embedding)
        out = samplers[length](d_params, vae_params, step_key(key, b),
                               jnp.asarray(batch.x), jnp.asarray(emb))
        x1 = np.asarray(batch.x)
        xt = np.asarray(out.series)
        for i in range(len(x1)):
            mse = calculate_mse(normalize_per_row(x1[i])[None],
                                normalize_per_row(xt[i])[None])
            mses.append(mse)
            x1s.append(x1[i])
            xts.append(xt[i])
            subjects.append(batch.subjects[i] if batch.subjects else "?")
        print(f"Batch {b} MSE: {mses[-1]}")
        features = {name: xt[0][j].astype(float).tolist()
                    for j, name in enumerate(feature_names)}
        sample_dir = os.path.join(run_dir, f"sample_{b}")
        save_result(sample_dir, features,
                    args.render_gifs and args.dataset_name == "benchpress")
        np.save(os.path.join(sample_dir, "x_t.npy"), xt)
        np.save(os.path.join(run_dir, f"x_t_sample_{b}.npy"), xt[0])
        np.save(os.path.join(os.path.dirname(run_dir),
                             f"x_1_sample_{b}.npy"), x1[0])

    plot_side_by_side_comparison(x1s, xts, mses, subjects, run_dir,
                                 feature_names)
    plot_pca_tsne(x1s, xts, run_dir)
    return x1s


def main(argv=None):
    args = get_args(argv)
    x_1_list = None
    ctx = _build_ctx(args)      # one loader + one jitted sampler per length
    for i in range(args.run_time):
        run_dir = os.path.join(args.generation_save_path, f"run_{i}")
        x_1_list = infer(args, run_dir, i, ctx=ctx)
    if x_1_list and args.render_gifs and args.dataset_name == "benchpress":
        feature_names = args.features[-args.input_dim:]
        last_dir = os.path.join(args.generation_save_path,
                                f"run_{args.run_time - 1}")
        for b, x1 in enumerate(x_1_list[:3]):
            features = {n: x1[j].astype(float).tolist()
                        for j, n in enumerate(feature_names)}
            RearV_BenchpressAnimator(features).animate(
                os.path.join(last_dir, f"rear_{b}.gif"))
            TopV_BenchpressAnimator(features).animate(
                os.path.join(last_dir, f"top_{b}.gif"))


if __name__ == "__main__":
    main()
