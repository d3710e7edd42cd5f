"""T2S CFG sampling CLI (the serving path).

Reference: infer.py — flag surface (:127-147), run_multi x10 (:148-164),
per-batch CFG loop -> here one compiled lax.scan sampler, decode at
x_1.shape[-1], .npy outputs {x_1, x_t, x_t_latent_dec_array,
x_t_latent_enc_array} (:112-123), GT-vs-generated figure dump and the
diffusion GIF from batch 0 (:157-198).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from t2ms_tpu.cli._common import build_denoiser, build_t2s_vae
from t2ms_tpu.config import denoiser_ckpt_dir, generation_dir, t2s_pretrained_dir
from t2ms_tpu.data.provider import t2s_loader_provider
from t2ms_tpu.sampling import decode_trajectory, make_cfg_sampler
from t2ms_tpu.training import checkpoints as ckpt
from t2ms_tpu.utils.prng import root_key, step_key
from t2ms_tpu.visualize.diagnostics import (plot_generation_figs,
                                            save_diffusion_gif)


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Inference flow matching model")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--data_root", type=str, default="./Data")
    p.add_argument("--save_path", type=str,
                   default="./results/denoiser_results")
    p.add_argument("--usepretrainedvae", default=True)
    p.add_argument("--backbone", type=str, default="flowmatching")
    p.add_argument("--denoiser", type=str, default="DiT")
    p.add_argument("--cfg_scale", type=float, default=7)
    p.add_argument("--total_step", type=int, default=100)
    p.add_argument("--solver", type=str, default="euler",
                   choices=["euler", "heun", "midpoint", "ddim"],
                   help="integrator. euler = reference parity "
                        "(infer.py:84; flow ODE or DDPM ancestral). "
                        "heun/midpoint (flow only) are order-2 (2 model "
                        "evals/step): matched endpoint error at ~1/4 the "
                        "steps — drop --total_step accordingly. ddim "
                        "(ddpm only) samples deterministically over "
                        "--sample_steps of the total_step schedule")
    p.add_argument("--sample_steps", type=int, default=0,
                   help="ddim only: sampling steps over the --total_step "
                        "training schedule (0 = total_step)")
    p.add_argument("--checkpoint_id", type=int, default=19999)
    p.add_argument("--use_ema", type=lambda s: s not in ("0", "False"),
                   default=False,
                   help="sample from the EMA shadow weights saved by "
                        "cli.train --ema_decay (model_{id}_ema) instead "
                        "of the live weights; errors if absent")
    p.add_argument("--dataset_name", type=str, default="exchangerate_24")
    p.add_argument("--run_multi", type=lambda s: s not in ("0", "False"),
                   default=False)
    p.add_argument("--general_seed", type=int, default=2025)
    p.add_argument("--max_batches", type=int, default=0,
                   help="0 = all test batches")
    p.add_argument("--checkpoint_file", type=str, default="",
                   help="explicit denoiser checkpoint path; a .pth file "
                        "is imported from the reference torch format")
    p.add_argument("--latent_grid", type=int, default=30,
                   help="VAE latent grid length (30 = T2S reference; "
                        "use 6 with imported reference MLP checkpoints)")
    p.add_argument("--vae_file", type=str, default="",
                   help="explicit VAE checkpoint path; a .pth file is "
                        "imported from the reference torch format "
                        "(whole-pickled module or state_dict)")
    p.add_argument("--compute_dtype", type=str, default="f32",
                   choices=["f32", "float32", "bf16", "bfloat16"],
                   help="denoiser activation dtype; bf16 is the measured "
                        "TPU serving config (+46%% throughput, outputs "
                        "correlate >0.999 with f32 — BASELINE.md)")
    args = p.parse_args(argv)
    args.mix_train = False
    model_root = args.dataset_name.split("_")[0]
    args.checkpoint_path = args.checkpoint_file or os.path.join(
        denoiser_ckpt_dir(args.save_path, args.backbone, args.denoiser,
                          model_root),
        f"model_{args.checkpoint_id}")
    args.pretrained_model_path = args.vae_file or os.path.join(
        t2s_pretrained_dir(model_root), "final_model")
    args.generation_save_path = generation_dir(
        args.save_path, args.backbone, args.denoiser, args.dataset_name,
        args.cfg_scale, args.total_step)
    return args


def _load_torch_vae_params(path: str):
    """Reference whole-pickled VAE (.pth) -> LAVAE params
    (infer.py:39-41 torch.load(weights_only=False))."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tools.import_torch_ckpt import (lavae_params_from_state_dict,
                                         load_torch_file)
    return lavae_params_from_state_dict(load_torch_file(path))


def _load_torch_denoiser_params(path: str, kind: str):
    """Reference denoiser checkpoint (.pth, train-loop dict or plain
    state_dict) -> DiT/MLPDenoiser params (infer.py:43-48)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tools.import_torch_ckpt import (dit_params_from_state_dict,
                                         load_torch_file,
                                         mlp_params_from_state_dict)
    sd = load_torch_file(path)
    if kind == "MLP":
        return mlp_params_from_state_dict(sd)
    return dit_params_from_state_dict(sd)


def _build_ctx(args):
    """Everything reusable across runs: loader, models, params, plan.
    run_multi makes 11 infer() calls — rebuilding (and re-jitting)
    per run would pay a full sampler compile through the tunnel each
    time (minutes-scale, CLAUDE.md)."""
    datasets, batcher = t2s_loader_provider(args, "test")
    length = datasets[0].length

    vae = build_t2s_vae(args)
    probe = jnp.zeros((2, length))
    vae_params = vae.init(jax.random.key(0), probe)
    torch_vae = args.pretrained_model_path.endswith(".pth")
    if torch_vae and os.path.exists(args.pretrained_model_path):
        vae_params = _load_torch_vae_params(args.pretrained_model_path)
        print(f"Imported reference VAE from {args.pretrained_model_path}")
    elif os.path.exists(args.pretrained_model_path):
        vae_params = ckpt.load_params(args.pretrained_model_path, vae_params)
    else:
        # the reference crashes on torch.load here (infer.py:39-41). We
        # warn instead of raising: the random init is deterministic
        # (key 0), so a denoiser trained with the same missing-VAE
        # warning in cli.train round-trips coherently — but outputs are
        # meaningless if a trained VAE was expected.
        print(f"WARNING: no pretrained VAE at "
              f"{args.pretrained_model_path}; using the deterministic "
              f"random init (run cli.pretrain_vae or pass --vae_file "
              f"for real outputs)")

    from t2ms_tpu.training.scaling import setup_scaling
    plan = setup_scaling(args, for_training=False)
    if plan.n_data > 1:
        print(f"Serving plan: {plan.describe()}")
    denoiser = build_denoiser(args.denoiser, latent_len=args.latent_grid,
                              latent_dim=64,
                              compute_dtype=plan.compute_dtype)
    z, _ = vae.apply(vae_params, probe, method=vae.encode)
    d_params = denoiser.init(jax.random.key(1), z, jnp.zeros(2),
                             jnp.zeros((2, 128)))
    if args.checkpoint_path.endswith(".pth") and \
            os.path.exists(args.checkpoint_path):
        d_params = _load_torch_denoiser_params(args.checkpoint_path,
                                               args.denoiser)
        if args.denoiser == "MLP":
            # the reference MLP hard-codes its token count (mlp.py:49-85,
            # 6 at reference scale); rebuild at the CHECKPOINT's geometry
            # and insist the VAE latent grid matches — a silent mismatch
            # would crash deep inside the first apply
            ckpt_len = int(d_params["params"]["layer_0"]["mlp2_fc1"]
                           ["kernel"].shape[0])
            if ckpt_len != z.shape[-1]:
                raise ValueError(
                    f"imported reference MLP expects latent length "
                    f"{ckpt_len} but the VAE produces {z.shape[-1]}; pass "
                    f"a VAE with latent_grid={ckpt_len} (--vae_file)")
            denoiser = build_denoiser("MLP", latent_len=ckpt_len,
                                      latent_dim=64)
        print(f"Imported reference denoiser from {args.checkpoint_path}")
    elif os.path.exists(args.checkpoint_path):
        restored = ckpt.load_train_ckpt(args.checkpoint_path, d_params, None)
        d_params = restored["params"]
        print(f"Loaded denoiser from {args.checkpoint_path}")
    else:
        print(f"WARNING: no checkpoint at {args.checkpoint_path}; "
              "sampling from random weights")

    if getattr(args, "use_ema", False):
        from t2ms_tpu.training.ema import load_ema_for_inference
        d_params = load_ema_for_inference(args.checkpoint_path, d_params)

    if plan.n_data > 1:
        from t2ms_tpu.training.scaling import replicate_tree
        d_params = replicate_tree(plan, d_params)
        vae_params = replicate_tree(plan, vae_params)

    return dict(batcher=batcher, length=length, vae=vae,
                vae_params=vae_params, denoiser=denoiser,
                d_params=d_params, plan=plan, samplers={})


def infer(args, run_dir: str, seed_offset: int = 0, collect_gif=True,
          ctx=None):
    os.makedirs(run_dir, exist_ok=True)
    print(f"Inference config::Step: {args.total_step}\t"
          f"CFG Scale: {args.cfg_scale}")
    ctx = ctx if ctx is not None else _build_ctx(args)
    batcher, length = ctx["batcher"], ctx["length"]
    vae, vae_params = ctx["vae"], ctx["vae_params"]
    d_params, plan = ctx["d_params"], ctx["plan"]
    if collect_gif not in ctx["samplers"]:
        # the trajectory stack is a (total_step, B, ...) scan output only
        # the GIF consumes — don't carry it on multi runs
        ctx["samplers"][collect_gif] = make_cfg_sampler(
            ctx["denoiser"], vae, args.backbone, args.total_step,
            args.cfg_scale, out_length=length,
            collect_trajectory=collect_gif,
            solver=getattr(args, "solver", "euler"),
            sample_steps=getattr(args, "sample_steps", 0) or None)
    sampler = ctx["samplers"][collect_gif]
    key = root_key(args.general_seed + seed_offset)

    x1s, xts, lat_dec, lat_enc = [], [], [], []
    gif_frames = None
    for b, batch in enumerate(batcher.epoch(0)):
        if args.max_batches and b >= args.max_batches:
            break
        print(f"Generating {b}th Batch TS...")
        x_in = jnp.asarray(batch.x)
        e_in = jnp.asarray(batch.embedding)
        if plan.n_data > 1 and x_in.shape[0] % plan.n_data == 0:
            # DP-shard the serving batch; tail batches that don't divide
            # the data axis run replicated. (Deliberate deviation: the
            # reference drops eval tails too — dataloader.py:98,111
            # drop_last=True — but dropping rows silently shrinks the
            # metric set, so our test loaders keep them; every run keeps
            # the same rows, so multi-run metrics stay aligned.)
            from t2ms_tpu.parallel.mesh import shard_batch
            x_in, e_in = shard_batch(plan.mesh, (x_in, e_in))
        out = sampler(d_params, vae_params, step_key(key, b), x_in, e_in)
        x1s.append(np.asarray(batch.x))
        xts.append(np.asarray(out.series))
        lat_dec.append(np.asarray(out.latent))
        lat_enc.append(np.asarray(out.latent_enc))
        if b == 0 and collect_gif:
            frames = np.asarray(decode_trajectory(vae, vae_params,
                                                  out.trajectory, length))
            gt, _ = vae.apply(vae_params, out.latent_enc[:1], length,
                              method=vae.decode)
            gif_frames = list(frames) + [np.asarray(gt)[0]]

    x_1 = np.concatenate(x1s)[:, :, None]
    x_t = np.concatenate(xts)[:, :, None]
    np.save(os.path.join(run_dir, "x_1.npy"), x_1)
    np.save(os.path.join(run_dir, "x_t.npy"), x_t)
    np.save(os.path.join(run_dir, "x_t_latent_dec_array.npy"),
            np.concatenate(lat_dec))
    np.save(os.path.join(run_dir, "x_t_latent_enc_array.npy"),
            np.concatenate(lat_enc))
    return x_1, x_t, gif_frames


def main(argv=None):
    args = get_args(argv)
    print("start generate", args.run_multi)
    if args.run_multi:
        ctx = _build_ctx(args)          # one loader + one jitted sampler
        x_1, x_t, _ = infer(args, args.generation_save_path, 0,
                            collect_gif=False, ctx=ctx)
        for run_index in range(10):
            run_dir = os.path.join(args.generation_save_path,
                                   f"run_{run_index}")
            x_1, x_t, _ = infer(args, run_dir, run_index + 1,
                                collect_gif=False, ctx=ctx)
        plot_generation_figs(x_1, x_t, args.generation_save_path)
    else:
        x_1, x_t, frames = infer(args, args.generation_save_path, 0)
        plot_generation_figs(x_1, x_t, args.generation_save_path)
        if frames:
            save_diffusion_gif(frames, args.generation_save_path,
                               f"animation_{args.backbone}.gif",
                               step_stride=1)


if __name__ == "__main__":
    main()
