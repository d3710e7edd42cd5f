"""T2S denoiser training CLI.

Reference: train.py — flag surface (:138-158), mix/split training paths
(:52-136), OneCycle AdamW (:37-38), checkpoint-resume (:42-47), save every
1000 epochs, path scheme checkpoints/{backbone}_{denoiser}_{dataset}.

TPU path: the per-batch work is one jitted step per length bucket; the
Python loop only routes host batches.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from t2ms_tpu.cli._common import build_denoiser, build_t2s_vae
from t2ms_tpu.config import denoiser_ckpt_dir, t2s_pretrained_dir
from t2ms_tpu.data.provider import t2s_loader_provider
from t2ms_tpu.training import checkpoints as ckpt
from t2ms_tpu.training import scaling
from t2ms_tpu.training.optim import onecycle_adamw
from t2ms_tpu.training.trainer import TrainState, make_denoiser_train_step
from t2ms_tpu.utils.logging import JsonlLogger, StepTimer
from t2ms_tpu.utils.prng import root_key, step_key


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Train T2S model")
    p.add_argument("--checkpoint_path", type=str, default="")
    p.add_argument("--dataset_name", type=str, default="ETTh1")
    p.add_argument("--data_root", type=str, default="./Data")
    p.add_argument("--batch_size", type=int, default=9216)
    p.add_argument("--epochs", type=int, default=20000)
    p.add_argument("--save_path", type=str,
                   default="./results/denoiser_results")
    p.add_argument("--mix_train", type=lambda s: s not in ("0", "False"),
                   default=True)
    # accepted for reference-script compat but always-frozen: the
    # reference's unfreeze path (train.py:31-33, requires_grad = not
    # usepretrainedvae) is unreachable from ITS OWN CLI too — the flag
    # has no type=, so any CLI string (incl. 'False') is truthy
    p.add_argument("--usepretrainedvae", default=True,
                   help="accepted for compatibility; the VAE encoder is "
                        "always frozen (the reference CLI cannot "
                        "actually unfreeze it either — its bool flag "
                        "parses any string as True)")
    p.add_argument("--latent_cache", type=lambda s: s not in ("0", "False"),
                   default=True,
                   help="encode each sample through the frozen VAE ONCE "
                        "at startup and train on cached latents — "
                        "numerically identical to the reference's "
                        "per-step encode (train.py:73; the encoder is "
                        "frozen+deterministic) without its overhead. "
                        "0/False keeps the in-step encode.")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="exponential-moving-average decay for a shadow "
                        "copy of the denoiser weights (0 = off, the "
                        "reference behavior; 0.999 is the diffusion "
                        "convention). Saved as model_{epoch}_ema; sample "
                        "it with cli.infer --use_ema")
    p.add_argument("--total_step", type=int, default=100)
    p.add_argument("--backbone", type=str, default="flowmatching")
    p.add_argument("--denoiser", type=str, default="DiT")
    p.add_argument("--general_seed", type=int, default=2025)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--max_ckpts_keep", type=int, default=0,
                   help="retention: keep at most N checkpoints "
                        "(0 = keep all, the reference behavior)")
    p.add_argument("--ckpt_keep_period", type=int, default=0,
                   help="retention: additionally preserve every N-th "
                        "epoch checkpoint forever (0 = off)")
    scaling.add_scaling_args(p)
    args = p.parse_args(argv)
    root = args.dataset_name.split("_")[0]
    args.pretrained_model_path = os.path.join(
        t2s_pretrained_dir(root), "final_model")
    args.save_path = denoiser_ckpt_dir(args.save_path, args.backbone,
                                       args.denoiser, args.dataset_name)
    return args


def train(args):
    print(f"Training config::\tepoch: {args.epochs}\t"
          f"save_path: {args.save_path}")
    os.makedirs(args.save_path, exist_ok=True)
    datasets, batcher = t2s_loader_provider(args, "train")
    if len(batcher) == 0:
        raise ValueError(
            f"no length bucket holds a full batch of {args.batch_size} "
            f"rows (train loaders drop tails like the reference, "
            f"dataloader.py:98); reduce --batch_size")

    # One scaling policy for every entry point (training/scaling.py): DP
    # mesh over the visible devices, auto grad-accumulation so the
    # reference's batch-9216 default fits one chip's HBM, bf16 opt-in.
    plan = scaling.setup_scaling(args)
    args.scaling_plan = plan  # introspectable by tests/drivers
    print(f"Scaling plan: {plan.describe()}")

    vae = build_t2s_vae()
    probe = jnp.zeros((2, datasets[0].length))
    vae_params = vae.init(jax.random.key(0), probe)
    if os.path.exists(args.pretrained_model_path):
        vae_params = ckpt.load_params(args.pretrained_model_path, vae_params)
        print(f"Loaded pretrained VAE from {args.pretrained_model_path}")
    else:
        print(f"WARNING: no pretrained VAE at {args.pretrained_model_path}; "
              "training against a random frozen encoder")

    denoiser = build_denoiser(args.denoiser, latent_len=30, latent_dim=64,
                              compute_dtype=plan.compute_dtype)
    z, _ = vae.apply(vae_params, probe, method=vae.encode)
    params = denoiser.init(jax.random.key(1), z, jnp.zeros(2),
                           jnp.zeros((2, 128)))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"Total learnable parameters: {n_params}")

    precoded = False
    if getattr(args, "latent_cache", True):
        from t2ms_tpu.training.trainer import precompute_latent_buckets
        cached = precompute_latent_buckets(vae, vae_params, batcher)
        if cached is not None:
            batcher, precoded = cached, True
            print("Latent cache: dataset encoded once through the frozen "
                  "VAE; hot loop trains on latents")
        else:
            print("Latent cache skipped (store would exceed the host-RAM "
                  "budget); keeping the in-step encode")

    opt = onecycle_adamw(total_steps=len(batcher) * args.epochs)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step_fn = make_denoiser_train_step(denoiser, vae, opt, args.backbone,
                                       args.total_step,
                                       accum_steps=plan.accum_steps,
                                       precoded=precoded)

    loss_list = []
    start_epoch = 0
    if args.checkpoint_path:
        restored = ckpt.load_train_ckpt(args.checkpoint_path, state.params,
                                        state.opt_state)
        # "step" is the OPTIMIZER-step counter (seeds the fold_in key
        # stream — restoring the epoch there would replay keys already
        # consumed); "epoch" drives the loop range. Pre-epoch-field
        # checkpoints restore epoch = stored step (their old meaning).
        state = TrainState(restored["params"], restored["opt_state"],
                           jnp.asarray(restored["step"]))
        loss_list = list(restored["loss_history"])
        start_epoch = int(restored["epoch"]) + 1
        print(f"Resumed from {args.checkpoint_path} at epoch {start_epoch}")

    # commit params/opt-state replicated on the DP mesh so jit never
    # inserts resharding transfers against the sharded batches
    state = scaling.replicate_tree(plan, state)
    vae_params = scaling.replicate_tree(plan, vae_params)

    from t2ms_tpu.training.ema import setup_cli_ema
    ema, ema_update = setup_cli_ema(getattr(args, "ema_decay", 0.0),
                                    state.params, args.checkpoint_path)

    key = root_key(args.general_seed)
    logger = JsonlLogger(os.path.join(args.save_path, "train_log.jsonl"))
    timer = StepTimer()
    from t2ms_tpu.config import FrameworkConfig
    from t2ms_tpu.utils.logging import profile_trace
    fw = FrameworkConfig.from_env()
    with profile_trace(fw.profile_dir):
        state = _run_epochs(args, batcher, step_fn, state, vae_params, key,
                            logger, timer, loss_list, start_epoch,
                            mesh=plan.mesh, ema=ema, ema_update=ema_update)
    return state


def _run_epochs(args, batcher, step_fn, state, vae_params, key, logger,
                timer, loss_list, start_epoch, mesh=None, ema=None,
                ema_update=None):
    from t2ms_tpu.data.prefetch import prefetch_to_device
    from t2ms_tpu.training import checkpoints as ckpt
    mgr = ckpt.TrainCheckpointManager(
        args.save_path,
        max_to_keep=getattr(args, "max_ckpts_keep", 0) or None,
        keep_period=getattr(args, "ckpt_keep_period", 0) or None)
    # the step index is tracked host-side: the trainer increments
    # state.step by exactly 1 per call, so int(state.step) per iteration
    # would only add a device->host round-trip (~32 ms through the axon
    # tunnel) that serializes the loop against the previous step —
    # CLAUDE.md's "never host-sync per iteration" rule. Losses likewise
    # stay device arrays until the epoch ends (one stacked transfer).
    step_no = int(state.step)
    for epoch in range(start_epoch, args.epochs):
        staged = prefetch_to_device(
            batcher.epoch(epoch), mesh=mesh,
            transform=lambda b: (np.asarray(b.x), np.asarray(b.embedding)))
        epoch_losses = []
        for i, (batch, (x_dev, emb_dev)) in enumerate(staged):
            state, loss = step_fn(state, vae_params,
                                  step_key(key, step_no), x_dev, emb_dev)
            if ema_update is not None:
                ema = ema_update(ema, state.params)
            step_no += 1
            epoch_losses.append(loss)
            timer.tick()
            if i % 100 == 0:
                print(f"[Epoch {epoch}] [batch {i}] loss: {float(loss)}")
        # all steps are already dispatched; transfers happen at epoch end
        loss_list.extend(float(np.asarray(v)) for v in epoch_losses)
        logger.log(epoch=epoch, loss=loss_list[-1],
                   steps_per_sec=timer.steps_per_sec)
        if epoch % args.save_every == 0 or epoch == args.epochs - 1:
            print(f"Saving model {epoch} to {args.save_path}...")
            mgr.save(epoch, state.params, state.opt_state, loss_list,
                     opt_step=step_no)
            if ema is not None:
                from t2ms_tpu.training.ema import save_cli_ema
                save_cli_ema(args.save_path, ema, epoch, mgr.all_steps())
    mgr.wait_until_finished()
    mgr.close()
    return state


def main(argv=None):
    args = get_args(argv)
    stime = time.time()
    train(args)
    print(time.time() - stime)


if __name__ == "__main__":
    main()
