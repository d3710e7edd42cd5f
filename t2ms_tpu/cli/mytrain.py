"""Motion-track (T2MS) denoiser training CLI.

Reference: mytrain.py — YAML config via get_cfg (:113), sport-specific
loaders (:18-22), DiT(flow_dim) (:23), conv-VAE state load (:29-30),
grouped bucket batches, save every 100 epochs with hard stop at 4000
(:90-97), path scheme {backbone}_{denoiser}_{sport}_{caption}_{epc}.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from t2ms_tpu.cli._common import build_denoiser, build_motion_vae
from t2ms_tpu.config import (denoiser_ckpt_dir, get_cfg,
                             motion_pretrained_dir)
from t2ms_tpu.data.provider import motion_loader_provider
from t2ms_tpu.training import checkpoints as ckpt
from t2ms_tpu.training import scaling
from t2ms_tpu.training.optim import onecycle_adamw
from t2ms_tpu.training.trainer import TrainState, make_denoiser_train_step
from t2ms_tpu.utils.logging import JsonlLogger, StepTimer, plot_loss_curve
from t2ms_tpu.utils.prng import root_key, step_key


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Train T2MS model")
    p.add_argument("--checkpoint_path", type=str, default="")
    p.add_argument("--dataset_name", type=str,
                   choices=["deadlift", "benchpress"], default="benchpress")
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--epochs", type=int, default=20000)
    p.add_argument("--save_path", type=str,
                   default="./results/denoiser_results")
    p.add_argument("--general_seed", type=int, default=2025)
    p.add_argument("--usepretrainedvae", default=True)
    p.add_argument("--total_step", type=int, default=100)
    p.add_argument("--latent_cache", type=lambda s: s not in ("0", "False"),
                   default=True,
                   help="encode each sample through the frozen conv VAE "
                        "ONCE at startup and train on cached latents "
                        "(numerically identical — see cli/train.py)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA shadow weights (0 = off; 0.999 convention); "
                        "saved as model_{epoch}_ema, sampled with "
                        "cli.myinfer --use_ema")
    p.add_argument("--config", type=str, default="config.yaml")
    p.add_argument("--hard_stop_epoch", type=int, default=4000)
    p.add_argument("--max_ckpts_keep", type=int, default=0,
                   help="retention: keep at most N checkpoints "
                        "(0 = keep all, the reference behavior)")
    p.add_argument("--ckpt_keep_period", type=int, default=0,
                   help="retention: additionally preserve every N-th "
                        "epoch checkpoint forever (0 = off)")
    p.add_argument("--save_every", type=int, default=100)
    scaling.add_scaling_args(p)
    args = p.parse_args(argv)
    args = get_cfg(args)
    args.save_path = denoiser_ckpt_dir(
        args.save_path, args.backbone, args.denoiser, args.dataset_name,
        args.caption, args.pretrained_epc)
    args.pretrained_model_path = os.path.join(
        motion_pretrained_dir(args.split_base_num, args.dataset_name,
                              args.pretrained_epc), "final_model")
    return args


def train(args):
    print(f"Training config::\tepoch: {args.epochs}\t"
          f"save_path: {args.save_path}")
    os.makedirs(args.save_path, exist_ok=True)
    train_batcher, _ = motion_loader_provider(args, "train")
    if len(train_batcher) == 0:
        raise ValueError(
            f"no motion bucket holds a full batch of {args.batch_size} "
            f"rows (train loaders drop tails like the reference); "
            f"reduce --batch_size")

    plan = scaling.setup_scaling(args)
    args.scaling_plan = plan
    print(f"Scaling plan: {plan.describe()}")

    vae = build_motion_vae(args)
    probe = jnp.zeros((2, args.input_dim, args.split_base_num))
    vae_params = vae.init(jax.random.key(0), probe)
    if os.path.exists(args.pretrained_model_path):
        vae_params = ckpt.load_params(args.pretrained_model_path, vae_params)
        print(f"Loaded pretrained VAE from {args.pretrained_model_path}")
    else:
        print(f"WARNING: no pretrained VAE at {args.pretrained_model_path}")

    denoiser = build_denoiser(args.denoiser, latent_len=args.flow_dim,
                              latent_dim=args.embedding_dim,
                              compute_dtype=plan.compute_dtype)
    z, _ = vae.apply(vae_params, probe, method=vae.encode)
    params = denoiser.init(jax.random.key(1), z, jnp.zeros(2),
                           jnp.zeros((2, 128)))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"Total learnable parameters: {n_params}")

    precoded = False
    if getattr(args, "latent_cache", True):
        from t2ms_tpu.training.trainer import precompute_latent_buckets
        cached = precompute_latent_buckets(vae, vae_params, train_batcher)
        if cached is not None:
            train_batcher, precoded = cached, True
            print("Latent cache: dataset encoded once through the frozen "
                  "VAE; hot loop trains on latents")

    opt = onecycle_adamw(total_steps=max(1, len(train_batcher))
                         * args.epochs)
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
        # "step" = optimizer-step counter (seeds the fold_in key stream);
        # "epoch" drives the loop — see cli/train.py resume notes
        state = TrainState(restored["params"], restored["opt_state"],
                           jnp.asarray(restored["step"]))
        loss_list = list(restored["loss_history"])
        start_epoch = int(restored["epoch"]) + 1
        plot_loss_curve(loss_list, args.save_path)

    state = scaling.replicate_tree(plan, state)
    vae_params = scaling.replicate_tree(plan, vae_params)

    from t2ms_tpu.training.ema import setup_cli_ema
    ema, ema_update = setup_cli_ema(getattr(args, "ema_decay", 0.0),
                                    state.params, args.checkpoint_path)

    print("training...")
    key = root_key(args.general_seed)
    logger = JsonlLogger(os.path.join(args.save_path, "train_log.jsonl"))
    timer = StepTimer()
    epoch_losses = []
    from t2ms_tpu.config import FrameworkConfig
    from t2ms_tpu.data.prefetch import prefetch_to_device
    from t2ms_tpu.utils.logging import profile_trace
    fw = FrameworkConfig.from_env()
    mgr = ckpt.TrainCheckpointManager(
        args.save_path,
        max_to_keep=getattr(args, "max_ckpts_keep", 0) or None,
        keep_period=getattr(args, "ckpt_keep_period", 0) or None)
    # host-side step counter + device-array losses until epoch end: a
    # per-iteration int(state.step)/float(loss) host-syncs through the
    # tunnel and serializes the loop (CLAUDE.md throughput rule)
    step_no = int(state.step)
    with profile_trace(fw.profile_dir):
        for epoch in range(start_epoch, args.epochs):
            group_losses = []
            staged = prefetch_to_device(
                train_batcher.epoch(epoch), mesh=plan.mesh,
                transform=lambda b: (np.asarray(b.x),
                                     np.asarray(b.embedding)))
            for batch, (x_dev, emb_dev) in staged:
                state, loss = step_fn(state, vae_params,
                                      step_key(key, step_no),
                                      x_dev, emb_dev)
                if ema_update is not None:
                    ema = ema_update(ema, state.params)
                step_no += 1
                group_losses.append(loss)
                timer.tick()
            # all steps already dispatched; transfers happen at epoch end
            epoch_losses.append(float(np.mean(
                [np.asarray(l) for l in group_losses])))
            print(f"[Epoch {epoch}] loss: {epoch_losses[-1]:.5f}")
            logger.log(epoch=epoch, loss=epoch_losses[-1],
                       steps_per_sec=timer.steps_per_sec)
            if epoch % args.save_every == 0 or epoch == args.epochs - 1:
                print(f"Saving model {epoch} to {args.save_path}...")
                plot_loss_curve(epoch_losses, args.save_path)
                # the reference persists a list it never appends to
                # (mytrain.py:46,93); we persist the actual epoch losses
                mgr.save(epoch, state.params, state.opt_state,
                         loss_list + epoch_losses, opt_step=step_no)
                if ema is not None:
                    from t2ms_tpu.training.ema import save_cli_ema
                    save_cli_ema(args.save_path, ema, epoch,
                                 mgr.all_steps())
            if epoch == args.hard_stop_epoch:
                break
    mgr.wait_until_finished()
    mgr.close()
    return state


def main(argv=None):
    args = get_args(argv)
    from t2ms_tpu.utils.prng import seed_everything
    seed_everything(args.general_seed)
    train(args)
    print("Training complete.")


if __name__ == "__main__":
    main()
