"""Motion-track VAE pretraining CLI (TSae seq2seq autoencoder).

Reference: pretrained_mylavae.py — trains AttentionSeq2SeqAutoencoder (NOT
the conv VAE; :185) with warmup+cosine (:186), grouped bucket batches
transposed to (B, T, n_f) (:207-210), periodic validation + checkpoints
(:220-231), then reconstruction GIF + PCA/t-SNE inference (:132-163).

``--vae_kind conv`` additionally supports pretraining the conv myvqvae
(used by mytrain/myinfer), completing both motion VAE paths.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from t2ms_tpu.cli._common import build_motion_vae
from t2ms_tpu.config import get_cfg, motion_pretrained_dir
from t2ms_tpu.data.provider import motion_loader_provider
from t2ms_tpu.models.vae.tsae import TSae, tsae_loss
from t2ms_tpu.training import checkpoints as ckpt
from t2ms_tpu.training.optim import warmup_cosine_adamw
from t2ms_tpu.training.trainer import (TrainState, make_vae_train_step)
from t2ms_tpu.utils.logging import JsonlLogger, plot_loss_curve
from t2ms_tpu.visualize.diagnostics import plot_pca_tsne


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_name", type=str,
                   choices=["deadlift", "benchpress"], default="benchpress")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--save_path", type=str,
                   default="results/saved_pretrained_models/")
    p.add_argument("--only_inference", type=lambda s: s not in ("0", "False"),
                   default=False)
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--config", type=str, default="config.yaml")
    p.add_argument("--vae_kind", type=str, default="tsae",
                   choices=["tsae", "conv"])
    p.add_argument("--max_updates", type=int, default=0,
                   help="override pretrained_epc update budget (0=config)")
    args = p.parse_args(argv)
    return get_cfg(args)


def _build(args):
    if args.vae_kind == "tsae":
        model = TSae(n_features=args.input_dim, flow_dim=args.flow_dim,
                     num_encoder_layers=args.num_encoder_layers,
                     num_decoder_layers=args.num_decoder_layers,
                     d_ff=args.d_ff, num_heads=args.num_heads)
    else:
        model = build_motion_vae(args)
    return model


def train(args):
    save_dir = motion_pretrained_dir(args.split_base_num, args.dataset_name,
                                     args.pretrained_epc)
    save_dir = os.path.join(args.save_path, os.path.basename(save_dir)) \
        if not save_dir.startswith(args.save_path) else save_dir
    os.makedirs(save_dir, exist_ok=True)

    train_batcher, test_batcher = motion_loader_provider(args, "train")
    model = _build(args)
    opt = warmup_cosine_adamw(args.learning_rate)

    first = next(iter(train_batcher.epoch(0)))
    if args.vae_kind == "tsae":
        x0 = jnp.asarray(first.x).transpose(0, 2, 1)     # (B, T, n_f)
        params = model.init(jax.random.key(args.general_seed), x0,
                            jnp.zeros((x0.shape[0], 128)))

        drop_root = jax.random.key(args.general_seed + 1)

        @jax.jit
        def step_fn(state, x):
            # per-step dropout key (reference trains the TSae with p=0.1
            # dropout everywhere — TSae.py:114; train mode in shared_eval)
            dkey = jax.random.fold_in(drop_root, state.step)
            (loss, _), g = jax.value_and_grad(
                lambda p: tsae_loss(model, p, x, dropout_key=dkey),
                has_aux=True)(state.params)
            u, opt_state = opt.update(g, state.opt_state, state.params)
            return (TrainState(optax.apply_updates(state.params, u),
                               opt_state, state.step + 1), (loss, loss))

        def prep(batch):
            return jnp.asarray(batch.x).transpose(0, 2, 1)
    else:
        params = model.init(jax.random.key(args.general_seed),
                            jnp.asarray(first.x))
        step_fn = make_vae_train_step(model, opt)

        def prep(batch):
            return jnp.asarray(batch.x)

    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    budget = args.max_updates or args.pretrained_epc
    total_epochs = int((budget + args.epoch) / max(1, len(train_batcher))
                       + 0.5)
    print(f"total epoch : {total_epochs}")
    logger = JsonlLogger(os.path.join(save_dir, "train_log.jsonl"))
    loss_list = []
    for epoch in range(total_epochs):
        group_losses = []
        for batch in train_batcher.epoch(epoch):
            state, (loss, _) = step_fn(state, prep(batch))
            group_losses.append(float(loss))
        mean_loss = float(np.mean(group_losses)) if group_losses else 0.0
        print(f"Epoch: {epoch + 1}, Training Loss: {mean_loss:.6f}")
        loss_list.append(mean_loss)
        logger.log(epoch=epoch, loss=mean_loss)
        if epoch % max(1, total_epochs // 10) == 0:
            val_losses = []
            for batch in test_batcher.epoch(0):
                if args.vae_kind == "tsae":
                    x = prep(batch)
                    r = model.apply(state.params, x,
                                    method=model.reconstruct_teacher_forced)
                    val_losses.append(float(jnp.mean(jnp.square(r - x))))
                else:
                    from t2ms_tpu.models.vae.lavae import lavae_loss
                    loss, _ = lavae_loss(model, state.params, prep(batch))
                    val_losses.append(float(loss))
            if val_losses:
                print(f"Validation Loss: {np.mean(val_losses):.6f}")
            plot_loss_curve(loss_list, save_dir, "loss_curve_epoch.png")
            ckpt.save_params(save_dir, state.params, f"model_epoch_{epoch}")
    ckpt.save_params(save_dir, state.params, "final_model")
    print("Training complete.")
    return model, state.params, test_batcher, save_dir


def inference(args, model, params, test_batcher, save_dir, num_samples=None):
    real, reco = [], []
    for batch in test_batcher.epoch(0):
        if args.vae_kind == "tsae":
            x = jnp.asarray(batch.x).transpose(0, 2, 1)
            r = model.apply(params, x, method=model.reconstruct_autoregressive)
            real.extend(np.asarray(x).transpose(0, 2, 1))
            reco.extend(np.asarray(r).transpose(0, 2, 1))
        else:
            out, _, _, _ = model.apply(params, jnp.asarray(batch.x))
            real.extend(np.asarray(batch.x))
            reco.extend(np.asarray(out))
        if num_samples is not None and len(real) >= num_samples:
            break
    if real:
        plot_pca_tsne(real, reco, save_dir)
    return real, reco


def main(argv=None):
    args = get_args(argv)
    model, params, test_batcher, save_dir = train(args)
    print("Starting inference...")
    inference(args, model, params, test_batcher, save_dir)


if __name__ == "__main__":
    main()
