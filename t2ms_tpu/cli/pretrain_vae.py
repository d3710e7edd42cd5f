"""T2S LA-VAE pretraining CLI.

Reference: pretrained_lavae_unified.py — argparse surface (:111-127),
mix/plain train paths (:142-174), final_model checkpoint, reconstruction
inference with comparison plots, PCA/t-SNE, MAE/RMSE to metrics.txt
(:55-108). (The reference's broken `datafactory.benchpress_dataloader`
import at :11 is replaced by the working T2S provider.)

Usage:
  python -m t2ms_tpu.cli.pretrain_vae --dataset_name ETTh1 --mix_train 1 ...
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from t2ms_tpu.cli._common import build_t2s_vae
from t2ms_tpu.data.provider import t2s_loader_provider
from t2ms_tpu.training import checkpoints as ckpt
from t2ms_tpu.training.optim import warmup_cosine_adamw
from t2ms_tpu.training.trainer import TrainState, make_vae_train_step
from t2ms_tpu.utils.logging import JsonlLogger, StepTimer
from t2ms_tpu.visualize.diagnostics import plot_comparison, plot_pca_tsne


def get_args(argv=None):
    p = argparse.ArgumentParser()
    # --dataset_path is the reference's name for the same flag
    # (pretrained_lavae_unified.py:112); keep both for drop-in scripts
    p.add_argument("--dataset_name", "--dataset_path", dest="dataset_name",
                   type=str, default="ETTh1")
    p.add_argument("--data_root", type=str, default="./Data")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_training_updates", type=int, default=2000)
    p.add_argument("--save_path", type=str,
                   default="results/saved_pretrained_models/")
    p.add_argument("--general_seed", type=int, default=42)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--block_hidden_size", type=int, default=128)
    p.add_argument("--num_residual_layers", type=int, default=2)
    p.add_argument("--res_hidden_size", type=int, default=256)
    p.add_argument("--embedding_dim", type=int, default=64)
    p.add_argument("--mix_train", type=lambda s: s not in ("0", "False"),
                   default=True)
    p.add_argument("--inference_samples", type=int, default=8)
    # legacy VQ flags the reference defines but its AE never consumes
    # (pretrained_lavae_unified.py:123-125; the 'vqvae' has no quantizer)
    # — accepted so reference sweep scripts run unchanged, ignored
    p.add_argument("--num_embeddings", type=int, default=128,
                   help="ignored (reference legacy)")
    p.add_argument("--compression_factor", type=int, default=4,
                   help="ignored (reference legacy)")
    p.add_argument("--commitment_cost", type=float, default=0.25,
                   help="ignored (reference legacy)")
    return p.parse_args(argv)


def train(args):
    # dataset{name}_epoch{updates} dir scheme (reference :130)
    save_dir = os.path.join(
        args.save_path,
        f"dataset{args.dataset_name}_epoch{args.num_training_updates}")
    os.makedirs(save_dir, exist_ok=True)

    model = build_t2s_vae(args)
    opt = warmup_cosine_adamw(args.learning_rate)
    datasets, train_batcher = t2s_loader_provider(args, "train")
    _, test_batcher = t2s_loader_provider(args, "test")

    first = next(iter(train_batcher.epoch(0)))
    params = model.init(jax.random.key(args.general_seed),
                        jnp.asarray(first.x))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step_fn = make_vae_train_step(model, opt)

    logger = JsonlLogger(os.path.join(save_dir, "train_log.jsonl"))
    timer = StepTimer()
    updates, epoch = 0, 0
    while updates < args.num_training_updates:
        losses = []
        for batch in train_batcher.epoch(epoch):
            state, (loss, recon_err) = step_fn(state, jnp.asarray(batch.x))
            losses.append(float(loss))
            timer.tick()
            updates += 1
            if updates >= args.num_training_updates:
                break
        print(f"Epoch: {epoch}, Loss: {np.mean(losses):.6f}")
        logger.log(epoch=epoch, loss=float(np.mean(losses)),
                   steps_per_sec=timer.steps_per_sec)
        if epoch % max(1, args.num_training_updates // 10) == 0:
            ckpt.save_params(save_dir, state.params,
                             f"model_epoch_{epoch}")
        epoch += 1
    ckpt.save_params(save_dir, state.params, "final_model")
    print("Training complete.")
    return model, state.params, test_batcher, save_dir


def inference(model, params, test_batcher, save_dir, num_samples=8):
    """Reconstruction eval: comparison plots, PCA/t-SNE, MAE/RMSE overall
    AND per length bucket (reference :55-108).

    The reference's any_length_evaluation groups samples by length
    {24,48,96} (:97-108) — that grouping is exactly what measures the
    VAE's length-adaptivity — then (a quirk) keeps only the 48 bucket for
    MAE/RMSE. Here metrics.txt carries the overall numbers plus one
    MAE_{L}/RMSE_{L} pair per encountered length."""
    groups: dict[int, tuple[list, list]] = {}
    for batch in test_batcher.epoch(0):
        x = jnp.asarray(batch.x)
        L = int(x.shape[-1])
        real_g, recon_g = groups.setdefault(L, ([], []))
        if len(real_g) >= num_samples:
            continue
        out, _, _, _ = model.apply(params, x)
        real_g.extend(np.asarray(x))
        recon_g.extend(np.asarray(out))
        if all(len(g[0]) >= num_samples for g in groups.values()) \
                and len(groups) >= test_batcher.num_buckets:
            break
    real = [a for g in groups.values() for a in g[0][:num_samples]]
    recon = [a for g in groups.values() for a in g[1][:num_samples]]
    plot_comparison(real, recon, save_dir)
    plot_pca_tsne(real, recon, save_dir)

    def _mae_rmse(rs, gs):
        r = np.concatenate([np.ravel(a) for a in rs])
        g = np.concatenate([np.ravel(a) for a in gs])
        return (float(np.mean(np.abs(r - g))),
                float(np.sqrt(np.mean((r - g) ** 2))))

    mae, rmse = _mae_rmse(real, recon)
    with open(os.path.join(save_dir, "metrics.txt"), "w") as f:
        f.write(f"MAE: {mae}\n")
        f.write(f"RMSE: {rmse}\n")
        for L in sorted(groups):
            gm, gr = _mae_rmse(groups[L][0][:num_samples],
                               groups[L][1][:num_samples])
            f.write(f"MAE_{L}: {gm}\n")
            f.write(f"RMSE_{L}: {gr}\n")
            print(f"len {L}: MAE {gm:.6f} RMSE {gr:.6f}")
    print(f"MAE: {mae:.6f} RMSE: {rmse:.6f}")
    return mae, rmse


def main(argv=None):
    args = get_args(argv)
    model, params, test_batcher, save_dir = train(args)
    print("Starting inference...")
    inference(model, params, test_batcher, save_dir,
              args.inference_samples)


if __name__ == "__main__":
    main()
