"""Checkpoint-resume path: interrupted training resumes at the right epoch
with optimizer state intact (reference train.py:42-47 semantics)."""

import os

import numpy as np

from t2ms_tpu.data.synthetic import write_t2s_csv


def test_train_cli_resume(tmp_path, monkeypatch):
    for L in (24, 48, 96):
        write_t2s_csv(str(tmp_path / "Data" / "TSFragment-600K" /
                          f"embedding_cleaned_ETTh1_{L}.csv"),
                      n=40, T=L, seed=L)
    monkeypatch.chdir(tmp_path)
    from t2ms_tpu.cli import train

    train.main(["--dataset_name", "ETTh1", "--batch_size", "10",
                "--epochs", "2", "--total_step", "10", "--save_every", "1"])
    ckpt_dir = "results/denoiser_results/checkpoints/flowmatching_DiT_ETTh1"
    assert os.path.isdir(os.path.join(ckpt_dir, "model_1"))

    # resume from epoch 1 and run to epoch 3
    train.main(["--dataset_name", "ETTh1", "--batch_size", "10",
                "--epochs", "4", "--total_step", "10", "--save_every", "1",
                "--checkpoint_path", os.path.join(ckpt_dir, "model_1")])
    assert os.path.isdir(os.path.join(ckpt_dir, "model_3"))
    hist = np.load(os.path.join(ckpt_dir, "model_3.loss_history.npy"))
    # 2 epochs x 12 batches then 2 more epochs
    assert len(hist) > 24
    assert np.isfinite(hist).all()
