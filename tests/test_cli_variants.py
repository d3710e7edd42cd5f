"""CLI variant coverage: deadlift motion track and the DDPM backbone
through the T2S CLI pair."""

import json
import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def deadlift_env(tmp_path_factory):
    from t2ms_tpu.data.synthetic import write_motion_dataset
    root = tmp_path_factory.mktemp("deadlift")
    write_motion_dataset(str(root / "Data"), "deadlift", n_subjects=3,
                         clips_per_subject=6, caption_dir="Caption_synth")
    cfg = {
        "dataset_root": "./Data",
        "general_seed": 2025,
        "deadlift": {
            "input_dim": 7,
            "features": {i: [{"name": f"feat_{i}"},
                             {"definition": "synthetic"}]
                         for i in range(7)},
            "flow_dim": 8,
            "dataset": {"split_base_num": 48, "caption": "Caption_synth"},
            "vae": {"d_ff": 32, "num_encoder_layers": 1,
                    "num_decoder_layers": 1, "num_heads": 4,
                    "embedding_dim": 8, "epoch": 4,
                    "block_hidden_size": 16, "num_residual_layers": 1,
                    "res_hidden_size": 16},
            "diffusion": {"denoiser": "DiT", "backbone": "flowmatching"},
        },
    }
    with open(root / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    return root


def test_deadlift_pretrain_train_infer(deadlift_env, monkeypatch):
    monkeypatch.chdir(deadlift_env)
    from t2ms_tpu.cli import myinfer, mytrain, pretrain_mylavae

    pretrain_mylavae.main(["--dataset_name", "deadlift", "--batch_size",
                           "4", "--vae_kind", "conv", "--max_updates", "4"])
    assert os.path.isdir(
        "results/saved_pretrained_models/48_deadlift_epoch4/final_model")

    mytrain.main(["--dataset_name", "deadlift", "--batch_size", "4",
                  "--epochs", "2", "--total_step", "10", "--save_every",
                  "1"])
    ckpt_dir = ("results/denoiser_results/checkpoints/"
                "flowmatching_DiT_deadlift_Caption_synth_4")
    assert os.path.isdir(os.path.join(ckpt_dir, "model_1"))

    myinfer.main(["--dataset_name", "deadlift", "--batch_size", "1",
                  "--cfg_scale", "3", "--total_step", "5",
                  "--checkpoint_id", "1", "--run_time", "1",
                  "--max_batches", "1", "--render_gifs", "0"])
    gen = ("results/denoiser_results/generation/"
           "flowmatching_DiT_deadlift_3.0_5/run_0")
    assert os.path.exists(os.path.join(gen, "sample_0", "data.json"))
    with open(os.path.join(gen, "sample_0", "data.json")) as f:
        feats = json.load(f)
    assert len(feats) == 7   # deadlift input_dim


def test_t2s_ddpm_backbone(tmp_path, monkeypatch):
    from t2ms_tpu.data.synthetic import write_t2s_csv
    for L in (24, 48, 96):
        write_t2s_csv(str(tmp_path / "Data" / "TSFragment-600K" /
                          f"embedding_cleaned_ETTh1_{L}.csv"), n=40, T=L)
        write_t2s_csv(str(tmp_path / "Data" / "our" /
                          f"embedding_cleaned_ETTh1_{L}.csv"), n=150, T=L)
    monkeypatch.chdir(tmp_path)
    from t2ms_tpu.cli import infer, train

    train.main(["--dataset_name", "ETTh1", "--batch_size", "10",
                "--epochs", "1", "--total_step", "10", "--save_every", "1",
                "--backbone", "ddpm"])
    infer.main(["--dataset_name", "ETTh1_24", "--batch_size", "2",
                "--cfg_scale", "9.0", "--total_step", "10",
                "--checkpoint_id", "0", "--backbone", "ddpm",
                "--max_batches", "1"])
    gen = ("results/denoiser_results/generation/"
           "ddpm_DiT_ETTh1_24_9.0_10")
    x_t = np.load(os.path.join(gen, "x_t.npy"))
    assert np.isfinite(x_t).all()
