"""CLI end-to-end tests on synthetic corpora: pretrain -> train -> infer ->
evaluate for both tracks, exercising the reference-compatible flag surfaces
and artifact layouts."""

import json
import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def t2s_env(tmp_path_factory):
    """Synthetic TSFragment-style corpus + tiny pretrained VAE."""
    from t2ms_tpu.data.synthetic import write_t2s_csv
    root = tmp_path_factory.mktemp("t2s")
    data = root / "Data"
    for L in (24, 48, 96):
        write_t2s_csv(str(data / "TSFragment-600K" /
                          f"embedding_cleaned_ETTh1_{L}.csv"),
                      n=300, T=L, seed=L)
        # 0.99 train proportion needs >=100 rows for a nonempty test split
        write_t2s_csv(str(data / "our" / f"embedding_cleaned_ETTh1_{L}.csv"),
                      n=300, T=L, seed=L)
    return root


def test_t2s_train_infer_evaluate(t2s_env, monkeypatch):
    monkeypatch.chdir(t2s_env)
    from t2ms_tpu.cli import evaluation, infer, train

    # --- denoiser train (no pretrained VAE -> random frozen encoder) ---
    train.main(["--dataset_name", "ETTh1", "--batch_size", "10",
                "--epochs", "2", "--total_step", "10",
                "--data_root", "./Data", "--save_every", "1"])
    ckpt_dir = ("results/denoiser_results/checkpoints/"
                "flowmatching_DiT_ETTh1")
    assert os.path.isdir(os.path.join(ckpt_dir, "model_1"))

    # --- inference (run_multi for the eval layout) ---
    infer.main(["--dataset_name", "ETTh1_24", "--batch_size", "5",
                "--cfg_scale", "7.0", "--total_step", "10",
                "--checkpoint_id", "1", "--data_root", "./Data",
                "--run_multi", "1", "--max_batches", "1"])
    gen_dir = ("results/denoiser_results/generation/"
               "flowmatching_DiT_ETTh1_24_7.0_10")
    assert os.path.exists(os.path.join(gen_dir, "x_t.npy"))
    assert os.path.exists(os.path.join(gen_dir, "run_9", "x_1.npy"))
    x_t = np.load(os.path.join(gen_dir, "x_t.npy"))
    assert x_t.shape[1:] == (24, 1) and np.isfinite(x_t).all()

    # --- evaluation (C-FID trains TS2Vec on the eval data, ~1 min) ---
    evaluation.main(["--dataset_name", "ETTh1_24", "--cfg_scale", "7.0",
                     "--total_step", "10",
                     "--method_list", "MSE,WAPE,MRR,CRPS,C-FID"])
    eval_dir = ("results/denoiser_results/evaluation/"
                "flowmatching_DiT_ETTh1_24_7.0_10")
    files = os.listdir(eval_dir)
    assert any(f.endswith("_multi.json") for f in files)
    single = [f for f in files if not f.endswith("_multi.json")][0]
    with open(os.path.join(eval_dir, single)) as f:
        res = json.load(f)
    assert "MSE" in res and np.isfinite(res["MSE"])
    assert "C-FID" in res and np.isfinite(res["C-FID"])


def test_t2s_pretrain_vae_cli(t2s_env, monkeypatch):
    monkeypatch.chdir(t2s_env)
    from t2ms_tpu.cli import pretrain_vae
    # --dataset_path + the legacy VQ flags are reference spellings
    # (pretrained_lavae_unified.py:112,123-125) — must parse unchanged
    pretrain_vae.main(["--dataset_path", "ETTh1", "--batch_size", "10",
                       "--num_training_updates", "6", "--data_root",
                       "./Data", "--inference_samples", "4",
                       "--num_embeddings", "128", "--commitment_cost",
                       "0.25", "--compression_factor", "4"])
    d = "results/saved_pretrained_models/datasetETTh1_epoch6"
    assert os.path.isdir(os.path.join(d, "final_model"))
    assert os.path.exists(os.path.join(d, "metrics.txt"))
    assert os.path.exists(os.path.join(d, "pca_tsne.png"))
    # per-length grouped recon metrics (reference any_length_evaluation,
    # pretrained_lavae_unified.py:97-108): one MAE_{L}/RMSE_{L} pair per
    # length bucket in the mix-train set
    metrics = open(os.path.join(d, "metrics.txt")).read()
    assert "MAE: " in metrics and "RMSE: " in metrics
    grouped = [ln for ln in metrics.splitlines() if ln.startswith("MAE_")]
    assert len(grouped) >= 2, metrics
    for ln in metrics.splitlines():
        assert np.isfinite(float(ln.split(": ")[1]))


@pytest.fixture(scope="module")
def motion_env(tmp_path_factory):
    from t2ms_tpu.data.synthetic import write_motion_dataset
    root = tmp_path_factory.mktemp("motion")
    data = root / "Data"
    write_motion_dataset(str(data), "benchpress", n_subjects=3,
                         clips_per_subject=6, caption_dir="Caption_synth")
    cfg = {
        "dataset_root": "./Data",
        "general_seed": 2025,
        "benchpress": {
            "input_dim": 10,
            "features": {i: [{"name": f"feat_{i}"},
                             {"definition": "synthetic"}]
                         for i in range(13)},
            "flow_dim": 8,
            "dataset": {"split_base_num": 36, "caption": "Caption_synth"},
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


def test_motion_pretrain_train_infer_eval(motion_env, monkeypatch):
    monkeypatch.chdir(motion_env)
    from t2ms_tpu.cli import myevaluation, myinfer, mytrain, pretrain_mylavae

    # --- conv VAE pretrain (the kind mytrain/myinfer load) ---
    pretrain_mylavae.main(["--dataset_name", "benchpress", "--batch_size",
                           "4", "--vae_kind", "conv", "--max_updates", "4"])
    vae_dir = "results/saved_pretrained_models/36_benchpress_epoch4"
    assert os.path.isdir(os.path.join(vae_dir, "final_model"))

    # --- denoiser train ---
    mytrain.main(["--dataset_name", "benchpress", "--batch_size", "4",
                  "--epochs", "2", "--total_step", "10",
                  "--save_every", "1"])
    ckpt_dir = ("results/denoiser_results/checkpoints/"
                "flowmatching_DiT_benchpress_Caption_synth_4")
    assert os.path.isdir(os.path.join(ckpt_dir, "model_1"))

    # --- inference (offline embeddings, no GIFs for speed) ---
    myinfer.main(["--dataset_name", "benchpress", "--batch_size", "1",
                  "--cfg_scale", "3", "--total_step", "5",
                  "--checkpoint_id", "1", "--run_time", "2",
                  "--max_batches", "1", "--render_gifs", "0",
                  "--embedder", "fake"])
    gen_dir = ("results/denoiser_results/generation/"
               "flowmatching_DiT_benchpress_3.0_5")
    assert os.path.exists(os.path.join(gen_dir, "run_0", "sample_0",
                                       "data.json"))
    assert os.path.exists(os.path.join(gen_dir, "x_1_sample_0.npy"))

    # --- evaluation ---
    myevaluation.main(["--dataset_name", "benchpress", "--cfg_scale", "3",
                       "--total_step", "5", "--run_time", "2",
                       "--n_samples", "2",
                       "--method_list", "MSE,WAPE,ED,ACD,SD,KD,DTW"])
    eval_dir = ("results/denoiser_results/evaluation/"
                "flowmatching_DiT_benchpress_3.0_5")
    files = os.listdir(eval_dir)
    assert files
    with open(os.path.join(eval_dir, files[0])) as f:
        res = json.load(f)
    assert "summary" in res and "DTW" in res["summary"]


def test_tsae_pretrain_cli(motion_env, monkeypatch):
    monkeypatch.chdir(motion_env)
    from t2ms_tpu.cli import pretrain_mylavae
    pretrain_mylavae.main(["--dataset_name", "benchpress", "--batch_size",
                           "4", "--vae_kind", "tsae", "--max_updates", "4"])
    vae_dir = "results/saved_pretrained_models/36_benchpress_epoch4"
    assert os.path.exists(os.path.join(vae_dir, "pca_tsne.png"))
