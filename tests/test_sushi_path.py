"""SUSHI dataset path: single-dataset mix-train branch, MMD-style embedding
parsing, len-2048 series through the provider (reference
dataloader.py:88-90, dataset.py:84-88)."""

import numpy as np
from types import SimpleNamespace

from t2ms_tpu.data.provider import t2s_loader_provider
from t2ms_tpu.data.registry import csv_path_for
from t2ms_tpu.data.synthetic import write_t2s_csv


def test_sushi_provider(tmp_path):
    write_t2s_csv(str(tmp_path / "Data" / "SUSHI" /
                      "embedding_cleaned_SUSHI.csv"),
                  n=120, T=256, mmd_style=True, seed=7)
    args = SimpleNamespace(dataset_name="SUSHI", mix_train=True,
                           batch_size=16, general_seed=2025,
                           data_root=str(tmp_path / "Data"))
    datasets, batcher = t2s_loader_provider(args, "train")
    assert len(datasets) == 1
    assert datasets[0].length == 256
    batch = next(iter(batcher.epoch(0)))
    assert batch.x.shape == (16, 256)
    assert batch.embedding.shape == (16, 128)


def test_csv_path_rules():
    assert csv_path_for("SUSHI", "./Data").endswith("SUSHI")
    assert csv_path_for("MMD-Agriculture_24", "./Data").endswith("MMD")
    assert csv_path_for("ETTh1", "./Data", mix_train=True).endswith(
        "TSFragment-600K")
    assert csv_path_for("ETTh1_24", "./Data", mix_train=False).endswith(
        "our")
