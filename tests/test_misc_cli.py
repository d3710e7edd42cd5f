"""Tests for the metrics-experiment CLI, PP stage hooks, seed_everything,
and the shipped config.yaml template."""

import os

import numpy as np

from t2ms_tpu.cli.metrics_experiment import run_experiment
from t2ms_tpu.parallel.pp import current_stage, stage
from t2ms_tpu.utils.prng import seed_everything


def test_metrics_experiment(tmp_path):
    rng = np.random.default_rng(0)
    for sub in ("a", "b"):
        d = tmp_path / sub / "filtered_norm"
        d.mkdir(parents=True)
        for i in range(1, 4):
            arr = rng.standard_normal((20, 3)) + i * 0.1
            (d / f"merged_{i}.txt").write_text("\n".join(
                ",".join(f"{v:.5f}" for v in row) for row in arr))
    res = run_experiment(str(tmp_path / "a"), str(tmp_path / "b"),
                         str(tmp_path / "out"), ("filtered_norm",), 3)
    assert ("filtered_norm", "mse") in res
    assert res[("filtered_norm", "mse")].shape == (3, 3)
    assert os.path.exists(tmp_path / "out" / "mse" /
                          "filtered_norm_result.jpg")
    # self-compare excludes the diagonal
    res_self = run_experiment(str(tmp_path / "a"), str(tmp_path / "a"),
                              str(tmp_path / "out2"), ("filtered_norm",), 3)
    assert res_self[("filtered_norm", "mse")].shape == (3, 2)


def test_pp_stage_hooks():
    import jax.numpy as jnp
    assert current_stage() is None
    with stage(0):
        assert current_stage() == 0
        with stage(1):
            assert current_stage() == 1
        assert current_stage() == 0
    assert current_stage() is None


def test_seed_everything():
    key = seed_everything(2025)
    a = np.random.rand(3)
    seed_everything(2025)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    assert key is not None


def test_shipped_config_template():
    import argparse
    from t2ms_tpu.config import get_cfg
    args = argparse.Namespace(config="config.yaml",
                              dataset_name="benchpress")
    args = get_cfg(args)
    assert args.input_dim == 10 and args.flow_dim == 64
    assert args.features[0] == "bar_x"
    assert len(args.features) == 13
    args2 = argparse.Namespace(config="config.yaml",
                               dataset_name="deadlift")
    args2 = get_cfg(args2)
    assert args2.input_dim == 7 and args2.flow_dim == 50
    assert args2.block_hidden_size == 128
