"""EMA shadow weights (opt-in training extension over the reference):
update math, donation safety, checkpoint lifecycle through cli.train,
and sampling from the shadow via cli.infer --use_ema."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2ms_tpu.training.ema import ema_name, make_ema_update, prune_ema


def test_ema_update_math():
    """k updates against constant params p from init e0 must give
    d^k * e0 + (1 - d^k) * p exactly (geometric series)."""
    d = 0.9
    upd = make_ema_update(d)
    e = {"w": jnp.full((3,), 2.0), "b": jnp.full((2,), -1.0)}
    p = {"w": jnp.full((3,), 10.0), "b": jnp.full((2,), 3.0)}
    for _ in range(5):
        e = upd(e, p)
    f = d ** 5
    np.testing.assert_allclose(np.asarray(e["w"]), f * 2.0 + (1 - f) * 10.0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(e["b"]), f * -1.0 + (1 - f) * 3.0,
                               rtol=1e-6)


def test_ema_update_does_not_touch_params():
    """The update donates the EMA buffers only — params must stay live
    and unchanged afterwards (the aliasing hazard cli.train copies
    around)."""
    upd = make_ema_update(0.99)
    p = {"w": jnp.arange(4.0)}
    e = jax.tree_util.tree_map(jnp.copy, p)
    e2 = upd(e, p)
    np.testing.assert_array_equal(np.asarray(p["w"]), [0.0, 1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(e2["w"]), np.asarray(p["w"]),
                               rtol=1e-6)


def test_ema_decay_validation():
    for bad in (0.0, 1.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            make_ema_update(bad)


def test_prune_ema(tmp_path):
    for s in (1, 2, 3):
        os.makedirs(tmp_path / f"model_{s}_ema")
    os.makedirs(tmp_path / "model_2")               # non-ema entry: kept
    prune_ema(str(tmp_path), keep_steps=[2], current=3)
    left = sorted(os.listdir(tmp_path))
    assert left == ["model_2", "model_2_ema", "model_3_ema"]


@pytest.fixture(scope="module")
def t2s_env(tmp_path_factory):
    from t2ms_tpu.data.synthetic import write_t2s_csv
    root = tmp_path_factory.mktemp("ema_t2s")
    for L in (24, 48, 96):
        write_t2s_csv(str(root / "Data" / "TSFragment-600K" /
                          f"embedding_cleaned_ETTh1_{L}.csv"),
                      n=120, T=L, seed=L)
        write_t2s_csv(str(root / "Data" / "our" /
                          f"embedding_cleaned_ETTh1_{L}.csv"),
                      n=120, T=L, seed=L)
    return root


def test_cli_train_infer_ema_roundtrip(t2s_env, monkeypatch, capsys):
    """cli.train --ema_decay writes model_{epoch}_ema next to each kept
    checkpoint; cli.infer --use_ema samples from it (and the shadow
    differs from the live weights after training)."""
    monkeypatch.chdir(t2s_env)
    from t2ms_tpu.cli import infer, train

    train.main(["--dataset_name", "ETTh1", "--batch_size", "10",
                "--epochs", "2", "--total_step", "10",
                "--data_root", "./Data", "--save_every", "1",
                "--ema_decay", "0.9"])
    ckpt_dir = ("results/denoiser_results/checkpoints/"
                "flowmatching_DiT_ETTh1")
    assert os.path.isdir(os.path.join(ckpt_dir, "model_1_ema"))

    # raw no-target restores: compare leaves between live and ema trees
    import orbax.checkpoint as ocp
    raw = ocp.PyTreeCheckpointer()
    live = raw.restore(os.path.abspath(
        os.path.join(ckpt_dir, "model_1", "default")))["params"]
    ema = raw.restore(os.path.abspath(
        os.path.join(ckpt_dir, "model_1_ema")))["params"]
    leaves_l = jax.tree_util.tree_leaves(live)
    leaves_e = jax.tree_util.tree_leaves(ema)
    assert len(leaves_l) == len(leaves_e) > 0
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_l, leaves_e)), \
        "EMA shadow should lag the live weights after training"

    infer.main(["--dataset_name", "ETTh1_24", "--batch_size", "4",
                "--cfg_scale", "3.0", "--total_step", "5",
                "--checkpoint_id", "1", "--data_root", "./Data",
                "--max_batches", "1", "--use_ema", "1"])
    assert "Loaded EMA weights" in capsys.readouterr().out

    with pytest.raises(FileNotFoundError):
        infer.main(["--dataset_name", "ETTh1_24", "--batch_size", "4",
                    "--total_step", "5", "--checkpoint_id", "7",
                    "--data_root", "./Data", "--max_batches", "1",
                    "--use_ema", "1"])
