"""Aux-subsystem tests: MinMaxScaler parity, NaN guard, logging artifacts,
profiler hook no-op path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from t2ms_tpu.evaluate.metrics import MinMaxScaler
from t2ms_tpu.models.denoisers import DiT
from t2ms_tpu.models.vae import LAVAE
from t2ms_tpu.training.trainer import TrainState, make_denoiser_train_step
from t2ms_tpu.utils.logging import (JsonlLogger, StepTimer, plot_loss_curve,
                                    profile_trace, write_json_data)


def test_minmax_scaler_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((20, 4)) * 5 + 3
    sc = MinMaxScaler()
    y = sc.fit_transform(x)
    assert y.min() >= 0 and y.max() <= 1
    back = sc.inverse_transform(y.copy())
    np.testing.assert_allclose(back, x, rtol=1e-4)


def test_nan_guard_skips_update():
    vae = LAVAE(in_channels=1, latent_grid=6, num_hiddens=16,
                num_residual_hiddens=16, embedding_dim=8)
    x = jnp.ones((4, 24))
    vp = vae.init(jax.random.key(0), x)
    dit = DiT(latent_len=6, latent_dim=8, d_model=32, depth=1, num_heads=2)
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(1), z, jnp.zeros(4), jnp.zeros((4, 32)))
    opt = optax.adamw(1e-3)
    state = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
    step = make_denoiser_train_step(dit, vae, opt, donate=False,
                                    nan_guard=True)
    # poison the input -> loss NaN -> the WHOLE update is skipped: every
    # params leaf AND every opt_state leaf (AdamW moments, count) must
    # keep its previous value
    bad = jnp.full((4, 24), jnp.nan)
    params_before = jax.tree_util.tree_map(jnp.copy, state.params)
    opt_before = jax.tree_util.tree_map(jnp.copy, state.opt_state)
    state2, loss = step(state, vp, jax.random.key(2), bad,
                        jnp.zeros((4, 32)))
    assert not np.isfinite(float(loss))
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_before),
                    jax.tree_util.tree_leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # healthy input still updates
    state3, loss3 = step(state2, vp, jax.random.key(3), x,
                         jnp.zeros((4, 32)))
    assert np.isfinite(float(loss3))
    moved = jax.tree_util.tree_leaves(state3.params)[0]
    unmoved = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.array_equal(np.asarray(unmoved), np.asarray(moved))


def test_logging_artifacts(tmp_path):
    p = plot_loss_curve([1.0, 0.5, 0.3], str(tmp_path))
    assert p and os.path.exists(p)
    assert plot_loss_curve([], str(tmp_path)) is None
    jp = str(tmp_path / "log.jsonl")
    lg = JsonlLogger(jp)
    lg.log(step=1, loss=0.5)
    lg.log(step=2, loss=0.4)
    lines = open(jp).read().strip().split("\n")
    assert len(lines) == 2
    write_json_data({"a": 1}, str(tmp_path / "sub" / "r.json"))
    assert os.path.exists(tmp_path / "sub" / "r.json")


def test_profile_trace_noop_and_timer():
    with profile_trace(None):
        pass
    t = StepTimer(skip_first=1)
    t.tick()
    t.tick()
    assert t.steps_per_sec > 0
