"""Schedule golden tests vs torch LR schedulers + Orbax checkpoint roundtrip."""

import numpy as np
import torch
import jax.numpy as jnp
import optax

from t2ms_tpu.training.optim import vae_schedule
from t2ms_tpu.training import checkpoints as ckpt


def test_onecycle_matches_torch():
    total = 500
    sched = optax.cosine_onecycle_schedule(
        transition_steps=total, peak_value=1e-4, pct_start=0.3,
        div_factor=25.0, final_div_factor=1e4)
    m = torch.nn.Linear(1, 1)
    opt = torch.optim.AdamW(m.parameters(), lr=1e-4)
    tsched = torch.optim.lr_scheduler.OneCycleLR(opt, max_lr=1e-4,
                                                 total_steps=total)
    torch_lrs, ours = [], []
    for i in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        ours.append(float(sched(i)))
        opt.step()
        tsched.step()
    np.testing.assert_allclose(ours, torch_lrs, rtol=2e-2, atol=2e-7)


def test_onecycle_tiny_step_counts_stay_finite():
    """optax's cosine_onecycle divides by int(pct_start * T), which is 0
    for T <= 3 — NaN lr, and one AdamW update NaNs the entire parameter
    tree (hit by a --steps 2 smoke run). onecycle_adamw must clamp."""
    from t2ms_tpu.training.optim import onecycle_adamw
    import jax
    import jax.numpy as jnp

    for total in (1, 2, 3, 4):
        opt = onecycle_adamw(total)
        p = {"w": jnp.ones((3,))}
        st = opt.init(p)
        g = {"w": jnp.ones((3,))}
        for _ in range(total + 1):
            u, st = opt.update(g, st, p)
            p = optax.apply_updates(p, u)
        assert np.isfinite(np.asarray(p["w"])).all(), total


def test_vae_schedule_matches_torch_sequential():
    m = torch.nn.Linear(1, 1)
    opt = torch.optim.AdamW(m.parameters(), lr=1e-3, weight_decay=1e-2)
    s1 = torch.optim.lr_scheduler.LinearLR(opt, start_factor=0.1,
                                           total_iters=1000)
    s2 = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=400 - 1000,
                                                    eta_min=1e-6)
    seq = torch.optim.lr_scheduler.SequentialLR(opt, [s1, s2],
                                                milestones=[1000])
    sched = vae_schedule(1e-3)
    torch_lrs, ours = [], []
    for i in range(1800):
        torch_lrs.append(opt.param_groups[0]["lr"])
        ours.append(float(sched(i)))
        opt.step()
        seq.step()
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-3, atol=1e-8)


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    opt = optax.adamw(1e-3)
    state = opt.init(params)
    d = str(tmp_path / "ckpts")
    path = ckpt.save_train_ckpt(d, 42, params, state, [0.5, 0.4])
    assert ckpt.latest_step(d) == 42
    restored = ckpt.load_train_ckpt(path, params, state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(params["w"]))
    assert int(restored["step"]) == 42
    np.testing.assert_allclose(restored["loss_history"], [0.5, 0.4])


def test_params_only_roundtrip(tmp_path):
    params = {"k": jnp.ones((4, 4))}
    path = ckpt.save_params(str(tmp_path), params)
    back = ckpt.load_params(path, params)
    np.testing.assert_array_equal(np.asarray(back["k"]), np.ones((4, 4)))


def test_async_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.ones((3, 3)) * 2}
    opt = optax.adamw(1e-3)
    state = opt.init(params)
    d = str(tmp_path / "async")
    path = ckpt.save_train_ckpt(d, 7, params, state, [1.0],
                                asynchronous=True)
    ckpt.wait_for_saves()
    restored = ckpt.load_train_ckpt(path, params, state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(params["w"]))
    assert int(restored["step"]) == 7


def test_adamw_trajectory_matches_torch():
    """50 optimization steps on a fixed quadratic: optax.adamw must track
    torch.optim.AdamW parameter-for-parameter (same lr/wd/betas/eps)."""
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(6).astype(np.float32)
    target = rng.standard_normal(6).astype(np.float32)

    # torch
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt_t = torch.optim.AdamW([wt], lr=1e-2, weight_decay=1e-2)
    for _ in range(50):
        opt_t.zero_grad()
        loss = torch.sum((wt - torch.tensor(target)) ** 2)
        loss.backward()
        opt_t.step()

    # optax
    wj = jnp.asarray(w0)
    opt_j = optax.adamw(1e-2, weight_decay=1e-2)
    state = opt_j.init(wj)
    import jax
    grad_fn = jax.grad(lambda w: jnp.sum((w - jnp.asarray(target)) ** 2))
    for _ in range(50):
        g = grad_fn(wj)
        updates, state = opt_j.update(g, state, wj)
        wj = optax.apply_updates(wj, updates)

    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_checkpoint_manager_retention_and_resume(tmp_path):
    """TrainCheckpointManager: max_to_keep + keep_period retention with
    model_{step} naming; sidecar pruning; restore of latest; and
    load_train_ckpt interop with manager-written step dirs (the CLI
    --checkpoint_path resume path)."""
    import os

    from t2ms_tpu.training.checkpoints import (TrainCheckpointManager,
                                               load_train_ckpt)

    params = {"w": jnp.arange(4.0)}
    opt_state = {"m": jnp.zeros(4)}
    mgr = TrainCheckpointManager(str(tmp_path), max_to_keep=2, keep_period=3)
    for s in range(7):
        mgr.save(s, {"w": jnp.arange(4.0) + s}, opt_state,
                 [float(x) for x in range(s + 1)])
    mgr.wait_until_finished()
    assert mgr.all_steps() == [0, 3, 5, 6]
    entries = sorted(os.listdir(tmp_path))
    assert "model_6" in entries and "model_4" not in entries
    assert "model_6.loss_history.npy" in entries
    assert "model_4.loss_history.npy" not in entries   # pruned with step
    assert "model_3.loss_history.npy" in entries       # keep_period kept

    r = mgr.restore(None, params, opt_state)
    assert int(r["step"]) == 6
    np.testing.assert_array_equal(np.asarray(r["params"]["w"]),
                                  np.arange(4.0) + 6)
    assert r["loss_history"] == [0, 1, 2, 3, 4, 5, 6]
    mgr.close()

    r2 = load_train_ckpt(str(tmp_path / "model_5"), params, opt_state)
    np.testing.assert_array_equal(np.asarray(r2["params"]["w"]),
                                  np.arange(4.0) + 5)
    assert r2["loss_history"] == [0, 1, 2, 3, 4, 5]
