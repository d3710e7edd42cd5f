"""Higher-order flow-ODE solvers (sampler acceleration, an extension over
the reference's Euler-only loop, infer.py:84): heun/midpoint must
integrate the SAME ODE (same velocity field, same init noise) with
order-2 convergence, so total_step can drop ~4x at matched endpoint
error (~2x fewer model evals)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2ms_tpu.models.denoisers import DiT
from t2ms_tpu.models.vae import LAVAE
from t2ms_tpu.sampling import make_cfg_sampler


def _stack(solver, steps, dit, vae, vp, dp, x, emb):
    s = make_cfg_sampler(dit, vae, "flowmatching", total_step=steps,
                         cfg_scale=3.0, out_length=24, solver=solver)
    return np.asarray(s(dp, vp, jax.random.key(7), x, emb).latent,
                      np.float64)


@pytest.fixture(scope="module")
def tiny():
    vae = LAVAE(in_channels=1, latent_grid=6)
    dit = DiT(latent_len=6, latent_dim=64, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 24))
    emb = jax.random.normal(jax.random.key(1), (2, 128))
    vp = vae.init(jax.random.key(2), x)
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(3), z, jnp.zeros(2), emb)
    return dit, vae, vp, dp, x, emb


def test_order2_beats_euler_at_equal_evals(tiny):
    ref = _stack("euler", 512, *tiny)          # fine-grid ground truth
    e32 = np.abs(_stack("euler", 32, *tiny) - ref).max()
    h16 = np.abs(_stack("heun", 16, *tiny) - ref).max()   # 32 evals too
    m16 = np.abs(_stack("midpoint", 16, *tiny) - ref).max()
    # at the SAME model-eval budget the order-2 solvers land much closer
    assert h16 < 0.5 * e32, (h16, e32)
    assert m16 < 0.5 * e32, (m16, e32)


def test_order_of_convergence(tiny):
    # each solver against its OWN fine-grid solution: an euler reference
    # has O(1e-3) error of its own at 512 steps, which floors the heun
    # errors (heun@8 already lands within it — measured in-round)
    err = {}
    for s in ("euler", "heun"):
        ref = _stack(s, 128 if s == "heun" else 512, *tiny)
        for n in (8, 16):
            err[s, n] = np.abs(_stack(s, n, *tiny) - ref).max()
    # halving dt: euler error ~halves (order 1), heun ~quarters (order 2)
    assert 1.5 < err["euler", 8] / err["euler", 16] < 3.0, err
    assert err["heun", 8] / err["heun", 16] > 3.0, err


def test_solver_validation():
    vae = LAVAE(in_channels=1, latent_grid=6)
    dit = DiT(latent_len=6, latent_dim=64)
    with pytest.raises(ValueError, match="solver"):
        make_cfg_sampler(dit, vae, "flowmatching", solver="rk7")
    with pytest.raises(ValueError, match="ancestral"):
        make_cfg_sampler(dit, vae, "ddpm", solver="heun")


def _ddim_stack(steps, sample_steps, dit, vae, vp, dp, x, emb):
    s = make_cfg_sampler(dit, vae, "ddpm", total_step=steps, cfg_scale=3.0,
                         out_length=24, solver="ddim",
                         sample_steps=sample_steps)
    return np.asarray(s(dp, vp, jax.random.key(7), x, emb).latent,
                      np.float64)


def test_ddim_matches_python_loop(tiny):
    """The scan DDIM sampler must equal a hand-rolled eta=0 DDIM loop
    (Song et al. eq. 12) over the same sub-schedule."""
    from t2ms_tpu.models.backbones import ddpm as ddpm_lib
    dit, vae, vp, dp, x, emb = tiny
    T, S = 20, 5
    got = _ddim_stack(T, S, *tiny)

    sched = ddpm_lib.make_schedule(T)
    abar = np.asarray(sched.alpha_bar, np.float64)
    z_enc, _ = vae.apply(vp, x, method=vae.encode)
    x_t = np.asarray(jax.random.normal(jax.random.key(7), z_enc.shape),
                     np.float64)
    ts, prev = ddpm_lib.ddim_timesteps(T, S)
    for tc, tp in zip(ts, prev):
        t = jnp.full((x.shape[0],), int(tc), jnp.int32)
        pu = np.asarray(dit.apply(dp, jnp.asarray(x_t, jnp.float32), t,
                                  jnp.zeros_like(emb)), np.float64)
        pc = np.asarray(dit.apply(dp, jnp.asarray(x_t, jnp.float32), t,
                                  emb), np.float64)
        eps = pu + 3.0 * (pc - pu)
        ab, abp = abar[tc], (abar[tp] if tp >= 0 else 1.0)
        x0 = (x_t - np.sqrt(1 - ab) * eps) / np.sqrt(ab)
        x_t = np.sqrt(abp) * x0 + np.sqrt(1 - abp) * eps
    np.testing.assert_allclose(got, x_t, rtol=2e-4, atol=2e-5)


def test_ddim_is_deterministic_and_converges_to_full_schedule(tiny):
    """eta=0: repeat runs identical; a 25-step sub-schedule lands near
    the full-schedule DDIM endpoint (the few-step acceleration claim)."""
    a = _ddim_stack(100, 25, *tiny)
    b = _ddim_stack(100, 25, *tiny)
    np.testing.assert_array_equal(a, b)
    full = _ddim_stack(100, 100, *tiny)
    coarse_err = np.abs(_ddim_stack(100, 10, *tiny) - full).max()
    fine_err = np.abs(_ddim_stack(100, 50, *tiny) - full).max()
    assert fine_err < coarse_err, (fine_err, coarse_err)
    assert fine_err < 0.25 * max(1e-9, np.abs(full).max()), fine_err


def test_ddim_timestep_schedule():
    from t2ms_tpu.models.backbones.ddpm import ddim_timesteps
    ts, prev = ddim_timesteps(100, 4)
    assert ts[0] == 99 and prev[-1] == -1
    # regression: a SINGLE step must denoise from t=T-1, not t=0
    # (linspace(0, T-1, 1) returns the start point — the one-step
    # "sample" would be the input noise)
    ts1, p1 = ddim_timesteps(100, 1)
    assert list(ts1) == [99] and list(p1) == [-1]
    assert list(prev[:-1]) == list(ts[1:])
    assert all(a > b for a, b in zip(ts[:-1], ts[1:]))
    with pytest.raises(ValueError):
        ddim_timesteps(100, 0)
    with pytest.raises(ValueError):
        ddim_timesteps(100, 101)


def test_ddim_validation():
    vae = LAVAE(in_channels=1, latent_grid=6)
    dit = DiT(latent_len=6, latent_dim=64)
    with pytest.raises(ValueError, match="ddim"):
        make_cfg_sampler(dit, vae, "flowmatching", solver="ddim")
    with pytest.raises(ValueError, match="sample_steps"):
        make_cfg_sampler(dit, vae, "flowmatching", solver="euler",
                         sample_steps=10)
