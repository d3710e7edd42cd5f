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
