"""Gradient accumulation: accumulated step equals the mean of per-microbatch
losses/grads computed with the same folded keys — and the CFG text-drop
coin is per OPTIMIZER step (reference train.py:80), not per microbatch."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from t2ms_tpu.models.denoisers import DiT
from t2ms_tpu.models.vae import LAVAE
from t2ms_tpu.training.trainer import TrainState, make_denoiser_train_step


def test_accum_matches_manual_mean():
    vae = LAVAE(in_channels=1, latent_grid=6, num_hiddens=16,
                num_residual_hiddens=16, embedding_dim=8)
    x_probe = jnp.ones((2, 24))
    vp = vae.init(jax.random.key(0), x_probe)
    dit = DiT(latent_len=6, latent_dim=8, d_model=32, depth=1, num_heads=2)
    z, _ = vae.apply(vp, x_probe, method=vae.encode)
    dp = dit.init(jax.random.key(1), z, jnp.zeros(2), jnp.zeros((2, 32)))
    opt = optax.sgd(1.0)   # update == -grad, so params expose the grads

    B, k = 8, 4
    x = jax.random.normal(jax.random.key(2), (B, 24))
    e = jax.random.normal(jax.random.key(3), (B, 32))
    key = jax.random.key(7)

    # accumulate in one jitted step. cfg_drop_prob=0 so the manual
    # emulation below is exact: the accum path shares ONE cfg coin drawn
    # from the step key, while each manual single step would draw its own
    # from its folded key (see test_accum_cfg_coin_is_per_step).
    st = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
    step_acc = make_denoiser_train_step(dit, vae, opt, total_step=10,
                                        donate=False, accum_steps=k,
                                        cfg_drop_prob=0.0)
    st_acc, loss_acc = step_acc(st, vp, key, x, e)

    # manual: mean of per-microbatch grads with folded keys
    step_one = make_denoiser_train_step(dit, vae, opt, total_step=10,
                                        donate=False, cfg_drop_prob=0.0)
    losses, grad_trees = [], []
    for i in range(k):
        xm = x[i * 2:(i + 1) * 2]
        em = e[i * 2:(i + 1) * 2]
        st_i = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
        st_i, loss_i = step_one(st_i, vp, jax.random.fold_in(key, i), xm, em)
        losses.append(float(loss_i))
        # grad = old - new under sgd(1.0)
        grad_trees.append(jax.tree_util.tree_map(
            lambda a, b: a - b, dp, st_i.params))
    want_loss = float(np.mean(losses))
    np.testing.assert_allclose(float(loss_acc), want_loss, rtol=1e-5)
    mean_grads = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / k, *grad_trees)
    got_grads = jax.tree_util.tree_map(lambda a, b: a - b, dp,
                                       st_acc.params)
    for g, w in zip(jax.tree_util.tree_leaves(got_grads),
                    jax.tree_util.tree_leaves(mean_grads)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-6)


def test_accum_cfg_coin_is_per_step():
    """All microbatches of one optimizer step share ONE CFG drop coin
    (reference semantics: the whole update's batch is conditioned or
    dropped together, train.py:80-82) — so the accum step's loss equals
    EXACTLY the all-kept or the all-dropped loss, never a mixture."""
    vae = LAVAE(in_channels=1, latent_grid=6, num_hiddens=16,
                num_residual_hiddens=16, embedding_dim=8)
    x_probe = jnp.ones((2, 24))
    vp = vae.init(jax.random.key(0), x_probe)
    dit = DiT(latent_len=6, latent_dim=8, d_model=32, depth=1, num_heads=2)
    z, _ = vae.apply(vp, x_probe, method=vae.encode)
    dp = dit.init(jax.random.key(1), z, jnp.zeros(2), jnp.zeros((2, 32)))
    # perturb away from init: adaLN-zero makes a fresh DiT ignore its
    # conditioning, which would make all-kept == all-dropped trivially
    dp = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.key(9), p.shape,
                                               p.dtype), dp)
    opt = optax.sgd(1.0)
    B, k = 8, 4
    x = jax.random.normal(jax.random.key(2), (B, 24))
    e = jax.random.normal(jax.random.key(3), (B, 32))
    key = jax.random.key(7)
    st = lambda: TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))

    losses = {}
    for prob in (0.0, 0.5, 1.0):
        step = make_denoiser_train_step(dit, vae, opt, total_step=10,
                                        donate=False, accum_steps=k,
                                        cfg_drop_prob=prob)
        _, losses[prob] = step(st(), vp, key, x, e)
    all_kept, all_dropped = float(losses[0.0]), float(losses[1.0])
    assert all_kept != all_dropped          # text conditioning matters
    assert float(losses[0.5]) in (all_kept, all_dropped)


def test_accum_rejects_indivisible_batch():
    vae = LAVAE(in_channels=1, latent_grid=6, num_hiddens=16,
                num_residual_hiddens=16, embedding_dim=8)
    vp = vae.init(jax.random.key(0), jnp.ones((2, 24)))
    dit = DiT(latent_len=6, latent_dim=8, d_model=32, depth=1, num_heads=2)
    z, _ = vae.apply(vp, jnp.ones((2, 24)), method=vae.encode)
    dp = dit.init(jax.random.key(1), z, jnp.zeros(2), jnp.zeros((2, 32)))
    opt = optax.sgd(1.0)
    st = TrainState(dp, opt.init(dp), jnp.zeros((), jnp.int32))
    step = make_denoiser_train_step(dit, vae, opt, total_step=10,
                                    donate=False, accum_steps=3)
    import pytest
    with pytest.raises(ValueError, match="accum_steps"):
        step(st, vp, jax.random.key(2), jnp.ones((8, 24)),
             jnp.ones((8, 32)))
