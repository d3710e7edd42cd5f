"""TSae tests: shapes, causal correctness of the teacher-forced decoder,
autoregressive/teacher-forced consistency, conditioning, and learnability."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from t2ms_tpu.models.vae.tsae import TSae, tsae_loss


def _model():
    return TSae(n_features=5, flow_dim=16, num_encoder_layers=2,
                num_decoder_layers=2, d_ff=32, num_heads=4)


def _data(n=4, T=12, nf=5, seed=0):
    return jax.random.normal(jax.random.key(seed), (n, T, nf))


def test_shapes_conditional_forward():
    m = _model()
    x = _data()
    emb = jax.random.normal(jax.random.key(1), (4, 128))
    params = m.init(jax.random.key(2), x, emb)
    out = m.apply(params, x, emb)
    assert out.shape == x.shape
    # conditioning changes the output
    out2 = m.apply(params, x, emb + 1.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_teacher_forced_causality():
    """Output at position t must not depend on inputs at positions > t fed
    to the decoder (it may depend on them through the encoder memory, so we
    probe the decoder in isolation)."""
    m = _model()
    x = _data()
    params = m.init(jax.random.key(2), x, jnp.zeros((4, 128)))
    mem = m.apply(params, x, method=m.encode)

    tgt = _data(seed=3)
    out_a = m.apply(params, mem, tgt, method=m.decode_teacher_forced)
    tgt_mod = tgt.at[:, -1, :].add(100.0)   # perturb the last target frame
    out_b = m.apply(params, mem, tgt_mod, method=m.decode_teacher_forced)
    # positions < T-1 unchanged (the shifted input hides frame T-1 anyway
    # for position T-1; frames feed positions t+1..)
    np.testing.assert_allclose(np.asarray(out_a[:, :-1]),
                               np.asarray(out_b[:, :-1]), atol=1e-5)


def test_autoregressive_shapes_and_determinism():
    m = _model()
    x = _data()
    params = m.init(jax.random.key(2), x, jnp.zeros((4, 128)))
    gen = m.apply(params, x, method=m.reconstruct_autoregressive)
    assert gen.shape == x.shape
    gen2 = m.apply(params, x, method=m.reconstruct_autoregressive)
    np.testing.assert_allclose(np.asarray(gen), np.asarray(gen2), atol=1e-6)


def test_autoregressive_first_step_matches_teacher_forced():
    """With the same zero-BOS input, position 0 of AR generation equals
    position 0 of the teacher-forced decode."""
    m = _model()
    x = _data()
    params = m.init(jax.random.key(2), x, jnp.zeros((4, 128)))
    mem = m.apply(params, x, method=m.encode)
    tf = m.apply(params, mem, x, method=m.decode_teacher_forced)
    ar = m.apply(params, mem, method=m.generate)
    np.testing.assert_allclose(np.asarray(ar[:, 0]), np.asarray(tf[:, 0]),
                               rtol=1e-4, atol=1e-5)


def test_tsae_overfits_small_batch():
    m = _model()
    x = _data(n=8, T=10)
    params = m.init(jax.random.key(0), x, jnp.zeros((8, 128)))
    opt = optax.adamw(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        (loss, _), g = jax.value_and_grad(
            lambda p: tsae_loss(m, p, x), has_aux=True)(params)
        u, state = opt.update(g, state, params)
        return optax.apply_updates(params, u), state, loss

    first = None
    for i in range(120):
        params, state, loss = step(params, state)
        if first is None:
            first = float(loss)
    assert float(loss) < first / 3, (first, float(loss))
