"""Serving engine: batch-composition invariance (the dynamic-batching
correctness property), serving-sampler parity with a hand-rolled python
CFG loop, per-sample DDPM noise, padding/tier bookkeeping, deadline
flush, and shutdown semantics."""

import argparse
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2ms_tpu.models.backbones import rectified_flow as rf
from t2ms_tpu.models.denoisers import DiT
from t2ms_tpu.models.vae import LAVAE
from t2ms_tpu.serving import ServingEngine, make_serving_sampler


def _setup(T=24):
    vae = LAVAE(in_channels=1, latent_grid=6, num_hiddens=16,
                num_residual_hiddens=16, embedding_dim=8)
    x = jax.random.normal(jax.random.key(0), (4, T))
    vp = vae.init(jax.random.key(1), x)
    dit = DiT(latent_len=6, latent_dim=8, d_model=32, depth=1, num_heads=2)
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(2), z, jnp.zeros(4), jnp.zeros((4, 32)))
    dp = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.key(3), p.shape),
        dp)
    return vae, vp, dit, dp, z.shape[1:]


def test_serving_sampler_matches_python_loop():
    """Per-sample runtime cfg_scale must reproduce the reference CFG loop
    (two forwards + per-scale combine) sample by sample."""
    vae, vp, dit, dp, lat = _setup()
    steps = 5
    sampler = make_serving_sampler(dit, vae, "flowmatching", steps, lat, 24)
    seeds = jnp.array([11, 12], dtype=jnp.uint32)
    cfg = jnp.array([2.0, 6.0], dtype=jnp.float32)
    emb = jax.random.normal(jax.random.key(5), (2, 32))
    series = sampler(dp, vp, seeds, cfg, emb)

    x_t = jax.vmap(lambda s: jax.random.normal(
        jax.random.key(s), lat, jnp.float32))(seeds)
    for j in range(steps):
        t = jnp.full((2,), j / steps)
        pu = dit.apply(dp, x_t, t, jnp.zeros_like(emb))
        pc = dit.apply(dp, x_t, t, emb)
        pred = pu + cfg[:, None, None] * (pc - pu)
        x_t = rf.euler(x_t, pred, 1.0 / steps)
    want, _ = vae.apply(vp, x_t, 24, method=vae.decode)
    np.testing.assert_allclose(np.asarray(series), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_serving_sampler_batch_composition_invariance():
    """Row i depends only on (seed_i, cfg_i, emb_i): running a request
    alone, or alongside different neighbours, must give the same series."""
    vae, vp, dit, dp, lat = _setup()
    s4 = make_serving_sampler(dit, vae, "flowmatching", 4, lat, 24)
    emb = np.asarray(jax.random.normal(jax.random.key(7), (4, 32)))
    seeds = np.array([5, 6, 7, 8], np.uint32)
    cfg = np.array([1.0, 3.0, 5.0, 7.0], np.float32)
    full = np.asarray(s4(dp, vp, jnp.asarray(seeds), jnp.asarray(cfg),
                         jnp.asarray(emb)))
    # same tier, permuted rows -> same per-row results
    perm = np.array([2, 0, 3, 1])
    permuted = np.asarray(s4(dp, vp, jnp.asarray(seeds[perm]),
                             jnp.asarray(cfg[perm]),
                             jnp.asarray(emb[perm])))
    np.testing.assert_array_equal(permuted, full[perm])
    # different tier -> numerically close (XLA may fuse differently)
    s1 = make_serving_sampler(dit, vae, "flowmatching", 4, lat, 24)
    solo = np.asarray(s1(dp, vp, jnp.asarray(seeds[2:3]),
                         jnp.asarray(cfg[2:3]), jnp.asarray(emb[2:3])))
    np.testing.assert_allclose(solo[0], full[2], rtol=1e-4, atol=1e-5)


def test_serving_sampler_ddpm_per_sample_noise():
    """DDPM ancestral path: per-sample keys make each row reproducible in
    isolation (same invariance as the flow path)."""
    vae, vp, dit, dp, lat = _setup()
    s = make_serving_sampler(dit, vae, "ddpm", 4, lat, 24)
    emb = jax.random.normal(jax.random.key(9), (3, 32))
    seeds = jnp.array([1, 2, 3], dtype=jnp.uint32)
    cfg = jnp.full((3,), 3.0, jnp.float32)
    out = np.asarray(s(dp, vp, seeds, cfg, emb))
    again = np.asarray(s(dp, vp, seeds[1:2], cfg[1:2], emb[1:2]))
    np.testing.assert_allclose(again[0], out[1], rtol=1e-4, atol=1e-5)
    assert np.isfinite(out).all()


def _engine(vae, vp, dit, dp, **kw):
    kw.setdefault("backbone", "flowmatching")
    kw.setdefault("total_step", 3)
    kw.setdefault("out_lengths", (24,))
    kw.setdefault("batch_tiers", (1, 2, 4))
    kw.setdefault("max_wait_ms", 40.0)
    kw.setdefault("text_emb_dim", 32)
    return ServingEngine(dit, vae, dp, vp, **kw)


def test_engine_results_match_direct_sampler():
    """Whatever batches the engine forms, each request's series equals a
    direct serving-sampler call with that request's (seed, cfg, emb)."""
    vae, vp, dit, dp, lat = _setup()
    emb = np.asarray(jax.random.normal(jax.random.key(11), (6, 32)))
    with _engine(vae, vp, dit, dp) as eng:
        futs = [eng.submit(emb[i], 24, cfg_scale=1.0 + i, seed=100 + i)
                for i in range(6)]
        results = [f.result(timeout=120) for f in futs]
    direct = make_serving_sampler(dit, vae, "flowmatching", 3, lat, 24)
    for i, r in enumerate(results):
        want = np.asarray(direct(
            dp, vp, jnp.array([100 + i], jnp.uint32),
            jnp.array([1.0 + i], jnp.float32), jnp.asarray(emb[i:i + 1])))
        np.testing.assert_allclose(r.series, want[0], rtol=1e-4, atol=1e-5)
        assert r.seed == 100 + i and r.cfg_scale == 1.0 + i
        assert r.out_length == 24 and r.batched_with >= 1


def test_engine_multi_bucket_and_stats():
    """Two length buckets share one engine; stats account every row."""
    vae, vp, dit, dp, _ = _setup()
    emb = np.zeros((32,), np.float32)
    with _engine(vae, vp, dit, dp, out_lengths=(16, 24)) as eng:
        rs = eng.generate([(emb, 16), (emb, 24), (emb, 16), (emb, 24)])
        assert [r.out_length for r in rs] == [16, 24, 16, 24]
        assert {r.series.shape[-1] for r in rs} == {16, 24}
        st = eng.stats()
    assert st["requests"] == 4 and st["served_rows"] == 4
    assert st["batches"] >= 2 and st["p50_latency_s"] > 0


def test_engine_pads_to_tier_and_reports_it():
    """3 concurrent requests on tiers (1,2,4) must serve at tier 4 with
    one padding row (or smaller tiers if the dispatcher split them —
    either way padding accounting must be consistent)."""
    vae, vp, dit, dp, _ = _setup()
    emb = np.zeros((32,), np.float32)
    with _engine(vae, vp, dit, dp, max_wait_ms=200.0) as eng:
        # block the dispatcher from flushing early by submitting together
        futs = [eng.submit(emb, 24, seed=i) for i in range(3)]
        rs = [f.result(timeout=120) for f in futs]
        st = eng.stats()
    assert all(r.batch_size in (1, 2, 4) for r in rs)
    total_rows = st["served_rows"] + st["padding_fraction"] * 0  # served only
    assert total_rows == 3
    if rs[0].batched_with == 3:          # single batch path: tier 4, 1 pad
        assert rs[0].batch_size == 4
        assert st["padding_fraction"] == pytest.approx(0.25)


def test_engine_deadline_flush_single_request():
    """A lone request must not wait forever for a full batch: the
    max_wait deadline flushes it at the smallest tier."""
    vae, vp, dit, dp, _ = _setup()
    emb = np.zeros((32,), np.float32)
    with _engine(vae, vp, dit, dp, max_wait_ms=10.0) as eng:
        r = eng.submit(emb, 24).result(timeout=120)
    assert r.batched_with == 1


def test_engine_rejects_bad_requests_and_shutdown():
    vae, vp, dit, dp, _ = _setup()
    emb = np.zeros((32,), np.float32)
    eng = _engine(vae, vp, dit, dp)
    with pytest.raises(ValueError):
        eng.submit(emb, 999)                      # not a bucket
    with pytest.raises(ValueError):
        eng.submit(np.zeros((5,), np.float32), 24)  # wrong emb dim
    eng.close()
    with pytest.raises(RuntimeError):
        eng.submit(emb, 24)


def test_engine_close_drains_pending():
    """close(drain=True) serves queued work; drain=False fails it."""
    vae, vp, dit, dp, _ = _setup()
    emb = np.zeros((32,), np.float32)
    eng = _engine(vae, vp, dit, dp, max_wait_ms=10_000.0,
                  batch_tiers=(4,))
    f = eng.submit(emb, 24)          # can't fill tier 4 -> waits
    eng.close(drain=True)
    assert f.result(timeout=1).series.shape[-1] == 24

    eng2 = _engine(vae, vp, dit, dp, max_wait_ms=10_000.0,
                   batch_tiers=(4,))
    f2 = eng2.submit(emb, 24)
    eng2.close(drain=False)
    with pytest.raises(RuntimeError):
        f2.result(timeout=1)


def test_engine_concurrent_submitters():
    """Thread-safety: many submitters racing the dispatcher all get
    correct, finite results."""
    vae, vp, dit, dp, _ = _setup()
    emb = np.asarray(jax.random.normal(jax.random.key(13), (8, 32)))
    outs = {}

    with _engine(vae, vp, dit, dp, max_wait_ms=5.0) as eng:
        def worker(i):
            outs[i] = eng.submit(emb[i], 24, seed=i).result(timeout=120)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        st = eng.stats()
    assert sorted(outs) == list(range(8))
    assert all(np.isfinite(outs[i].series).all() for i in outs)
    assert st["served_rows"] == 8


def test_engine_dp_sharded_parity():
    """With a ScalingPlan over the 8 virtual CPU devices, DP-divisible
    tiers dispatch data-sharded and must reproduce the unsharded engine's
    results row for row."""
    from t2ms_tpu.training.scaling import setup_scaling

    vae, vp, dit, dp, _ = _setup()
    emb = np.asarray(jax.random.normal(jax.random.key(17), (8, 32)))
    reqs = [(emb[i], 24, 2.0 + i, 300 + i) for i in range(8)]

    plan = setup_scaling(
        argparse.Namespace(batch_size=8, compute_dtype="f32"),
        for_training=False)
    assert plan.n_data > 1, "conftest should provide 8 virtual devices"

    with _engine(vae, vp, dit, dp, batch_tiers=(8,),
                 max_wait_ms=500.0, scaling_plan=plan) as eng:
        sharded = eng.generate(reqs)
    with _engine(vae, vp, dit, dp, batch_tiers=(8,),
                 max_wait_ms=500.0) as eng:
        plain = eng.generate(reqs)
    for a, b in zip(sharded, plain):
        np.testing.assert_allclose(a.series, b.series, rtol=1e-4,
                                   atol=1e-5)


def test_serving_sampler_ddim_rows_deterministic():
    """DDIM through the serving sampler: deterministic given the seed,
    and batch-composition independent (noise enters only at x_t0)."""
    vae, vp, dit, dp, lat = _setup()
    s = make_serving_sampler(dit, vae, "ddpm", 8, lat, 24,
                             solver="ddim", sample_steps=3)
    emb = jax.random.normal(jax.random.key(21), (3, 32))
    seeds = jnp.array([4, 5, 6], dtype=jnp.uint32)
    cfg = jnp.full((3,), 2.0, jnp.float32)
    out = np.asarray(s(dp, vp, seeds, cfg, emb))
    solo = np.asarray(s(dp, vp, seeds[2:3], cfg[2:3], emb[2:3]))
    np.testing.assert_allclose(solo[0], out[2], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(out, np.asarray(s(dp, vp, seeds, cfg,
                                                    emb)))


def test_engine_admission_control():
    """max_pending caps the queue: excess submits raise EngineOverloaded
    immediately; draining serves what was admitted."""
    from t2ms_tpu.serving import EngineOverloaded
    vae, vp, dit, dp, _ = _setup()
    emb = np.zeros((32,), np.float32)
    eng = _engine(vae, vp, dit, dp, batch_tiers=(4,),
                  max_wait_ms=10_000.0, max_pending=2)
    f1 = eng.submit(emb, 24)
    f2 = eng.submit(emb, 24)
    with pytest.raises(EngineOverloaded):
        eng.submit(emb, 24)
    eng.close(drain=True)
    assert f1.result(timeout=1).series.shape[-1] == 24
    assert f2.result(timeout=1).series.shape[-1] == 24


def test_engine_holds_expired_batch_when_pipeline_full():
    """Saturation rule (round-4 serving bench: a hot deadline fragmented
    batches to 55% padding): a deadline-expired group must be HELD while
    the in-flight pipeline is full — it keeps aggregating and dispatches
    as ONE larger batch once the completer frees a slot."""
    import threading
    import time as _time

    vae, vp, dit, dp, _ = _setup()
    emb = np.zeros((32,), np.float32)

    release = threading.Event()

    class _SlowArray:
        """Host-sync blocker: np.asarray() blocks until release is set."""

        def __init__(self, n):
            self._n = n

        def __array__(self, dtype=None, copy=None):
            release.wait(timeout=60)
            a = np.zeros((self._n, 24), np.float32)
            return a if dtype is None else a.astype(dtype)

    def fake_sampler(params, vae_params, seeds, cfg, e):
        return _SlowArray(len(np.asarray(seeds)))

    # deadline 0 = every request is instantly expired: without the hold
    # rule each would dispatch alone at tier 1
    with _engine(vae, vp, dit, dp, max_wait_ms=0.0) as eng:
        eng._samplers = {k: fake_sampler for k in eng._samplers}
        # fill the pipeline: b1 is host-syncing in the completer (blocked
        # in __array__), b2 and b3 occupy the maxsize-2 inflight queue.
        # Submit ONE at a time (waiting for pickup) so they cannot
        # coalesce into fewer batches.
        first = []
        for i in range(3):
            first.append(eng.submit(emb, 24, seed=i))
            deadline = _time.monotonic() + 10
            while _time.monotonic() < deadline:
                with eng._lock:
                    drained = all(not q for q in eng._queues.values())
                if drained:
                    break
                _time.sleep(0.01)
        deadline = _time.monotonic() + 10
        while not eng._inflight.full() and _time.monotonic() < deadline:
            _time.sleep(0.01)
        assert eng._inflight.full(), "pipeline never filled"

        held = [eng.submit(emb, 24, seed=10 + i) for i in range(3)]
        _time.sleep(0.3)   # deadline long expired; the hold must keep
        with eng._lock:    # all 3 queued, aggregating
            assert sum(len(q) for q in eng._queues.values()) == 3

        release.set()
        results = [f.result(timeout=60) for f in held]
        for f in first:
            f.result(timeout=60)
    # the held trio must have served together as one batch (tier 4 with
    # one padding row on tiers (1,2,4))
    assert [r.batched_with for r in results] == [3, 3, 3]
    assert [r.batch_size for r in results] == [4, 4, 4]
