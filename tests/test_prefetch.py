"""Prefetch iterator tests: ordering, device placement, sharding, error
propagation."""

import numpy as np
import pytest

import jax

from t2ms_tpu.data.prefetch import prefetch_to_device
from t2ms_tpu.parallel import make_mesh


def test_prefetch_preserves_order_and_places():
    batches = [np.full((4, 3), i, np.float32) for i in range(5)]
    got = list(prefetch_to_device(iter(batches)))
    assert len(got) == 5
    for i, (host, dev) in enumerate(got):
        assert float(dev[0, 0]) == i
        assert isinstance(dev, jax.Array)


def test_prefetch_with_mesh_shards():
    mesh = make_mesh()
    batches = [np.arange(16, dtype=np.float32).reshape(8, 2)]
    (host, dev), = list(prefetch_to_device(iter(batches), mesh=mesh))
    assert dev.sharding.spec[0] == "data"
    np.testing.assert_array_equal(np.asarray(dev), batches[0])


def test_prefetch_transform_and_error():
    def gen():
        yield np.ones(3)
        raise RuntimeError("boom")

    it = prefetch_to_device(gen(), transform=lambda b: b * 2)
    host, dev = next(it)
    np.testing.assert_array_equal(np.asarray(dev), np.full(3, 2.0))
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_multihost_batcher_partitions_global_stream():
    """Two simulated processes drawing the same seeded shuffle must see
    disjoint contiguous slices whose union is exactly the single-process
    global batch (SURVEY.md §2.6 DP per-host loading)."""
    from t2ms_tpu.data.loaders import BucketBatcher

    rng = np.random.default_rng(0)
    buckets = {24: dict(x=rng.standard_normal((32, 24)),
                        embedding=rng.standard_normal((32, 8)),
                        texts=[f"t{i}" for i in range(32)])}
    global_b = BucketBatcher(buckets, 8, seed=5, process_count=1,
                             process_index=0)
    p0 = BucketBatcher(buckets, 8, seed=5, process_count=2, process_index=0)
    p1 = BucketBatcher(buckets, 8, seed=5, process_count=2, process_index=1)
    for gb, b0, b1 in zip(global_b.epoch(3), p0.epoch(3), p1.epoch(3)):
        assert b0.x.shape[0] == 4 and b1.x.shape[0] == 4
        np.testing.assert_array_equal(np.concatenate([b0.x, b1.x]), gb.x)
        np.testing.assert_array_equal(
            np.concatenate([b0.embedding, b1.embedding]), gb.embedding)
        assert b0.texts + b1.texts == gb.texts


def test_global_shard_batch_assembles_process_local_data():
    """Single-process degenerate path of the multi-host assembly: the
    make_array_from_process_local_data call must produce the same global
    array as shard_batch on an 8-device data mesh."""
    import jax

    from t2ms_tpu.parallel.mesh import (data_sharding, make_mesh,
                                        shard_batch)

    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    via_local = jax.make_array_from_process_local_data(
        data_sharding(mesh, 2), x)
    via_put = shard_batch(mesh, x)
    np.testing.assert_array_equal(np.asarray(via_local),
                                  np.asarray(via_put))
    assert via_local.sharding.is_equivalent_to(via_put.sharding, 2)


def test_multihost_tail_batch_wraps_instead_of_raising():
    """A final batch smaller than (or not divisible by) process_count
    wrap-pads to equal per-process slices: no mid-epoch ValueError, no
    silently dropped rows (round-2 review fix)."""
    from t2ms_tpu.data.loaders import BucketBatcher

    rng = np.random.default_rng(1)
    # 35 rows, batch 8 -> final slot has 3 rows < process_count 4
    buckets = {24: dict(x=rng.standard_normal((35, 24)),
                        embedding=rng.standard_normal((35, 8)),
                        texts=[f"t{i}" for i in range(35)])}
    procs = [BucketBatcher(buckets, 8, seed=5, drop_last=False,
                           process_count=4, process_index=i)
             for i in range(4)]
    epochs = [list(p.epoch(0)) for p in procs]
    sizes = {len(e) for e in epochs}
    assert sizes == {len(epochs[0])}
    for batches in zip(*epochs):
        per = {b.x.shape[0] for b in batches}
        assert len(per) == 1          # equal-sized slices on every process
    # union of the final (wrapped) batch still covers only real rows
    last_rows = np.concatenate([e[-1].x for e in epochs])
    assert last_rows.shape[0] == 4 * epochs[0][-1].x.shape[0]
    # wrapped rows carry valid=False so eval pipelines can drop them
    # instead of double-counting (ADVICE r2); full batches carry None
    for e in epochs:
        assert all(b.valid is None for b in e[:-1])
    masks = [e[-1].valid for e in epochs]
    assert all(m is not None for m in masks)
    n_valid = int(np.concatenate(masks).sum())
    assert n_valid == 3               # the real tail rows, exactly once
    kept = np.concatenate([e[-1].x[m] for e, m in zip(epochs, masks)])
    assert kept.shape[0] == 3 and np.unique(kept, axis=0).shape[0] == 3


def test_myevaluation_skips_mismatched_sample():
    """A per-sample shape mismatch skips that sample but keeps the
    accumulated results (round-2 review fix: returning None crashed the
    next sample's item assignment)."""
    import argparse

    from t2ms_tpu.cli.myevaluation import evaluate_data

    args = argparse.Namespace(method_list="MSE", device=None)
    runs, D, T = 3, 2, 16
    ok = np.random.default_rng(0).standard_normal((runs, D, T))
    result = {}
    result = evaluate_data(args, ok, ok.copy(), 0, result)
    assert 0 in result and "MSE" in result[0]
    bad = np.zeros((runs, D, T + 4))
    result = evaluate_data(args, ok, bad, 1, result)   # mismatch: skip
    assert result is not None and 1 not in result and 0 in result
    result = evaluate_data(args, ok, ok.copy(), 2, result)
    assert 2 in result
