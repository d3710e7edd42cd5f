"""Data factory tests: CSV parse/scale/split parity, motion bucketing rules,
fixed-shape bucketed batching, embedder determinism."""

import numpy as np
import pytest

from t2ms_tpu.data import (BucketBatcher, FakeEmbedder, load_motion_records,
                           load_t2s_csv, map_target_len,
                           reference_random_split, split_indices)
from t2ms_tpu.data.synthetic import write_motion_dataset, write_t2s_csv


def test_split_indices_matches_legacy_numpy():
    """Must equal np.random.seed(...); np.random.permutation(...)."""
    st = np.random.get_state()
    np.random.seed(123)
    want = np.random.permutation(100)
    np.random.set_state(st)
    tr, te = split_indices(100, 0.99, seed=123)
    np.testing.assert_array_equal(np.concatenate([tr, te]), want)
    assert len(tr) == 99 and len(te) == 1


def test_t2s_csv_roundtrip(tmp_path):
    p = write_t2s_csv(str(tmp_path / "embedding_cleaned_synth_24.csv"),
                      n=50, T=24)
    train = load_t2s_csv("embedding_cleaned_synth_24", str(tmp_path),
                         "train", proportion=0.9, seed=123)
    test = load_t2s_csv("embedding_cleaned_synth_24", str(tmp_path),
                        "test", proportion=0.9, seed=123)
    assert train.samples.shape == (45, 24)
    assert test.samples.shape == (5, 24)
    assert train.embeddings.shape == (45, 128)
    # MinMax scaling to [0, 1] per column over the full table
    full = np.concatenate([train.samples, test.samples])
    assert full.min() >= -1e-6 and full.max() <= 1 + 1e-6
    assert len(train.texts) == 45


def test_t2s_tsl_ragged_rows(tmp_path):
    """A TSL-named CSV with ragged OT literals loads as an UNscaled
    object array (reference dataset.py:77-78) instead of crashing."""
    import pandas as pd
    rows = [[1.0, 2.0, 3.0], [4.0, 5.0], [6.0, 7.0, 8.0, 9.0],
            [1.5, 2.5, 3.5], [0.5, 1.0]]
    pd.DataFrame({
        "Text": [f"t{i}" for i in range(5)],
        "OT": [str(r) for r in rows],
        "TextEmbedding": [str([0.1] * 8)] * 5,
    }).to_csv(tmp_path / "synth_TSL_x.csv", index=False)
    d = load_t2s_csv("synth_TSL_x", str(tmp_path), "train",
                     proportion=0.8, seed=123)
    assert d.samples.dtype == object and len(d) == 4
    got = {tuple(np.asarray(s)) for s in d.samples}
    assert got <= {tuple(r) for r in rows}     # unscaled, original values


def test_t2s_mmd_style_embeddings(tmp_path):
    write_t2s_csv(str(tmp_path / "embedding_cleaned_Agriculture_24.csv"),
                  n=20, T=24, mmd_style=True)
    d = load_t2s_csv("embedding_cleaned_Agriculture_24", str(tmp_path),
                     "train", proportion=0.9, seed=123)
    assert d.embeddings.shape == (18, 128)
    assert np.isfinite(d.embeddings).all()


@pytest.mark.parametrize("sport,cases", [
    ("benchpress", [(40, 36, 36), (57, 36, 36), (58, 36, 0), (58, 72, 72),
                    (77, 72, 72), (78, 72, 0), (78, 144, 144),
                    (200, 144, 144)]),
    ("deadlift", [(40, 48, 48), (80, 48, 48), (81, 48, 0), (81, 96, 96),
                  (98, 96, 96), (99, 96, 0), (99, 192, 192)]),
])
def test_bucket_thresholds(sport, cases):
    for T, target, want in cases:
        assert map_target_len(sport, T, target) == want


def test_motion_records_bucketing(tmp_path):
    root = write_motion_dataset(str(tmp_path), "benchpress")
    import os
    jp = os.path.join(root, "data.json")
    cr = os.path.join(root, "Caption_synth")
    r36 = load_motion_records("benchpress", jp, cr, "train", 36)
    r72 = load_motion_records("benchpress", jp, cr, "train", 72)
    r144 = load_motion_records("benchpress", jp, cr, "train", 144)
    rtest = load_motion_records("benchpress", jp, cr, "test", 0)
    assert len(r36) + len(r72) + len(r144) == len(rtest) == 18
    for r in r36:
        assert r.x.shape == (10, 36)     # 13 features - 3 dropped
    for r in r72:
        assert r.x.shape == (10, 72)
    assert all(len(r.embeddings) == 2 for r in r36)


def test_motion_records_deadlift(tmp_path):
    root = write_motion_dataset(str(tmp_path), "deadlift")
    import os
    jp = os.path.join(root, "data.json")
    cr = os.path.join(root, "Caption_synth")
    recs = load_motion_records("deadlift", jp, cr, "train", 48)
    assert all(r.x.shape == (7, 48) for r in recs)
    assert all(len(r.embeddings) == 1 for r in recs)


def test_reference_random_split_matches_torch():
    import torch
    from torch.utils.data import random_split
    g = torch.Generator().manual_seed(2025)
    tr, te = random_split(list(range(37)), [0.9, 0.1], generator=g)
    got_tr, got_te = reference_random_split(37, 2025)
    assert got_tr == list(tr.indices)
    assert got_te == list(te.indices)


def test_bucket_batcher_fixed_shapes():
    rng = np.random.default_rng(0)
    buckets = {
        24: dict(x=rng.standard_normal((10, 24)).astype(np.float32),
                 embedding=rng.standard_normal((10, 8)).astype(np.float32),
                 texts=[f"a{i}" for i in range(10)]),
        48: dict(x=rng.standard_normal((7, 48)).astype(np.float32),
                 embedding=rng.standard_normal((7, 8)).astype(np.float32),
                 texts=[f"b{i}" for i in range(7)]),
    }
    bb = BucketBatcher(buckets, batch_size=4, seed=1)
    batches = list(bb.epoch(0))
    assert len(batches) == len(bb) == 2 + 1     # 10//4 + 7//4
    for b in batches:
        assert b.x.shape[0] == 4                # fixed size, drop_last
        assert b.x.shape[1] == b.bucket
    # determinism per (seed, epoch) and reshuffling across epochs
    again = list(bb.epoch(0))
    np.testing.assert_array_equal(batches[0].x, again[0].x)
    other = list(bb.epoch(1))
    assert not all(np.array_equal(a.x, b.x)
                   for a, b in zip(batches, other))


def test_fake_embedder_deterministic_and_normalized():
    e = FakeEmbedder(128)
    a = e.embed(["hello", "world"])
    b = e.embed(["hello", "world"])
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)
    assert not np.allclose(a[0], a[1])
