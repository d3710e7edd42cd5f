"""Regression tests for the round-3 hardening pass: behaviors fixed by
the adversarial self-review batches that had no direct coverage."""

import os
import threading
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_prefetch_abandonment_releases_worker():
    """Dropping the prefetch generator mid-stream must let the staging
    thread exit instead of blocking in q.put forever."""
    from t2ms_tpu.data.prefetch import prefetch_to_device

    before = {t.ident for t in threading.enumerate()}
    gen = prefetch_to_device(iter([{"x": np.ones(3)} for _ in range(100)]),
                             size=2)
    next(gen)
    gen.close()                      # abandon after one item
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.ident not in before and t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"staging thread leaked: {leaked}"


def test_host_local_batch_size_requires_process_divisibility(monkeypatch):
    from t2ms_tpu.parallel import make_mesh
    from t2ms_tpu.parallel.mesh import host_local_batch_size
    mesh = make_mesh(jax.local_devices(backend="cpu")[:2], data=2, model=1)
    assert host_local_batch_size(6, mesh) == 6    # single process
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    with pytest.raises(ValueError, match="process"):
        host_local_batch_size(6, mesh)            # 6 % 4 != 0


def test_env_flag_falsy_strings(monkeypatch):
    from t2ms_tpu.config import env_flag
    for v in ("0", "false", "False", "no", "off", ""):
        monkeypatch.setenv("T2MS_TEST_FLAG", v)
        assert not env_flag("T2MS_TEST_FLAG"), v
    for v in ("1", "true", "yes"):
        monkeypatch.setenv("T2MS_TEST_FLAG", v)
        assert env_flag("T2MS_TEST_FLAG"), v
    monkeypatch.delenv("T2MS_TEST_FLAG")
    assert not env_flag("T2MS_TEST_FLAG")


def test_steptimer_skip_zero_measures():
    from t2ms_tpu.utils.logging import StepTimer
    t = StepTimer(skip_first=0)
    for _ in range(3):
        t.tick()
    assert np.isfinite(t.steps_per_sec) and t.steps_per_sec > 0


def test_mix_train_rejects_suffixed_name():
    from t2ms_tpu.data.registry import csv_path_for
    assert csv_path_for("ETTh1", mix_train=True).endswith("TSFragment-600K")
    assert csv_path_for("ETTh1_24", mix_train=False).endswith("our")
    with pytest.raises(ValueError, match="bare family"):
        csv_path_for("ETTh1_24", mix_train=True)


def test_seed_everything_none_gives_usable_key():
    from t2ms_tpu.utils.prng import seed_everything
    k1 = seed_everything(None)
    k2 = seed_everything(None)
    # usable keys, and (overwhelmingly likely) distinct entropy
    v1 = jax.random.uniform(k1, (2,))
    assert np.isfinite(np.asarray(v1)).all()
    assert not np.array_equal(jax.random.key_data(k1),
                              jax.random.key_data(k2))


def test_caption_resume_retries_failed_clip(tmp_path):
    """A clip whose captioning failed (empty dir, no caption.json) must
    be retried on the next run, not skipped forever."""
    import json

    from t2ms_tpu.pipeline.captions import generate_captions
    from t2ms_tpu.pipeline.llm import FakeChat

    data = {"s1": {"0": {"featA": [1.0, 2.0], "featB": [3.0, 4.0]}}}
    data_path = tmp_path / "data.json"
    data_path.write_text(json.dumps(data))
    out = tmp_path / "caps"
    # simulate a previous failed run: dir exists, artifact missing
    (out / "s1" / "0").mkdir(parents=True)
    n = generate_captions(FakeChat(), str(data_path), str(out),
                          {"featA": "a", "featB": "b"}, make_figures=False)
    assert n == 1
    assert (out / "s1" / "0" / "caption.json").exists()


def test_corpus_text_is_nonempty(tmp_path):
    """Offline corpus samples must carry real conditioning text — a
    FakeChat/trend schema mismatch previously wrote Text='' everywhere
    while every validator stayed green."""
    import json

    from t2ms_tpu.pipeline.corpus import generate_corpus
    from t2ms_tpu.pipeline.llm import FakeChat, FakeEmbed

    rng = np.random.default_rng(0)
    series = rng.standard_normal(64).tolist()
    out = str(tmp_path / "corpus")
    n = generate_corpus(FakeChat(), FakeEmbed(), series, 24, out,
                        make_figures=False)
    assert n > 0
    texts = set()
    for f in os.listdir(out):
        if f.endswith(".json"):
            with open(os.path.join(out, f)) as fh:
                payload = json.load(fh)
            assert payload["Text"].strip(), f
            texts.add(payload["Text"])
    assert len(texts) > 1            # distinct windows -> distinct text
