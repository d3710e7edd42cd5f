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
