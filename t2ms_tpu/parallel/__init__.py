from t2ms_tpu.parallel.mesh import (
    data_sharding,
    host_local_batch_size,
    make_mesh,
    replicated,
    shard_batch,
)
from t2ms_tpu.parallel.pp import pipeline_apply

__all__ = [
    "data_sharding",
    "host_local_batch_size",
    "make_mesh",
    "pipeline_apply",
    "replicated",
    "shard_batch",
]
