from t2ms_tpu.parallel.mesh import (
    data_sharding,
    host_local_batch_size,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "data_sharding",
    "host_local_batch_size",
    "make_mesh",
    "replicated",
    "shard_batch",
]
