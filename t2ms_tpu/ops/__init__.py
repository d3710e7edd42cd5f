from t2ms_tpu.ops.resize import (
    adaptive_avg_pool1d,
    adaptive_avg_pool_matrix,
    linear_resize,
    linear_resize_matrix,
    resize_time_axis,
)

__all__ = [
    "adaptive_avg_pool1d",
    "adaptive_avg_pool_matrix",
    "linear_resize",
    "linear_resize_matrix",
    "resize_time_axis",
]
