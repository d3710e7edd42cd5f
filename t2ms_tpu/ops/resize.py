"""Length resampling as matrix multiplication — the length-adaptive core.

The reference's "Length-Adaptive VAE" mechanism rests on two resampling
primitives (reference: model/pretrained/vqvae.py:70,98 uses
``F.interpolate(mode='linear', align_corners=True)``;
datafactory/benchpress/dataset.py:83-86 additionally uses
``F.adaptive_avg_pool1d`` for downsampling).

On TPU we implement both as *precomputed sparse-band matrices applied with a
matmul*: every resample is a linear map ``y = x @ R`` with ``R`` of shape
``(in_len, out_len)``.  This turns a gather-heavy op into an MXU-friendly
contraction, is exactly differentiable, and matches torch numerics to
float32 round-off (golden-tested in tests/test_resize.py).

Matrices are built in numpy at trace time (shapes are static under jit) and
cached per ``(in_len, out_len, mode)``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "linear_resize_matrix",
    "adaptive_avg_pool_matrix",
    "linear_resize",
    "adaptive_avg_pool1d",
    "resize_time_axis",
]


@functools.lru_cache(maxsize=None)
def _linear_resize_matrix_np(in_len: int, out_len: int) -> np.ndarray:
    """Row-stochastic (in_len, out_len) matrix for align_corners=True linear
    interpolation, matching ``torch.nn.functional.interpolate(mode='linear',
    align_corners=True)`` (reference vqvae.py:70)."""
    if in_len < 1 or out_len < 1:
        raise ValueError(f"invalid resize {in_len}->{out_len}")
    mat = np.zeros((in_len, out_len), dtype=np.float64)
    if out_len == 1:
        # torch samples position 0 when out_len == 1 under align_corners.
        mat[0, 0] = 1.0
        return mat.astype(np.float32)
    if in_len == 1:
        mat[0, :] = 1.0
        return mat.astype(np.float32)
    # torch computes source positions in float32 on f32 inputs
    # (aten upsample_linear1d: scale and src_idx are scalar_t); match it so
    # the fracs agree bitwise at large indices.
    scale = np.float32(in_len - 1) / np.float32(out_len - 1)
    pos = np.float32(np.arange(out_len, dtype=np.float32) * scale)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, in_len - 1)
    frac = (pos - lo.astype(np.float32)).astype(np.float64)
    for j in range(out_len):
        mat[lo[j], j] += 1.0 - frac[j]
        mat[hi[j], j] += frac[j]
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _adaptive_avg_pool_matrix_np(in_len: int, out_len: int) -> np.ndarray:
    """(in_len, out_len) matrix matching ``F.adaptive_avg_pool1d`` semantics:
    output j averages input[floor(j*in/out) : ceil((j+1)*in/out)]
    (reference benchpress/dataset.py:83)."""
    if in_len < 1 or out_len < 1:
        raise ValueError(f"invalid pool {in_len}->{out_len}")
    mat = np.zeros((in_len, out_len), dtype=np.float64)
    for j in range(out_len):
        start = (j * in_len) // out_len
        end = -((-(j + 1) * in_len) // out_len)  # ceil((j+1)*in/out)
        mat[start:end, j] = 1.0 / (end - start)
    return mat.astype(np.float32)


def linear_resize_matrix(in_len: int, out_len: int) -> jnp.ndarray:
    return jnp.asarray(_linear_resize_matrix_np(in_len, out_len))


def adaptive_avg_pool_matrix(in_len: int, out_len: int) -> jnp.ndarray:
    return jnp.asarray(_adaptive_avg_pool_matrix_np(in_len, out_len))


def linear_resize(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Resample the last axis of ``x`` to ``out_len`` with align-corners
    linear interpolation. Works for any leading shape; one matmul."""
    in_len = x.shape[-1]
    if in_len == out_len:
        return x
    mat = linear_resize_matrix(in_len, out_len)
    return jnp.matmul(x, mat.astype(x.dtype))


def adaptive_avg_pool1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch-equivalent adaptive average pooling over the last axis."""
    in_len = x.shape[-1]
    if in_len == out_len:
        return x
    mat = adaptive_avg_pool_matrix(in_len, out_len)
    return jnp.matmul(x, mat.astype(x.dtype))


def resize_time_axis(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Reference dataset resize rule (benchpress/dataset.py:79-87):
    adaptive-avg-pool when shrinking, linear interpolation when growing."""
    in_len = x.shape[-1]
    if in_len == out_len:
        return x
    if in_len > out_len:
        return adaptive_avg_pool1d(x, out_len)
    return linear_resize(x, out_len)
