"""Dynamic Time Warping — native C++ kernel + JAX wavefront version.

The reference's only native-accelerated call is
``dtaidistance.dtw_ndim.distance(..., use_c=True)`` (evaluation.py:156).
Our equivalents:

  * ``dtw_native`` / ``calculate_dtw`` — the C++ kernel in native/dtw.cpp
    (two-row DP, batch entry point, ctypes-bound; auto-built on first use).
  * ``dtw_jax`` — an anti-diagonal *wavefront* formulation: a lax.scan over
    the T1+T2-1 diagonals with each diagonal computed as one vector op, so
    a batch of DTWs vmaps onto the TPU VPU (O(T) sequential steps instead
    of O(T^2)).
  * pure-numpy fallback mirroring evaluate/metrics.py:139-170.

All return sqrt(accumulated squared-Euclidean frame cost) — identical to
dtaidistance's definition.
"""

from __future__ import annotations

import ctypes

import jax
import jax.numpy as jnp
import numpy as np

from t2ms_tpu.utils.native import load_native as _load_native

__all__ = ["calculate_dtw", "dtw_native", "dtw_numpy", "dtw_jax",
           "dtw_jax_batch"]


def _as_frames(x) -> np.ndarray:
    """(T,) -> (T, 1): a univariate series is T scalar FRAMES (reference
    metrics.py:139-170), not one T-dimensional frame — np.atleast_2d's
    (1, T) would silently compute plain Euclidean distance."""
    x = np.asarray(x, np.float64)
    return x[:, None] if x.ndim == 1 else x


def dtw_numpy(a: np.ndarray, b: np.ndarray, window: int = 0) -> float:
    """Two-row numpy DP (fallback). ``window`` is the same Sakoe-Chiba
    band as native/dtw.cpp (centered on the scaled diagonal; <= 0 =
    unconstrained) so fallback hosts agree with native ones."""
    a = _as_frames(a)
    b = _as_frames(b)
    if a.shape[1] != b.shape[1]:
        raise ValueError("dim mismatch")
    T1, T2 = a.shape[0], b.shape[0]
    prev = np.full(T2 + 1, np.inf)
    prev[0] = 0.0
    for i in range(1, T1 + 1):
        cost = np.sum((a[i - 1][None, :] - b) ** 2, axis=1)
        curr = np.full(T2 + 1, np.inf)
        j_lo, j_hi = 1, T2
        if window > 0:
            center = int(i * (T2 / T1))
            j_lo = max(center - window, 1)
            j_hi = min(center + window, T2)
        for j in range(j_lo, j_hi + 1):
            curr[j] = cost[j - 1] + min(prev[j], curr[j - 1], prev[j - 1])
        prev = curr
    return float(np.sqrt(prev[T2]))


def dtw_native(a: np.ndarray, b: np.ndarray, window: int = 0) -> float:
    """Single-pair native DTW; falls back to numpy if the .so can't build."""
    lib = _load_native()
    a = np.ascontiguousarray(_as_frames(a))
    b = np.ascontiguousarray(_as_frames(b))
    if a.shape[-1] != b.shape[-1]:
        raise ValueError("dim mismatch")
    if lib is None:
        return dtw_numpy(a, b, window)
    return float(lib.t2ms_dtw_ndim(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), a.shape[0],
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), b.shape[0],
        a.shape[1], window))


def calculate_dtw(ori_data: np.ndarray, comp_data: np.ndarray,
                  window: int = 0) -> float:
    """Mean DTW over the batch (reference calculate_dtw,
    myevaluation.py:174-183): inputs (N, T, D) frames x dims."""
    ori = np.ascontiguousarray(ori_data, np.float64)
    gen = np.ascontiguousarray(comp_data, np.float64)
    if ori.shape[0] != gen.shape[0]:
        # zip() below would silently truncate to the shorter batch
        raise ValueError(f"batch mismatch: {ori.shape[0]} vs "
                         f"{gen.shape[0]}")
    lib = _load_native()
    if lib is not None and ori.ndim == 3 and gen.ndim == 3:
        N, T1, D = ori.shape
        T2 = gen.shape[1]
        out = np.empty(N, np.float64)
        lib.t2ms_dtw_batch(
            ori.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            gen.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            N, T1, T2, D, window,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return float(out.mean())
    return float(np.mean([dtw_numpy(o, g, window)
                          for o, g in zip(ori, gen)]))


# ---------------------------------------------------------------------------
# JAX wavefront DTW (device-batched)
# ---------------------------------------------------------------------------

def dtw_jax(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """DTW of one pair (T1, D) x (T2, D) via anti-diagonal scan."""
    C = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)  # (T1, T2)
    T1, T2 = C.shape
    INF = jnp.inf
    i_idx = jnp.arange(T1)

    def body(carry, k):
        d2, d1 = carry          # diagonals k-2, k-1 indexed by i
        j = k - i_idx
        valid = (j >= 0) & (j < T2)
        im1 = jnp.maximum(i_idx - 1, 0)
        up = jnp.where(i_idx > 0, d1[im1], INF)      # D[i-1, j]
        left = d1                                     # D[i, j-1]
        diag = jnp.where(i_idx > 0, d2[im1], INF)     # D[i-1, j-1]
        best = jnp.minimum(jnp.minimum(up, left), diag)
        best = jnp.where((i_idx == 0) & (j == 0), 0.0, best)
        cost = C[i_idx, jnp.clip(j, 0, T2 - 1)]
        new = jnp.where(valid, cost + best, INF)
        return (d1, new), None

    init = (jnp.full(T1, INF), jnp.full(T1, INF))
    (_, last), _ = jax.lax.scan(body, init, jnp.arange(T1 + T2 - 1))
    return jnp.sqrt(last[T1 - 1])


@jax.jit
def dtw_jax_batch(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched DTW (N, T1, D) x (N, T2, D) -> (N,), vmapped wavefronts."""
    return jax.vmap(dtw_jax)(a, b)
