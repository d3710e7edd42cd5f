"""T2S CSV dataset: parsing, scaling, and the seeded train/test split.

Reference: datafactory/dataset.py —
  * CSV columns: Text (caption), OT (series literal), TextEmbedding
    (128-d literal), parsed at dataset.py:72-96;
  * MinMax scaling over the whole table (dataset.py:81-82) unless the name
    contains 'TSL';
  * RNG-stable split: np.random.seed(seed); permutation; ceil(size*ratio)
    regular ids (dataset.py:44-69) — we reproduce the exact indices via
    np.random.RandomState(seed).permutation, which generates the identical
    MT19937 stream.

Output is columnar numpy (samples, texts, embeddings) — host-side arrays
ready for fixed-shape device batching (no per-item Dataset objects).
"""

from __future__ import annotations

import ast
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import pandas as pd

__all__ = ["T2SData", "load_t2s_csv", "split_indices", "parse_literal_rows"]

_MMD_NAMES = {"Agriculture", "Climate", "Energy", "Health", "Security",
              "Traffic", "Economy", "Environment", "SocialGood", "SUSHI"}


def parse_literal_rows(rows, row_len: Optional[int] = None) -> np.ndarray:
    """Parse a column of bracketed float-list literals into (N, L) float64.

    Uses the native C++ parser (native/parse.cpp) — the reference's
    per-row ``ast.literal_eval`` (dataset.py:76) is the load-time hot path
    on 600K-row corpora. Falls back to ast parsing when the native library
    is unavailable. Handles both comma- and space-separated literals."""
    rows = list(rows)
    if row_len is None:
        row_len = len(_parse_row(rows[0]))
    from t2ms_tpu.utils.native import load_native
    lib = load_native()
    if lib is not None and all(isinstance(r, str) for r in rows):
        import ctypes
        buf = "\n".join(rows).encode()
        out = np.empty((len(rows), row_len), np.float64)
        got = lib.t2ms_parse_float_lists(
            buf, len(rows), row_len,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if got == len(rows):
            return out
        # fall through to python parsing on shape mismatch
    return np.asarray([_parse_row(r) for r in rows], dtype=np.float64)


def _parse_row(r):
    """One bracketed float-list literal -> python list (comma- or
    space-separated, reference dataset.py:76,84-94)."""
    if not isinstance(r, str):
        return list(r)
    try:
        return list(ast.literal_eval(r))
    except (ValueError, SyntaxError):
        return [float(v) for v in
                r.replace("[", "").replace("]", "").strip().split()]


def split_indices(size: int, ratio: float, seed: int = 123):
    """Reference divide() split ids (dataset.py:44-69)."""
    rs = np.random.RandomState(seed)
    n_train = int(np.ceil(size * ratio))
    perm = rs.permutation(size)
    return perm[:n_train], perm[n_train:]


@dataclass
class T2SData:
    """One split of a T2S CSV dataset."""
    samples: np.ndarray              # (N, T) float32
    texts: List[str]
    embeddings: np.ndarray           # (N, 128) float32
    name: str = ""
    bucket: Optional[int] = None     # series length tag for mix-train

    def __len__(self):
        return self.samples.shape[0]

    @property
    def length(self) -> int:
        return self.samples.shape[-1]


def _parse_embedding_column(col: pd.Series, name: str) -> np.ndarray:
    # Both embedding formats (comma literals for MMD/SUSHI families,
    # space-separated dumps otherwise — dataset.py:84-94) parse through the
    # same native float scanner.
    return parse_literal_rows(col.tolist(), row_len=None).astype(np.float32)


def load_t2s_csv(name: str, data_root: str, period: str = "train",
                 proportion: float = 0.99, seed: int = 123) -> T2SData:
    """Load + scale + split one CSV (reference T2SDataset.__init__)."""
    if period not in ("train", "test"):
        raise ValueError("period must be train or test")
    df = pd.read_csv(os.path.join(data_root, name + ".csv"))
    texts = df["Text"].tolist()
    if "TSL" in name.split("_"):
        # TSL rows may be RAGGED and are kept unscaled as an object array
        # (reference dataset.py:77-78 np.array(parsed, dtype=object))
        parsed = [_parse_row(r) for r in df["OT"]]
        if len({len(p) for p in parsed}) == 1:
            series = np.asarray(parsed, np.float64)
        else:
            series = np.empty(len(parsed), dtype=object)
            for i, p in enumerate(parsed):
                series[i] = np.asarray(p, np.float64)
    else:
        series = parse_literal_rows(df["OT"].tolist())
        # MinMaxScaler fit/transform over columns (dataset.py:81-82)
        mn = series.min(axis=0)
        rng_ = series.max(axis=0) - mn
        rng_[rng_ == 0] = 1.0
        series = (series - mn) / rng_
    embeddings = _parse_embedding_column(df["TextEmbedding"], name)

    tr, te = split_indices(series.shape[0], proportion, seed)
    idx = tr if period == "train" else te
    return T2SData(
        samples=(series[idx] if series.dtype == object
                 else series[idx].astype(np.float32)),
        texts=[texts[i] for i in idx],
        embeddings=embeddings[idx],
        name=name,
    )
