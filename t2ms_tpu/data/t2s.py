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
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

__all__ = ["T2SData", "load_t2s_csv", "split_indices"]

_MMD_NAMES = {"Agriculture", "Climate", "Energy", "Health", "Security",
              "Traffic", "Economy", "Environment", "SocialGood", "SUSHI"}


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
    parts = set(name.split("_"))
    if parts & _MMD_NAMES:
        rows = col.apply(lambda s: np.array(ast.literal_eval(s)))
    else:
        rows = col.apply(
            lambda s: [float(num) for num in
                       s.replace("[", "").replace("]", "").strip().split()])
    return np.asarray(rows.tolist(), dtype=np.float32)


def load_t2s_csv(name: str, data_root: str, period: str = "train",
                 proportion: float = 0.99, seed: int = 123) -> T2SData:
    """Load + scale + split one CSV (reference T2SDataset.__init__)."""
    if period not in ("train", "test"):
        raise ValueError("period must be train or test")
    df = pd.read_csv(os.path.join(data_root, name + ".csv"))
    texts = df["Text"].tolist()
    parsed = [ast.literal_eval(item) if isinstance(item, str) else item
              for item in df["OT"]]
    series = np.asarray(parsed, dtype=np.float64)
    if "TSL" not in name.split("_"):
        # MinMaxScaler fit/transform over columns (dataset.py:81-82)
        mn = series.min(axis=0)
        rng_ = series.max(axis=0) - mn
        rng_[rng_ == 0] = 1.0
        series = (series - mn) / rng_
    embeddings = _parse_embedding_column(df["TextEmbedding"], name)

    tr, te = split_indices(series.shape[0], proportion, seed)
    idx = tr if period == "train" else te
    return T2SData(
        samples=series[idx].astype(np.float32),
        texts=[texts[i] for i in idx],
        embeddings=embeddings[idx],
        name=name,
    )
