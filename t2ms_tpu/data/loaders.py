"""Fixed-shape, length-bucketed batch streams — the TPU answer to the
reference's ragged AlternatingDataset + grouping collate.

The reference shuffles three per-length datasets together and regroups each
batch into up to three variable-size sub-batches (dataloader.py:115-133) —
variable shapes that would retrace/recompile under XLA every step. Here each
length bucket yields *fixed-size* batches (drop_last like the reference
train loaders), and the epoch interleaves bucket batches in a seeded shuffled
order. Same data distribution per epoch, but every batch shape is one of
exactly ``len(buckets)`` compiled programs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["ArrayBatch", "BucketBatcher"]


@dataclass
class ArrayBatch:
    """One device-ready batch from a single length bucket."""
    x: np.ndarray                 # (B, ...) series
    embedding: np.ndarray         # (B, E)
    texts: List[str]
    bucket: int                   # series length of this bucket
    subjects: Optional[List[str]] = None
    extra_embedding: Optional[np.ndarray] = None  # e.g. summary embedding
    valid: Optional[np.ndarray] = None  # (B,) bool; None = all rows real.
    # Set only when a multi-host tail batch was wrap-padded: wrapped
    # (duplicated) rows carry False so evaluation pipelines can drop
    # them instead of double-counting (ADVICE r2).

    def __len__(self):
        return self.x.shape[0]


class BucketBatcher:
    """Epoch iterator over per-bucket columnar stores.

    buckets: dict length -> dict(x=(N,...), embedding=(N,E), texts=[...],
    subjects?/extra_embedding?). Each epoch: shuffle within buckets, emit
    fixed-size batches, interleave across buckets in shuffled order.

    Multi-host (SURVEY.md §2.6 DP row): pass process_index/process_count
    (default: jax process topology) and ``batch_size`` is treated as the
    GLOBAL batch — every process draws the identical seeded shuffle, then
    keeps only its contiguous 1/process_count slice of each batch, so the
    per-host streams partition the global stream exactly.
    parallel.mesh.global_shard_batch reassembles the global jax.Array via
    jax.make_array_from_process_local_data."""

    def __init__(self, buckets: Dict[int, dict], batch_size: int,
                 seed: int = 0, drop_last: bool = True,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.buckets = buckets
        self.batch_size = batch_size
        self.seed = seed
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count

    def _local_slice(self, idx: np.ndarray):
        """-> (local_idx, valid_mask-or-None)."""
        pc, pi = self.process_count, self.process_index
        if pc is None:
            import jax
            pc, pi = jax.process_count(), jax.process_index()
        if pc <= 1:
            return idx, None
        # every process must contribute an equal-sized slice (the global
        # assembly requires consistent shapes), so a tail batch that does
        # not divide evenly is padded BY WRAPPING — no rows are silently
        # dropped and no mid-epoch error on small final batches. The
        # wrapped (duplicated) rows are flagged False in the valid mask
        # so evaluation consumers can drop them (ADVICE r2).
        per = -(-len(idx) // pc)
        if per * pc != len(idx):
            pad = np.resize(idx, per * pc)
            pos = np.arange(pi * per, (pi + 1) * per)
            return pad[pi * per:(pi + 1) * per], pos < len(idx)
        return idx[pi * per:(pi + 1) * per], None

    def __len__(self):
        n = 0
        for data in self.buckets.values():
            size = data["x"].shape[0]
            n += (size // self.batch_size if self.drop_last
                  else -(-size // self.batch_size))
        return n

    @property
    def num_buckets(self) -> int:
        return len(self.buckets)

    def epoch(self, epoch_idx: int = 0) -> Iterator[ArrayBatch]:
        rng = np.random.default_rng((self.seed, epoch_idx))
        slots: List[Tuple[int, np.ndarray]] = []
        for length, data in self.buckets.items():
            size = data["x"].shape[0]
            perm = rng.permutation(size)
            n_full = size // self.batch_size
            for b in range(n_full):
                slots.append((length, perm[b * self.batch_size:
                                           (b + 1) * self.batch_size]))
            if not self.drop_last and size % self.batch_size:
                slots.append((length, perm[n_full * self.batch_size:]))
        order = rng.permutation(len(slots))
        for i in order:
            length, idx = slots[i]
            idx, valid = self._local_slice(idx)
            data = self.buckets[length]
            yield ArrayBatch(
                x=data["x"][idx],
                embedding=data["embedding"][idx],
                texts=[data["texts"][j] for j in idx],
                bucket=length,
                subjects=([data["subjects"][j] for j in idx]
                          if "subjects" in data else None),
                extra_embedding=(data["extra_embedding"][idx]
                                 if "extra_embedding" in data else None),
                valid=valid,
            )

    @staticmethod
    def from_t2s(datasets: Sequence, batch_size: int, seed: int = 0,
                 drop_last: bool = True) -> "BucketBatcher":
        """Build from T2SData splits (one per length)."""
        buckets = {}
        for ds in datasets:
            buckets[ds.length] = dict(x=ds.samples, embedding=ds.embeddings,
                                      texts=ds.texts)
        return BucketBatcher(buckets, batch_size, seed, drop_last)

    @staticmethod
    def from_motion(records_by_bucket: Dict[int, list], batch_size: int,
                    seed: int = 0, drop_last: bool = True,
                    emb_index: int = 0) -> "BucketBatcher":
        """Build from {target_len: [MotionRecord,...]}. ``emb_index`` picks
        which caption embedding is the conditioning one (benchpress trains on
        Prefix_embedding — pretrained_mylavae.py:207-210 and mytrain.py:61
        consume the 3rd tuple slot)."""
        buckets = {}
        for length, recs in records_by_bucket.items():
            if not recs:
                continue
            buckets[length] = dict(
                x=np.stack([r.x for r in recs]),
                embedding=np.stack([r.embeddings[emb_index] for r in recs]),
                texts=[r.text for r in recs],
                subjects=[r.subject for r in recs],
            )
            if len(recs[0].embeddings) > 1:
                buckets[length]["extra_embedding"] = np.stack(
                    [r.embeddings[1] for r in recs])
        return BucketBatcher(buckets, batch_size, seed, drop_last)
