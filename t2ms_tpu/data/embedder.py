"""Pluggable text-embedding providers.

The reference re-embeds captions *live* through the OpenAI API during
inference (myinfer.py:24-46,162: 'text-embedding-3-large', dimensions=128,
with a category prefix built from the subject name). That makes inference
network-bound and untestable offline, so the framework makes the embedder an
interface:

  * PrecomputedEmbedder — default: embeddings come from the dataset
    (caption.json / CSV columns), no network.
  * FakeEmbedder — deterministic hash-seeded vectors for tests/benches.
  * OpenAIEmbedder — optional parity path, gated on the openai package and
    OPENAI_API_KEY; reproduces the prefix construction.
"""

from __future__ import annotations

from typing import Protocol, Sequence

import numpy as np

__all__ = ["TextEmbedder", "PrecomputedEmbedder", "FakeEmbedder",
           "OpenAIEmbedder", "build_benchpress_prefix"]

def build_benchpress_prefix(text: str) -> str:
    """The caption prefix prepended before live embedding
    (myinfer.py:36-37)."""
    return ("The following presents the smooth feature description for the "
            "bench press as follows: \n" + text)


class TextEmbedder(Protocol):
    dim: int

    def embed(self, texts: Sequence[str]) -> np.ndarray: ...


class PrecomputedEmbedder:
    """Pass-through: batches already carry their embeddings."""
    def __init__(self, dim: int = 128):
        self.dim = dim

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        raise RuntimeError(
            "PrecomputedEmbedder expects embeddings in the batch; "
            "no live embedding is performed.")


class FakeEmbedder:
    """Deterministic unit-norm embedding from a text hash — offline
    stand-in for the OpenAI call so inference and tests run hermetically.
    Delegates to pipeline.llm.FakeEmbed: the dataset-construction and
    inference paths must stay bit-identical offline."""
    def __init__(self, dim: int = 128):
        self.dim = dim

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        from t2ms_tpu.pipeline.llm import FakeEmbed
        fe = FakeEmbed(self.dim)
        return np.asarray([fe.embed(t) for t in texts], np.float32)


class OpenAIEmbedder:
    """Live parity path (myinfer.py:40-46). Requires the ``openai`` package
    and OPENAI_API_KEY; raises a clear error otherwise."""
    def __init__(self, dim: int = 128,
                 model: str = "text-embedding-3-large",
                 prefix_builder=build_benchpress_prefix):
        self.dim = dim
        self.model = model
        self.prefix_builder = prefix_builder
        try:
            import openai  # type: ignore
        except ImportError as e:
            raise RuntimeError(
                "openai package not installed; use FakeEmbedder or "
                "PrecomputedEmbedder") from e
        self._client = openai.OpenAI()

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        inputs = [self.prefix_builder(t).replace("\n", " ") for t in texts]
        r = self._client.embeddings.create(input=inputs, model=self.model,
                                           dimensions=self.dim)
        return np.asarray([d.embedding for d in r.data], np.float32)


def get_embedder(name: str, dim: int = 128) -> "TextEmbedder":
    if name == "precomputed":
        return PrecomputedEmbedder(dim)
    if name == "fake":
        return FakeEmbedder(dim)
    if name == "openai":
        return OpenAIEmbedder(dim)
    raise ValueError(f"unknown embedder {name}")
