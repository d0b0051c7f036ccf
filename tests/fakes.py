"""Deterministic test doubles (SURVEY.md §4: hermetic fake LLM/embedder)."""

from __future__ import annotations

import hashlib

import numpy as np


class FakeEmbedder:
    """Deterministic unit-vector embedder with topic structure.

    Texts sharing words get correlated embeddings (bag-of-hashed-words
    projected to dim, normalized) so similarity-driven logic is testable.
    """

    def __init__(self, dim: int = 64, seed: int = 0):
        self.dim = dim
        self._rng_seed = seed
        self.calls = 0

    def _word_vec(self, word: str) -> np.ndarray:
        h = int.from_bytes(hashlib.md5(word.encode()).digest()[:8], "little")
        rng = np.random.default_rng(h ^ self._rng_seed)
        return rng.standard_normal(self.dim)

    def __call__(self, texts: list[str]) -> np.ndarray:
        self.calls += 1
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            words = t.lower().split() or ["<empty>"]
            v = np.sum([self._word_vec(w) for w in words], axis=0)
            out[i] = v / max(np.linalg.norm(v), 1e-9)
        return out

    def encode(self, texts: list[str]) -> np.ndarray:
        return self(texts)

    def encode_one(self, text: str) -> np.ndarray:
        return self([text])[0]


class FakeCrossEncoder:
    """Scores pairs by word overlap (deterministic, in [0, 1])."""

    def score_pairs(self, query: str, docs: list[str]) -> np.ndarray:
        q = set(query.lower().split())
        out = np.zeros(len(docs), np.float32)
        for i, d in enumerate(docs):
            dw = set(d.lower().split())
            out[i] = len(q & dw) / max(len(q | dw), 1)
        return out
