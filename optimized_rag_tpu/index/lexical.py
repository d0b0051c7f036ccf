"""Lexical BM25 index with impact-ordered champion lists.

TPU-native replacement for the reference's per-query ``rank_bm25.BM25Okapi``
rebuild (rag/retrieval.py:324-347): the corpus statistics are built once at
index time into dense device arrays, and each query is a gather + VPU
arithmetic + scatter-add + fused top-k (ops/bm25.py).

Tokenization here is the *lexical* analyzer (lowercase word split +
hash-bucketed vocabulary); the neural tokenizer for the encoder lives in
models/tokenizer.py.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import jax.numpy as jnp
import numpy as np

from optimized_rag_tpu.ops.bm25 import bm25_idf, bm25_topk

_WORD_RE = re.compile(r"[a-z0-9]+", re.UNICODE)

# A tiny stopword list: BM25 idf already downweights these, but dropping
# them keeps champion lists pointed at informative terms.
_STOPWORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on or that the "
    "to was were will with this these those i you we they what which who".split())


def _light_stem(w: str) -> str:
    """Suffix-strip + inflection normalization (scanning/scans/scan ->
    scan, stored/storing/store -> stor). Applied identically at index
    and query time, so it only has to be consistent, not linguistically
    perfect. Digit-bearing tokens (bfloat16, v5e) pass through."""
    if any(c.isdigit() for c in w):
        return w
    for suf in ("ings", "ing", "edly", "ed", "es", "s", "ly"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: -len(suf)]
            break
    if len(w) > 3 and w[-1] == w[-2] and w[-1] not in "aeiou":
        w = w[:-1]
    if len(w) > 3 and w[-1] == "e":
        w = w[:-1]
    return w


def lexical_tokens(text: str) -> list[str]:
    return [_light_stem(t) for t in _WORD_RE.findall(text.lower())
            if t not in _STOPWORDS]


class LexicalIndex:
    """Champion-list BM25 index.

    ``cap`` bounds postings kept per term (impact-ordered by tf); scoring is
    exact when every query term's document frequency <= cap.
    """

    def __init__(self, vocab_hash_bits: int = 17, cap: int = 1024,
                 k1: float = 1.5, b: float = 0.75):
        self.vocab_size = 1 << vocab_hash_bits
        self.cap = cap
        self.k1, self.b = k1, b
        self._postings: dict[int, dict[int, int]] = defaultdict(dict)
        self._doc_len: list[float] = []
        self._device = None   # built arrays, invalidated on add
        self._row_of: dict[int, int] = {}  # term id -> champion row

    # ------------------------------------------------------------ building

    def _term_id(self, token: str) -> int:
        # Stable hash (Python's hash() is salted per-process).
        h = 2166136261
        for ch in token.encode("utf-8"):
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        return h % self.vocab_size

    @property
    def size(self) -> int:
        return len(self._doc_len)

    def add(self, texts: list[str]) -> np.ndarray:
        """Add documents; ids align with DenseIndex insertion order.

        Uses the C++ analyzer (native/analyzer.cpp via
        optimized_rag_tpu/native.py) for ASCII docs when built; the Python
        path is the authoritative fallback and both are parity-tested.
        """
        from optimized_rag_tpu import native
        start = self.size
        for text in texts:
            doc_id = len(self._doc_len)
            counts = native.term_counts(text, self.vocab_size)
            if counts is not None:
                terms, tfs, doc_len = counts
                self._doc_len.append(float(doc_len))
                for term, tf in zip(terms, tfs):
                    self._postings[int(term)][doc_id] = int(tf)
            else:
                toks = lexical_tokens(text)
                self._doc_len.append(float(len(toks)))
                for term, tf in Counter(toks).items():
                    self._postings[self._term_id(term)][doc_id] = tf
        self._device = None
        return np.arange(start, self.size, dtype=np.int64)

    def build(self, padded_size: int | None = None) -> None:
        """Materialize device arrays. Called lazily by search().

        Device arrays are compacted to the OBSERVED vocabulary: champion
        rows exist only for terms that occur in the corpus (plus one empty
        sentinel row), and query term ids are remapped host-side in
        ``encode_query``. Sizing to the full hash space would ship
        vocab_size*cap cells to the device regardless of corpus size.
        Row count and cap are padded to powers of two to bound the number
        of distinct compiled shapes as the corpus grows.
        """
        n = max(self.size, 1)
        # doc_len is a jitted-input shape too: sizing it exactly n meant
        # every add()+search cycle compiled a fresh program. Pow2-pad it
        # like the champion arrays; scores past ``size`` are masked to
        # -inf in every consumer (bm25_topk/dual_topk/encode_and_retrieve)
        # and padded rows are never referenced by champ_docs.
        pad_n = padded_size or (1 << (n - 1).bit_length())
        terms = sorted(self._postings)
        cap_used = max((min(len(p), self.cap)
                        for p in self._postings.values()), default=1)
        cap_used = 1 << (cap_used - 1).bit_length()      # pow2 pad
        rows = len(terms) + 1                            # +1 empty sentinel
        rows_pad = 1 << (rows - 1).bit_length()
        champ_docs = np.zeros((rows_pad, cap_used), np.int32)
        champ_tf = np.zeros((rows_pad, cap_used), np.float32)
        champ_valid = np.zeros((rows_pad, cap_used), bool)
        df = np.zeros(rows_pad, np.int64)
        self._row_of = {}
        for row, t in enumerate(terms):
            postings = self._postings[t]
            self._row_of[t] = row
            df[row] = len(postings)
            items = sorted(postings.items(), key=lambda kv: -kv[1])[:self.cap]
            m = len(items)
            champ_docs[row, :m] = [d for d, _ in items]
            champ_tf[row, :m] = [tf for _, tf in items]
            champ_valid[row, :m] = True
        doc_len = np.zeros(pad_n, np.float32)
        doc_len[:self.size] = self._doc_len
        avg = float(np.mean(self._doc_len)) if self._doc_len else 1.0
        self._device = {
            "champ_docs": jnp.asarray(champ_docs),
            "champ_tf": jnp.asarray(champ_tf),
            "champ_valid": jnp.asarray(champ_valid),
            "idf": bm25_idf(jnp.asarray(df), self.size or 1),
            "doc_len": jnp.asarray(doc_len),
            "avg_len": jnp.asarray(np.float32(avg)),
        }

    # ------------------------------------------------------------- queries

    def encode_query(self, text: str, max_terms: int = 32):
        """Query terms -> compacted champion-row ids (unknown terms drop)."""
        if self._device is None:
            self.build()
        rows = [self._row_of[t]
                for t in (self._term_id(tok)
                          for tok in lexical_tokens(text))
                if t in self._row_of][:max_terms]
        q = np.zeros(max_terms, np.int32)
        valid = np.zeros(max_terms, bool)
        q[:len(rows)] = rows
        valid[:len(rows)] = True
        # numpy (not device) arrays: callers pass them straight into jitted
        # functions, keeping the upload inside one execute round trip.
        return q, valid

    def search(self, text: str, k: int, max_terms: int = 32):
        """Returns (scores [k] np.f32, ids [k] np.int64); -1 = no match."""
        if self._device is None:
            self.build()
        q, valid = self.encode_query(text, max_terms)
        d = self._device
        k_eff = min(k, max(self.size, 1))
        scores, ids = bm25_topk(q, valid, d["champ_docs"], d["champ_tf"],
                                d["champ_valid"], d["idf"], d["doc_len"],
                                d["avg_len"], k=k_eff, size=self.size,
                                k1=self.k1, b=self.b)
        scores, ids = np.asarray(scores), np.asarray(ids, np.int64)
        out_s = np.full(k, -np.inf, np.float32)
        out_i = np.full(k, -1, np.int64)
        matched = scores > 0.0   # BM25 contributions are strictly positive
        m = int(matched.sum())
        out_s[:m] = scores[matched][:m]
        out_i[:m] = ids[matched][:m]
        return out_s, out_i

    # ------------------------------------------------------------ snapshot

    def state_dict(self) -> dict:
        terms = np.array(sorted(self._postings.keys()), np.int64)
        flat_docs, flat_tf, offsets = [], [], [0]
        for t in terms:
            for d, tf in sorted(self._postings[int(t)].items()):
                flat_docs.append(d)
                flat_tf.append(tf)
            offsets.append(len(flat_docs))
        return {
            "vocab_size": self.vocab_size, "cap": self.cap,
            "k1": self.k1, "b": self.b,
            "doc_len": np.asarray(self._doc_len, np.float32),
            "terms": terms,
            "offsets": np.asarray(offsets, np.int64),
            "flat_docs": np.asarray(flat_docs, np.int64),
            "flat_tf": np.asarray(flat_tf, np.int64),
        }

    @classmethod
    def from_state_dict(cls, state: dict) -> "LexicalIndex":
        bits = int(np.log2(int(state["vocab_size"])))
        idx = cls(bits, int(state["cap"]), float(state["k1"]),
                  float(state["b"]))
        idx._doc_len = [float(x) for x in state["doc_len"]]
        offs = state["offsets"]
        for j, t in enumerate(state["terms"]):
            lo, hi = int(offs[j]), int(offs[j + 1])
            idx._postings[int(t)] = {
                int(d): int(tf) for d, tf in
                zip(state["flat_docs"][lo:hi], state["flat_tf"][lo:hi])}
        return idx
