"""Hybrid retriever: dense + BM25 + temporal fusion, fully on device.

Replaces the reference HybridRetriever (rag/retrieval.py:13-371) whose
hybrid score ``alpha*semantic + beta*bm25 + gamma*recency`` was computed in
Python dict loops over pgvector/rank_bm25 results. Here:

  * dense candidates: fused matmul+top-k over the DenseIndex (or a
    ShardedDenseIndex / IVFIndex — anything with .search(q, k))
  * keyword candidates: champion-list BM25 (index/lexical.py)
  * the candidate union is scored on all three channels as one
    [3, n_candidates] tensor and fused with ops.weighted_fusion using
    DW-GRPO weights

Recency decay is 0.5^(age_days/half_life) (reference rag/retrieval.py:283).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from optimized_rag_tpu.engine.types import (
    Intent, RetrievedDoc, Source, intent_weights, retrieval_strategy)
from optimized_rag_tpu.index.dense import DenseIndex
from optimized_rag_tpu.index.lexical import LexicalIndex
from optimized_rag_tpu.ops.topk import NEG_INF

NEG_INF_HALF = NEG_INF / 2


class HybridRetriever:
    """Multi-channel retrieval over one corpus (documents, archival, ...).

    ``texts``/``created_at`` providers map doc ids to payloads — the host
    metadata store (store/db.py) supplies them; tests use plain lists.
    """

    def __init__(self, dense: DenseIndex, lexical: Optional[LexicalIndex],
                 embed_fn: Callable[[List[str]], np.ndarray],
                 get_text: Callable[[int], str],
                 get_created_at: Optional[Callable[[int], float]] = None,
                 half_life_days: float = 30.0,
                 source: Source = Source.DOCUMENTS,
                 candidate_k: int = 50,
                 encoder=None):
        self.dense = dense
        # Optional EmbeddingService: when present, the whole query path
        # (encoder forward + dual top-k + fusion) runs as ONE device
        # dispatch (ops/fused_query.py) instead of three.
        self.encoder = encoder
        self._created_dev = None   # [capacity] days-since-epoch, device
        self._created_n = 0
        self._created_cap = 0
        self._created_epoch = 0    # DenseIndex.epoch the cache was built at
        # Optional ANN candidate source (IVFIndex / ShardedIVFIndex /
        # ShardedDenseIndex) installed by the index policy at scale
        # (index/policy.py). It covers rows [0, ann_size); the exact
        # DenseIndex covers the freshly-added tail, and candidates are
        # the union — freshness never costs recall.
        self.ann = None
        self.ann_size = 0
        self.lexical = lexical
        self.embed_fn = embed_fn
        self.get_text = get_text
        self.get_created_at = get_created_at
        self.half_life_days = half_life_days
        self.source = source
        self.candidate_k = candidate_k

    # ----------------------------------------------------------------- API

    def retrieve(self, query: str, top_k: int = 10,
                 intent: Intent | str | None = None,
                 weights: Optional[Dict[str, float]] = None,
                 query_embedding: Optional[np.ndarray] = None
                 ) -> List[RetrievedDoc]:
        """Hybrid retrieve honoring the per-intent strategy table."""
        strategy = retrieval_strategy(intent)
        if not strategy["use_hybrid"] or self.lexical is None \
                or self.lexical.size == 0:
            return self.dense_only(query, top_k, query_embedding)
        return self.hybrid_search(query, top_k, intent, weights,
                                  query_embedding)

    def _ann_candidates(self, q: np.ndarray, k: int):
        """ANN over the built segment unioned with exact search over the
        post-build tail. Returns (scores [B,k], ids [B,k]).

        The ANN keeps its pre-build copy of every vector, so rows
        tombstoned in the DenseIndex after the build would come back at
        full score; oversample by the tombstone count and mask them out
        here (the exact paths filter inside DenseIndex.search)."""
        dead = self.dense._tombstones
        kk = k + min(len(dead), max(0, self.ann_size - k))
        s1, i1 = self.ann.search(q, kk)
        tail = self.dense.search_tail(q, k, self.ann_size)
        s = np.concatenate([s1, tail.scores], axis=1)
        i = np.concatenate([np.asarray(i1, np.int64), tail.ids], axis=1)
        if dead:
            gone = np.isin(i, np.fromiter(dead, np.int64, len(dead)))
            s = np.where(gone, -np.inf, s)
            i = np.where(gone, np.int64(-1), i)
        order = np.argsort(-s, axis=1, kind="stable")[:, :k]
        return (np.take_along_axis(s, order, axis=1),
                np.take_along_axis(i, order, axis=1))

    def dense_only(self, query: str, top_k: int,
                   query_embedding: Optional[np.ndarray] = None
                   ) -> List[RetrievedDoc]:
        q = (query_embedding if query_embedding is not None
             else self.embed_fn([query]))
        q = np.atleast_2d(q)
        if self.ann is not None and self.ann_size > 0:
            scores, ids = self._ann_candidates(q, top_k)
        else:
            res = self.dense.search(q, k=top_k)
            scores, ids = res.scores, res.ids
        out = []
        for score, did in zip(scores[0], ids[0]):
            if did < 0 or not np.isfinite(score):
                continue
            out.append(self._mk(int(did), float(score),
                                semantic=float(score)))
        return out

    def _created_days(self) -> jax.Array:
        """Device array of days-since-epoch per dense row, synced
        incrementally (host fetches only rows added since last call)."""
        cap, n = self.dense.capacity, self.dense.size
        # delete()/compact() remap row ids: the incremental cache would
        # attach previous docs' timestamps to the wrong rows. Rebuild from
        # scratch when the index epoch moved (ADVICE r2 medium).
        epoch = getattr(self.dense, "epoch", 0)
        if epoch != self._created_epoch:
            self._created_dev = None
            self._created_n = 0
            self._created_epoch = epoch
        if self._created_dev is None or self._created_cap != cap:
            old = self._created_dev
            self._created_dev = jnp.zeros((cap,), jnp.float32)
            if old is not None and self._created_n > 0:
                self._created_dev = jax.lax.dynamic_update_slice(
                    self._created_dev, old[: self._created_n], (0,))
            self._created_cap = cap
        if self._created_n < n and self.get_created_at is not None:
            fresh = np.asarray(
                [self.get_created_at(i) / 86400.0
                 for i in range(self._created_n, n)], np.float32)
            self._created_dev = jax.lax.dynamic_update_slice(
                self._created_dev, jnp.asarray(fresh), (self._created_n,))
            self._created_n = n
        return self._created_dev

    def _fused_query(self, query: str, top_k: int,
                     weights: Dict[str, float]) -> List[RetrievedDoc]:
        """ONE-dispatch hybrid query (ops/fused_query.py): encoder forward,
        dual top-k, union dedup, and fusion all ride a single round trip.
        The query embedding comes back in the same buffer and is cached so
        downstream stages (rerank/eval) reuse it for free."""
        from optimized_rag_tpu.ops.fused_query import encode_and_retrieve
        enc = self.encoder
        if self.lexical._device is None:
            self.lexical.build()
        dvc = self.lexical._device
        qt, qv = self.lexical.encode_query(query)
        q_ids, q_mask = enc.tokenizer.encode_batch([query], enc.max_len)
        ck = min(max(self.candidate_k, top_k), self.dense.size)
        if self.get_created_at is not None:
            created = self._created_days()
            w_tmp = weights.get("temporal", 0.10)
        else:
            created = jnp.zeros((self.dense.capacity,), jnp.float32)
            w_tmp = 0.0
        w = np.asarray([weights.get("semantic", 0.55),
                        weights.get("keyword", 0.35), w_tmp], np.float32)
        packed = np.asarray(encode_and_retrieve(
            enc.params, q_ids, q_mask,
            self.dense.embeddings(), self.dense.size,
            qt, qv, dvc["champ_docs"], dvc["champ_tf"], dvc["champ_valid"],
            dvc["idf"], dvc["doc_len"], dvc["avg_len"],
            created, time.time() / 86400.0,
            w, self.half_life_days,
            encode_fn=enc._fwd, matryoshka_dim=enc.matryoshka_dim,
            candidate_k=ck, k=min(top_k, 2 * ck),
            k1=self.lexical.k1, b=self.lexical.b,
            row_scale=self.dense.row_scale))
        k = min(top_k, 2 * ck)
        enc.cache_put(query, packed[5, : enc.dim])
        out = []
        for col in range(k):
            did = int(packed[1, col])
            if did < 0 or packed[0, col] <= NEG_INF_HALF:
                continue
            out.append(self._mk(did, float(packed[0, col]),
                                semantic=float(packed[2, col]),
                                keyword=float(packed[3, col]),
                                temporal=float(packed[4, col])))
        return out

    def hybrid_search(self, query: str, top_k: int,
                      intent: Intent | str | None = None,
                      weights: Optional[Dict[str, float]] = None,
                      query_embedding: Optional[np.ndarray] = None
                      ) -> List[RetrievedDoc]:
        if weights is None:
            a, b, g = intent_weights(intent)
            weights = {"semantic": a, "keyword": b, "temporal": g}
        # Fastest path: the ENTIRE query (encoder forward included) in one
        # device dispatch. Needs the encoder service, a clean dense index
        # (no ANN overlay / tombstones), and a built lexical channel.
        if (self.encoder is not None and query_embedding is None
                and self.lexical is not None and self.lexical.size > 0
                and self.ann is None and not self.dense._tombstones
                and self.dense.size > 0):
            return self._fused_query(query, top_k, weights)
        ck = max(self.candidate_k, top_k)
        q = (query_embedding if query_embedding is not None
             else self.embed_fn([query]))
        q = np.atleast_2d(q)

        # Fast path: both channels in ONE device dispatch (ops/hybrid.py),
        # then one fused gather+score+blend dispatch below. Falls back to
        # separate dispatches when tombstones force oversample+filter.
        if self.lexical is not None and self.lexical.size > 0 \
                and self.ann is None \
                and not self.dense._tombstones and self.dense.size > 0:
            from optimized_rag_tpu.ops.hybrid import dual_topk
            if self.lexical._device is None:
                self.lexical.build()
            dvc = self.lexical._device
            qt, qv = self.lexical.encode_query(query)
            kk = min(ck, self.dense.size)
            qn0 = np.asarray(q, np.float32)
            qn0 = qn0 / np.maximum(
                np.linalg.norm(qn0, axis=1, keepdims=True), 1e-9)
            packed = np.asarray(dual_topk(
                qn0, self.dense.embeddings(), self.dense.size, qt, qv,
                dvc["champ_docs"], dvc["champ_tf"], dvc["champ_valid"],
                dvc["idf"], dvc["doc_len"], dvc["avg_len"],
                k=kk, k1=self.lexical.k1, b=self.lexical.b,
                row_scale=self.dense.row_scale))
            ds, di = packed[0, 0], packed[1, 0].astype(np.int64)
            bs, bi = packed[0, -1], packed[1, -1].astype(np.int64)
            dense_ids = [int(i) for s, i in zip(ds, di)
                         if i >= 0 and s > NEG_INF_HALF]
            lex_scores = {int(i): float(s)
                          for s, i in zip(bs, bi) if i >= 0 and s > 0.0}
        else:
            kk = min(ck, max(self.dense.size, 1))
            if self.ann is not None and self.ann_size > 0:
                dscores, dids = self._ann_candidates(q, kk)
                dense_ids = [int(i) for s_, i in zip(dscores[0], dids[0])
                             if i >= 0 and np.isfinite(s_)]
            else:
                dres = self.dense.search(q, k=kk)
                dense_ids = [int(i) for i in dres.ids[0] if i >= 0]
            lex_scores = {}
            if self.lexical is not None and self.lexical.size > 0:
                ls, li = self.lexical.search(query, k=ck)
                lex_scores = {int(i): float(s)
                              for s, i in zip(ls, li) if i >= 0}

        cand = sorted(set(dense_ids) | set(lex_scores))
        if not cand:
            return []

        # Fuse the candidate union in ONE dispatch: gather embeddings,
        # exact semantic re-score, temporal decay, per-channel min-max,
        # weighted blend, top-k (ops/hybrid.fuse_candidates). Candidate
        # count is padded to a power of two to bound compiled shapes.
        from optimized_rag_tpu.ops.hybrid import fuse_candidates
        c_pad = 1 << (max(len(cand), top_k, 8) - 1).bit_length()
        cand_ids = np.full(c_pad, -1, np.int32)
        cand_ids[:len(cand)] = cand
        cand_valid = cand_ids >= 0
        kw = np.zeros(c_pad, np.float32)
        kw[:len(cand)] = [lex_scores.get(c, 0.0) for c in cand]
        ages = np.zeros(c_pad, np.float32)
        if self.get_created_at is not None:
            now = time.time()
            ages[:len(cand)] = [(now - self.get_created_at(c)) / 86400.0
                                for c in cand]
            w_tmp = weights.get("temporal", 0.10)
        else:
            w_tmp = 0.0
        w = np.asarray([weights.get("semantic", 0.55),
                        weights.get("keyword", 0.35), w_tmp], np.float32)
        qn = np.asarray(q[0], np.float32)
        qn = qn / max(np.linalg.norm(qn), 1e-9)
        packed = np.asarray(fuse_candidates(
            qn, self.dense.embeddings(), cand_ids, cand_valid, kw, ages,
            w, self.half_life_days, k=min(top_k, c_pad),
            row_scale=self.dense.row_scale))
        fused, pos = packed[0], packed[1].astype(np.int64)
        out = []
        for col, (s, p) in enumerate(zip(fused, pos)):
            if p < 0 or p >= len(cand):
                continue
            out.append(self._mk(cand[int(p)], float(s),
                                semantic=float(packed[2, col]),
                                keyword=float(packed[3, col]),
                                temporal=float(packed[4, col])))
        return out

    # ------------------------------------------------------------- helpers

    def _mk(self, doc_id: int, score: float, semantic=0.0, keyword=0.0,
            temporal=0.0) -> RetrievedDoc:
        return RetrievedDoc(
            doc_id=doc_id, score=score, text=self.get_text(doc_id),
            source=self.source,
            created_at=(self.get_created_at(doc_id)
                        if self.get_created_at else time.time()),
            semantic_score=semantic, keyword_score=keyword,
            temporal_score=temporal)
