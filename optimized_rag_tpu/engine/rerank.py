"""Selective reranking: policy + cross-encoder + MMR + RRF.

Re-implements the reference's four ranking primitives (rag/reranker.py) and
the SelectiveReranker routing policy (rag/selective_reranker.py:88-160):

  * precision intents always rerank with the cross-encoder
  * <=5 results skip unless embedding scores are very low (<0.05 avg)
  * score-variance heuristic: high variance (>0.1) = clear winners, skip;
    low variance (<0.05) = rerank
  * rerank blend 0.7*new + 0.3*orig (reranker.py:77)
  * MMR diversification via ops/mmr.py (reranker.py:156-191)
  * RRF merge via ops/fusion.py (reranker.py:239-271)
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from optimized_rag_tpu.engine.types import (
    Intent, PRECISION_INTENTS, RetrievedDoc)
from optimized_rag_tpu.ops.fusion import blend_rerank, rrf_fuse
from optimized_rag_tpu.ops.mmr import mmr_select


class EmbeddingReranker:
    """Bi-encoder reranker: re-score candidates by query-doc cosine and
    blend with the original score (reference OpenAIReranker,
    rag/reranker.py:13-101 — its one batched embedding call for k+1 texts
    becomes one on-device encoder forward)."""

    def __init__(self, embed_fn: Callable, blend_original: float = 0.3):
        self.embed_fn = embed_fn
        self.blend_original = blend_original

    def rerank(self, query: str, docs: List[RetrievedDoc],
               top_k: int | None = None) -> List[RetrievedDoc]:
        if not docs:
            return []
        embs = np.atleast_2d(self.embed_fn([query] + [d.text for d in docs]))
        q, d_embs = embs[0], embs[1:]
        new = (d_embs @ q).astype(np.float32)
        orig = np.asarray([d.score for d in docs], np.float32)
        blended = np.asarray(blend_rerank(jnp.asarray(new),
                                          jnp.asarray(orig),
                                          self.blend_original))
        order = np.argsort(-blended, kind="stable")
        out = []
        for i in order[: top_k or len(docs)]:
            doc = docs[int(i)]
            doc.rerank_score = float(new[int(i)])
            doc.score = float(blended[int(i)])
            out.append(doc)
        return out


class SelectiveReranker:
    def __init__(self, cross_encoder=None,
                 embed_fn: Optional[Callable] = None,
                 blend_original: float = 0.3,
                 low_score_force: float = 0.05,
                 high_variance_skip: float = 0.1,
                 low_variance_rerank: float = 0.05):
        self.cross_encoder = cross_encoder  # CrossEncoderService or None
        self.embed_fn = embed_fn
        self.embedding_reranker = (EmbeddingReranker(embed_fn,
                                                     blend_original)
                                   if embed_fn is not None else None)
        self.blend_original = blend_original
        self.low_score_force = low_score_force
        self.high_variance_skip = high_variance_skip
        self.low_variance_rerank = low_variance_rerank
        self.stats = {"reranked": 0, "skipped": 0, "embedding_reranked": 0}

    # -------------------------------------------------------------- policy

    def should_rerank(self, docs: Sequence[RetrievedDoc],
                      intent: Intent | str | None) -> tuple[bool, str]:
        try:
            if Intent(intent) in PRECISION_INTENTS:
                return True, f"precision intent ({intent})"
        except (ValueError, TypeError):
            pass
        scores = [d.score for d in docs]
        if len(docs) <= 5:
            avg = float(np.mean(scores)) if scores else 0.0
            if avg < self.low_score_force:
                return True, f"low embedding scores ({avg:.3f})"
            return False, "too few results (<=5)"
        top = np.asarray(scores[:10], np.float32)
        var = float(np.var(top))
        if var > self.high_variance_skip:
            return False, f"high score variance ({var:.3f})"
        if var < self.low_variance_rerank:
            return True, f"low score variance ({var:.3f})"
        return True, "default rerank"

    # ------------------------------------------------------------- actions

    def rerank(self, query: str, docs: List[RetrievedDoc],
               intent: Intent | str | None = None, top_k: int | None = None
               ) -> List[RetrievedDoc]:
        """Apply the policy; returns (possibly) reranked docs.

        Routing mirrors the reference: precision intents -> cross-encoder,
        chat/search -> embedding reranker; fallback chain cross-encoder ->
        embedding reranker -> passthrough (selective_reranker.py:166-226).
        """
        if not docs:
            return docs
        do, _reason = self.should_rerank(docs, intent)
        if not do:
            self.stats["skipped"] += 1
            return docs[:top_k] if top_k else docs
        is_precision = False
        try:
            is_precision = Intent(intent) in PRECISION_INTENTS
        except (ValueError, TypeError):
            pass
        if (self.cross_encoder is None or not is_precision) \
                and self.embedding_reranker is not None \
                and self.cross_encoder is None:
            self.stats["embedding_reranked"] += 1
            return self.embedding_reranker.rerank(query, docs, top_k)
        if self.cross_encoder is None:
            self.stats["skipped"] += 1
            return docs[:top_k] if top_k else docs
        self.stats["reranked"] += 1
        new = self.cross_encoder.score_pairs(query, [d.text for d in docs])
        orig = np.asarray([d.score for d in docs], np.float32)
        blended = np.asarray(blend_rerank(jnp.asarray(new), jnp.asarray(orig),
                                          self.blend_original))
        order = np.argsort(-blended, kind="stable")
        out = []
        for i in order[: top_k or len(docs)]:
            d = docs[int(i)]
            d.rerank_score = float(new[int(i)])
            d.score = float(blended[int(i)])
            out.append(d)
        return out

    def apply_mmr(self, docs: List[RetrievedDoc], k: int,
                  lam: float = 0.7,
                  embeddings: Optional[np.ndarray] = None
                  ) -> List[RetrievedDoc]:
        """Diversify to k docs (reference rag/nodes/helpers.py:183-256)."""
        if len(docs) <= k:
            return docs
        if embeddings is None:
            assert self.embed_fn is not None, "need embed_fn or embeddings"
            embeddings = self.embed_fn([d.text for d in docs])
        rel = np.asarray([d.score for d in docs], np.float32)
        order, _ = mmr_select(jnp.asarray(embeddings), jnp.asarray(rel), k,
                              lam=lam)
        return [docs[int(i)] for i in np.asarray(order) if i >= 0]

    @staticmethod
    def rrf_merge(lists: Sequence[Sequence[RetrievedDoc]], k_out: int,
                  rrf_k: float = 60.0) -> List[RetrievedDoc]:
        """Merge ranked lists by reciprocal-rank fusion."""
        lists = [lst for lst in lists if lst]
        if not lists:
            return []
        by_id = {}
        for lst in lists:
            for d in lst:
                by_id.setdefault(d.doc_id, d)
        max_id = max(by_id) + 1
        kmax = max(len(lst) for lst in lists)
        idx = np.full((len(lists), kmax), 0, np.int32)
        valid = np.zeros((len(lists), kmax), bool)
        for r, lst in enumerate(lists):
            for c, d in enumerate(lst):
                idx[r, c] = d.doc_id
                valid[r, c] = True
        scores, ids = rrf_fuse(jnp.asarray(idx), jnp.asarray(valid),
                               k_out=min(k_out, max_id), rrf_k=rrf_k,
                               num_candidates=max_id)
        out = []
        for s, i in zip(np.asarray(scores), np.asarray(ids)):
            if s <= 0 or int(i) not in by_id:
                continue
            d = by_id[int(i)]
            d.score = float(s)
            out.append(d)
        return out[:k_out]
