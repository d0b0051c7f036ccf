"""IR metrics: P@K, R@K, MRR, NDCG — vectorized over query batches.

Re-implements rag/evaluation.py:20-286 (per-query Python loops over id
lists) as NumPy batch operations, plus the LLM-judged faithfulness scorer
(:157). A RAGAS adapter is gated on the optional dependency like the
reference's (rag/ragas_evaluator.py:33-46).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _hits(retrieved: np.ndarray, relevant: Sequence[set]) -> np.ndarray:
    """retrieved [B, K] ids; relevant: B sets. -> [B, K] bool."""
    out = np.zeros(retrieved.shape, bool)
    for b, rel in enumerate(relevant):
        out[b] = np.isin(retrieved[b], list(rel))
    return out


def precision_at_k(retrieved, relevant: Sequence[set], k: int) -> np.ndarray:
    r = np.asarray(retrieved)[:, :k]
    return _hits(r, relevant).sum(axis=1) / k


def recall_at_k(retrieved, relevant: Sequence[set], k: int) -> np.ndarray:
    r = np.asarray(retrieved)[:, :k]
    denom = np.asarray([max(len(s), 1) for s in relevant], np.float64)
    return _hits(r, relevant).sum(axis=1) / denom


def mean_reciprocal_rank(retrieved, relevant: Sequence[set]) -> float:
    r = np.asarray(retrieved)
    h = _hits(r, relevant)
    rr = np.zeros(len(r))
    for b in range(len(r)):
        nz = np.nonzero(h[b])[0]
        if len(nz):
            rr[b] = 1.0 / (nz[0] + 1)
    return float(rr.mean())


def ndcg_at_k(retrieved, relevance_scores: Sequence[Dict[int, float]],
              k: int) -> np.ndarray:
    """relevance_scores: per query {doc_id: graded relevance}."""
    r = np.asarray(retrieved)[:, :k]
    discounts = 1.0 / np.log2(np.arange(2, k + 2))
    out = np.zeros(len(r))
    for b, grades in enumerate(relevance_scores):
        gains = np.asarray([grades.get(int(d), 0.0) for d in r[b]])
        dcg = float((gains * discounts[:len(gains)]).sum())
        ideal = np.sort(list(grades.values()))[::-1][:k]
        idcg = float((ideal * discounts[:len(ideal)]).sum())
        out[b] = dcg / idcg if idcg > 0 else 0.0
    return out


class RAGEvaluator:
    """Batch evaluation + LLM faithfulness (reference rag/evaluation.py)."""

    def __init__(self, llm=None):
        self.llm = llm

    def evaluate_retrieval(self, retrieved, relevant: Sequence[set],
                           k: int = 10) -> Dict[str, float]:
        return {
            f"precision@{k}": float(precision_at_k(retrieved, relevant,
                                                   k).mean()),
            f"recall@{k}": float(recall_at_k(retrieved, relevant, k).mean()),
            "mrr": mean_reciprocal_rank(retrieved, relevant),
        }

    def faithfulness_score(self, answer: str, context: str) -> float:
        if self.llm is None:
            return 0.0
        from optimized_rag_tpu.agent import prompts
        import re
        raw = self.llm.complete(
            prompts.FAITHFULNESS_PROMPT.format(context=context,
                                               answer=answer),
            task="faithfulness")
        m = re.search(r"[01]?\.\d+|[01]", raw)
        return float(m.group(0)) if m else 0.0


class RAGASEvaluator:
    """Optional RAGAS integration (reference rag/ragas_evaluator.py:12-222);
    activates only if the ragas package exists."""

    def __init__(self):
        try:
            import ragas  # type: ignore  # noqa: F401
            self.available = True
        except ImportError:
            self.available = False

    def evaluate_rag_response(self, question: str, answer: str,
                              contexts: List[str]) -> Optional[Dict]:
        if not self.available:
            return None
        from ragas import evaluate  # type: ignore
        from ragas.metrics import faithfulness, answer_relevancy  # type: ignore
        from datasets import Dataset  # type: ignore
        ds = Dataset.from_dict({"question": [question], "answer": [answer],
                                "contexts": [contexts]})
        res = evaluate(ds, metrics=[faithfulness, answer_relevancy])
        return dict(res)
