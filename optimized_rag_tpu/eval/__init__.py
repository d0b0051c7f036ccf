"""IR evaluation metrics."""

from optimized_rag_tpu.eval.metrics import (
    RAGEvaluator, mean_reciprocal_rank, ndcg_at_k, precision_at_k,
    recall_at_k)
