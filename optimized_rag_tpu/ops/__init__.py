"""Pallas + XLA compute kernels.

Every numeric kernel the reference runs as a Python loop, SQL query, or
remote API call (SURVEY.md §2.3) lives here as a batched on-device op:

  similarity   cosine / dot similarity matrices (replaces 8 duplicated
               pure-Python cosine loops, e.g. rag/retrieval.py:362)
  topk         fused matmul+top-k dense retrieval (replaces pgvector
               `ORDER BY embedding <=> q LIMIT k`, rag/document_store.py:448)
  bm25         impact-ordered lexical scoring (replaces per-query
               rank_bm25 rebuild, rag/retrieval.py:324)
  fusion       RRF / weighted hybrid fusion / temporal decay
               (rag/reranker.py:239, rag/retrieval.py:294)
  mmr          greedy MMR diversification (rag/reranker.py:156)
  kmeans       on-device k-means for IVF centroids (replaces pgvector
               index build, rag/document_store.py:141)
"""

from optimized_rag_tpu.ops.similarity import (
    normalize, cosine_matrix, pairwise_cosine, batched_cosine,
)
from optimized_rag_tpu.ops.topk import (
    exact_topk, chunked_topk, pallas_topk, pallas_topk_ann,
    pallas_topk_verified, rescore_topk)
from optimized_rag_tpu.ops.quantize import quantize_int8, dequantize_int8
from optimized_rag_tpu.ops.fusion import (
    rrf_fuse, weighted_fusion, temporal_decay, minmax_normalize,
)
from optimized_rag_tpu.ops.mmr import mmr_select
from optimized_rag_tpu.ops.bm25 import bm25_score_champions
from optimized_rag_tpu.ops.kmeans import kmeans_fit, kmeans_assign
