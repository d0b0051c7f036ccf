"""On-device indexes over sharded jax.Arrays.

Replaces the reference's PostgreSQL/pgvector storage-and-search layer
(rag/document_store.py, database/operations.py):

  dense     padded embedding-matrix store + fused top-k search
  lexical   BM25 champion-list index (replaces per-query rank_bm25 rebuild)
  ivf       IVF cluster-pruned index (replaces pgvector ivfflat)
  snapshot  checkpoint/restore of index state (replaces Postgres durability)
"""

from optimized_rag_tpu.index.dense import DenseIndex
from optimized_rag_tpu.index.lexical import LexicalIndex
from optimized_rag_tpu.index.ivf import IVFIndex
