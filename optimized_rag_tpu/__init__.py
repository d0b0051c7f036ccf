"""optimized_rag_tpu — a TPU-native retrieval-augmented-generation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
gabrielcheda/optimized-rag (a LangGraph + OpenAI + pgvector RAG agent):
the PostgreSQL/pgvector + BM25 + API-call core is replaced by an on-TPU
index-and-scoring engine, and embedding / cross-encoder forwards run as
batched JAX transformers on-device.

Layering (bottom-up):
  ops/       Pallas + XLA kernels (fused top-k, BM25, fusion, MMR, k-means)
  index/     dense / lexical / IVF indexes over sharded jax.Arrays
  parallel/  device-mesh helpers and sharded top-k merge
  models/    JAX encoder + cross-encoder, tokenizer, training step
  engine/    query pipeline, tiered retrieval, compression, consistency
  store/     durable metadata (SQLite): docs, memories, KG, learned weights
  agent/     the conversational agent graph + anti-hallucination stack
  eval/      IR metrics (P@K, R@K, MRR, NDCG) vectorized
"""

__version__ = "0.1.0"
