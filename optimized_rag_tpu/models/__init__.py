"""On-device models: tokenizer, bi-encoder, cross-encoder, training.

Eliminates the reference's hot-path network calls (SURVEY.md §2.3):
  * OpenAI embedding RPCs (memory/embeddings.py:100-133) -> batched JAX
    transformer encoder forward, pjit over the batch
  * sentence-transformers ms-marco-MiniLM CPU cross-encoder
    (rag/reranker.py:313,355) -> batched JAX cross-encoder forward
"""

from optimized_rag_tpu.models.tokenizer import HashTokenizer
from optimized_rag_tpu.models.encoder import (
    TransformerConfig, BiEncoder, CrossEncoder, EmbeddingService)
