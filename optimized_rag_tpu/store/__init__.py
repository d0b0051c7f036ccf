"""Durable host-side state.

Replaces the reference's PostgreSQL layer (database/connection.py,
database/operations.py, database/dw_grpo_persistence.py) with an embedded
SQLite store — the TPU engine owns search; the store owns payloads:
document/chunk text, MemGPT memories, KG triples, learned weights,
performance logs, and cost accounting.
"""

from optimized_rag_tpu.store.db import MetadataStore
from optimized_rag_tpu.store.memory import MemoryManager
from optimized_rag_tpu.store.kg import (
    KnowledgeGraphExtractor, KnowledgeGraphRetriever)
from optimized_rag_tpu.store.cost import CostTracker, get_cost_tracker
