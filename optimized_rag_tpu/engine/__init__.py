"""Query/ingestion engine: the on-TPU replacement of the reference's
RAG component layer (rag/*.py — SURVEY.md §2.1 rows 6-28).

Control decisions (escalate? rerank? compress?) stay on host; every score
is computed in batches on device through ops/.
"""

from optimized_rag_tpu.engine.types import (
    Intent, RetrievedDoc, intent_weights, retrieval_strategy)
from optimized_rag_tpu.engine.adaptive import (
    DynamicWeightManager, PerformanceTracker, QueryFeatureExtractor)
from optimized_rag_tpu.engine.retriever import HybridRetriever
from optimized_rag_tpu.engine.rerank import SelectiveReranker
from optimized_rag_tpu.engine.hierarchical import (
    ConfidenceEvaluator, HierarchicalRetriever)
from optimized_rag_tpu.engine.compressor import ContextCompressor
from optimized_rag_tpu.engine.consistency import ConsistencyChecker
from optimized_rag_tpu.engine.chunking import (
    FixedSizeChunker, RecursiveChunker, SemanticChunker)
from optimized_rag_tpu.engine.wrangler import (
    DataWrangler, Deduplicator, QualityScorer, TextCleaner)
