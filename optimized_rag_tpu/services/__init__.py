"""Host services: document ingestion pipeline."""

from optimized_rag_tpu.services.ingest import DocumentIngestor
