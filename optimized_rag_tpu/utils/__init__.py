"""Host utilities: logging, token budgeting, metrics export, retry."""

from optimized_rag_tpu.utils.logging_config import setup_logging
from optimized_rag_tpu.utils.tokens import (
    calculate_tokens, check_context_overflow, truncate_conversation)
from optimized_rag_tpu.utils.metrics_export import MetricsExporter
from optimized_rag_tpu.utils.retry import retry_with_backoff
