"""Persistent XLA compilation cache.

Every fresh process pays the full XLA compile for the encoder /
cross-encoder / fused-turn programs (~40-90 s for the bundled 6L/384
checkpoint on the TPU) before its first answer. The reference has no
analog — its "models" are HTTP calls — but for an on-device framework
cold-start latency is a product surface: pointing JAX's persistent
compilation cache at the data dir makes every process after the first
skip straight to execution.

The cache lives at the USER level (~/.cache/optimized_rag_tpu/xla by
default, override with ORAG_COMPILE_CACHE_DIR) rather than under the
data dir: compiled executables depend on program shapes and the runtime,
not on any corpus, and a per-data-dir cache made every fresh deployment
recompile from scratch (~9 min first ingest).

Call :func:`setup_compilation_cache` before the first jitted call; it is
idempotent and fail-open (an unwritable cache dir just disables caching).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_configured: set = set()


def setup_compilation_cache(settings) -> bool:
    """Enable JAX's on-disk compilation cache (user-level dir).
    Returns True when active."""
    if not settings.flags.enable_compilation_cache:
        return False
    cache_dir = os.environ.get("ORAG_COMPILE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "optimized_rag_tpu", "xla")
    if cache_dir in _configured:
        return True
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Default threshold (1 s) skips the many small host-side programs;
        # the encoder/fused-turn executables all compile far slower.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # pragma: no cover - depends on fs/runtime
        logger.warning("compilation cache disabled: %s", exc)
        return False
    _configured.add(cache_dir)
    return True
