"""Symmetric per-row int8 quantization for corpus storage.

Halves HBM bytes again vs bfloat16 (4x vs float32): the measured
single-chip ceiling of ~7.5 GB resident corpus (docs/RESULTS_r4.md §10)
holds ~56M rows at 128-d int8 vs 28M at bf16, and the HBM-bound scan
reads half the bytes per row. The reference has no storage-precision
ladder at all (pgvector stores float32 only, rag/document_store.py:125).

Scheme: rows are L2-normalized before storage (index/dense.py), so a
symmetric per-row scale loses nothing to offsets:

    q8[i]    = round(x[i] / s[i]),  s[i] = max|x[i]| / 127
    score    = (q_f32 . q8[i]) * s[i]

Queries stay float32 — quantization error is corpus-side only, and the
scan's scale multiply is one fused [B, tile] * [1, tile] broadcast.
Search pairs the int8 scan with 4x oversampling and a dequantized
float32 rescore, mirroring the bf16 path (index/dense.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def quantize_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[N, D] float -> (int8 values [N, D], per-row scale [N] f32).

    Rows of all zeros (tombstones, padding) get scale 0 so their score
    contribution stays exactly 0 regardless of the stored bytes.
    """
    x = x.astype(jnp.float32)
    m = jnp.max(jnp.abs(x), axis=1)                        # [N]
    scale = m / 127.0
    inv = jnp.where(m > 0, 127.0 / jnp.maximum(m, 1e-30), 0.0)
    q = jnp.clip(jnp.round(x * inv[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


@jax.jit
def dequantize_int8(q: jax.Array, scale: jax.Array) -> jax.Array:
    """(int8 [N, D], scale [N]) -> float32 [N, D]."""
    return q.astype(jnp.float32) * scale[:, None].astype(jnp.float32)
