"""Batched similarity kernels.

The reference computes cosine similarity with pure-Python loops over
``List[float]`` in eight separate places (rag/retrieval.py:362,
rag/reranker.py:92,197, rag/nodes/helpers.py:263,
rag/consistency_checker.py:241, rag/context_compressor.py:243,
rag/ensemble_verifier.py:276, rag/chunking.py:205). Here it is one jitted
normalized matmul, batched everywhere; embeddings are L2-normalized once at
index time so cosine == dot and the MXU does all the work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along the last axis (safe for zero rows)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                            keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)


@jax.jit
def cosine_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cosine similarity between every row of ``a`` [M,D] and ``b`` [N,D].

    Returns [M, N] float32. Inputs need not be pre-normalized.
    """
    a = normalize(a)
    b = normalize(b)
    return jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


@jax.jit
def pairwise_cosine(x: jax.Array) -> jax.Array:
    """All-pairs cosine similarity of rows of ``x`` [N,D] -> [N,N] f32.

    Backs the consistency checker's O(n^2) contradiction scan
    (reference: rag/consistency_checker.py:169-190) as a single matmul.
    """
    x = normalize(x)
    return jnp.dot(x, x.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=())
def batched_cosine(q: jax.Array, docs: jax.Array) -> jax.Array:
    """Row-wise cosine: q [B,D] against docs [B,D] -> [B] f32."""
    q = normalize(q).astype(jnp.float32)
    docs = normalize(docs).astype(jnp.float32)
    return jnp.sum(q * docs, axis=-1)
