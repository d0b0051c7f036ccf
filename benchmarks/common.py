"""Shared benchmark harness.

Timing protocol (see bench.py): per-iteration host materialization —
under the axon tunnel ``block_until_ready`` does not synchronize with
remote execution, so a host transfer is the only honest barrier; numbers
include host<->device transfer.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def emit(record: dict) -> None:
    print(json.dumps(record), flush=True)


def make_corpus(n: int, d: int, seed: int = 0, clusters: int = 0):
    """Unit-norm corpus; optionally drawn around cluster centers (real
    embedding corpora are clustered — IVF recall depends on it)."""
    rng = np.random.default_rng(seed)
    if clusters:
        centers = rng.standard_normal((clusters, d)).astype(np.float32) * 2.0
        assign = rng.integers(0, clusters, n)
        x = centers[assign] + rng.standard_normal((n, d)).astype(np.float32)
    else:
        x = rng.standard_normal((n, d), dtype=np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def make_corpus_device(n: int, d: int, seed: int = 0, clusters: int = 0,
                       chunk: int = 1 << 20, dtype=None):
    """Generate the corpus ON DEVICE (jax.random), never shipping N*D
    floats across the host<->device link — at 10M x 128 the host path
    pushes 5 GB through the tunnel and can wedge it. Chunked so peak
    memory stays bounded during generation."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    k_centers, k_assign, k_noise = jax.random.split(key, 3)
    centers = (jax.random.normal(k_centers, (max(clusters, 1), d),
                                 jnp.float32) * 2.0) if clusters else None

    import functools

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen_chunk(k1, k2, rows):
        noise = jax.random.normal(k1, (rows, d), jnp.float32)
        if centers is not None:
            assign = jax.random.randint(k2, (rows,), 0, clusters)
            x = centers[assign] + noise
        else:
            x = noise
        x = x / jnp.maximum(
            jnp.linalg.norm(x, axis=1, keepdims=True), 1e-9)
        return x.astype(dtype) if dtype is not None else x

    parts = []
    done = 0
    while done < n:
        rows = min(chunk, n - done)
        k_noise, k1 = jax.random.split(k_noise)
        k_assign, k2 = jax.random.split(k_assign)
        parts.append(gen_chunk(k1, k2, rows))
        done += rows
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def make_corpus_device_big(n: int, d: int, seed: int = 0,
                           clusters: int = 4096, chunk: int = 1 << 20,
                           dtype=None):
    """Like make_corpus_device but ONE jit (lax.map over chunk keys):
    the chunked variant keeps every part alive across the final
    concatenate (2x peak HBM — an 8 GB corpus would OOM a 16 GB chip),
    while here XLA sees the whole program and the peak is the output
    plus one f32 chunk transient. Also a single dispatch, so a degraded
    relay costs one round trip instead of n/chunk."""
    import jax
    import jax.numpy as jnp

    assert n % chunk == 0, (n, chunk)
    m = n // chunk

    @jax.jit
    def gen(key):
        k_centers, k_chunks = jax.random.split(key)
        centers = (jax.random.normal(k_centers, (max(clusters, 1), d),
                                     jnp.float32) * 2.0)

        def one(k):
            k1, k2 = jax.random.split(k)
            noise = jax.random.normal(k1, (chunk, d), jnp.float32)
            if clusters:
                assign = jax.random.randint(k2, (chunk,), 0, clusters)
                x = centers[assign] + noise
            else:
                x = noise
            x = x / jnp.maximum(
                jnp.linalg.norm(x, axis=1, keepdims=True), 1e-9)
            return x.astype(dtype) if dtype is not None else x

        return jax.lax.map(one, jax.random.split(k_chunks, m))

    out = gen(jax.random.PRNGKey(seed))
    return out.reshape(n, d)


def make_corpus_device_int8(n: int, d: int, seed: int = 0,
                            clusters: int = 4096, chunk: int = 1 << 20):
    """Clustered unit corpus generated AND quantized chunk-wise in one
    jit: the f32 source never materializes (48M x 128 f32 would be
    24 GB), only the int8 codes + per-row scales leave the map body.
    Returns (codes [n, d] int8, scale [n] f32)."""
    import jax
    import jax.numpy as jnp

    from optimized_rag_tpu.ops.quantize import quantize_int8

    assert n % chunk == 0, (n, chunk)
    m = n // chunk

    @jax.jit
    def gen(key):
        k_centers, k_chunks = jax.random.split(key)
        centers = (jax.random.normal(k_centers, (max(clusters, 1), d),
                                     jnp.float32) * 2.0)

        def one(k):
            k1, k2 = jax.random.split(k)
            noise = jax.random.normal(k1, (chunk, d), jnp.float32)
            if clusters:
                assign = jax.random.randint(k2, (chunk,), 0, clusters)
                x = centers[assign] + noise
            else:
                x = noise
            x = x / jnp.maximum(
                jnp.linalg.norm(x, axis=1, keepdims=True), 1e-9)
            return quantize_int8(x)

        return jax.lax.map(one, jax.random.split(k_chunks, m))

    codes, scale = gen(jax.random.PRNGKey(seed))
    return codes.reshape(n, d), scale.reshape(n)


def timed(fn, iters: int = 10, warmup: int = 1):
    """Returns seconds/iteration; fn must materialize its own result."""
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def recall_at_k(got_ids: np.ndarray, oracle_ids: np.ndarray) -> float:
    k = oracle_ids.shape[1]
    return float(np.mean([
        len(set(got_ids[r, :k]) & set(oracle_ids[r])) / k
        for r in range(len(oracle_ids))]))
