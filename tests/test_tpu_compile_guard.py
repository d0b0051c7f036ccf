"""Headline-shape compile guard (VERDICT r4 weak #5 / next #8).

The round-4 ``pl.when`` fast-path experiment silently pushed the packed
kernel's scoped-VMEM demand past the 16 MB AOT cap and the b1024
headline shape stopped compiling — the hermetic CPU suite could not
catch it because interpret mode compiles anything. These tests AOT
compile the EXACT headline configurations (shapes only, no 5 GB corpus
buffers are materialized) on the real TPU backend, so a kernel edit
that breaks the Mosaic compile fails CI-on-chip instead of the next
bench run. Skipped on CPU (the hermetic suite); bench.py's probe-compile
fallback remains the last-resort guard in production.
"""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="AOT Mosaic compile only meaningful on the TPU backend")

N_10M = 10 * 1024 * 1024
D = 128
K = 10


def _abstract(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def test_certified_b1024_headline_compiles():
    from optimized_rag_tpu.ops.topk import pallas_topk_certified
    fn = lambda q, c: pallas_topk_certified(q, c, K, size=N_10M, tile=4096)
    jax.jit(fn).lower(_abstract((1024, D), jnp.float32),
                      _abstract((N_10M, D), jnp.bfloat16)).compile()


def test_certified_multi_b4096_headline_compiles():
    from optimized_rag_tpu.ops.topk import pallas_topk_certified_multi
    fn = lambda q, c: pallas_topk_certified_multi(
        q, c, K, size=N_10M, sub_batch=1024, tile=4096)
    jax.jit(fn).lower(_abstract((4096, D), jnp.float32),
                      _abstract((N_10M, D), jnp.bfloat16)).compile()


def test_certified_int8_b1024_compiles():
    from optimized_rag_tpu.ops.topk import pallas_topk_certified
    fn = lambda q, c, s: pallas_topk_certified(q, c, K, size=N_10M,
                                               tile=4096, row_scale=s)
    jax.jit(fn).lower(_abstract((1024, D), jnp.float32),
                      _abstract((N_10M, D), jnp.int8),
                      _abstract((N_10M,), jnp.float32)).compile()
