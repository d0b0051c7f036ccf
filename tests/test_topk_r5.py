"""Round-5 kernel additions: ANN fast path + int8-native certified scan.

Interpret-mode (hermetic CPU) correctness pins; the real-TPU compile of
the same configs is guarded by tests/test_tpu_compile_guard.py and
driven by bench.py's ann/int8 configs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from optimized_rag_tpu.ops.similarity import normalize
from optimized_rag_tpu.ops.topk import (
    exact_topk, pallas_topk_ann, pallas_topk_ann_multi,
    pallas_topk_certified, pallas_topk_certified_multi)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _make(rng, b=8, n=128 * 40, d=64):
    q = np.asarray(normalize(jnp.asarray(
        rng.standard_normal((b, d), dtype=np.float32))))
    c = np.asarray(normalize(jnp.asarray(
        rng.standard_normal((n, d), dtype=np.float32))))
    return q, c


def _recall(ids, oracle_ids):
    hits = sum(len(set(a.tolist()) & set(b.tolist()))
               for a, b in zip(np.asarray(ids), oracle_ids))
    return hits / oracle_ids.size


def test_ann_random_high_recall(rng):
    q, c = _make(rng)
    o_s, o_i = exact_topk(jnp.asarray(q), jnp.asarray(c), 10)
    s, i = pallas_topk_ann(jnp.asarray(q), jnp.asarray(c), 10,
                           tile=128, interpret=True)
    assert _recall(i, np.asarray(o_i)) >= 0.95
    # returned scores are exact f32 rescores of the returned ids
    got = np.asarray(s)
    want = (q @ c[np.asarray(i)].transpose(0, 2, 1))[
        np.arange(q.shape[0])[:, None], np.arange(10)[None, :],
        np.arange(10)[None, :]] if False else None
    for b_ in range(q.shape[0]):
        exact = q[b_] @ c[np.asarray(i)[b_]].T
        np.testing.assert_allclose(got[b_], exact, rtol=2e-5, atol=2e-5)


def test_ann_clustered_recall(rng):
    """Same-document chunk runs are CONTIGUOUS: strided units must keep
    recall high when the whole top-k sits in one tile."""
    b, d, tile = 4, 32, 128
    n = tile * 60
    q = np.asarray(normalize(jnp.asarray(
        rng.standard_normal((b, d), dtype=np.float32))))
    c = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    for bi in range(b):
        t0 = (bi * 7 + 3) * tile
        c[t0:t0 + 10] = q[bi] + 0.02 * rng.standard_normal((10, d))
    c = np.asarray(normalize(jnp.asarray(c)))
    o_s, o_i = exact_topk(jnp.asarray(q), jnp.asarray(c), 10)
    s, i = pallas_topk_ann(jnp.asarray(q), jnp.asarray(c), 10,
                           tile=tile, interpret=True)
    assert _recall(i, np.asarray(o_i)) >= 0.9


def test_ann_padding_and_multi(rng):
    q, c = _make(rng, b=8)
    size = c.shape[0] - 77
    o_s, o_i = exact_topk(jnp.asarray(q), jnp.asarray(c), 10, size=size)
    s, i = pallas_topk_ann(jnp.asarray(q), jnp.asarray(c), 10, size=size,
                           tile=128, interpret=True)
    assert np.asarray(i).max() < size
    sm, im = pallas_topk_ann_multi(jnp.asarray(q), jnp.asarray(c), 10,
                                   size=size, sub_batch=4, tile=128,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(im), np.asarray(i))


def test_ann_int8_row_scale(rng):
    from optimized_rag_tpu.ops.quantize import quantize_int8
    q, c = _make(rng)
    c8, scale = quantize_int8(jnp.asarray(c))
    o_s, o_i = exact_topk(jnp.asarray(q), jnp.asarray(c), 10)
    s, i = pallas_topk_ann(jnp.asarray(q), c8, 10, tile=128,
                           interpret=True, row_scale=scale)
    assert _recall(i, np.asarray(o_i)) >= 0.9


# ----------------------------------------------- int8-native certified scan

def _int8_oracle(q, c8, scale, k):
    """Exact oracle of the int8-native scoring function: int32 dots of
    the quantized operands, then the kernel's scale fold order."""
    from optimized_rag_tpu.ops.quantize import quantize_int8
    q8, qs = quantize_int8(jnp.asarray(q))
    q8, qs = np.asarray(q8, np.int32), np.asarray(qs)
    i32 = q8 @ np.asarray(c8, np.int32).T                  # exact
    sc = (i32.astype(np.float32) * np.asarray(scale)[None, :]) \
        * qs[:, None]
    order = np.argsort(-sc, axis=1)[:, :k]
    return np.take_along_axis(sc, order, axis=1), order


def test_certified_int8_native_exact(rng):
    from optimized_rag_tpu.ops.quantize import quantize_int8
    q, c = _make(rng, b=8)
    c8, scale = quantize_int8(jnp.asarray(c))
    o_s, o_i = _int8_oracle(q, c8, scale, 10)
    s, packed = pallas_topk_certified(jnp.asarray(q), c8, 10, tile=128,
                                      interpret=True, row_scale=scale,
                                      int8_native=True)
    packed = np.asarray(packed)
    assert packed[-1, 0] == 0
    np.testing.assert_allclose(np.asarray(s), o_s, rtol=1e-5, atol=1e-6)
    for b_ in range(q.shape[0]):
        assert set(packed[b_].tolist()) == set(o_i[b_].tolist())


def test_certified_int8_native_clustered(rng):
    from optimized_rag_tpu.ops.quantize import quantize_int8
    b, d, tile = 4, 32, 128
    n = tile * 60
    q = np.asarray(normalize(jnp.asarray(
        rng.standard_normal((b, d), dtype=np.float32))))
    c = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    for bi in range(b):
        t0 = (bi * 7 + 3) * tile
        c[t0:t0 + 10] = q[bi] + 0.02 * rng.standard_normal((10, d))
    c = np.asarray(normalize(jnp.asarray(c)))
    c8, scale = quantize_int8(jnp.asarray(c))
    o_s, o_i = _int8_oracle(q, c8, scale, 10)
    s, packed = pallas_topk_certified(jnp.asarray(q), c8, 10, tile=tile,
                                      interpret=True, row_scale=scale,
                                      int8_native=True)
    packed = np.asarray(packed)
    assert packed[-1, 0] == 0
    for b_ in range(b):
        assert set(packed[b_].tolist()) == set(o_i[b_].tolist())


def test_certified_int8_native_padding(rng):
    from optimized_rag_tpu.ops.quantize import quantize_int8
    q, c = _make(rng, b=8)
    size = c.shape[0] - 77
    c8, scale = quantize_int8(jnp.asarray(c))
    s, packed = pallas_topk_certified(jnp.asarray(q), c8, 10, size=size,
                                      tile=128, interpret=True,
                                      row_scale=scale, int8_native=True)
    packed = np.asarray(packed)
    assert packed[-1, 0] == 0
    assert packed[:-1].max() < size


def test_certified_int8_native_multi_matches_single(rng):
    from optimized_rag_tpu.ops.quantize import quantize_int8
    q, c = _make(rng, b=12)
    c8, scale = quantize_int8(jnp.asarray(c))
    sm, pm = pallas_topk_certified_multi(jnp.asarray(q), c8, 10,
                                         sub_batch=4, tile=128,
                                         interpret=True, row_scale=scale,
                                         int8_native=True)
    pm = np.asarray(pm)
    for j in range(3):
        s1, p1 = pallas_topk_certified(jnp.asarray(q[j * 4:(j + 1) * 4]),
                                       c8, 10, tile=128, interpret=True,
                                       row_scale=scale, int8_native=True)
        np.testing.assert_array_equal(pm[j * 4:(j + 1) * 4],
                                      np.asarray(p1)[:-1])


def test_certified_int8_native_recall_vs_f32(rng):
    """End metric: int8-native top-k (+ f32 rescore as DenseIndex does)
    must track the f32 oracle. Query+corpus quantization at d>=64 keeps
    recall@10 ~1.0 on random unit vectors."""
    from optimized_rag_tpu.ops.quantize import quantize_int8
    from optimized_rag_tpu.ops.topk import rescore_topk
    q, c = _make(rng, b=8, n=128 * 40, d=64)
    c8, scale = quantize_int8(jnp.asarray(c))
    o_s, o_i = exact_topk(jnp.asarray(q), jnp.asarray(c), 10)
    s, packed = pallas_topk_certified(jnp.asarray(q), c8, 40, tile=128,
                                      interpret=True, row_scale=scale,
                                      int8_native=True)
    rs, ri = rescore_topk(jnp.asarray(q), c8, jnp.asarray(
        np.asarray(packed)[:-1]), 10, row_scale=scale)
    hits = sum(len(set(a.tolist()) & set(b.tolist()))
               for a, b in zip(np.asarray(ri), np.asarray(o_i)))
    assert hits / o_i.size >= 0.95
