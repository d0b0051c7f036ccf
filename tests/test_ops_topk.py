"""Top-k kernels vs NumPy oracle (exact brute-force = pgvector-equivalent)."""

import jax.numpy as jnp
import numpy as np
import pytest

from optimized_rag_tpu.ops.similarity import normalize
from optimized_rag_tpu.ops.topk import (
    chunked_topk, dispatch_topk, exact_topk, pallas_topk)


def _oracle_topk(q, c, k, size=None):
    scores = q.astype(np.float64) @ c.astype(np.float64).T
    if size is not None:
        scores[:, size:] = -np.inf
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def _make(rng, b=8, n=4096, d=128):
    q = np.asarray(normalize(jnp.asarray(
        rng.standard_normal((b, d), dtype=np.float32))))
    c = np.asarray(normalize(jnp.asarray(
        rng.standard_normal((n, d), dtype=np.float32))))
    return q, c


def _check(scores, idx, oracle_s, oracle_i):
    scores, idx = np.asarray(scores), np.asarray(idx)
    # Scores must match; indices may differ only under exact score ties.
    np.testing.assert_allclose(scores, oracle_s, rtol=2e-4, atol=2e-4)
    ties = ~np.isclose(
        np.sort(oracle_s, axis=1)[:, 1:], np.sort(oracle_s, axis=1)[:, :-1],
        rtol=1e-6).all()
    if ties:
        np.testing.assert_array_equal(idx, oracle_i)


def test_exact_topk(rng):
    q, c = _make(rng)
    s, i = exact_topk(jnp.asarray(q), jnp.asarray(c), 10)
    _check(s, i, *_oracle_topk(q, c, 10))


def test_exact_topk_with_padding(rng):
    q, c = _make(rng)
    size = 3000
    s, i = exact_topk(jnp.asarray(q), jnp.asarray(c), 10, size=size)
    _check(s, i, *_oracle_topk(q, c, 10, size=size))
    assert np.asarray(i).max() < size


def test_chunked_topk(rng):
    q, c = _make(rng, n=8192)
    s, i = chunked_topk(jnp.asarray(q), jnp.asarray(c), 10, chunk=1024)
    _check(s, i, *_oracle_topk(q, c, 10))


@pytest.mark.parametrize("n", [8192 + 992, 1000, 1024 + 1])
def test_chunked_topk_remainder_tail(rng, n):
    # N not a multiple of chunk: the tail rows are scored by the extra
    # merge matmul (the 12.5M-rows/shard capacity case, rounded to a
    # tile multiple but not a chunk multiple).
    q, c = _make(rng, n=n)
    s, i = chunked_topk(jnp.asarray(q), jnp.asarray(c), 10, chunk=1024)
    _check(s, i, *_oracle_topk(q, c, 10))
    s, i = chunked_topk(jnp.asarray(q), jnp.asarray(c), 7, size=n - 3,
                        chunk=1024)
    _check(s, i, *_oracle_topk(q, c, 7, size=n - 3))


def test_chunked_topk_padding(rng):
    q, c = _make(rng, n=8192)
    s, i = chunked_topk(jnp.asarray(q), jnp.asarray(c), 7, size=5000,
                        chunk=1024)
    _check(s, i, *_oracle_topk(q, c, 7, size=5000))


@pytest.mark.parametrize("k", [1, 10, 32])
def test_pallas_topk_interpret(rng, k):
    q, c = _make(rng, b=8, n=2048, d=128)
    s, i = pallas_topk(jnp.asarray(q), jnp.asarray(c), k, tile=512,
                       interpret=True)
    _check(s, i, *_oracle_topk(q, c, k))


def test_pallas_topk_padding(rng):
    q, c = _make(rng, b=8, n=2048, d=128)
    s, i = pallas_topk(jnp.asarray(q), jnp.asarray(c), 10, size=1500,
                       tile=512, interpret=True)
    _check(s, i, *_oracle_topk(q, c, 10, size=1500))
    assert np.asarray(i).max() < 1500


def test_dispatch_topk_cpu(rng):
    q, c = _make(rng, n=2048)
    s, i = dispatch_topk(jnp.asarray(q), jnp.asarray(c), 5)
    _check(s, i, *_oracle_topk(q, c, 5))


def test_recall_at_10_is_one_vs_oracle(rng):
    """BASELINE.json config[0]: recall@10 == 1.0 vs exact brute force."""
    q, c = _make(rng, b=16, n=4096, d=256)
    _, oracle_i = _oracle_topk(q, c, 10)
    _, i = exact_topk(jnp.asarray(q), jnp.asarray(c), 10)
    i = np.asarray(i)
    recall = np.mean([
        len(set(i[r]) & set(oracle_i[r])) / 10 for r in range(len(q))])
    assert recall == 1.0


# ------------------------------------------ round-2: verified exact kernel

def _clustered_case(rng, b=4, d=32, tile=128, tiles=80, k=10):
    """Corpus where each query's full top-k lands inside ONE tile — the
    adversarial case for tile_k<k extraction (RAG corpora store chunks of
    one document contiguously)."""
    n = tile * tiles
    q = np.asarray(normalize(jnp.asarray(
        rng.standard_normal((b, d), dtype=np.float32))))
    c = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    for bi in range(b):
        t0 = (bi * 7 + 3) * tile          # a distinct tile per query
        c[t0:t0 + k] = q[bi] + 0.01 * rng.standard_normal((k, d))
    c = np.asarray(normalize(jnp.asarray(c)))
    return q, c, n


def test_pallas_tile_k_lt_k_is_approximate(rng):
    """Documents the failure mode: unverified tile_k=2 drops clustered
    winners (this is why approximation is opt-in)."""
    q, c, n = _clustered_case(rng)
    oracle_s, oracle_i = _oracle_topk(q, c, 10)
    s, i = pallas_topk(jnp.asarray(q), jnp.asarray(c), 10, tile=128,
                       tile_k=2, interpret=True)
    i = np.asarray(i)
    recall = np.mean([len(set(i[r]) & set(oracle_i[r])) / 10
                      for r in range(len(q))])
    assert recall <= 0.3, f"expected heavy loss, got recall {recall}"


def test_pallas_topk_verified_exact_on_clustered(rng):
    from optimized_rag_tpu.ops.topk import pallas_topk_verified
    q, c, n = _clustered_case(rng)
    oracle_s, oracle_i = _oracle_topk(q, c, 10)
    s, i = pallas_topk_verified(jnp.asarray(q), jnp.asarray(c), 10,
                                tile=128, tile_k=2, interpret=True)
    _check(s, i, oracle_s, oracle_i)
    assert set(np.asarray(i)[0]) == set(oracle_i[0])


def test_pallas_topk_verified_random_and_padding(rng):
    from optimized_rag_tpu.ops.topk import pallas_topk_verified
    q, c = _make(rng, b=8, n=128 * 40, d=64)
    size = 128 * 40 - 77
    oracle_s, oracle_i = _oracle_topk(q, c, 10, size=size)
    s, i = pallas_topk_verified(jnp.asarray(q), jnp.asarray(c), 10,
                                size=size, tile=128, tile_k=2,
                                interpret=True)
    _check(s, i, oracle_s, oracle_i)


def test_pallas_topk_verified_query_chunking(rng):
    """mem_budget forcing lax.map over query chunks must not change
    results."""
    from optimized_rag_tpu.ops.topk import pallas_topk_verified
    q, c, n = _clustered_case(rng, b=8)
    oracle_s, oracle_i = _oracle_topk(q, c, 10)
    s, i = pallas_topk_verified(jnp.asarray(q), jnp.asarray(c), 10,
                                tile=128, tile_k=2, interpret=True,
                                mem_budget=128 * 10 * 32 * 4 * 2)
    _check(s, i, oracle_s, oracle_i)


def test_dispatch_approx_opt_in(rng):
    """approx_tile_k is an explicit opt-in; default dispatch stays exact."""
    q, c, n = _clustered_case(rng)
    oracle_s, oracle_i = _oracle_topk(q, c, 10)
    s, i = dispatch_topk(jnp.asarray(q), jnp.asarray(c), 10,
                         prefer_pallas=True, tile=128)
    _check(s, i, oracle_s, oracle_i)
    _, i_approx = dispatch_topk(jnp.asarray(q), jnp.asarray(c), 10,
                                prefer_pallas=True, tile=128,
                                approx_tile_k=2)
    i_approx = np.asarray(i_approx)
    recall = np.mean([len(set(i_approx[r]) & set(oracle_i[r])) / 10
                      for r in range(len(q))])
    assert recall < 1.0


def test_batch_union_verified_exact_on_clustered(rng):
    from optimized_rag_tpu.ops.topk import pallas_topk_verified_batch
    q, c, n = _clustered_case(rng, b=8)
    oracle_s, oracle_i = _oracle_topk(q, c, 10)
    s, packed = pallas_topk_verified_batch(
        jnp.asarray(q), jnp.asarray(c), 10, tile=128, tile_k=2,
        union_tiles=16, interpret=True)
    packed = np.asarray(packed)
    assert packed[-1, 0] == 0, "union must cover 8 distinct hot tiles"
    _check(s, packed[:-1], oracle_s, oracle_i)


def test_batch_union_detects_overflow(rng):
    """More distinct suspicious tiles than union slots -> nonzero
    uncovered count (the caller's signal to rerun exactly)."""
    from optimized_rag_tpu.ops.topk import pallas_topk_verified_batch
    q, c, n = _clustered_case(rng, b=8)
    _, packed = pallas_topk_verified_batch(
        jnp.asarray(q), jnp.asarray(c), 10, tile=128, tile_k=2,
        union_tiles=2, interpret=True)   # 8 hot tiles, 2 slots
    assert np.asarray(packed)[-1, 0] > 0


def test_batch_union_with_padding(rng):
    from optimized_rag_tpu.ops.topk import pallas_topk_verified_batch
    q, c = _make(rng, b=16, n=128 * 40, d=64)
    size = 128 * 40 - 77
    oracle_s, oracle_i = _oracle_topk(q, c, 10, size=size)
    s, packed = pallas_topk_verified_batch(
        jnp.asarray(q), jnp.asarray(c), 10, size=size, tile=128,
        tile_k=2, union_tiles=8, interpret=True)
    packed = np.asarray(packed)
    if packed[-1, 0] == 0:
        _check(s, packed[:-1], oracle_s, oracle_i)


# ------------------------------------------ round-3: certified packed kernel

def test_certified_random(rng):
    from optimized_rag_tpu.ops.topk import pallas_topk_certified
    q, c = _make(rng, b=8, n=128 * 40, d=64)
    oracle_s, oracle_i = _oracle_topk(q, c, 10)
    s, packed = pallas_topk_certified(jnp.asarray(q), jnp.asarray(c), 10,
                                      tile=128, interpret=True)
    packed = np.asarray(packed)
    assert packed[-1, 0] == 0
    _check(s, packed[:-1], oracle_s, oracle_i)


def test_certified_clustered(rng):
    """Adversarial case: a query's full top-k inside ONE tile (contiguous
    same-document chunks). The unit rescue + union rescan must recover
    every winner."""
    from optimized_rag_tpu.ops.topk import pallas_topk_certified
    q, c, n = _clustered_case(rng, b=8)
    oracle_s, oracle_i = _oracle_topk(q, c, 10)
    s, packed = pallas_topk_certified(jnp.asarray(q), jnp.asarray(c), 10,
                                      tile=128, union_tiles=16,
                                      interpret=True)
    packed = np.asarray(packed)
    assert packed[-1, 0] == 0
    _check(s, packed[:-1], oracle_s, oracle_i)
    assert set(packed[0]) == set(oracle_i[0])


def test_certified_single_unit_cluster(rng):
    """All k winners inside ONE G-row unit of one tile: only the c1 unit
    rescue can recover rows 2..k (they hide behind the unit winner)."""
    from optimized_rag_tpu.ops.topk import pallas_topk_certified
    tile, groups, d = 128, 8, 32
    small = tile // groups
    n = tile * 60
    q = np.asarray(normalize(jnp.asarray(
        rng.standard_normal((4, d), dtype=np.float32))))
    c = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    for bi in range(4):
        t0 = (bi * 5 + 2) * tile
        unit = 3  # rows t0+3, t0+3+small, ... share one strided unit
        rows = [t0 + unit + g * small for g in range(groups)]
        for rank, r in enumerate(rows):
            c[r] = q[bi] * (1.0 - 0.001 * rank) \
                + 0.001 * rng.standard_normal(d)
    c = np.asarray(normalize(jnp.asarray(c)))
    oracle_s, oracle_i = _oracle_topk(q, c, groups)
    s, packed = pallas_topk_certified(jnp.asarray(q), jnp.asarray(c),
                                      groups, tile=tile, groups=groups,
                                      interpret=True)
    packed = np.asarray(packed)
    assert packed[-1, 0] == 0
    _check(s, packed[:-1], oracle_s, oracle_i)


def test_certified_padding(rng):
    from optimized_rag_tpu.ops.topk import pallas_topk_certified
    q, c = _make(rng, b=8, n=128 * 40, d=64)
    size = 128 * 40 - 77
    oracle_s, oracle_i = _oracle_topk(q, c, 10, size=size)
    s, packed = pallas_topk_certified(jnp.asarray(q), jnp.asarray(c), 10,
                                      size=size, tile=128, interpret=True)
    packed = np.asarray(packed)
    assert packed[-1, 0] == 0
    _check(s, packed[:-1], oracle_s, oracle_i)
    assert packed[:-1].max() < size


def test_certified_detects_union_overflow(rng):
    from optimized_rag_tpu.ops.topk import pallas_topk_certified
    q, c, n = _clustered_case(rng, b=8)
    _, packed = pallas_topk_certified(jnp.asarray(q), jnp.asarray(c), 10,
                                      tile=128, union_tiles=2,
                                      interpret=True)
    # 8 distinct hot tiles vs 2 union slots: either the rescue pass alone
    # already covers every winner (certificates hold) or uncovered > 0.
    packed = np.asarray(packed)
    if packed[-1, 0] == 0:
        oracle_s, oracle_i = _oracle_topk(q, c, 10)
        _check(_, packed[:-1], oracle_s, oracle_i)


def test_certified_negative_scores(rng):
    """Queries anti-correlated with the corpus: all scores negative; the
    +2.0 shift must keep packed ordering correct."""
    from optimized_rag_tpu.ops.topk import pallas_topk_certified
    q = np.asarray(normalize(jnp.asarray(
        rng.standard_normal((4, 32), dtype=np.float32))))
    base = rng.standard_normal((128 * 20, 32)).astype(np.float32)
    # push every corpus row to have negative dot with every query
    for bi in range(4):
        base -= 0.5 * np.abs(base @ q[bi])[:, None] * q[bi]
    c = np.asarray(normalize(jnp.asarray(base)))
    oracle_s, oracle_i = _oracle_topk(q, c, 5)
    s, packed = pallas_topk_certified(jnp.asarray(q), jnp.asarray(c), 5,
                                      tile=128, interpret=True)
    packed = np.asarray(packed)
    assert packed[-1, 0] == 0
    _check(s, packed[:-1], oracle_s, oracle_i)


def test_dispatch_routes_certified(rng):
    """Default dispatch stays exact through the certified kernel on the
    clustered adversarial corpus."""
    q, c, n = _clustered_case(rng, b=16, tiles=700)
    oracle_s, oracle_i = _oracle_topk(q, c, 10)
    s, i = dispatch_topk(jnp.asarray(q), jnp.asarray(c), 10,
                         prefer_pallas=True, tile=128)
    _check(s, np.asarray(i), oracle_s, oracle_i)


def test_dispatch_defer_certificate(rng):
    from optimized_rag_tpu.ops.topk import certificate_uncovered
    q, c, n = _clustered_case(rng, b=16, tiles=700)
    oracle_s, oracle_i = _oracle_topk(q, c, 10)
    s, ids = dispatch_topk(jnp.asarray(q), jnp.asarray(c), 10,
                           prefer_pallas=True, tile=128,
                           defer_certificate=True)
    ids = np.asarray(ids)
    assert ids.shape[0] == len(q) + 1
    if certificate_uncovered(ids) == 0:
        _check(s, ids[:-1], oracle_s, oracle_i)


def test_dispatch_batch_union_fallback_stays_exact(rng):
    """dispatch_topk must stay exact even when the union overflows: the
    clustered case with b>=16 distinct hot tiles and a tiny union forces
    the certified fallback path."""
    from optimized_rag_tpu.ops import topk as topk_mod
    q, c, n = _clustered_case(rng, b=16, tiles=700)  # 700 tiles >= 64*k...
    oracle_s, oracle_i = _oracle_topk(q, c, 10)
    s, i = topk_mod.dispatch_topk(jnp.asarray(q), jnp.asarray(c), 10,
                                  prefer_pallas=True, tile=128)
    _check(s, np.asarray(i), oracle_s, oracle_i)


def test_certified_multi_matches_single_dispatch(rng):
    """One-dispatch multi-batch wrapper: M sub-batches through lax.map
    must return exactly what M separate certified calls return, with
    the certificate row summed across blocks."""
    from optimized_rag_tpu.ops.topk import (
        pallas_topk_certified, pallas_topk_certified_multi)
    q, c = _make(rng, b=12, n=128 * 40, d=64)
    oracle_s, oracle_i = _oracle_topk(q, c, 10)
    s, packed = pallas_topk_certified_multi(
        jnp.asarray(q), jnp.asarray(c), 10, sub_batch=4,
        tile=128, interpret=True)
    packed = np.asarray(packed)
    assert s.shape == (12, 10) and packed.shape == (13, 10)
    assert packed[-1, 0] == 0
    _check(s, packed[:-1], oracle_s, oracle_i)
    # block-for-block identical to the single-batch kernel
    for blk in range(3):
        s1, p1 = pallas_topk_certified(
            jnp.asarray(q[4 * blk:4 * blk + 4]), jnp.asarray(c), 10,
            tile=128, interpret=True)
        np.testing.assert_allclose(np.asarray(s1),
                                   np.asarray(s)[4 * blk:4 * blk + 4])
        assert (np.asarray(p1)[:-1]
                == packed[4 * blk:4 * blk + 4]).all()


def test_certified_multi_with_padding_size(rng):
    from optimized_rag_tpu.ops.topk import pallas_topk_certified_multi
    q, c = _make(rng, b=8, n=128 * 16, d=64)
    live = 128 * 16 - 77                    # padded tail must never win
    oracle_s, oracle_i = _oracle_topk(q, c[:live], 10)
    s, packed = pallas_topk_certified_multi(
        jnp.asarray(q), jnp.asarray(c), 10, size=live, sub_batch=4,
        tile=128, interpret=True)
    packed = np.asarray(packed)
    assert packed[-1, 0] == 0
    assert (packed[:-1] < live).all()
    _check(s, packed[:-1], oracle_s, oracle_i)


def test_dispatch_padded_batch_certifies_exact(rng):
    """Zero pad rows poisoned the certificate: a zero query's tau is 0,
    so every tile's upper bound reads suspicious and uncovered>0 on
    EVERY padded call — the exact result was then silently recomputed
    (2x the scan). Pad rows now duplicate a real query; the padded
    dispatch must certify uncovered==0 and match the exact oracle."""
    from optimized_rag_tpu.ops import topk as T
    n, d, k, tile = 16384, 8, 4, 64        # n//tile = 256 >= 64*k
    c = rng.standard_normal((n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    b = 1030                               # pads to 2x1024 sub-batches
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s, packed = T.dispatch_topk(jnp.asarray(q), jnp.asarray(c), k,
                                prefer_pallas=True, tile=tile,
                                defer_certificate=True)
    assert packed.shape == (b + 1, k)
    assert T.certificate_uncovered(packed) == 0
    s_ref, i_ref = T.exact_topk(jnp.asarray(q), jnp.asarray(c), k)
    assert np.array_equal(np.asarray(packed[:-1]), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=0, atol=1e-5)


def test_dispatch_chunked_handles_remainder_corpus(rng):
    """Non-TPU large-corpus routing uses the remainder-capable
    chunked_topk for ANY n > chunk (a tile-rounded shard capacity is
    rarely a chunk multiple; exact_topk would materialize [B, N])."""
    from optimized_rag_tpu.ops import topk as T
    n, d, k = 2048 + 300, 8, 5
    c = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((3, d)).astype(np.float32)
    s, ids = T.dispatch_topk(jnp.asarray(q), jnp.asarray(c), k,
                             prefer_pallas=False, chunk=1024)
    s_ref, i_ref = T.exact_topk(jnp.asarray(q), jnp.asarray(c), k)
    assert np.array_equal(np.asarray(ids), np.asarray(i_ref))


def test_dispatch_routes_large_batches_to_multi(monkeypatch):
    """dispatch_topk sends B>=2048 (multiple of 1024) through the
    single-dispatch multi-batch kernel and smaller batches through the
    plain certified kernel."""
    from optimized_rag_tpu.ops import topk as T
    calls = {}

    def fake(name):
        def _f(q, c, k, size=None, **kw):
            calls[name] = (tuple(q.shape), kw.get("sub_batch"))
            return (jnp.zeros((q.shape[0], k), jnp.float32),
                    jnp.zeros((q.shape[0] + 1, k), jnp.int32))
        return _f

    monkeypatch.setattr(T, "pallas_topk_certified_multi", fake("multi"))
    monkeypatch.setattr(T, "pallas_topk_certified", fake("single"))
    c = jnp.zeros((2560, 8), jnp.float32)
    s, ids = T.dispatch_topk(jnp.zeros((2048, 8), jnp.float32), c, 4,
                             prefer_pallas=True, tile=4)
    assert calls.pop("multi") == ((2048, 8), 1024)
    assert ids.shape == (2048, 4)          # certificate row stripped
    T.dispatch_topk(jnp.zeros((512, 8), jnp.float32), c, 4,
                    prefer_pallas=True, tile=4)
    assert calls.pop("single")[0] == (512, 8)


def test_dispatch_pads_awkward_large_batches_to_multi(monkeypatch):
    """B in (1024, 2048) or not divisible by 1024 must NOT hit the
    single certified kernel (its [B, tile] VMEM block caps B at ~1024,
    ADVICE r3 medium): it pads up to whole sub-batches, routes through
    the multi kernel, and slices the pad back off."""
    from optimized_rag_tpu.ops import topk as T
    calls = {}

    def fake(name):
        def _f(q, c, k, size=None, **kw):
            calls[name] = (tuple(q.shape), kw.get("sub_batch"))
            return (jnp.zeros((q.shape[0], k), jnp.float32),
                    jnp.zeros((q.shape[0] + 1, k), jnp.int32))
        return _f

    monkeypatch.setattr(T, "pallas_topk_certified_multi", fake("multi"))
    monkeypatch.setattr(T, "pallas_topk_certified", fake("single"))
    c = jnp.zeros((2560, 8), jnp.float32)
    for b in (1536, 2304, 1025):
        s, ids = T.dispatch_topk(jnp.zeros((b, 8), jnp.float32), c, 4,
                                 prefer_pallas=True, tile=4)
        padded = ((b + 1023) // 1024) * 1024
        assert calls.pop("multi") == ((padded, 8), 1024), b
        assert "single" not in calls
        assert s.shape == (b, 4)
        assert ids.shape == (b, 4), "pad sliced, certificate row stripped"


