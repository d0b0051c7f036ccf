"""Similarity, fusion, MMR, BM25 and k-means kernels vs NumPy oracles."""

import jax.numpy as jnp
import numpy as np

from optimized_rag_tpu.ops.bm25 import bm25_idf, bm25_score_champions
from optimized_rag_tpu.ops.fusion import (
    minmax_normalize, rrf_fuse, temporal_decay, weighted_fusion)
from optimized_rag_tpu.ops.kmeans import kmeans_assign, kmeans_fit
from optimized_rag_tpu.ops.mmr import mmr_select
from optimized_rag_tpu.ops.similarity import (
    cosine_matrix, normalize, pairwise_cosine)


# ---------------------------------------------------------------- similarity

def test_normalize_unit_rows(rng):
    x = rng.standard_normal((16, 64)).astype(np.float32)
    n = np.asarray(normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)


def test_normalize_zero_row_safe(rng):
    x = np.zeros((2, 8), np.float32)
    n = np.asarray(normalize(jnp.asarray(x)))
    assert np.isfinite(n).all()


def test_cosine_matrix_oracle(rng):
    a = rng.standard_normal((5, 32)).astype(np.float32)
    b = rng.standard_normal((7, 32)).astype(np.float32)
    got = np.asarray(cosine_matrix(jnp.asarray(a), jnp.asarray(b)))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(got, an @ bn.T, atol=1e-5)


def test_pairwise_cosine_diag_one(rng):
    x = rng.standard_normal((9, 16)).astype(np.float32)
    got = np.asarray(pairwise_cosine(jnp.asarray(x)))
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-5)
    np.testing.assert_allclose(got, got.T, atol=1e-6)


# -------------------------------------------------------------------- fusion

def test_minmax_normalize(rng):
    s = rng.standard_normal((4, 10)).astype(np.float32)
    out = np.asarray(minmax_normalize(jnp.asarray(s)))
    np.testing.assert_allclose(out.min(axis=1), 0.0, atol=1e-6)
    np.testing.assert_allclose(out.max(axis=1), 1.0, atol=1e-6)


def test_weighted_fusion_matches_manual(rng):
    stack = rng.random((3, 20)).astype(np.float32)
    w = np.array([0.7, 0.2, 0.1], np.float32)
    got = np.asarray(weighted_fusion(jnp.asarray(stack), jnp.asarray(w)))
    normed = [(s - s.min()) / (s.max() - s.min()) for s in stack]
    want = sum(wi * ni for wi, ni in zip(w, normed))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rrf_fuse_oracle():
    # Two ranked lists over a 100-doc id space.
    lists = np.array([[5, 3, 9, 1], [3, 7, 5, 2]], np.int32)
    valid = np.ones_like(lists, bool)
    scores, ids = rrf_fuse(jnp.asarray(lists), jnp.asarray(valid), k_out=4,
                           rrf_k=60.0, num_candidates=100)
    acc = {}
    for lst in lists:
        for r, doc in enumerate(lst):
            acc[doc] = acc.get(doc, 0.0) + 1.0 / (60.0 + r + 1.0)
    want = sorted(acc.items(), key=lambda kv: -kv[1])[:4]
    got = list(zip(np.asarray(ids).tolist(), np.asarray(scores).tolist()))
    for (wid, ws), (gid, gs) in zip(want, got):
        assert wid == gid
        np.testing.assert_allclose(gs, ws, atol=1e-6)


def test_temporal_decay_halves_at_half_life():
    ages = jnp.asarray([0.0, 30.0, 60.0])
    got = np.asarray(temporal_decay(ages, 30.0))
    np.testing.assert_allclose(got, [1.0, 0.5, 0.25], atol=1e-6)


# ----------------------------------------------------------------------- MMR

def _oracle_mmr(emb, rel, k, lam):
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sim = emb @ emb.T
    n = len(rel)
    selected, order = [], []
    for _ in range(k):
        best, best_j = -np.inf, -1
        for j in range(n):
            if j in selected:
                continue
            pen = max(sim[j][s] for s in selected) if selected else 0.0
            sc = lam * rel[j] - (1 - lam) * pen
            if sc > best + 1e-9:
                best, best_j = sc, j
        selected.append(best_j)
        order.append(best_j)
    return order


def test_mmr_matches_oracle(rng):
    emb = rng.standard_normal((12, 16)).astype(np.float32)
    rel = rng.random(12).astype(np.float32)
    order, _ = mmr_select(jnp.asarray(emb), jnp.asarray(rel), 5, lam=0.7)
    assert np.asarray(order).tolist() == _oracle_mmr(emb, rel, 5, 0.7)


def test_mmr_first_pick_is_max_relevance(rng):
    emb = rng.standard_normal((8, 16)).astype(np.float32)
    rel = rng.random(8).astype(np.float32)
    order, _ = mmr_select(jnp.asarray(emb), jnp.asarray(rel), 3)
    assert np.asarray(order)[0] == int(np.argmax(rel))


def test_mmr_respects_valid_mask(rng):
    emb = rng.standard_normal((8, 16)).astype(np.float32)
    rel = np.linspace(1, 0, 8).astype(np.float32)
    valid = np.array([False, False, True, True, True, True, True, True])
    order, _ = mmr_select(jnp.asarray(emb), jnp.asarray(rel), 4,
                          valid=jnp.asarray(valid))
    assert all(o >= 2 for o in np.asarray(order).tolist())


# ---------------------------------------------------------------------- BM25

def _oracle_bm25(query_terms, docs_tf, doc_len, k1=1.5, b=0.75):
    """docs_tf: dict term -> {doc: tf}; returns dense score vector."""
    n = len(doc_len)
    avg = np.mean(doc_len)
    all_df = {t: len(d) for t, d in docs_tf.items()}
    scores = np.zeros(n)
    for t in query_terms:
        postings = docs_tf.get(t, {})
        df = all_df.get(t, 0)
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for doc, tf in postings.items():
            denom = tf + k1 * (1 - b + b * doc_len[doc] / avg)
            scores[doc] += idf * tf * (k1 + 1) / denom
    return scores


def test_bm25_exact_when_cap_covers_df(rng):
    n, v, cap = 50, 20, 16
    # Random sparse term-doc occurrences.
    docs_tf = {}
    doc_len = rng.integers(20, 200, n).astype(np.float64)
    for t in range(v):
        docs = rng.choice(n, size=rng.integers(1, cap), replace=False)
        docs_tf[t] = {int(d): int(rng.integers(1, 5)) for d in docs}
    champ_docs = np.zeros((v, cap), np.int32)
    champ_tf = np.zeros((v, cap), np.float32)
    champ_valid = np.zeros((v, cap), bool)
    df = np.zeros(v, np.int64)
    for t, postings in docs_tf.items():
        items = sorted(postings.items(), key=lambda kv: -kv[1])[:cap]
        df[t] = len(postings)
        for j, (d, tf) in enumerate(items):
            champ_docs[t, j], champ_tf[t, j], champ_valid[t, j] = d, tf, True
    idf = np.asarray(bm25_idf(jnp.asarray(df), n))
    q = np.array([3, 7, 11, 0], np.int32)
    qvalid = np.array([True, True, True, False])
    got = np.asarray(bm25_score_champions(
        jnp.asarray(q), jnp.asarray(qvalid), jnp.asarray(champ_docs),
        jnp.asarray(champ_tf), jnp.asarray(champ_valid), jnp.asarray(idf),
        jnp.asarray(doc_len.astype(np.float32)),
        jnp.asarray(np.float32(doc_len.mean()))))
    want = _oracle_bm25([3, 7, 11], docs_tf, doc_len)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------------- kmeans

def test_kmeans_recovers_separated_clusters(rng):
    centers = np.eye(4, 32).astype(np.float32) * 10
    pts = np.concatenate([
        centers[i] + 0.05 * rng.standard_normal((50, 32)).astype(np.float32)
        for i in range(4)])
    cents, assign = kmeans_fit(jnp.asarray(pts), 4, iters=8, seed=1)
    assign = np.asarray(assign)
    # Each ground-truth group maps to exactly one cluster id.
    groups = [set(assign[i * 50:(i + 1) * 50].tolist()) for i in range(4)]
    assert all(len(g) == 1 for g in groups)
    assert len(set().union(*groups)) == 4


def test_kmeans_assign_matches_argmax(rng):
    pts = rng.standard_normal((64, 16)).astype(np.float32)
    cents = rng.standard_normal((4, 16)).astype(np.float32)
    a, _ = kmeans_assign(jnp.asarray(normalize(jnp.asarray(pts))),
                         jnp.asarray(cents))
    pn = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(a), np.argmax(pn @ cn.T, axis=1))
