"""int8 corpus storage: quantization, scaled kernels, DenseIndex mode.

The reference stores float32 only (rag/document_store.py:125); the
storage-precision ladder (f32 / bf16 / int8) is a TPU-side capacity
lever — int8 quarters the HBM-resident bytes and the scan read.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimized_rag_tpu.index.dense import DenseIndex
from optimized_rag_tpu.ops.quantize import dequantize_int8, quantize_int8
from optimized_rag_tpu.ops.topk import (
    chunked_topk, exact_topk, pallas_topk, rescore_topk)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


# ------------------------------------------------------------- quantization

def test_quantize_roundtrip_error_bound(rng):
    x = jnp.asarray(_unit(rng, 256, 64))
    q8, scale = quantize_int8(x)
    assert q8.dtype == jnp.int8 and scale.dtype == jnp.float32
    back = np.asarray(dequantize_int8(q8, scale))
    # Symmetric rounding: per-component error <= scale/2 = max|row|/254.
    bound = np.asarray(scale)[:, None] / 2 + 1e-7
    assert (np.abs(back - np.asarray(x)) <= bound).all()
    # Unit rows stay near-unit after dequantization.
    norms = np.linalg.norm(back, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=0.02)


def test_quantize_zero_rows_score_zero(rng):
    x = jnp.concatenate([jnp.asarray(_unit(rng, 4, 32)),
                         jnp.zeros((2, 32))])
    q8, scale = quantize_int8(x)
    assert np.asarray(scale)[4:].tolist() == [0.0, 0.0]
    back = np.asarray(dequantize_int8(q8, scale))
    assert (back[4:] == 0.0).all()


# ------------------------------------------------------------ scaled kernels

def _quantized_problem(rng, n=2048, d=64, b=8):
    corpus = _unit(rng, n, d)
    q8, scale = quantize_int8(jnp.asarray(corpus))
    deq = dequantize_int8(q8, scale)
    q = jnp.asarray(_unit(rng, b, d))
    return q, q8, scale, deq


def test_exact_and_chunked_row_scale_match_dequantized_oracle(rng):
    q, q8, scale, deq = _quantized_problem(rng)
    want_s, want_i = exact_topk(q, deq, 10)
    s1, i1 = exact_topk(q, q8, 10, row_scale=scale)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(want_s),
                               atol=1e-6)
    s2, i2 = chunked_topk(q, q8, 10, chunk=512, row_scale=scale)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(want_i))
    # Remainder-tail path (n not a multiple of chunk).
    s3, i3 = chunked_topk(q, q8, 10, chunk=700, row_scale=scale)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(want_i))


def test_pallas_row_scale_matches_dequantized_oracle(rng):
    q, q8, scale, deq = _quantized_problem(rng)
    want_s, want_i = exact_topk(q, deq, 10)
    s, i = pallas_topk(q, q8, 10, tile=256, row_scale=scale,
                       interpret=jax.default_backend() != "tpu")
    # The scaled kernel's bf16 query cast can flip near-ties; require
    # candidate-set agreement (the production path rescores in f32).
    recall = np.mean([len(set(np.asarray(i)[r]) & set(np.asarray(want_i)[r]))
                      for r in range(q.shape[0])]) / 10
    assert recall >= 0.9, recall
    got = rescore_topk(q, q8, i, 10, row_scale=scale)
    np.testing.assert_allclose(np.asarray(got[0])[:, 0],
                               np.asarray(want_s)[:, 0], atol=2e-3)


def test_pallas_row_scale_size_mask(rng):
    q, q8, scale, deq = _quantized_problem(rng, n=1024)
    want_s, want_i = exact_topk(q, deq, 5, size=700)
    s, i = pallas_topk(q, q8, 5, size=700, tile=256, row_scale=scale,
                       interpret=jax.default_backend() != "tpu")
    assert int(np.asarray(i).max()) < 700
    recall = np.mean([len(set(np.asarray(i)[r]) & set(np.asarray(want_i)[r]))
                      for r in range(q.shape[0])]) / 5
    assert recall >= 0.9, recall


def test_rescore_row_scale_parity(rng):
    q, q8, scale, deq = _quantized_problem(rng, n=512)
    cand = jnp.asarray(rng.integers(0, 512, size=(8, 32)), jnp.int32)
    want = rescore_topk(q, deq, cand, 10)
    got = rescore_topk(q, q8, cand, 10, row_scale=scale)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=1e-6)


# ------------------------------------------------------------- fused hybrid

def test_fuse_candidates_row_scale(rng):
    from optimized_rag_tpu.ops.hybrid import fuse_candidates
    q, q8, scale, deq = _quantized_problem(rng, n=256, b=1)
    cand_ids = np.arange(32, dtype=np.int32)
    cand_valid = np.ones(32, bool)
    kw = np.zeros(32, np.float32)
    ages = np.zeros(32, np.float32)
    w = np.asarray([1.0, 0.0, 0.0], np.float32)
    want = np.asarray(fuse_candidates(q[0], deq, cand_ids, cand_valid,
                                      kw, ages, w, 30.0, k=5))
    got = np.asarray(fuse_candidates(q[0], q8, cand_ids, cand_valid,
                                     kw, ages, w, 30.0, k=5,
                                     row_scale=scale))
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_allclose(got[0], want[0], atol=1e-5)


# ---------------------------------------------------------------- DenseIndex

def test_int8_index_recall_matches_f32(rng):
    docs = _unit(rng, 4096, 64)
    f32 = DenseIndex(dim=64, capacity_block=4096, tile=256)
    f32.add(docs)
    i8 = DenseIndex(dim=64, capacity_block=4096, tile=256, dtype=jnp.int8)
    i8.add(docs)
    assert i8.quantized and i8._emb.dtype == jnp.int8
    q = _unit(rng, 8, 64)
    want = f32.search(q, k=10)
    got = i8.search(q, k=10)
    recall = np.mean([len(set(got.ids[r]) & set(want.ids[r])) / 10
                      for r in range(8)])
    assert recall >= 0.95, recall
    # Rescored scores are f32 dots of the dequantized rows: close to f32.
    np.testing.assert_allclose(got.scores, want.scores, atol=2e-2)


def test_int8_index_delete_and_compact(rng):
    docs = _unit(rng, 64, 32)
    idx = DenseIndex(dim=32, capacity_block=256, tile=256, dtype=jnp.int8)
    ids = idx.add(docs)
    q = docs[:1]
    top = idx.search(q, k=1)
    assert int(top.ids[0, 0]) == 0
    idx.delete([ids[0]])
    top = idx.search(q, k=1)
    assert int(top.ids[0, 0]) != 0
    mapping = idx.compact()
    assert mapping[0] == -1 and idx.size == 63
    # Scales moved with their rows: self-hit still works post-compact.
    top = idx.search(docs[5:6], k=1)
    assert int(top.ids[0, 0]) == mapping[5]


def test_int8_index_snapshot_roundtrip(rng, tmp_path):
    from optimized_rag_tpu.index.snapshot import load_state, save_state
    docs = _unit(rng, 48, 32)
    idx = DenseIndex(dim=32, capacity_block=256, tile=256, dtype=jnp.int8)
    idx.add(docs)
    idx.delete([3])
    save_state(str(tmp_path), "dense", idx.state_dict())
    back = DenseIndex.from_state_dict(load_state(str(tmp_path), "dense"))
    assert back.quantized and back.size == 48 and 3 in back._tombstones
    np.testing.assert_array_equal(np.asarray(back._emb[:48]),
                                  np.asarray(idx._emb[:48]))
    np.testing.assert_array_equal(np.asarray(back._scale[:48]),
                                  np.asarray(idx._scale[:48]))
    want = idx.search(docs[7:8], k=3)
    got = back.search(docs[7:8], k=3)
    np.testing.assert_array_equal(got.ids, want.ids)


def test_int8_index_search_tail(rng):
    docs = _unit(rng, 96, 32)
    idx = DenseIndex(dim=32, capacity_block=256, tile=32, dtype=jnp.int8)
    idx.add(docs)
    res = idx.search_tail(docs[80:81], k=3, from_row=64)
    assert int(res.ids[0, 0]) == 80
    assert (res.ids[0] >= 64).all()


def test_int8_vectors_f32_and_get(rng):
    docs = _unit(rng, 16, 32)
    idx = DenseIndex(dim=32, capacity_block=256, tile=256, dtype=jnp.int8)
    idx.add(docs)
    v = np.asarray(idx.vectors_f32())
    assert v.dtype == np.float32 and v.shape == (16, 32)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=0.02)
    g = np.asarray(idx.get([2, 5]))
    np.testing.assert_allclose(g, v[[2, 5]], atol=1e-7)


def test_agent_int8_corpus_setting():
    import sys
    sys.path.insert(0, "tests")
    from fakes import FakeCrossEncoder, FakeEmbedder
    from optimized_rag_tpu.agent.agent import RAGAgent
    from optimized_rag_tpu.agent.llm import DeterministicLLM
    from optimized_rag_tpu.config import Settings
    s = Settings.from_env({"ORAG_RETRIEVAL_CORPUS_DTYPE": "int8",
                           "ORAG_FLAGS_ENABLE_METRICS_EXPORT": "0"})
    a = RAGAgent(s, llm=DeterministicLLM(),
                 embed_service=FakeEmbedder(dim=32),
                 cross_encoder=FakeCrossEncoder())
    assert a.dense.dtype == jnp.int8 and a.dense.quantized
    a.ingestor.ingest_text("the quick brown fox document")
    a.ingestor.ingest_text("bananas are rich in potassium")
    docs = a.retriever.dense_only("quick brown fox", 2)
    assert docs
    docs = a.retriever.retrieve("quick brown fox", top_k=2)
    assert docs


# ------------------------------------------------------- certified (scaled)

def test_certified_row_scale_interpret(rng):
    from optimized_rag_tpu.ops.topk import (
        certificate_uncovered, pallas_topk_certified,
        pallas_topk_certified_multi)
    q, q8, scale, deq = _quantized_problem(rng, n=4096, d=64, b=8)
    # Oracle scoring the SAME function as the scaled kernel: bf16-rounded
    # queries (int8 codes are exact in bf16), f32 accumulation, f32 scale.
    qb = q.astype(jnp.bfloat16).astype(jnp.float32)
    want_s, want_i = exact_topk(qb, q8, 10, row_scale=scale)
    # int8_native=False pins the bf16-operand scaled path this oracle
    # models; the int8-native MXU path has its own oracle-matched tests
    # (tests/test_topk_r5.py).
    s, ids = pallas_topk_certified(q, q8, 10, tile=256,
                                   row_scale=scale, interpret=True,
                                   int8_native=False)
    assert certificate_uncovered(ids) == 0
    np.testing.assert_array_equal(np.asarray(ids)[:-1], np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               atol=2e-3)
    # Multi sub-batch path.
    q2 = jnp.concatenate([q, q])
    s2, ids2 = pallas_topk_certified_multi(q2, q8, 10, sub_batch=8,
                                           tile=256, row_scale=scale,
                                           interpret=True,
                                           int8_native=False)
    assert certificate_uncovered(ids2) == 0
    np.testing.assert_array_equal(np.asarray(ids2)[:8], np.asarray(want_i))


def test_dispatch_row_scale_certified_route(rng):
    from optimized_rag_tpu.ops.topk import dispatch_topk
    # n//tile >= 64*k forces the certified route (tile=8, k=... keep k
    # tiny): 4096/8 = 512 tiles >= 64*2.
    q, q8, scale, deq = _quantized_problem(rng, n=4096, d=64, b=4)
    qb = q.astype(jnp.bfloat16).astype(jnp.float32)
    want_s, want_i = exact_topk(qb, q8, 2, row_scale=scale)
    s, i = dispatch_topk(q, q8, 2, size=4096, prefer_pallas=True, tile=8,
                         row_scale=scale)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(want_i))
