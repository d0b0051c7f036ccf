"""QueryServer micro-batching + synthetic end-to-end engine evaluation."""

import threading
import time

import numpy as np
import pytest

from optimized_rag_tpu.engine.retriever import HybridRetriever
from optimized_rag_tpu.eval.synthetic import evaluate_retriever, make_dataset
from optimized_rag_tpu.index.dense import DenseIndex
from optimized_rag_tpu.index.lexical import LexicalIndex
from optimized_rag_tpu.serving import QueryServer

from fakes import FakeEmbedder


@pytest.fixture
def served_index(rng):
    emb = FakeEmbedder(dim=32)
    docs = [f"document number {i} about topic {i % 5}" for i in range(200)]
    idx = DenseIndex(dim=32, capacity_block=256, tile=256)
    idx.add(emb(docs))
    return emb, idx, docs


def test_server_batches_concurrent_queries(served_index):
    emb, idx, docs = served_index
    server = QueryServer(emb, idx, max_batch=32, max_wait_ms=30)
    server.start()
    try:
        futures = [server.submit(docs[i], k=3) for i in range(20)]
        results = [f.result(timeout=10) for f in futures]
        for i, (scores, ids) in enumerate(results):
            assert ids[0] == i           # self-retrieval
            assert scores.shape == (3,)
        stats = server.get_stats()
        assert stats["queries"] == 20
        assert stats["batches"] < 20     # coalescing happened
        assert stats["max_batch_seen"] > 1
    finally:
        server.stop()


def test_server_mixed_k(served_index):
    emb, idx, docs = served_index
    server = QueryServer(emb, idx, max_batch=8, max_wait_ms=20)
    server.start()
    try:
        f1 = server.submit(docs[0], k=1)
        f2 = server.submit(docs[1], k=7)
        s1, i1 = f1.result(5)
        s2, i2 = f2.result(5)
        assert len(i1) == 1 and len(i2) == 7
    finally:
        server.stop()


def test_server_error_propagates(served_index):
    emb, idx, docs = served_index

    class Boom:
        def search(self, q, k):
            raise RuntimeError("index exploded")

    server = QueryServer(emb, Boom(), max_wait_ms=1)
    server.start()
    try:
        with pytest.raises(RuntimeError, match="exploded"):
            server.submit("q", k=2).result(5)
    finally:
        server.stop()


def test_server_stop_is_clean(served_index):
    emb, idx, _ = served_index
    server = QueryServer(emb, idx)
    server.start()
    server.stop()
    assert all(not t.is_alive() for t in server._threads)


# ------------------------------------------------------------- synthetic eval

def test_synthetic_dataset_construction():
    ds = make_dataset(num_docs=100, num_topics=5, num_queries=10, seed=1)
    assert ds.num_docs == 100 and len(ds.queries) == 10
    for qt, rel in zip(ds.query_topics, ds.relevant):
        assert all(ds.doc_topics[d] == qt for d in rel)


def test_engine_beats_random_on_synthetic():
    ds = make_dataset(num_docs=300, num_topics=10, num_queries=30, seed=2)
    emb = FakeEmbedder(dim=64)
    dense = DenseIndex(dim=64, capacity_block=512, tile=256)
    dense.add(emb(ds.texts))
    lex = LexicalIndex(vocab_hash_bits=15, cap=64)
    lex.add(ds.texts)
    retr = HybridRetriever(dense, lex, emb, get_text=lambda i: ds.texts[i])
    metrics = evaluate_retriever(
        lambda q, k: retr.hybrid_search(q, top_k=k), ds, k=10)
    # Topic docs are ~30/300; random P@10 would be ~0.1.
    assert metrics["precision@10"] > 0.8, metrics
    assert metrics["mrr"] > 0.8, metrics


def test_dense_only_vs_hybrid_on_synthetic():
    """Hybrid (lexical channel) must help on keyword-disjoint topics."""
    ds = make_dataset(num_docs=200, num_topics=8, num_queries=20, seed=3)
    emb = FakeEmbedder(dim=32)
    dense = DenseIndex(dim=32, capacity_block=256, tile=256)
    dense.add(emb(ds.texts))
    lex = LexicalIndex(vocab_hash_bits=15, cap=64)
    lex.add(ds.texts)
    retr = HybridRetriever(dense, lex, emb, get_text=lambda i: ds.texts[i])
    hybrid = evaluate_retriever(
        lambda q, k: retr.hybrid_search(q, top_k=k), ds, k=10)
    dense_only = evaluate_retriever(
        lambda q, k: retr.dense_only(q, k), ds, k=10)
    assert hybrid["recall@10"] >= dense_only["recall@10"]


def test_queryserver_two_workers_concurrent_correctness():
    """Two dispatcher threads (the depth-2 serving pipeline) must return
    the same results as direct search, under concurrent submission."""
    import threading
    import numpy as np
    from optimized_rag_tpu.serving import QueryServer
    from optimized_rag_tpu.index.dense import DenseIndex

    rng = np.random.default_rng(3)
    dim = 32
    corpus = rng.standard_normal((500, dim)).astype(np.float32)

    def embed(texts):
        # Deterministic per-text vector: seed from the text's number.
        return np.stack([corpus[int(t.split("#")[1])] for t in texts])

    idx = DenseIndex(dim=dim, capacity_block=1024, tile=128)
    idx.add(corpus)
    server = QueryServer(embed, idx, max_batch=16, max_wait_ms=2.0,
                         workers=2)
    server.start()
    try:
        results = {}
        lock = threading.Lock()

        def client(lo, hi):
            for i in range(lo, hi):
                s, ids = server.search(f"q#{i}", k=5, timeout=60)
                with lock:
                    results[i] = (s, ids)

        threads = [threading.Thread(target=client,
                                    args=(j * 25, (j + 1) * 25))
                   for j in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        server.stop()
    assert len(results) == 200
    for i, (s, ids) in results.items():
        assert ids[0] == i, f"query {i} must retrieve its own row first"
    stats = server.get_stats()
    assert stats["queries"] == 200
    # stop() must have terminated both workers
    assert all(not t.is_alive() for t in server._threads)


def test_server_restart_after_stop(served_index):
    emb, idx, docs = served_index
    server = QueryServer(emb, idx, max_batch=8, max_wait_ms=2)
    server.start()
    server.stop()
    server.start()                         # must not inherit stale sentinel
    try:
        s, ids = server.search(docs[3], k=3, timeout=10)
        assert ids[0] == 3
    finally:
        server.stop()


def test_server_cancelled_future_does_not_poison_batch(served_index):
    emb, idx, docs = served_index
    server = QueryServer(emb, idx, max_batch=8, max_wait_ms=50)
    server.start()
    try:
        f_cancel = server.submit(docs[0], k=3)
        f_live = server.submit(docs[1], k=3)
        f_cancel.cancel()
        s, ids = f_live.result(timeout=10)
        assert ids[0] == 1
    finally:
        server.stop()


def test_server_k_validation():
    server = QueryServer(lambda t: np.zeros((len(t), 4)), None, max_k=10)
    server.start()
    try:
        import pytest as _pytest
        with _pytest.raises(ValueError):
            server.submit("q", k=0)
        with _pytest.raises(ValueError):
            server.submit("q", k=11)
    finally:
        server.stop()


def test_server_stop_cancels_undispatched_requests(served_index):
    """Requests still queued when stop() runs must fail fast (cancelled),
    not leave callers hanging until their result() timeout."""
    import time as _time
    emb, idx, docs = served_index

    class SlowIndex:
        def search(self, q, k):
            _time.sleep(0.3)
            return idx.search(q, k)

    server = QueryServer(emb, SlowIndex(), max_batch=2, max_wait_ms=1,
                         workers=1)
    server.start()
    futs = [server.submit(docs[i]) for i in range(30)]
    _time.sleep(0.05)          # let the first batches enter dispatch
    server.stop()
    states = [("done" if f.done() else "pending") for f in futs]
    assert "pending" not in states, states


def test_server_idle_single_request_emits_promptly(served_index):
    """The post-busy grace must not delay the idle case: one request with
    an empty pool emits after ~max_wait, not after multiples of it."""
    emb, idx, docs = served_index
    server = QueryServer(emb, idx, max_batch=64, max_wait_ms=5, workers=2)
    server.start()
    try:
        server.search(docs[0], k=3, timeout=10)      # warm
        t0 = time.perf_counter()
        server.search(docs[1], k=3, timeout=10)
        dt = time.perf_counter() - t0
        # 5ms window + one grace window + dispatch; 1s bound is generous
        # for CI but catches an unbounded-extension regression.
        assert dt < 1.0, f"idle single-request latency {dt:.2f}s"
        assert server.get_stats()["max_batch_seen"] == 1
    finally:
        server.stop()


# ------------------------------------------------- round-3: EmbedBatcher

def test_embed_batcher_correctness_and_coalescing():
    """Concurrent encode() calls must return exactly their own rows, and
    requests arriving during a dispatch must coalesce into one."""
    from optimized_rag_tpu.serving import EmbedBatcher

    calls = []
    gate = threading.Event()

    def slow_encode(texts):
        calls.append(len(texts))
        if len(calls) == 1:
            gate.wait(timeout=5)     # hold the first dispatch open
        # deterministic embedding: hash of text in the first column
        out = np.zeros((len(texts), 4), np.float32)
        for i, t in enumerate(texts):
            out[i, 0] = float(int(t.split("-")[1]))
        return out

    b = EmbedBatcher(slow_encode).start()
    results = {}

    def worker(i):
        results[i] = b.encode([f"t-{i * 10}", f"t-{i * 10 + 1}"])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    threads[0].start()
    time.sleep(0.15)                  # t0 in flight, held by the gate
    for t in threads[1:]:
        t.start()
    time.sleep(0.15)                  # the rest queue up behind it
    gate.set()
    for t in threads:
        t.join(timeout=5)
    b.stop()
    for i in range(6):
        assert results[i].shape == (2, 4)
        assert results[i][0, 0] == i * 10 and results[i][1, 0] == i * 10 + 1
    # first dispatch = 1 request; everything else coalesced afterwards
    assert len(calls) < 6
    assert b.stats["dispatches"] == len(calls)
    assert b.stats["max_coalesced"] >= 2


def test_embed_batcher_passthrough_when_stopped():
    from optimized_rag_tpu.serving import EmbedBatcher
    b = EmbedBatcher(lambda ts: np.ones((len(ts), 3), np.float32))
    out = b.encode(["a", "b"])       # not started: direct call
    assert out.shape == (2, 3)


def test_embed_batcher_error_propagates():
    from optimized_rag_tpu.serving import EmbedBatcher

    def bad_encode(texts):
        raise RuntimeError("boom")

    b = EmbedBatcher(bad_encode).start()
    with pytest.raises(RuntimeError):
        b.encode(["x"])
    b.stop()


def test_concurrent_chat_setting_wires_batcher():
    """concurrent_chat routes agent.embed_fn through a shared batcher."""
    from optimized_rag_tpu.agent.agent import RAGAgent
    from optimized_rag_tpu.config import Settings
    import tempfile

    s = Settings()
    s.data_dir = tempfile.mkdtemp(prefix="cc_test_")
    s.serving.concurrent_chat = True
    s.flags.enable_kg = False
    agent = RAGAgent(s)
    try:
        assert agent.embed_batcher is not None
        agent.ingestor.ingest_text(
            "TPU matrix units multiply in systolic fashion.", "d1.txt")
        resp = agent.chat("How do TPU matrix units multiply?")
        assert isinstance(resp.answer, str)
        assert agent.embed_batcher.stats["dispatches"] > 0
    finally:
        agent.embed_batcher.stop()


def test_submit_racing_stop_fails_fast(served_index):
    """A submit that lands its request after stop()'s final drain must
    not leave the caller blocked forever on an unsettled future: the
    post-put liveness check cancels it and raises."""
    emb, idx, docs = served_index
    server = QueryServer(emb, idx, max_batch=8, max_wait_ms=10)
    server.start()
    orig_put = server._q.put
    fired = {"done": False}

    def racing_put(item):
        if not fired["done"] and item is not None:
            fired["done"] = True
            server._q.put = orig_put    # stop() uses the real put
            server.stop()               # drain completes before our put
            orig_put(item)              # lands in the abandoned queue
        else:
            orig_put(item)

    server._q.put = racing_put
    with pytest.raises(RuntimeError, match="stopped"):
        server.submit(docs[0], k=3)
