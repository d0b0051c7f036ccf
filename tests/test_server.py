"""HTTP serving surface: /search micro-batching, /chat, health, stats."""

import json
import threading
import urllib.request

import pytest

from optimized_rag_tpu.agent.agent import RAGAgent
from optimized_rag_tpu.agent.llm import DeterministicLLM
from optimized_rag_tpu.agent.web import WebSearchTool
from optimized_rag_tpu.config import Settings
from optimized_rag_tpu.server import AgentHTTPServer

from fakes import FakeCrossEncoder, FakeEmbedder


@pytest.fixture
def http_agent():
    s = Settings()
    s.flags.enable_metrics_export = False
    a = RAGAgent(s, llm=DeterministicLLM(),
                 embed_service=FakeEmbedder(dim=32),
                 cross_encoder=FakeCrossEncoder(),
                 web=WebSearchTool(search_fn=lambda q, n: []))
    a.ingestor.ingest_text(
        "The MXU is a 128x128 systolic array. It multiplies matrices in "
        "bfloat16 precision on the TPU.", filename="tpu.txt")
    srv = AgentHTTPServer(a, port=0)  # ephemeral port
    port = srv.start()
    yield srv, port
    srv.stop()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


def test_healthz_and_stats(http_agent):
    srv, port = http_agent
    code, body = _get(port, "/healthz")
    assert code == 200 and body["ok"] and body["corpus_size"] >= 1
    code, body = _get(port, "/stats")
    assert code == 200 and "serving" in body and "rerank" in body


def test_search_endpoint(http_agent):
    srv, port = http_agent
    code, body = _post(port, "/search",
                       {"query": "systolic array matrices", "k": 3})
    assert code == 200
    assert body["results"], body
    assert "systolic" in body["results"][0]["text"]


def test_search_micro_batches_concurrent_callers(http_agent):
    srv, port = http_agent
    results = []

    def call(i):
        results.append(_post(port, "/search",
                             {"query": f"systolic array {i}", "k": 2}))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 8 and all(c == 200 for c, _ in results)
    stats = srv.query_server.get_stats()
    assert stats["queries"] >= 8
    assert stats["batches"] <= stats["queries"]  # some coalescing happened


def test_chat_endpoint(http_agent):
    srv, port = http_agent
    code, body = _post(port, "/chat", {"message": "What is the MXU?"})
    assert code == 200
    assert body["answer"]
    assert "factuality_score" in body and "sources" in body


def test_bad_requests(http_agent):
    srv, port = http_agent
    code, body = _post(port, "/search", {})
    assert code == 400
    code, body = _post(port, "/nope", {"x": 1})
    assert code == 404


def test_get_errors_return_json_500(http_agent):
    """do_GET fail-open parity with do_POST: a stats-provider failure
    must come back as a JSON 500, not a closed socket."""
    srv, port = http_agent

    class Boom:
        def get_statistics(self):
            raise RuntimeError("stats provider exploded")

    old = srv.agent.hierarchical
    srv.agent.hierarchical = Boom()
    try:
        req = urllib.request.Request(f"http://127.0.0.1:{port}/stats")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 500
        assert "exploded" in json.loads(exc.value.read())["error"]
    finally:
        srv.agent.hierarchical = old
