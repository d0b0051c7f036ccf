"""CLI smoke tests (hermetic: fake embedder injected via build_agent
monkeypatch, CPU backend from conftest)."""

import os

import pytest

import optimized_rag_tpu.cli as cli
from optimized_rag_tpu.agent.agent import RAGAgent
from optimized_rag_tpu.agent.llm import DeterministicLLM
from optimized_rag_tpu.config import Settings

from fakes import FakeEmbedder, FakeCrossEncoder


@pytest.fixture
def fast_agent_factory(tmp_path, monkeypatch):
    def factory(settings, offline=True, **kw):
        from optimized_rag_tpu.store.db import MetadataStore
        settings.data_dir = str(tmp_path / "data")
        store = MetadataStore(os.path.join(settings.data_dir, "metadata.db"))
        agent = RAGAgent(settings, llm=DeterministicLLM(),
                         embed_service=FakeEmbedder(dim=32), store=store,
                         cross_encoder=FakeCrossEncoder())
        agent.load_indexes()   # mirror cli.build_agent restart behavior
        return agent
    monkeypatch.setattr(cli, "build_agent", factory)
    monkeypatch.setenv("ORAG_DATA_DIR", str(tmp_path / "data"))
    return factory


def test_cli_info(capsys):
    assert cli.main(["info"]) == 0
    out = capsys.readouterr().out
    assert "backend:" in out and "devices:" in out


def test_cli_ingest_files_and_errors(tmp_path, fast_agent_factory, capsys):
    good = tmp_path / "doc.md"
    good.write_text("# Title\nThe MXU is a systolic array that multiplies.")
    bad = tmp_path / "doc.xyz"
    bad.write_text("x")
    rc = cli.main(["ingest", str(good), str(bad)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ok  " in out and "ERR" in out and "unsupported" in out


def test_cli_ingest_directory(tmp_path, fast_agent_factory, capsys):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.txt").write_text("alpha document about tpus and matrices")
    (d / "b.txt").write_text("beta document about databases and vectors")
    assert cli.main(["ingest", str(d)]) == 0
    out = capsys.readouterr().out
    assert out.count("ok  ") == 2


def test_cli_chat_scripted(fast_agent_factory, capsys, monkeypatch):
    inputs = iter(["What is anything?", "memory", "stats", "exit"])
    monkeypatch.setattr("builtins.input", lambda *a: next(inputs))
    assert cli.main(["chat"]) == 0
    out = capsys.readouterr().out
    assert "Assistant:" in out
    assert "<persona>" in out          # memory command
    assert "rerank:" in out            # stats command


def test_ingest_then_restart_then_chat(tmp_path, fast_agent_factory,
                                       capsys, monkeypatch):
    """Index state must survive a process restart (snapshot + reload)."""
    doc = tmp_path / "doc.md"
    doc.write_text("The MXU is a 128x128 systolic array that multiplies "
                   "matrices in bfloat16.")
    assert cli.main(["ingest", str(doc)]) == 0
    assert "index snapshot" in capsys.readouterr().out
    # "restart": fresh agent via the same factory + data_dir
    inputs = iter(["What is the MXU systolic array?", "exit"])
    monkeypatch.setattr("builtins.input", lambda *a: next(inputs))
    assert cli.main(["chat"]) == 0
    out = capsys.readouterr().out
    assert "systolic" in out.lower()
    assert "128x128" in out
