"""CLI: chat REPL + ingest + info commands.

Reproduces the reference's entry points (main.py:14-85 interactive REPL
with the `memory` command; upload_rag_docs.py:14 batch ingestion;
setup_db.py:17 bootstrap — which here is just creating the data dir, since
there is no database server to provision).

  python -m optimized_rag_tpu chat
  python -m optimized_rag_tpu ingest <path> [path ...]
  python -m optimized_rag_tpu info
"""

from __future__ import annotations

import argparse
import os
import sys

from optimized_rag_tpu.config import Settings
from optimized_rag_tpu.utils.logging_config import setup_logging


def build_agent(settings: Settings, offline: bool = True):
    from optimized_rag_tpu.agent.agent import RAGAgent
    from optimized_rag_tpu.agent.llm import (
        DeterministicLLM, OpenAICompatibleLLM)
    from optimized_rag_tpu.store.db import MetadataStore

    llm = None
    api_base = os.environ.get("ORAG_LLM_API_BASE")
    if api_base and not offline:
        llm = OpenAICompatibleLLM(
            api_base, model=os.environ.get("ORAG_LLM_MODEL", "gpt-4o-mini"),
            api_key=os.environ.get("ORAG_LLM_API_KEY", ""))
    if llm is None:
        llm = DeterministicLLM()
    store = MetadataStore(os.path.join(settings.data_dir, "metadata.db"))
    agent = RAGAgent(settings, llm=llm, store=store)
    agent.load_indexes()  # restore device-side indexes if snapshotted
    return agent


def cmd_chat(args) -> int:
    settings = Settings.from_env()
    agent = build_agent(settings, offline=not args.online)
    print("optimized_rag_tpu chat — commands: 'memory', 'stats', 'exit'")
    while True:
        try:
            user = input("\nYou: ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if not user:
            continue
        if user.lower() in ("exit", "quit"):
            return 0
        if user.lower() == "memory":  # reference main.py:45-60
            print(agent.memory.format_core_memory())
            continue
        if user.lower() == "stats":
            if agent.hierarchical:
                print("tiers:", agent.hierarchical.get_statistics())
            if agent.cost_tracker:
                print("cost:", agent.cost_tracker.get_summary())
            print("rerank:", agent.reranker.stats)
            continue
        resp = agent.chat(user)
        print(f"\nAssistant: {resp.answer}")
        print(f"  [factuality={resp.factuality_score:.2f}"
              f" support={resp.support_ratio:.2f}"
              f" confidence={resp.confidence:.2f}"
              f" tiers={resp.tiers_used}"
              f" {resp.metrics['latency_s']:.2f}s]")
        if resp.warnings:
            print(f"  warnings: {'; '.join(resp.warnings)}")


def cmd_ingest(args) -> int:
    settings = Settings.from_env()
    agent = build_agent(settings)
    total_chunks = 0
    for path in args.paths:
        if os.path.isdir(path):
            results = agent.ingestor.upload_directory(path)
        else:
            results = [agent.ingestor.upload_file(path)]
        for r in results:
            if r.get("ok"):
                total_chunks += r["chunks"]
                print(f"ok  {r.get('document_id')}: {r['chunks']} chunks, "
                      f"{r['kg_triples']} triples, {r['seconds']:.2f}s")
            else:
                print(f"ERR {r.get('path', '')}: {r.get('error')}")
    path = agent.save_indexes()
    print(f"total: {total_chunks} chunks; corpus size {agent.dense.size}; "
          f"index snapshot -> {path}")
    return 0


def cmd_info(args) -> int:
    import jax
    from optimized_rag_tpu.utils.health import check_device_health
    settings = Settings.from_env()
    print(f"backend: {jax.default_backend()}")
    print(f"devices: {jax.devices()}")
    print(f"data_dir: {settings.data_dir}")
    print(f"encoder: dim={settings.encoder.dim} "
          f"layers={settings.encoder.num_layers}")
    print(f"health: {check_device_health(timeout_s=90)}")
    return 0


def main(argv=None) -> int:
    setup_logging(os.environ.get("ORAG_LOG_LEVEL", "WARNING"))
    p = argparse.ArgumentParser(prog="optimized_rag_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    pc = sub.add_parser("chat", help="interactive chat REPL")
    pc.add_argument("--online", action="store_true",
                    help="use ORAG_LLM_API_BASE for generation")
    pc.set_defaults(fn=cmd_chat)
    pi = sub.add_parser("ingest", help="ingest files or directories")
    pi.add_argument("paths", nargs="+")
    pi.set_defaults(fn=cmd_ingest)
    pn = sub.add_parser("info", help="environment info")
    pn.set_defaults(fn=cmd_info)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
