"""Warm agent chat-turn latency: the full 16-node pipeline end-to-end.

Measures what a user of the chat surface actually waits for — intent,
rewrite, hierarchical retrieval, rerank+eval, generation gating, claim
verification, memory update — with the deterministic offline LLM (so LLM
latency is ~0 and the number isolates the framework itself), the bundled
trained encoder/cross-encoder, and the fused-turn dispatches
(ops/fused_query.py, ops/fused_eval.py).

Usage: python benchmarks/bench_turn.py [--docs 200] [--turns 20]
Prints per-node means then one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200)
    ap.add_argument("--turns", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=6)
    args = ap.parse_args()

    import jax
    from optimized_rag_tpu.agent.agent import RAGAgent
    from optimized_rag_tpu.agent.llm import DeterministicLLM
    from optimized_rag_tpu.config import Settings
    from optimized_rag_tpu.eval.synthetic import make_dataset

    log(f"backend={jax.default_backend()}")
    settings = Settings()
    settings.data_dir = tempfile.mkdtemp(prefix="orag_turn_bench_")
    agent = RAGAgent(settings, llm=DeterministicLLM())

    ds = make_dataset(num_docs=args.docs, num_topics=10,
                      num_queries=args.warmup + args.turns, seed=11)
    t0 = time.perf_counter()
    for i in range(0, len(ds.texts), 64):
        agent.ingestor.ingest_text("\n".join(ds.texts[i:i + 64]),
                                   filename=f"doc{i}.txt")
    log(f"ingested {args.docs} docs in {time.perf_counter() - t0:.0f}s")

    queries = ds.queries
    for q in queries[:args.warmup]:
        agent.chat(q)
    agent.timer.reset()                   # drop warmup spans

    times = []
    for q in queries[args.warmup:args.warmup + args.turns]:
        t0 = time.perf_counter()
        resp = agent.chat(q)
        times.append(time.perf_counter() - t0)
        assert resp.answer
    times = np.sort(np.asarray(times))
    p50 = float(times[len(times) // 2])

    for name, st in sorted(agent.timer.stats().items()):
        if st["count"] >= args.turns and "/" not in name:
            log(f"  {name:24s} mean {st['mean_ms']:7.1f} ms")
    log(f"warm turn p50 {p50 * 1e3:.1f} ms  "
        f"(min {times[0] * 1e3:.1f}, max {times[-1] * 1e3:.1f})")
    print(json.dumps({
        "metric": f"agent_warm_turn_p50_{args.docs}docs",
        "value": round(p50 * 1e3, 1),
        "unit": "ms",
        "min_ms": round(float(times[0]) * 1e3, 1),
        "max_ms": round(float(times[-1]) * 1e3, 1),
        "turns": args.turns,
        "fused": agent.settings.flags.enable_fused_turn,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
