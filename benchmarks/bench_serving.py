"""Serving-path benchmark: concurrent callers through the micro-batching
QueryServer (serving.py) against the trained encoder + DenseIndex.

The reference's serving story is a single-user REPL where one query takes
minutes (SURVEY.md §6); this measures the multi-tenant path a production
deployment actually runs: N threads submit queries concurrently, the
dispatcher coalesces them into batched embed + fused top-k dispatches.

Usage:  python benchmarks/bench_serving.py [--docs 20000] [--clients 64]
Prints per-configuration latency/throughput lines, then one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--queries-per-client", type=int, default=20)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--workers", type=int, default=2,
                    help="dispatcher threads (2 = depth-2 pipeline)")
    ap.add_argument("--chat-turns", type=int, default=0,
                    help="also measure N full chat turns serial vs "
                         "concurrent (0 = skip)")
    args = ap.parse_args()

    import jax
    from optimized_rag_tpu.index.dense import DenseIndex
    from optimized_rag_tpu.models import pretrain
    from optimized_rag_tpu.models.encoder import EmbeddingService
    from optimized_rag_tpu.serving import QueryServer
    from optimized_rag_tpu.models.corpus import harvest_docstrings

    log(f"backend={jax.default_backend()}")
    loaded = pretrain.load_pretrained(
        os.path.join(REPO, "checkpoints", "pretrained"), "biencoder")
    if loaded is None:
        sys.exit("no bundled checkpoint under checkpoints/pretrained — "
                 "train one with: python -m optimized_rag_tpu train")
    cfg, params = loaded
    svc = EmbeddingService(
        cfg, params=params, max_len=64, cache_size=0,
        tokenizer=pretrain.load_tokenizer(
            os.path.join(REPO, "checkpoints", "pretrained"),
            cfg.vocab_size, 64))

    texts = harvest_docstrings(max_chunks=args.docs)
    if len(texts) < args.docs:
        texts = (texts * (args.docs // max(len(texts), 1) + 1))[:args.docs]
    log(f"corpus: {len(texts)} real-text chunks")

    idx = DenseIndex(dim=svc.dim, capacity_block=1 << 15, tile=1024)
    t0 = time.perf_counter()
    bs = 512
    for i in range(0, len(texts), bs):
        idx.add(svc.encode(texts[i:i + bs]))
    log(f"indexed in {time.perf_counter() - t0:.0f}s")

    # Queries: spans drawn from the corpus (ICT-style, so top-1 should
    # usually be the source chunk — sanity, not the metric here).
    rng = np.random.default_rng(7)
    from optimized_rag_tpu.models.pretrain import ICTSampler
    sampler = ICTSampler(texts, min_span=3, max_span=8)
    queries, _, _ = sampler.sample(rng, args.clients *
                                   args.queries_per_client)

    # Warm every pow2 bucket the dispatcher can hit — encode AND search:
    # each distinct (bucketed) batch size is its own XLA program.
    b = 1
    while True:
        idx.search(svc.encode([f"warm {i}" for i in range(b)]), k=10)
        if b >= args.max_batch:
            break
        b *= 2

    server = QueryServer(svc.encode, idx, max_batch=args.max_batch,
                         max_wait_ms=args.max_wait_ms,
                         workers=args.workers)
    server.start()
    # Throwaway storm: exercises the collector/dispatch path end to end
    # (thread scheduling, future plumbing) before the measured one.
    futs = [server.submit(q) for q in queries[:4 * args.max_batch]]
    for f in futs:
        f.result(timeout=600)

    lat_ms = []
    lat_lock = threading.Lock()

    def client(cid: int):
        mine = queries[cid * args.queries_per_client:
                       (cid + 1) * args.queries_per_client]
        for q in mine:
            t0 = time.perf_counter()
            server.search(q, k=10, timeout=120)
            dt = (time.perf_counter() - t0) * 1e3
            with lat_lock:
                lat_ms.append(dt)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    server.stop()

    lat = np.sort(np.asarray(lat_ms))
    n = len(lat)
    qps = n / wall
    stats = server.get_stats()
    log(f"{args.clients} clients x {args.queries_per_client} queries: "
        f"{wall:.1f}s wall -> {qps:.0f} qps end-to-end "
        f"(encode+search, avg batch {stats['avg_batch']:.1f})")
    log(f"latency p50={lat[n // 2]:.0f} ms p90={lat[int(n * .9)]:.0f} ms "
        f"p99={lat[int(n * .99)]:.0f} ms")

    # ---- concurrent full chat turns (VERDICT r2 weak #6): N threads run
    # agent.chat simultaneously; the per-turn claim-verification embedding
    # dispatch coalesces through the shared EmbedBatcher.
    chat = {}
    if args.chat_turns:
        from optimized_rag_tpu.agent.agent import RAGAgent
        from optimized_rag_tpu.config import Settings
        import tempfile
        for concurrent in (False, True):
            s = Settings()
            s.data_dir = tempfile.mkdtemp(prefix="bench_chat_")
            s.serving.concurrent_chat = concurrent
            s.flags.enable_kg = False
            agent = RAGAgent(s, embed_service=svc)
            for t in texts[:600]:
                agent.ingestor.ingest_text(t, "bench.txt")
            agent.warmup(deep=True)
            agent.chat("warm turn about embeddings")  # end-to-end warm
            n_threads = 8 if concurrent else 1
            turns = args.chat_turns
            qs = queries[:turns]
            done = []

            def chat_worker(i):
                resp = agent.chat(qs[i % len(qs)])
                done.append(resp)

            t0 = time.perf_counter()
            if concurrent:
                ths = [threading.Thread(target=chat_worker, args=(i,))
                       for i in range(turns)]
                sem = threading.Semaphore(n_threads)

                def gated(i):
                    with sem:
                        chat_worker(i)
                ths = [threading.Thread(target=gated, args=(i,))
                       for i in range(turns)]
                for t in ths:
                    t.start()
                for t in ths:
                    t.join()
            else:
                for i in range(turns):
                    chat_worker(i)
            wall_c = time.perf_counter() - t0
            key = "concurrent" if concurrent else "serial"
            chat[f"chat_qps_{key}"] = round(turns / wall_c, 2)
            if concurrent and agent.embed_batcher is not None:
                st = agent.embed_batcher.stats
                chat["embed_coalesce_ratio"] = round(
                    st["requests"] / max(st["dispatches"], 1), 2)
                agent.embed_batcher.stop()
            log(f"chat {key}: {turns} turns in {wall_c:.1f}s -> "
                f"{turns / wall_c:.2f} turns/s {chat}")

    print(json.dumps({
        "metric": f"serving_qps_{len(texts)}docs_{args.clients}clients",
        "value": round(qps, 1),
        "unit": "qps/chip",
        "p50_ms": round(float(lat[n // 2]), 1),
        "p90_ms": round(float(lat[int(n * .9)]), 1),
        "p99_ms": round(float(lat[int(n * .99)]), 1),
        "avg_batch": round(stats["avg_batch"], 1),
        "workers": args.workers,
        "backend": jax.default_backend(),
        **chat,
    }))


if __name__ == "__main__":
    main()
