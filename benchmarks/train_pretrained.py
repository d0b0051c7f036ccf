"""Produce the repo's bundled pretrained checkpoints (checkpoints/pretrained).

Trains on the synthetic topic corpus (gives the synthetic eval its
known-relevance structure) plus real English chunks from the repo docs;
the decoder LM trains on the real text only. Run on the TPU:

    python -u benchmarks/train_pretrained.py [--steps N] [--out DIR]

Reports trained-vs-random-init recall@10 on a held-out synthetic dataset
(the VERDICT r1 #3 acceptance gate: trained must win) and a decoder
sample.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def real_chunks() -> list:
    from optimized_rag_tpu.engine.chunking import RecursiveChunker
    chunker = RecursiveChunker(chunk_size=800, overlap=100)
    texts = []
    for path in (glob.glob(os.path.join(REPO, "docs", "*.md"))
                 + [os.path.join(REPO, "README.md")]):
        with open(path, encoding="utf-8") as f:
            texts.extend(c["content"] for c in chunker.chunk(f.read()))
    return texts


def ict_holdout_recall(service, held_out: list, k: int = 10,
                       n_queries: int = 200, seed: int = 5) -> float:
    """Real-text retrieval quality: ICT spans from held-out chunks must
    retrieve their source chunk. Measures generalization beyond the
    synthetic topic structure."""
    from optimized_rag_tpu.index.dense import DenseIndex
    from optimized_rag_tpu.models.pretrain import ICTSampler
    idx = DenseIndex(dim=service.dim, capacity_block=1024, tile=256)
    idx.add(service.encode(held_out))
    sampler = ICTSampler(held_out, min_span=3, max_span=8)
    rng = np.random.default_rng(seed)
    q, _, picks = sampler.sample(rng, n_queries)
    hits = 0
    ids = idx.search(service.encode(q), k).ids
    for row, want in zip(ids, picks):
        hits += int(want in row.tolist())
    return hits / n_queries


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=0,
                    help="0 = profile default")
    ap.add_argument("--profile", choices=("small", "large", "xl"),
                    default="small")
    ap.add_argument("--out", default=os.path.join(REPO, "checkpoints",
                                                  "pretrained"))
    args = ap.parse_args()

    import jax
    from optimized_rag_tpu.eval.synthetic import (
        evaluate_retriever, make_dataset)
    from optimized_rag_tpu.index.dense import DenseIndex
    from optimized_rag_tpu.models import pretrain
    from optimized_rag_tpu.models.decoder import DecoderConfig, Generator
    from optimized_rag_tpu.models.encoder import (
        EmbeddingService, TransformerConfig)
    from optimized_rag_tpu.parallel.mesh import make_mesh

    print(f"backend={jax.default_backend()}", flush=True)
    mesh = make_mesh(data=len(jax.devices()), model=1)
    real = real_chunks()
    if args.profile == "xl":
        # Round-3 (VERDICT r2 #5): 5-8x corpus — docstring prose +
        # function source + markdown (models/corpus.harvest_all) — and a
        # learned top-word vocabulary replacing FNV-mod hashing for the
        # frequent vocabulary. Same 6L/384 architecture (r2 measured the
        # CORPUS, not capacity or steps, as the binding constraint).
        from optimized_rag_tpu.models.corpus import harvest_all
        big = harvest_all(max_chunks=100000, extra_dirs=[REPO])
        # hold out PROSE chunks (comparable to the r2 0.565 number):
        # harvest_all shuffles, so filter non-code-looking chunks.
        prose = [t for t in big if "def " not in t and "self." not in t]
        held_out, held_set = prose[:300], set(prose[:300])
        train_texts = [t for t in big if t not in held_set]
        real = real + train_texts
        enc_cfg = TransformerConfig(vocab_size=32768, hidden_dim=384,
                                    num_layers=6, num_heads=12,
                                    mlp_dim=1536, max_seq_len=128,
                                    out_dim=384)
        dec_cfg = DecoderConfig(hidden_dim=256, num_layers=4, num_heads=4,
                                mlp_dim=1024, max_seq_len=1024)
        steps = args.steps or 2500
    elif args.profile == "large":
        # MiniLM-class encoder (6L/384 — the shapes tile the MXU cleanly:
        # 384=3*128, 1536=12*128) on the docstring-harvest corpus.
        from optimized_rag_tpu.models.corpus import harvest_docstrings
        docstrings = harvest_docstrings()
        held_out, docstrings = docstrings[:300], docstrings[300:]
        real = real + docstrings
        enc_cfg = TransformerConfig(vocab_size=32768, hidden_dim=384,
                                    num_layers=6, num_heads=12,
                                    mlp_dim=1536, max_seq_len=128,
                                    out_dim=384)
        dec_cfg = DecoderConfig(hidden_dim=256, num_layers=4, num_heads=4,
                                mlp_dim=1024, max_seq_len=1024)
        steps = args.steps or 2500
    else:
        held_out = []
        enc_cfg = TransformerConfig(vocab_size=16384, hidden_dim=256,
                                    num_layers=4, num_heads=8, mlp_dim=1024,
                                    max_seq_len=128, out_dim=256)
        dec_cfg = DecoderConfig(hidden_dim=256, num_layers=4, num_heads=4,
                                mlp_dim=1024, max_seq_len=1024)
        steps = args.steps or 1200
    texts = pretrain.default_corpus(real)
    print(f"corpus: {len(texts)} chunks ({len(real)} real), "
          f"steps={steps}", flush=True)

    t0 = time.time()
    losses = pretrain.pretrain_all(
        args.out, texts, encoder_cfg=enc_cfg, cross_cfg=enc_cfg,
        decoder_cfg=dec_cfg, mesh=mesh, steps=steps, batch=128,
        store_dtype=np.float16, decoder_texts=real,
        learned_vocab=(args.profile == "xl"),
        log=lambda m: print(m, flush=True))
    print(f"losses: {losses} ({time.time() - t0:.0f}s)", flush=True)

    # Acceptance gate: trained encoder must beat random init on held-out
    # synthetic recall@10.
    ds = make_dataset(num_docs=400, num_topics=20, num_queries=40, seed=99)
    cfg_t, params_t = pretrain.load_pretrained(args.out, "biencoder")

    def recall(service):
        idx = DenseIndex(dim=service.dim, capacity_block=1024, tile=256)
        idx.add(service.encode(ds.texts))

        def retrieve(q, k):
            return idx.search(service.encode([q]), k).ids[0].tolist()
        return evaluate_retriever(retrieve, ds, k=10)["recall@10"]

    svc_t = EmbeddingService(
        cfg_t, params=params_t, max_len=64,
        tokenizer=pretrain.load_tokenizer(args.out, cfg_t.vocab_size, 64))
    r_trained = recall(svc_t)
    r_random = recall(EmbeddingService(enc_cfg, max_len=64, seed=7))
    print(f"recall@10 trained={r_trained:.3f} random={r_random:.3f}",
          flush=True)
    assert r_trained > r_random, "trained encoder must win"
    if held_out:
        ict_t = ict_holdout_recall(svc_t, held_out)
        ict_r = ict_holdout_recall(
            EmbeddingService(enc_cfg, max_len=64, seed=7), held_out)
        print(f"ICT-holdout recall@10 trained={ict_t:.3f} "
              f"random={ict_r:.3f}", flush=True)

    dcfg, dparams = pretrain.load_pretrained(args.out, "decoder")
    gen = Generator(dcfg, params=dparams, max_prompt_len=256,
                    max_new_tokens=64)
    sample = gen.generate("The retrieval engine ", temperature=0.0)
    print(f"decoder sample: {sample!r}", flush=True)
    total = sum(os.path.getsize(os.path.join(args.out, f))
                for f in os.listdir(args.out))
    print(f"checkpoints -> {args.out} ({total / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
