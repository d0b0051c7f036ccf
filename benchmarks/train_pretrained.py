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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
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
    texts = pretrain.default_corpus(real)
    print(f"corpus: {len(texts)} chunks ({len(real)} real)", flush=True)

    enc_cfg = TransformerConfig(vocab_size=16384, hidden_dim=256,
                                num_layers=4, num_heads=8, mlp_dim=1024,
                                max_seq_len=128, out_dim=256)
    dec_cfg = DecoderConfig(hidden_dim=256, num_layers=4, num_heads=4,
                            mlp_dim=1024, max_seq_len=1024)
    t0 = time.time()
    losses = pretrain.pretrain_all(
        args.out, texts, encoder_cfg=enc_cfg, cross_cfg=enc_cfg,
        decoder_cfg=dec_cfg, mesh=mesh, steps=args.steps, batch=128,
        store_dtype=np.float16, decoder_texts=real,
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

    r_trained = recall(EmbeddingService(cfg_t, params=params_t, max_len=64))
    r_random = recall(EmbeddingService(enc_cfg, max_len=64, seed=7))
    print(f"recall@10 trained={r_trained:.3f} random={r_random:.3f}",
          flush=True)
    assert r_trained > r_random, "trained encoder must win"

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
