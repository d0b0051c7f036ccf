"""Biencoder-only xl retrain: more epochs + LR decay + bigger batch.

The round-4 xl chain (train_pretrained --profile xl) trained all three
models at 2500 steps x batch 128 with a flat 3e-4 AdamW — on the 78k
chunk corpus that is ~4 epochs, the loss curve was still falling, and
the shared-holdout gate came back 0.755 vs the bundled 0.770. This
script retrains ONLY the biencoder (the cross-encoder/decoder from the
xl run are kept) with the three levers the flat run left on the table:

  * steps: 8000 (~26 epochs of the prose+code corpus)
  * batch: 256 (in-batch negatives double -> stronger InfoNCE signal)
  * LR: 300-step warmup to 3e-4, cosine decay to 1e-5 (the flat run's
    end-of-run loss noise, 1.42 <-> 1.70, is the classic too-hot tail)

Corpus, holdout split, tokenizer and architecture are IDENTICAL to the
xl profile (benchmarks/train_pretrained.py:83-102) so the shared
holdout instrument (benchmarks/compare_encoders.py) stays comparable.
Writes into --out (default a sibling dir, NOT over pretrained_xl) and
prints the same ICT-holdout number the gate uses.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--peak-lr", type=float, default=3e-4)
    ap.add_argument("--tok-from",
                    default=os.path.join(REPO, "checkpoints",
                                         "pretrained_xl"))
    ap.add_argument("--out",
                    default=os.path.join(REPO, "checkpoints",
                                         "pretrained_xl2"))
    args = ap.parse_args()

    import jax
    import numpy as np
    import optax

    from benchmarks.train_pretrained import ict_holdout_recall, real_chunks
    from optimized_rag_tpu.models import pretrain
    from optimized_rag_tpu.models.corpus import harvest_all
    from optimized_rag_tpu.models.encoder import (
        EmbeddingService, TransformerConfig)
    from optimized_rag_tpu.parallel.mesh import make_mesh

    print(f"backend={jax.default_backend()}", flush=True)
    mesh = make_mesh(data=len(jax.devices()), model=1)

    # Corpus + holdout exactly as the xl profile derives them.
    big = harvest_all(max_chunks=100000, extra_dirs=[REPO])
    prose = [t for t in big if "def " not in t and "self." not in t]
    held_out, held_set = prose[:300], set(prose[:300])
    train_texts = [t for t in big if t not in held_set]
    texts = pretrain.default_corpus(real_chunks() + train_texts)
    print(f"corpus: {len(texts)} chunks, holdout {len(held_out)}",
          flush=True)

    cfg = TransformerConfig(vocab_size=32768, hidden_dim=384,
                            num_layers=6, num_heads=12, mlp_dim=1536,
                            max_seq_len=128, out_dim=384)
    tok = pretrain.load_tokenizer(args.tok_from, cfg.vocab_size, 64)

    schedule = optax.warmup_cosine_decay_schedule(
        init_value=args.peak_lr / 30, peak_value=args.peak_lr,
        warmup_steps=300, decay_steps=args.steps, end_value=1e-5)
    t0 = time.time()
    os.makedirs(args.out, exist_ok=True)
    params, loss = pretrain.train_biencoder(
        texts, cfg, mesh, steps=args.steps, batch=args.batch,
        learning_rate=schedule, log=lambda m: print(m, flush=True),
        tok=tok, snapshot_dir=args.out)
    print(f"final loss {loss:.4f} ({time.time() - t0:.0f}s)", flush=True)

    os.makedirs(args.out, exist_ok=True)
    pretrain.save_pretrained(args.out, "biencoder", params, cfg,
                             store_dtype=np.float16)
    # the inference-side loader needs the matching vocab beside the weights
    src = os.path.join(args.tok_from, "tokenizer.vocab.txt")
    dst = os.path.join(args.out, "tokenizer.vocab.txt")
    if os.path.exists(src) and not os.path.exists(dst):
        import shutil
        shutil.copyfile(src, dst)

    svc = EmbeddingService(cfg, params=params, max_len=64,
                           tokenizer=pretrain.load_tokenizer(
                               args.out, cfg.vocab_size, 64))
    r = ict_holdout_recall(svc, held_out)
    print(f"ICT-holdout recall@10 = {r:.3f}", flush=True)


if __name__ == "__main__":
    main()
