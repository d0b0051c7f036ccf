"""Cross-encoder retrain with the learned-vocab tokenizer (xl2 set).

Both encoder services load the SAME ``tokenizer.vocab.txt`` from the
checkpoint dir (agent/agent.py:94,130), so swapping in the xl2
biencoder + learned vocab would silently mis-tokenize the bundled
hash-trained cross-encoder. This script completes the xl2 checkpoint
set: same corpus derivation and architecture as the biencoder retrain
(benchmarks/retrain_biencoder_xl.py), pointwise relevance objective
(models/pretrain.train_cross_encoder), warmup+cosine schedule.

Gate printed at the end: held-out pairwise ranking accuracy — a
(span, own chunk) score must beat the same span against a random other
chunk — for the new checkpoint vs the bundled one. The swap decision
uses this plus the biencoder shared-holdout gate.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pairwise_accuracy(svc, held_out, n_queries: int = 200,
                      seed: int = 11) -> float:
    """Fraction of held-out ICT spans scoring own-chunk > random-chunk."""
    import numpy as np
    from optimized_rag_tpu.models.pretrain import ICTSampler
    sampler = ICTSampler(held_out, min_span=3, max_span=8)
    rng = np.random.default_rng(seed)
    q, d, picks = sampler.sample(rng, n_queries)
    neg_idx = rng.integers(0, len(held_out), n_queries)
    neg_idx = np.where(neg_idx == picks, (neg_idx + 1) % len(held_out),
                       neg_idx)
    wins = 0
    for qq, dd, nj in zip(q, d, neg_idx):
        pos, neg = svc.score_pairs(qq, [dd, held_out[int(nj)]])
        wins += int(pos > neg)
    return wins / n_queries


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--peak-lr", type=float, default=3e-4)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "checkpoints",
                                         "pretrained_xl2"))
    args = ap.parse_args()

    import jax
    import numpy as np
    import optax

    from benchmarks.train_pretrained import real_chunks
    from optimized_rag_tpu.models import pretrain
    from optimized_rag_tpu.models.corpus import harvest_all
    from optimized_rag_tpu.models.encoder import (
        CrossEncoderService, TransformerConfig)
    from optimized_rag_tpu.parallel.mesh import make_mesh

    print(f"backend={jax.default_backend()}", flush=True)
    mesh = make_mesh(data=len(jax.devices()), model=1)

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
    tok = pretrain.load_tokenizer(args.out, cfg.vocab_size, 96)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=args.peak_lr / 30, peak_value=args.peak_lr,
        warmup_steps=200, decay_steps=args.steps, end_value=1e-5)

    t0 = time.time()
    params, loss = pretrain.train_cross_encoder(
        texts, cfg, mesh, steps=args.steps, batch=args.batch,
        learning_rate=schedule, log=lambda m: print(m, flush=True),
        tok=tok)
    print(f"final loss {loss:.4f} ({time.time() - t0:.0f}s)", flush=True)
    pretrain.save_pretrained(args.out, "crossencoder", params, cfg,
                             store_dtype=np.float16)

    svc_new = CrossEncoderService(
        cfg, params=params, max_len=96,
        tokenizer=pretrain.load_tokenizer(args.out, cfg.vocab_size, 96))
    acc_new = pairwise_accuracy(svc_new, held_out)
    print(f"xl2 cross-encoder holdout pairwise accuracy = {acc_new:.3f}",
          flush=True)

    bundled_dir = os.path.join(REPO, "checkpoints", "pretrained")
    loaded = pretrain.load_pretrained(bundled_dir, "crossencoder")
    if loaded is not None:
        bcfg, bparams = loaded
        svc_old = CrossEncoderService(
            bcfg, params=bparams, max_len=96,
            tokenizer=pretrain.load_tokenizer(bundled_dir,
                                              bcfg.vocab_size, 96))
        acc_old = pairwise_accuracy(svc_old, held_out)
        print(f"bundled cross-encoder holdout pairwise accuracy = "
              f"{acc_old:.3f}", flush=True)


if __name__ == "__main__":
    main()
