"""Head-to-head encoder comparison on ONE shared ICT holdout.

The per-round training logs report ICT-holdout recall against each
run's own holdout, which drifts with the harvest. This script derives
the round-3 xl holdout exactly as train_pretrained.py --profile xl does
(prose chunks of harvest_all, same seed/env determinism) and evaluates
every given checkpoint on it, so cross-round encoder claims rest on one
fixed instrument.

    python benchmarks/compare_encoders.py checkpoints/pretrained \
        checkpoints/pretrained_xl
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ckpts = sys.argv[1:] or [os.path.join(REPO, "checkpoints", "pretrained")]
    from benchmarks.train_pretrained import ict_holdout_recall
    from optimized_rag_tpu.models import pretrain
    from optimized_rag_tpu.models.corpus import harvest_all
    from optimized_rag_tpu.models.encoder import EmbeddingService

    big = harvest_all(max_chunks=100000, extra_dirs=[REPO])
    prose = [t for t in big if "def " not in t and "self." not in t]
    held_out = prose[:300]
    print(f"holdout: {len(held_out)} prose chunks "
          f"(of {len(big)} harvested)", flush=True)

    for ck in ckpts:
        loaded = pretrain.load_pretrained(ck, "biencoder")
        if loaded is None:
            print(f"{ck}: no biencoder checkpoint", flush=True)
            continue
        cfg, params = loaded
        svc = EmbeddingService(
            cfg, params=params, max_len=64,
            tokenizer=pretrain.load_tokenizer(ck, cfg.vocab_size, 64))
        r = ict_holdout_recall(svc, held_out)
        print(f"{ck}: ICT-holdout recall@10 = {r:.3f}", flush=True)


if __name__ == "__main__":
    main()
