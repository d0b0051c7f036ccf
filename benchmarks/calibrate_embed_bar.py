"""Calibrate the embedding rescue channel's refusal bar (VERDICT r4 #3).

The channel (agent/llm.DeterministicLLM._embed_extract) refuses when the
best sentence's cosine against the query is below
``verification.extractive_embed_min_sim``. The bar must be calibrated on
data that is NOT the cross-lingual sections it unlocks: this script uses
the EN holdout probes (eval/holdout_probes.py — answerable + off-topic
questions over the fixture corpus, authored after the lexical bars were
frozen) and reports the cosine distributions both for the EN questions
and for their SCRIPTED pt/es/fr/de renderings (models/xlingual — the
training distribution, not the hand-written QA sections).

Prints per-group max-cosine stats and a suggested bar = midpoint between
the off-topic p90 and the answerable p10 (clamped to [0.3, 0.8]).

Run (chip): python benchmarks/calibrate_embed_bar.py [--json F]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from optimized_rag_tpu.agent.verification import split_sentences
    from optimized_rag_tpu.eval.holdout_probes import HOLDOUT_SHEET
    from optimized_rag_tpu.eval.qa_sheet import QA_DOCS_DIR
    from optimized_rag_tpu.models import pretrain
    from optimized_rag_tpu.models.encoder import EmbeddingService
    from optimized_rag_tpu.models.xlingual import LANGS, translate_en

    ck = os.path.join(REPO, "checkpoints", "pretrained")
    cfg, params = pretrain.load_pretrained(ck, "biencoder")
    svc = EmbeddingService(cfg, params=params, max_len=64, cache_size=0,
                           tokenizer=pretrain.load_tokenizer(
                               ck, cfg.vocab_size, 64))

    sents = []
    for fn in sorted(os.listdir(QA_DOCS_DIR)):
        with open(os.path.join(QA_DOCS_DIR, fn)) as f:
            sents += [s for s in split_sentences(f.read())
                      if len(s.split()) >= 4]
    print(f"{len(sents)} fixture sentences", file=sys.stderr)
    sv = np.asarray(svc.encode(sents))

    groups: dict = {}
    for item in HOLDOUT_SHEET:
        key = "offtopic" if item.unanswerable else "answerable"
        variants = [("en", item.question)] + [
            (lang, translate_en(item.question, lang)) for lang in LANGS]
        for lang, q in variants:
            qv = np.asarray(svc.encode([q]))[0]
            best = float(np.max(sv @ qv))
            groups.setdefault(f"{key}_{lang}", []).append(best)

    out = {}
    for k, v in sorted(groups.items()):
        a = np.asarray(v)
        out[k] = {"n": len(v), "p10": round(float(np.percentile(a, 10)), 4),
                  "p50": round(float(np.percentile(a, 50)), 4),
                  "p90": round(float(np.percentile(a, 90)), 4)}
    # suggested bar from the cross-lingual groups (the channel only
    # fires for non-EN queries)
    ans = np.asarray(sum((groups[f"answerable_{l}"] for l in LANGS), []))
    off = np.asarray(sum((groups[f"offtopic_{l}"] for l in LANGS), []))
    bar = float(np.clip((np.percentile(off, 90) + np.percentile(ans, 10))
                        / 2.0, 0.3, 0.8))
    out["suggested_bar"] = round(bar, 3)
    out["separation"] = round(float(np.percentile(ans, 10)
                                    - np.percentile(off, 90)), 4)
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
