"""Round-5: train the grounded pointer-generator (VERDICT r4 next #1).

Trains models/grounded.py on grounded-QA rows synthesized from the
docstring-harvest corpus (models/grounded_data.py). The QA-sheet
fixture docs (eval/qa_docs) and the reference PDFs are EXCLUDED from
training, so ``python -m optimized_rag_tpu.eval.qa_sheet --local-lm``
stays a held-out instrument: different documents, different questions.

Self-eval after training (synthesized holdout prompts the sampler never
trained on — fresh chunks): answer-core substring match + citation
accuracy + refusal behavior. The real gate is the QA sheet, run
separately.

Run (chip):  python benchmarks/train_grounded_r5.py --steps 12000
Resume after an outage: same command, same --out (snapshot protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def holdout_eval(gen, holdout_texts, n=60, seed=11):
    """Grounded self-eval on UNSEEN chunks: synthesize eval rows with the
    same generator-free pipeline and grade the model's decoded output."""
    import numpy as np
    from optimized_rag_tpu.models.grounded import REFUSAL
    from optimized_rag_tpu.models.grounded_data import GroundedSampler
    rng = np.random.default_rng(seed)
    sampler = GroundedSampler(holdout_texts, prompt_len=gen.max_prompt_len,
                              target_len=gen.max_new_tokens,
                              refusal_frac=0.25)
    rows = []
    prompts, metas = [], []
    while len(prompts) < n:
        prompt, answer, _core = sampler.sample(rng)
        prompts.append(prompt)
        metas.append(answer)
    bs = 12
    outs = []
    for i in range(0, n, bs):
        outs.extend(gen.generate_batch(prompts[i:i + bs]))
    ok_ans = ok_cit = ok_ref = n_ref = n_ans = 0
    for out, want in zip(outs, metas):
        if want == REFUSAL:
            n_ref += 1
            if "don't have enough information" in out:
                ok_ref += 1
            continue
        n_ans += 1
        core = re.sub(r"\s*\[\d+\]", "", want).strip().rstrip(".")
        # grade on a distinctive fragment of the gold sentence: the
        # middle half (the transforms may rotate clause order)
        frag = core[len(core) // 4: max(len(core) // 4 + 40,
                                        len(core) // 2)]
        hit = frag.lower() in out.lower()
        want_cits = set(re.findall(r"\[(\d+)\]", want))
        got_cits = set(re.findall(r"\[(\d+)\]", out))
        ok_ans += hit
        ok_cit += bool(want_cits and want_cits == got_cits)
        rows.append({"want": want[:120], "got": out[:120], "hit": hit})
    return {"n_answerable": n_ans, "answer_frag_acc": ok_ans / max(n_ans, 1),
            "citation_acc": ok_cit / max(n_ans, 1),
            "n_refusal": n_ref,
            "refusal_acc": ok_ref / max(n_ref, 1),
            "examples": rows[:8]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--peak-lr", type=float, default=3e-4)
    ap.add_argument("--prompt-len", type=int, default=1792)
    ap.add_argument("--target-len", type=int, default=384)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "checkpoints", "grounded_r5"))
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import optax

    from optimized_rag_tpu.models import pretrain
    from optimized_rag_tpu.models.corpus import harvest_all
    from optimized_rag_tpu.models.grounded import (
        GroundedConfig, GroundedGenerator)
    from optimized_rag_tpu.parallel.mesh import make_mesh

    print(f"backend={jax.default_backend()}", flush=True)
    mesh = make_mesh(data=len(jax.devices()), model=1)

    # Prose-only harvest (generation targets should read as sentences);
    # fixture/eval docs are NOT in the harvest dirs.
    big = harvest_all(max_chunks=100000, extra_dirs=[REPO])
    prose = [t for t in big if "def " not in t and "self." not in t
             and ">>>" not in t]
    held_out = prose[:400]
    held_set = set(held_out)
    train_texts = [t for t in prose if t not in held_set]
    print(f"corpus: {len(train_texts)} prose chunks, "
          f"holdout {len(held_out)}", flush=True)

    cfg = GroundedConfig(hidden_dim=384, num_layers=6, num_heads=6,
                         mlp_dim=1536, copy_dim=128,
                         max_seq_len=args.prompt_len + args.target_len,
                         prompt_len=args.prompt_len,
                         target_len=args.target_len)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=args.peak_lr / 30, peak_value=args.peak_lr,
        warmup_steps=min(300, max(args.steps // 4, 1)),
        decay_steps=args.steps, end_value=1e-5)

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    params, nll = pretrain.train_grounded(
        train_texts, cfg, mesh, steps=args.steps, batch=args.batch,
        learning_rate=schedule, prompt_len=args.prompt_len,
        target_len=args.target_len,
        log=lambda m: print(m, flush=True),
        snapshot_dir=args.out, snapshot_every=1000)
    print(f"trained in {time.time() - t0:.0f}s, final nll={nll:.4f}",
          flush=True)
    pretrain.save_pretrained(args.out, "grounded", params, cfg)

    gen = GroundedGenerator(cfg, params=jax.device_get(params),
                            max_prompt_len=args.prompt_len,
                            max_new_tokens=args.target_len)
    result = holdout_eval(gen, held_out)
    result["final_nll"] = nll
    result["steps"] = args.steps
    print(json.dumps({k: v for k, v in result.items()
                      if k != "examples"}, indent=2), flush=True)
    for ex in result["examples"]:
        print(" ", ex, flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
