"""No-translation cross-lingual QA sections only (VERDICT r4 next #3).

Runs ONLY what the acceptance criterion needs — the four pt/es/fr/de
sections with ``enable_translation=0`` (retrieval embeds the raw non-EN
query; the extractive generator's embedding rescue channel selects the
EN answer sentence in the same encoder space) — plus an EN spot-check
section to catch encoder-swap regressions. A fraction of the full
``qa_sheet --no-translation-xl`` run's chip time: the loopback-provider
cross-lingual sections and the PDF sections are skipped.

Run (chip):  python benchmarks/qa_nt_only.py [--json F] [--en-spot N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--en-spot", type=int, default=12,
                    help="first N EN sheet items as a swap-regression "
                         "spot check (0 = skip)")
    args = ap.parse_args()

    from optimized_rag_tpu.config import Settings
    from optimized_rag_tpu.eval.qa_sheet import (
        DE_SHEET, ES_SHEET, FR_SHEET, PT_SHEET, QA_SHEET, build_agent,
        run_sheet)

    nt_settings = Settings.from_env({"ORAG_FLAGS_ENABLE_TRANSLATION": "0"})
    nt_settings.data_dir = tempfile.mkdtemp(prefix="qa_nt_")
    agent = build_agent(settings=nt_settings)

    summary: dict = {}
    rows = []
    for tag, sheet in [("pt", PT_SHEET), ("es", ES_SHEET),
                       ("fr", FR_SHEET), ("de", DE_SHEET)]:
        print(f"{tag}-* section (translation DISABLED):", file=sys.stderr)
        res = run_sheet(agent, sheet=sheet)
        rows += [dict(r, id=f"nt-{r['id']}") for r in res["rows"]]
        ans = [r for r in res["rows"] if not r["unanswerable"]]
        probes = [r for r in res["rows"] if r["unanswerable"]]
        summary[f"{tag}_accuracy_notranslation"] = (
            sum(r["correct"] for r in ans) / max(len(ans), 1))
        summary[f"{tag}_probes_refused_notranslation"] = (
            sum(r["correct"] for r in probes) / max(len(probes), 1))
        summary[f"{tag}_n"] = len(res["rows"])

    if args.en_spot:
        print(f"EN spot check (first {args.en_spot}):", file=sys.stderr)
        res = run_sheet(agent, sheet=list(QA_SHEET)[:args.en_spot])
        rows += res["rows"]
        summary["en_spot_accuracy"] = (
            sum(r["correct"] for r in res["rows"]) / len(res["rows"]))
        summary["en_spot_n"] = len(res["rows"])

    out = {"summary": summary, "rows": rows}
    print(json.dumps(summary, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
