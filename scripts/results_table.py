"""Regenerate RESULTS_synthetic.md from RESULTS_synthetic.json
(the incremental output of scripts/run_all_models.py).

Run: python scripts/results_table.py [--json RESULTS_synthetic.json]
"""

from __future__ import annotations

import argparse
import json

HEADER = """# RESULTS (synthetic) — the full zoo (16 + AutoInt + FLEN) end-to-end on one TPU v5e chip

`python scripts/run_all_models.py --rows 200000 --epochs 2` — synthetic
WeChat-shaped data (real CSVs are not distributed; see docs/REPRODUCING.md
for real-data parity targets). AUC here is a learning-sanity value, not a
reference-parity claim; throughput is steady-state device-resident training.
Regenerate this file with `python scripts/results_table.py`.

| model | eval AUC | train examples/s |
|---|---|---|
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="RESULTS_synthetic.json")
    ap.add_argument("--out", default="RESULTS_synthetic.md")
    args = ap.parse_args()

    with open(args.json) as f:
        results = json.load(f)

    lines = [HEADER]
    multi = {}
    errors = {}
    for name in sorted(results):
        r = results[name]
        if "error" in r:
            errors[name] = r["error"]
            continue
        lines.append(
            f"| {name} | {r['eval_auc']:.4f} | "
            f"{r['train_examples_per_s_best']:,.0f} |\n"
        )
        if len(r.get("task_aucs", {})) > 1:
            multi[name] = r["task_aucs"]
    if multi:
        lines.append(f"\nMulti-task AUCs: {json.dumps(multi, sort_keys=True)}\n")
    if errors:
        lines.append(f"\nFAILED: {json.dumps(errors, sort_keys=True)}\n")
    with open(args.out, "w") as f:
        f.writelines(lines)
    print(f"wrote {args.out}: {len(results) - len(errors)} models"
          + (f", {len(errors)} FAILED" if errors else ""))


if __name__ == "__main__":
    main()
