"""Regenerate PARITY_RESULTS.md from PARITY_RESULTS.jsonl.

The jsonl is append-only (scripts/parity_check.py --json_out); the LATEST
row per model wins, so re-running a model after a methodology fix
supersedes its old row. Keeps the table and the jsonl from drifting.

Run: python scripts/parity_table.py [--jsonl PARITY_RESULTS.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os

HEADER = """# Quality head-to-heads: rank_tpu (TPU) vs reference-faithful torch (CPU)

Identical synthetic data (200k rows, WeChat schema, seed 0), identical
hyperparameters (each model's reference best-config defaults), Adam lr
0.005, batch 1024, 3 epochs. Torch mirrors live in `bench.py` with
`file:line` reference citations; runner: `scripts/parity_check.py
--model all --json_out ...`. Latest run per model (regenerate this file
with `python scripts/parity_table.py`). Full 18-model zoo covered.

| Model | rank_tpu eval AUC | torch eval AUC | delta | ours train s | torch train s |
|---|---|---|---|---|---|
"""

NOTES = """
Notes:
- every tower-model pair uses the same manual_tag representation on both
  sides (scalar lookup, parity_check SCALAR_TAG_MODELS) and identical
  architectures; remaining deltas are init/framework-numerics noise.
- deepfm/fwfm/ffm/pnn's low absolute AUCs on BOTH sides are the expected
  feature-subset property (categorical-only models; the synthetic signal
  lives mostly in the dense features) — matched by torch, so parity
  holds. Same for afm (no dense tower) and xdeepfm (CIN needs more
  epochs).
- esmm's AUC is the CTR head (read_comment); its CTCVR head AUCs are
  printed by the runner.
- times are wall-clock including compile; the TPU tunnel adds
  100-400 s of compile+transfer per model (docs/REPRODUCING.md §5).
- round 5 completed the seed matrix: every model including bst now
  carries 3 seeds (bst deltas +0.0031/+0.0160/-0.0070, mean +0.0040);
  the calibrated-regime table is PARITY_CALIB_r05.md.
- the four mildly-negative mean rows (afm/deepfm/ffm/pnn) are the
  categorical-only/low-signal models whose AUCs sit at 0.50-0.68 on
  BOTH sides; their sigmas are as large as their deltas.
"""


CALIB_HEADER = """# Calibrated-regime head-to-heads: rank_tpu (TPU) vs torch (CPU)

Same protocol as PARITY_RESULTS.md but on the EDA-calibrated synthetic
log (`rank_tpu/data/calibrated.py`, scale 0.05: 166,115 train / 30,452
eval rows, day-8-13/day-14 split, read_comment rate 3.56%) — the
reference's AUC regime, since round 5 with id-pair crossing structure and
exposure concentration (Bayes ceiling 0.971, models land ~0.90). Our side
runs `--dense_init torch` (torch nn.Linear init family, ops/mlp.py) so
the comparison measures learning dynamics, not init families — the fix
that closed round 4's 6/6-negative sign pattern and its collapsed DCN
seed (PARITY_CALIB_r04.md "HONEST OPEN ITEM"). 3 epochs, batch 1024,
Adam lr 0.005; seeds 42/43/44 per side. Runner: `scripts/parity_check.py
--model M --calibrated 0.05 --seed S --dense_init torch --json_out
PARITY_CALIB_r05.jsonl`; regenerate with `python scripts/parity_table.py
--jsonl PARITY_CALIB_r05.jsonl --out PARITY_CALIB_r05.md --calibrated`.
"""

CALIB_NOTES = """
Notes:
- eval is 30,452 rows with ~1,090 positives, so the per-seed AUC
  standard error is ~0.004; single-seed deltas of that size are noise,
  which is why every model carries 3 seeds.
- round-4 -> round-5 closure: r04 had 6/6 mildly-negative mean deltas
  (p~=0.03) and one collapsed DCN seed (0.9252 vs 0.9347/0.9348). With
  the torch-matched dense init (uniform +-1/sqrt(fan_in) kernel+bias;
  DCN cross weights N(0,0.02) instead of xavier's ~0.24 std at d0=50),
  4/6 mean deltas are positive, the remaining two (din -0.0024, bst
  -0.0012) are within 1 sigma of zero with mixed per-seed signs, and no
  seed collapses (all 18 runs land 0.897-0.911). The sign-consistent
  pattern is gone.
- the r05 generator's labels are harder than r04's (id-pair crossing
  terms reachable only through second-order learning), which is why both
  sides sit at ~0.90 here vs 0.93-0.94 on the r04 log — the regime
  comparison with the reference's published 0.912-0.919 is unchanged.
- full-zoo extension (VERDICT r4 #2 stretch, run late round 5): the
  remaining 12 models x 3 seeds were appended with the same protocol,
  completing the calibrated matrix at 18/18 models x 3 seeds. Aggregate:
  grand mean delta ~-0.001 (parity), roughly half the models on each
  side of zero with per-seed spreads of the +-0.004-0.01 this eval size
  implies. Two honest observations: (1) the FM-family rows (deepfm, afm,
  fwfm, ffm) are noticeably higher-variance on BOTH sides than the tower
  models (fwfm torch seeds span 0.80-0.91; one deepfm seed of ours lands
  -0.032) — second-order learning from N(0,1)-init embeddings (the
  torch-default, parity-faithful family both sides use here) is
  borderline-stable at 3 epochs on this log for both frameworks, see
  REPRODUCING 5f; (2) autoint is the one model whose mean is negative
  beyond 2 sigma (auto-flagged below) — the open item this table does
  not close.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default="PARITY_RESULTS.jsonl")
    ap.add_argument("--out", default="PARITY_RESULTS.md")
    ap.add_argument("--calibrated", action="store_true",
                    help="use the calibrated-regime header/notes")
    args = ap.parse_args()

    rows = {}
    with open(args.jsonl) as f:
        for line in f:
            if line.strip():
                r = json.loads(line)
                # latest wins per (model, seed); multi-seed rows aggregate
                rows.setdefault(r["model"], {})[r.get("seed", 42)] = r

    lines = [CALIB_HEADER if args.calibrated else HEADER]
    import numpy as np

    flagged = []
    for name in sorted(rows):
        runs = list(rows[name].values())
        if len(runs) == 1:
            r = runs[0]
            lines.append(
                f"| {name} | {r['ours']:.5f} | {r['torch']:.5f} | "
                f"{r['delta']:+.5f} | {r['t_ours']:.0f} | {r['t_torch']:.0f} |\n"
            )
        else:
            ours = np.array([r["ours"] for r in runs])
            tch = np.array([r["torch"] for r in runs])
            dl = np.array([r["delta"] for r in runs])
            sd = dl.std(ddof=1)
            if dl.mean() < -2 * sd:
                flagged.append(name)
            lines.append(
                f"| {name} ({len(runs)} seeds) | "
                f"{ours.mean():.5f} ± {ours.std(ddof=1):.5f} | "
                f"{tch.mean():.5f} ± {tch.std(ddof=1):.5f} | "
                f"{dl.mean():+.5f} ± {sd:.5f} | "
                f"{np.mean([r['t_ours'] for r in runs]):.0f} | "
                f"{np.mean([r['t_torch'] for r in runs]):.0f} |\n"
            )
    lines.append(CALIB_NOTES if args.calibrated else NOTES)
    if flagged:
        lines.append(
            "- **FLAG**: mean delta < -2 sigma for: "
            + ", ".join(flagged)
            + " — a real semantic gap, not init noise; investigate.\n"
        )
    else:
        lines.append(
            "- multi-seed rows: no model's mean delta is below -2 sigma — "
            "the negative single-seed deltas are within init noise.\n"
        )
    with open(args.out, "w") as f:
        f.writelines(lines)
    deltas = [np.mean([r["delta"] for r in rows[m].values()]) for m in rows]
    pos = sum(d > 0 for d in deltas)
    print(
        f"wrote {args.out}: {len(rows)} models, {pos} positive mean deltas, "
        f"range [{min(deltas):+.4f}, {max(deltas):+.4f}], flagged={flagged}"
    )


if __name__ == "__main__":
    main()
