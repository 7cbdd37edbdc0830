"""Assert the unambiguous directional effects in replayed sweep grids
(VERDICT r3 #5).

The reference's result.md tables are its de-facto regression suite
(SURVEY.md §4.2). Most cells differ by ~noise, but a few effects are
unambiguous in the reference tables and must reproduce in any faithful
implementation once the data regime is realistic (the EDA-calibrated
log):

  * DIN: softmax-normalised attention beats raw masked weights
    (algorithm/DIN/result.md — rows 9 vs 10: 0.9117 vs 0.9056);
  * DeepFM: 2 epochs beat 1 (algorithm/DeepFM/result.md rows 5-6:
    0.8530 vs 0.8123);
  * DCN: some cross depth > 0 beats depth 0 (pure deep tower) —
    algorithm/DCN/result.md rows 1 vs 4+ (0.9139 no-cross vs 0.9183
    3-cross); this is the "cross-depth response is no longer flat"
    check from VERDICT r3 #2.

Each assertion compares MEANS over the matching grid cells, so a single
noisy cell cannot flip it. Exits nonzero on violation.

Usage: python scripts/check_sweep_directions.py \
    --din SWEEP_DIN_r04.json --deepfm SWEEP_DEEPFM_r04.json \
    --dcn SWEEP_DCN_CALIB_r04.json
"""

import argparse
import json
import sys


def load(path):
    with open(path) as f:
        rows = json.load(f)
    bad = [r for r in rows if r.get("returncode") or r.get("eval_auc") is None]
    assert not bad, f"{path}: {len(bad)} failed cells: {bad[:2]}"
    return rows


def mean_where(rows, **conds):
    sel = [
        r["eval_auc"]
        for r in rows
        if all(str(r["overrides"].get(k)) == str(v) for k, v in conds.items())
    ]
    assert sel, f"no cells matching {conds}"
    return sum(sel) / len(sel), len(sel)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--din")
    ap.add_argument("--deepfm")
    ap.add_argument("--dcn")
    args = ap.parse_args()
    failures = []

    if args.din:
        rows = load(args.din)
        on, n1 = mean_where(rows, use_softmax="true")
        off, n2 = mean_where(rows, use_softmax="false")
        print(f"DIN softmax on {on:.5f} (n={n1}) vs off {off:.5f} (n={n2})"
              f" -> {'OK' if on > off else 'VIOLATION'}")
        if on <= off:
            failures.append("din_softmax")

    if args.deepfm:
        rows = load(args.deepfm)
        e2, n1 = mean_where(rows, num_epochs=2)
        e1, n2 = mean_where(rows, num_epochs=1)
        print(f"DeepFM 2-epoch {e2:.5f} (n={n1}) vs 1-epoch {e1:.5f} (n={n2})"
              f" -> {'OK' if e2 > e1 else 'VIOLATION'}")
        if e2 <= e1:
            failures.append("deepfm_epochs")

    if args.dcn:
        rows = load(args.dcn)
        d0, n1 = mean_where(rows, num_cross_layer=0)
        best_depth, best = max(
            (
                (d, mean_where(rows, num_cross_layer=d)[0])
                for d in (1, 2, 3, 4)
            ),
            key=lambda kv: kv[1],
        )
        print(f"DCN cross-depth 0 {d0:.5f} vs best depth {best_depth} "
              f"{best:.5f} -> {'OK' if best > d0 else 'VIOLATION'}")
        if best <= d0:
            failures.append("dcn_cross_depth")

    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    print("all directional checks pass")


if __name__ == "__main__":
    main()
