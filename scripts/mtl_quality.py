"""MTL-trick quality table (VERDICT r2 #6).

Uncertainty weighting, GradNorm and PCGrad are implemented and
mechanically tested; this measures whether they help. MMOE + PLE on
identical synthetic data (200k rows, WeChat schema, seed 0) under
``task_weighting in {sum, uncertainty, gradnorm, pcgrad}``, 3 seeds
each, reporting per-task eval AUC mean ± std and a default
recommendation. Matches the reference's published 3-task MMOE setting
(read_comment / like / click_avatar, ``/root/reference/README.md:41-42``;
the tricks themselves are the README's to-do list, ``README.md:59``).

Usage: python scripts/mtl_quality.py [--rows 200000] [--epochs 3]
       [--seeds 42,43,44] [--json_out MTL_QUALITY_r03.jsonl]
Then:  python scripts/mtl_quality.py --render  (writes MTL_QUALITY_r03.md)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODELS = ("mmoe", "ple")
WEIGHTINGS = ("sum", "uncertainty", "gradnorm", "pcgrad")
TASKS = ("read_comment", "like", "click_avatar")


def run_one(model_name, weighting, seed, train_d, eval_d, epochs, batch):
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer
    from rank_tpu.train.staged import StagedRunner

    cfg = default_config(model_name).replace(
        task_weighting=weighting, multihot_tags=False
    )
    trainer = Trainer(
        WECHAT_SCHEMA, cfg, TrainConfig(batch_size=batch, log_every=0, seed=seed)
    )
    runner = StagedRunner(trainer, train_d, eval_d, batch)
    state = runner.init_state()
    t0 = time.time()
    for e in range(1, epochs + 1):
        state, _ = runner.train_epoch(state, e, seed)
    stats = runner.evaluate(state, epochs)
    return {
        "model": model_name, "weighting": weighting, "seed": seed,
        "task_aucs": {k: float(v) for k, v in stats["task_aucs"].items()},
        "mean_auc": float(np.mean(list(stats["task_aucs"].values()))),
        "t_train": round(time.time() - t0, 1),
    }


def render(jsonl, out_md):
    rows = {}
    with open(jsonl) as f:
        for line in f:
            if line.strip():
                r = json.loads(line)
                rows.setdefault((r["model"], r["weighting"]), {})[r["seed"]] = r
    lines = [
        "# MTL-trick quality: task_weighting on MMOE / PLE\n\n",
        "Identical synthetic data (200k rows, WeChat schema, seed 0), 3\n"
        "seeds per cell, 3 epochs, batch 1024, staged runner. Per-task\n"
        "eval AUC mean ± std across seeds; reference 3-task setting\n"
        "(README.md:41-42); the tricks are the README's to-do list\n"
        "(README.md:59). Runner: `scripts/mtl_quality.py`.\n\n",
        "| Model | Weighting | " + " | ".join(TASKS) + " | mean | s/run |\n",
        "|---|---|" + "---|" * (len(TASKS) + 2) + "\n",
    ]
    summary = {}
    for model in MODELS:
        for w in WEIGHTINGS:
            runs = list(rows.get((model, w), {}).values())
            if not runs:
                continue
            def ms(v):
                sd = v.std(ddof=1) if len(v) > 1 else 0.0
                return f"{v.mean():.4f} ± {sd:.4f}"

            cells = []
            for t in TASKS:
                cells.append(ms(np.array([r["task_aucs"][t] for r in runs])))
            m = np.array([r["mean_auc"] for r in runs])
            summary[(model, w)] = m.mean()
            cells.append(ms(m))
            cells.append(f"{np.mean([r['t_train'] for r in runs]):.0f}")
            lines.append(
                f"| {model} | {w} ({len(runs)} seeds) | " + " | ".join(cells) + " |\n"
            )
    # recommendation: a non-sum default must beat sum by >= its own
    # cross-seed std, else the honest default is sum (simplest + cheapest)
    lines.append("\nRecommendation:\n")
    for model in MODELS:
        per_w = {w: summary[(model, w)] for w in WEIGHTINGS if (model, w) in summary}
        if not per_w:
            continue
        base = per_w.get("sum")
        best = max(per_w, key=per_w.get)
        best_runs = list(rows[(model, best)].values())
        sd = np.array([r["mean_auc"] for r in best_runs]).std(ddof=1) \
            if len(best_runs) > 1 else 0.0
        pick = best if (base is None or per_w[best] - base >= sd) else "sum"
        verdict = []
        for w, v in sorted(per_w.items(), key=lambda kv: -kv[1]):
            d = v - base if base is not None else float("nan")
            verdict.append(f"{w} {v:.4f} ({d:+.4f} vs sum)")
        note = "" if pick != "sum" or best == "sum" else \
            f" (best `{best}` is within 1 sigma of sum — not worth its step cost)"
        lines.append(f"- **{model}**: {'; '.join(verdict)} → default `{pick}`{note}.\n")
    with open(out_md, "w") as f:
        f.writelines(lines)
    print(f"wrote {out_md}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--seeds", default="42,43,44")
    ap.add_argument("--models", default=",".join(MODELS))
    ap.add_argument("--weightings", default=",".join(WEIGHTINGS))
    ap.add_argument("--json_out", default="MTL_QUALITY_r03.jsonl")
    ap.add_argument("--md_out", default="MTL_QUALITY_r03.md")
    ap.add_argument("--render", action="store_true",
                    help="only regenerate the md from the jsonl")
    args = ap.parse_args()

    if args.render:
        render(args.json_out, args.md_out)
        return

    from rank_tpu.data.loader import split_train_test
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA

    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=args.rows, seed=0)
    train_d, eval_d = split_train_test(data, 0.15)

    for model in args.models.split(","):
        for w in args.weightings.split(","):
            for seed in map(int, args.seeds.split(",")):
                r = run_one(model, w, seed, train_d, eval_d,
                            args.epochs, args.batch)
                with open(args.json_out, "a") as f:
                    f.write(json.dumps(r) + "\n")
                print(json.dumps(r), flush=True)
    render(args.json_out, args.md_out)


if __name__ == "__main__":
    main()
