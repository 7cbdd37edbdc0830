"""Train every model in the zoo end-to-end on the TPU (synthetic WeChat-
shaped data) and record eval AUC + steady-state throughput.

The real competition CSVs are not distributed (dataset/README.md:6), so
this demonstrates every model's full train/eval path on real hardware and
catches regressions; AUC numbers are synthetic-data sanity values, not
reference-parity claims (see BASELINE.md for those targets).

Usage: python scripts/run_all_models.py [--rows 200000] [--epochs 1]
"""

import argparse
import json
import time

import numpy as np

from rank_tpu.data.loader import split_train_test
from rank_tpu.data.synthetic import make_synthetic_dataset
from rank_tpu.features import WECHAT_SCHEMA
from rank_tpu.models import MODEL_CLASSES, default_config
from rank_tpu.train import TrainConfig, Trainer
from rank_tpu.train.staged import StagedRunner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=4096)
    ap.add_argument("--out", type=str, default="RESULTS_synthetic.json")
    ap.add_argument("--models", type=str, default=",".join(sorted(MODEL_CLASSES)))
    args = ap.parse_args()

    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=args.rows, seed=0)
    train_data, eval_data = split_train_test(data, 0.15)

    results = {}
    for name in args.models.split(","):
        print(f"\n=== {name} ===", flush=True)
        t0 = time.time()
        try:
            trainer = Trainer(
                WECHAT_SCHEMA,
                default_config(name),
                TrainConfig(batch_size=args.batch_size, log_every=0),
            )
            runner = StagedRunner(trainer, train_data, eval_data, args.batch_size)
            state = runner.init_state()
            eps = []
            for epoch in range(1, args.epochs + 1):
                state, stats = runner.train_epoch(state, epoch)
                eps.append(stats["examples_per_s"])
            ev = runner.evaluate(state, args.epochs)
            results[name] = {
                "eval_auc": round(ev["auc"], 5),
                "task_aucs": {k: round(v, 5) for k, v in ev["task_aucs"].items()},
                "train_examples_per_s_best": round(max(eps), 1),
                "wall_s": round(time.time() - t0, 1),
            }
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name} FAILED: {e}", flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
