"""Calibration report for the EDA-calibrated synthetic log (VERDICT r3 #2).

Generates the calibrated log at a given scale, compares every realized
marginal against the reference EDA notebook's measured targets
(``EDA.ipynb`` cells 15/16/25/27/30; see ``rank_tpu/data/calibrated.py``),
runs it through the full WeChatETL, reports the emergent feature
statistics (sequence lengths, single-feature AUCs on the test day), and —
with ``--probe`` — trains DCN on the result and records the eval AUC, the
headline "models land in the reference's 0.85+ regime" number.

Usage:
  python scripts/calibrate_synthetic.py [--scale 0.2] [--probe]
      [--json_out CALIBRATION_r04.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _auc(score, y):
    order = np.argsort(score, kind="stable")
    ranks = np.empty(len(score))
    ranks[order] = np.arange(1, len(score) + 1)
    n_pos, n_neg = y.sum(), (1 - y).sum()
    return float(
        (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--probe", action="store_true",
                    help="train DCN on the generated data (uses the TPU)")
    ap.add_argument("--probe_epochs", type=int, default=4)
    ap.add_argument("--cache_dir", default="/tmp/rank_tpu_calibrated")
    ap.add_argument("--json_out", default="CALIBRATION_r05.json")
    args = ap.parse_args()

    from rank_tpu.data.calibrated import (
        ACTIONS, CalibratedLogConfig, make_calibrated_dataset,
    )

    out = {"scale": args.scale, "seed": args.seed}
    t0 = time.time()
    train, test, schema = make_calibrated_dataset(
        scale=args.scale, seed=args.seed, cache_dir=args.cache_dir
    )
    out["t_generate_and_etl"] = round(time.time() - t0, 1)
    from rank_tpu.data.calibrated import log_cache_tag

    cfg = CalibratedLogConfig(scale=args.scale, seed=args.seed)
    tag = log_cache_tag(cfg)
    with open(os.path.join(args.cache_dir, tag, "log_stats.json")) as f:
        stats = json.load(f)

    # marginal fidelity vs the EDA targets
    out["rates"] = {
        a: {"target": stats["target_rates"][a],
            "realized": stats["realized_rates"][a],
            "ratio": round(
                stats["realized_rates"][a] / stats["target_rates"][a], 3)}
        for a in ACTIONS
    }
    uv_ratio = [round(g / t, 3) for g, t in
                zip(stats["realized_uv"], stats["target_uv"])]
    fu_ratio = [round(g / t, 3) for g, t in
                zip(stats["realized_feed_unique"],
                    stats["target_feed_unique"])]
    out["daily_uv_ratio"] = uv_ratio
    out["daily_feed_unique_ratio"] = fu_ratio
    out["uv_mean_abs_err"] = round(
        float(np.mean(np.abs(np.array(uv_ratio) - 1))), 4)
    out["feed_unique_mean_abs_err"] = round(
        float(np.mean(np.abs(np.array(fu_ratio) - 1))), 4)
    out["bayes_auc_test_day"] = stats["bayes_auc_test_day"]
    out["tuned_feed_zipf_alpha"] = stats.get("tuned_feed_zipf_alpha")
    out["rows"] = {"train": int(len(train["labels"])),
                   "test": int(len(test["labels"]))}

    # emergent ETL features
    sl = train["his_read_comment_7d_seq_length"]
    out["seq_length"] = {
        "mean": round(float(sl.mean()), 2),
        "zero_frac": round(float((sl == 0).mean()), 4),
        "cap50_frac": round(float((sl == 50).mean()), 4),
        "p50": int(np.percentile(sl, 50)), "p90": int(np.percentile(sl, 90)),
    }
    dn = list(schema.dense_names)
    y = test["labels"][:, 0]
    out["single_feature_auc_test_day"] = {
        name: round(_auc(test["dense"][:, dn.index(name)], y), 4)
        for name in ("u_read_comment_7d_sum", "i_read_comment_7d_sum",
                     "c_user_author_read_comment_7d_sum")
    }
    out["vocab_sizes"] = {f.name: f.vocab_size for f in schema.categorical}

    if args.probe:
        from rank_tpu.models import default_config
        from rank_tpu.train import TrainConfig, Trainer
        from rank_tpu.train.staged import StagedRunner

        trainer = Trainer(
            schema, default_config("dcn"),
            TrainConfig(batch_size=1024, log_every=0),
        )
        runner = StagedRunner(trainer, train, test, 1024)
        state = runner.init_state()
        best = 0.0
        for e in range(1, args.probe_epochs + 1):
            state, _ = runner.train_epoch(state, e)
            ev = runner.evaluate(state, e)
            best = max(best, ev["auc"])
        out["dcn_probe"] = {
            "epochs": args.probe_epochs,
            "best_eval_auc": round(best, 4),
            "reference_dcn_auc": 0.911,  # algorithm/DCN/result.md best row
        }

    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
