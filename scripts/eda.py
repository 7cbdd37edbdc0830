"""Dataset EDA report — parity with the reference's EDA notebook.

The reference ships ``dataset/wechat_algo_data1/EDA.ipynb`` (SURVEY.md
§2.1), whose 33 cells compute: row counts (cell 9), per-date behaviour
rates for the 7 action labels (cells 15-16), per-user-per-day interaction
stats — distinct feeds seen, mean play/stay, finish rate (cells 18-23) —
feed attribute distributions — videoplayseconds, works per author (cells
25-27) — and the read_comment label distribution over the training window
date_ 8-14 plus the unique-user count (cells 30-32).

This script computes the same aggregates as a reproducible batch job and
prints a text report (quantile tables instead of seaborn histograms; the
numbers are the same ones the notebook plots). The raw competition CSVs
are not distributed (dataset/README.md:6), so by default it synthesises a
small action log with the same schema to demonstrate the report; point
``--dataset_dir`` at a directory containing ``user_action.csv`` +
``feed_info.csv`` for the real thing.

Usage: python scripts/eda.py [--dataset_dir DIR] [--json out.json]
"""

import argparse
import json

import numpy as np
import pandas as pd

ACTIONS = [
    "read_comment", "like", "click_avatar", "forward", "comment",
    "follow", "favorite",
]


def quantile_row(s: pd.Series) -> dict:
    qs = s.quantile([0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0])
    return {f"p{int(q*100)}": round(float(v), 3) for q, v in qs.items()}


def synthesize(seed: int = 0, rows: int = 200_000):
    """Schema-identical stand-in for the undistributed competition CSVs."""
    rng = np.random.default_rng(seed)
    n_users, n_feeds, n_authors = 2000, 8000, 1500
    feed_author = rng.integers(0, n_authors, n_feeds)
    feed_secs = rng.gamma(2.0, 15.0, n_feeds).clip(1, 300).astype(int)
    ua = pd.DataFrame(
        dict(
            userid=rng.integers(0, n_users, rows),
            feedid=rng.integers(0, n_feeds, rows),
            date_=rng.integers(1, 15, rows),
            device=rng.integers(1, 3, rows),
            play=rng.gamma(1.5, 20_000, rows).astype(int),
            stay=rng.gamma(1.5, 25_000, rows).astype(int),
        )
    )
    for a, rate in zip(ACTIONS, (0.03, 0.025, 0.008, 0.004, 0.004, 0.007, 0.001)):
        ua[a] = (rng.random(rows) < rate).astype(int)
    fi = pd.DataFrame(
        dict(
            feedid=np.arange(n_feeds),
            authorid=feed_author,
            videoplayseconds=feed_secs,
        )
    )
    return ua, fi


def run(user_action: pd.DataFrame, feed_info: pd.DataFrame) -> dict:
    rep = {}
    # -- data overview (notebook cells 9, 31) ------------------------------
    rep["overview"] = {
        "user_action_rows": int(len(user_action)),
        "feed_info_rows": int(len(feed_info)),
        "unique_users": int(user_action["userid"].nunique()),
        "unique_feeds": int(user_action["feedid"].nunique()),
        "date_range": [int(user_action["date_"].min()), int(user_action["date_"].max())],
    }
    # -- per-date behaviour rates (cells 15-16) -----------------------------
    g = user_action.groupby("date_")
    per_date = g.agg(
        samples_n=("userid", "count"), uv=("userid", "nunique"),
        **{f"{a}_n": (a, "sum") for a in ACTIONS},
    )
    for a in ACTIONS:
        per_date[f"{a}_rate"] = per_date[f"{a}_n"] / per_date["samples_n"]
    rep["per_date"] = {
        str(d): {k: round(float(v), 5) for k, v in row.items()}
        for d, row in per_date.iterrows()
    }
    # -- user x day interaction stats (cells 18-23) -------------------------
    ud = user_action.groupby(["userid", "date_"]).agg(
        user_feed_unique_n=("feedid", "nunique"),
        user_feed_play_avg=("play", "mean"),
        user_feed_stay_avg=("stay", "mean"),
    )
    rep["user_day"] = {c: quantile_row(ud[c]) for c in ud.columns}
    merged = user_action.merge(
        feed_info[["feedid", "videoplayseconds"]], on="feedid", how="left"
    )
    finish = merged["play"] / (merged["videoplayseconds"] * 1000.0)
    rep["feed_finish_rate"] = quantile_row(finish.replace([np.inf, -np.inf], np.nan).dropna())
    # -- feed attribute distributions (cells 25-27) --------------------------
    rep["feed"] = {
        "videoplayseconds": quantile_row(feed_info["videoplayseconds"]),
    }
    if "authorid" in feed_info:
        per_author = feed_info.groupby("authorid")["feedid"].nunique()
        rep["feed"]["works_per_author"] = quantile_row(per_author)
        rep["feed"]["single_work_author_share"] = round(
            float((per_author == 1).mean()), 4
        )  # notebook cell 27: "~50% of authors have one feed"
    # -- training-window label distribution (cell 30) ------------------------
    window = user_action[user_action["date_"].between(8, 14)]
    rep["train_window_read_comment"] = {
        str(k): int(v)
        for k, v in window.groupby("read_comment")["userid"].count().items()
    }
    return rep


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_dir", default=None,
                    help="dir with user_action.csv + feed_info.csv")
    ap.add_argument("--json", default=None, help="also write the report as JSON")
    args = ap.parse_args(argv)
    if args.dataset_dir:
        ua = pd.read_csv(f"{args.dataset_dir}/user_action.csv")
        fi = pd.read_csv(f"{args.dataset_dir}/feed_info.csv")
    else:
        print("# raw CSVs not given — running on a schema-identical synthetic log\n")
        ua, fi = synthesize()
    rep = run(ua, fi)
    print(json.dumps(rep, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rep, f, indent=2)
    return rep


if __name__ == "__main__":
    main()
