"""ETL dress rehearsal at the reference's data scale (VERDICT r2 #3).

Generates a synthetic ``user_action.csv`` (default 20M rows — the same
order as the competition's ~70M-row log scaled to this container's 2
CPUs) + ``feed_info.csv`` (~110k feeds, matching the real feedid vocab
106,445) with realistic id distributions (zipf-ish user activity / feed
popularity, NaN-able bgm ids, 1-4 manual tags), runs the full 6-step
``WeChatETL`` end-to-end, then asserts structural invariants:

  * vocab sizes (every feed in feed_info; users bounded by generation);
  * window sums on sampled oracle slices (direct pandas recompute of
    u_/i_/c_ aggregates for random (id, date_) pairs);
  * split row counts (train == date_ 8-13 rows, test == date_ 14 rows);
  * array dump row counts + id ranges within the padded vocab.

Also times the reference's per-row feed_info preprocessing
(``DataGenerator.py:156`` iterrows prefix loop) against the vectorised
equivalent on the same frame, so the claimed speedup is a measurement.

Usage: python scripts/etl_at_scale.py [--rows 20000000] [--out /tmp/etl_scale]
Writes ETL_SCALE_r03.json at the repo root.
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rank_tpu.data.etl import ACTION_COLUMNS, WeChatETL  # noqa: E402

N_USERS = 20_000
N_FEEDS = 110_000
N_AUTHORS = 18_500
N_TAGS = 350
DAYS = 14

ACTION_RATES = {
    "read_comment": 0.04, "like": 0.03, "click_avatar": 0.01,
    "forward": 0.004, "comment": 0.002, "follow": 0.001, "favorite": 0.002,
}


def _zipf_probs(n, alpha):
    p = 1.0 / np.arange(1, n + 1) ** alpha
    return p / p.sum()


def generate(dataset_dir: str, rows: int, seed: int = 0, chunk=2_000_000):
    rng = np.random.default_rng(seed)
    t0 = time.time()

    # feed_info
    feed_ids = np.arange(1, N_FEEDS + 1)
    authors = rng.choice(
        np.arange(1, N_AUTHORS + 1), size=N_FEEDS, p=_zipf_probs(N_AUTHORS, 0.8)
    )
    song = rng.integers(1, 25_000, size=N_FEEDS).astype(float)
    song[rng.random(N_FEEDS) < 0.3] = np.nan
    singer = rng.integers(1, 17_500, size=N_FEEDS).astype(float)
    singer[rng.random(N_FEEDS) < 0.3] = np.nan
    n_tags_per = rng.integers(1, 5, size=N_FEEDS)
    tag_pool = np.arange(1, N_TAGS + 1)
    tags = [
        ";".join(map(str, rng.choice(tag_pool, size=k, replace=False)))
        if rng.random() > 0.05 else ""
        for k in n_tags_per
    ]
    pd.DataFrame({
        "feedid": feed_ids,
        "authorid": authors,
        "videoplayseconds": np.round(rng.exponential(30, N_FEEDS), 2),
        "description": "", "ocr": "", "asr": "",
        "bgm_song_id": song, "bgm_singer_id": singer,
        "manual_tag_list": tags,
    }).to_csv(os.path.join(dataset_dir, "feed_info.csv"), index=False)

    # user_action, chunked to bound peak memory
    user_p = _zipf_probs(N_USERS, 0.9)
    feed_p = _zipf_probs(N_FEEDS, 1.05)
    path = os.path.join(dataset_dir, "user_action.csv")
    written = 0
    first = True
    while written < rows:
        b = min(chunk, rows - written)
        df = pd.DataFrame({
            "userid": rng.choice(np.arange(1, N_USERS + 1), size=b, p=user_p),
            "feedid": rng.choice(feed_ids, size=b, p=feed_p),
            "date_": rng.integers(1, DAYS + 1, size=b),
            "device": rng.choice([1, 2], size=b, p=[0.7, 0.3]),
        })
        for col, rate in ACTION_RATES.items():
            df[col] = (rng.random(b) < rate).astype(np.int8)
        df["play"] = rng.integers(100, 60_000, size=b)
        df["stay"] = df["play"] + rng.integers(0, 20_000, size=b)
        df.to_csv(path, index=False, mode="w" if first else "a", header=first)
        first = False
        written += b
    return time.time() - t0


def reference_iterrows_preprocess(fi: pd.DataFrame, limit=None) -> float:
    """The reference's per-row prefix loop (DataGenerator.py:147-166):
    iterrows + .at writes. Returns wall seconds on ``limit`` rows."""
    fi = fi.head(limit).copy() if limit else fi.copy()
    # older pandas upcast int->object on .at writes silently; do it
    # explicitly so the reference loop runs on modern pandas
    fi = fi.astype({c: object for c in
                    ("feedid", "authorid", "bgm_song_id", "bgm_singer_id")})
    t0 = time.time()
    for index, row in fi.iterrows():
        fi.at[index, "feedid"] = "feedid_" + str(row["feedid"])
        fi.at[index, "authorid"] = "authorid_" + str(row["authorid"])
        if pd.notna(row["bgm_song_id"]):
            fi.at[index, "bgm_song_id"] = "bgm_song_id_" + str(int(row["bgm_song_id"]))
        if pd.notna(row["bgm_singer_id"]):
            fi.at[index, "bgm_singer_id"] = "bgm_singer_id_" + str(int(row["bgm_singer_id"]))
    return time.time() - t0


def check_invariants(etl: WeChatETL, out: dict, rng):
    vocab = {}
    for name in ("userid", "feedid", "authorid", "bgm_song_id",
                 "bgm_singer_id", "manual_tag_id", "device"):
        with open(os.path.join(etl.vocab_dir, name + ".txt")) as f:
            vocab[name] = sum(1 for line in f if line.strip())
    assert vocab["feedid"] == N_FEEDS, vocab
    assert 0 < vocab["userid"] <= N_USERS
    assert 0 < vocab["manual_tag_id"] <= N_TAGS
    assert vocab["device"] == 2
    out["vocab_sizes"] = vocab

    ua = etl.user_action  # prefixed in-memory frame
    # window-sum oracles on sampled slices
    uagg = pd.read_pickle(os.path.join(etl.features_dir, "user_agg_features.pkl"))
    for _ in range(5):
        r = uagg.iloc[rng.integers(0, len(uagg))]
        w = ua[(ua["userid"] == r["userid"]) & (ua["date_"] >= r["date_"] - 7)
               & (ua["date_"] < r["date_"])]
        for c in ACTION_COLUMNS:
            assert w[c].sum() == r[f"u_{c}_7d_sum"], (r["userid"], r["date_"], c)
    iagg = pd.read_pickle(os.path.join(etl.features_dir, "feed_agg_features.pkl"))
    for _ in range(5):
        r = iagg.iloc[rng.integers(0, len(iagg))]
        w = ua[(ua["feedid"] == r["feedid"]) & (ua["date_"] >= r["date_"] - 7)
               & (ua["date_"] < r["date_"])]
        for c in ACTION_COLUMNS:
            assert w[c].sum() == r[f"i_{c}_7d_sum"], (r["feedid"], r["date_"], c)
    cagg = pd.read_pickle(os.path.join(etl.features_dir, "cross_agg_features.pkl"))
    fi = etl.feed_info[["feedid", "authorid"]]
    for _ in range(3):
        r = cagg.iloc[rng.integers(0, len(cagg))]
        w = ua.merge(fi, on="feedid")
        w = w[(w["userid"] == r["userid"]) & (w["authorid"] == r["authorid"])
              & (w["date_"] >= r["date_"] - 7) & (w["date_"] < r["date_"])]
        assert w["read_comment"].sum() == r["c_user_author_read_comment_7d_sum"]
    out["window_oracle_checks"] = 13

    # split row counts
    train = pd.read_parquet(os.path.join(etl.dataframe_dir, "train.parquet"))
    test = pd.read_parquet(os.path.join(etl.dataframe_dir, "test.parquet"))
    n_train_expected = int(ua["date_"].between(8, 13).sum())
    n_test_expected = int((ua["date_"] == 14).sum())
    assert len(train) == n_train_expected, (len(train), n_train_expected)
    assert len(test) == n_test_expected, (len(test), n_test_expected)
    out["train_rows"] = len(train)
    out["test_rows"] = len(test)

    # arrays: row counts + encoded id ranges
    for split, n in (("train", len(train)), ("test", len(test))):
        arrs = np.load(os.path.join(etl.array_dir, f"{split}.npz"))
        assert arrs["userid"].shape[0] == n
        assert arrs["userid"].max() <= vocab["userid"]  # +1-slot layout
        assert arrs["feedid"].max() <= vocab["feedid"]
        assert np.isfinite(arrs["dense"]).all()
    out["arrays_ok"] = True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--out", default="/tmp/etl_scale")
    ap.add_argument("--json_out", default="ETL_SCALE_r03.json")
    args = ap.parse_args()

    dataset_dir = os.path.join(args.out, "dataset")
    out_path = os.path.join(args.out, "out")
    os.makedirs(dataset_dir, exist_ok=True)
    os.makedirs(out_path, exist_ok=True)

    out = {"rows": args.rows}
    print(f"generating {args.rows:,} action rows ...", flush=True)
    out["t_generate"] = round(generate(dataset_dir, args.rows), 1)
    out["csv_bytes"] = os.path.getsize(os.path.join(dataset_dir, "user_action.csv"))
    print(f"generated in {out['t_generate']}s "
          f"({out['csv_bytes']/1e9:.2f} GB)", flush=True)

    etl = WeChatETL(dataset_dir, out_path)
    steps = [
        ("load+preprocess", lambda: (etl._load(), etl._preprocess())),
        ("vocabulary", etl.generate_vocabulary),
        ("features", etl.generate_features),
        ("dataframe", etl.generate_dataframe),
        ("arrays", etl.generate_arrays),
    ]
    for name, fn in steps:
        t0 = time.time()
        fn()
        out[f"t_{name}"] = round(time.time() - t0, 1)
        print(f"step {name}: {out[f't_{name}']}s", flush=True)
    out["t_etl_total"] = round(sum(
        v for k, v in out.items() if k.startswith("t_") and k != "t_generate"
    ), 1)

    rng = np.random.default_rng(1)
    check_invariants(etl, out, rng)
    print("invariants ok", flush=True)

    # reference iterrows preprocessing vs our vectorised form, same frame
    fi_raw = pd.read_csv(
        os.path.join(dataset_dir, "feed_info.csv"),
        usecols=["feedid", "authorid", "videoplayseconds",
                 "bgm_song_id", "bgm_singer_id", "manual_tag_list"],
    )
    limit = 20_000  # iterrows sample; extrapolated linearly below
    t_iter = reference_iterrows_preprocess(fi_raw, limit)
    out["ref_iterrows_feedinfo_rows_per_s"] = round(limit / t_iter)
    t0 = time.time()
    fi2 = fi_raw.copy()
    fi2["feedid"] = "feedid_" + fi2["feedid"].astype(str)
    fi2["authorid"] = "authorid_" + fi2["authorid"].astype(str)
    for col in ("bgm_song_id", "bgm_singer_id"):
        vals = fi2[col].astype("Int64")
        fi2[col] = np.where(vals.isna(), np.nan, col + "_" + vals.astype(str))
    t_vec = time.time() - t0
    out["vectorised_feedinfo_rows_per_s"] = round(len(fi2) / t_vec)
    out["preprocess_speedup"] = round(
        out["vectorised_feedinfo_rows_per_s"]
        / out["ref_iterrows_feedinfo_rows_per_s"], 1
    )

    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
