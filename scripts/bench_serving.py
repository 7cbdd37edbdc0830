"""Serving-path latency/throughput benchmark (round 3).

The reference has no serving layer; rank_tpu's ``serve.Predictor``
(bucketed static shapes, best-checkpoint weights, optional bf16 weight
storage) is the production-inference surface. This measures, on the real
chip, per-model: single-request p50 latency at small batch (the bucketed
padded path) and steady-state throughput at a large batch, both with
true value-fetch fences (block_until_ready is not a fence on this
backend — CLAUDE.md / docs/REPRODUCING.md §5).

Usage: python scripts/bench_serving.py [--models dcn,bst,din,mmoe]
Writes SERVING_r03.json at the repo root.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_model(model_name, small=64, big=8192, repeats=30):
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import default_config
    from rank_tpu.serve import Predictor

    cfg = default_config(model_name)

    # fresh-init variables (quality-independent: serving cost is shape-
    # dependent only)
    import flax.linen as nn
    import jax

    from rank_tpu.models import build_model

    model = build_model(WECHAT_SCHEMA, cfg)
    sample = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=1, seed=0)
    variables = nn.meta.unbox(model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {k: np.asarray(v) for k, v in sample.items()}, train=False,
    ))
    pred = Predictor(WECHAT_SCHEMA, cfg, variables=variables)

    data_small = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=small, seed=1)
    data_big = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=big, seed=2)
    req_small = {k: v for k, v in data_small.items() if k != "labels"}
    req_big = {k: v for k, v in data_big.items() if k != "labels"}

    # warmup (compiles both buckets)
    for _ in range(3):
        out = pred(req_small)
        out = pred(req_big)
    _ = float(np.asarray(next(iter(out.values()))).sum())

    lat = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = pred(req_small)
        # value fetch IS the fence
        _ = float(np.asarray(next(iter(out.values()))).sum())
        lat.append((time.perf_counter() - t0) * 1e3)

    thr = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            out = pred(req_big)
        _ = float(np.asarray(next(iter(out.values()))).sum())
        thr.append(big * 10 / (time.perf_counter() - t0))

    return {
        "model": model_name,
        "small_batch": small,
        "p50_latency_ms": round(float(np.median(lat)), 2),
        "p90_latency_ms": round(float(np.percentile(lat, 90)), 2),
        "big_batch": big,
        "throughput_ex_per_s": round(float(np.median(thr))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="dcn,bst,din,mmoe")
    ap.add_argument("--json_out", default="SERVING_r03.json")
    args = ap.parse_args()
    results = []
    for m in args.models.split(","):
        r = bench_model(m)
        results.append(r)
        print(json.dumps(r), flush=True)
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
