"""Serving latency benchmark: Predictor end-to-end request latency.

The reference has no serving layer (SURVEY.md §1); rank_tpu's is
``rank_tpu/serve.py`` (bucketed static-shape batches, best-checkpoint
restore). This reports per-request wall latency (p50/p90) and
examples/s at request sizes 1 / 64 / 256 / 4096 for a model.

Caveat recorded with the numbers: in this environment the TPU is reached
through the axon tunnel, so small-batch latency is dominated by tunnel
round-trip (~5-25 ms), not model compute — the large-batch examples/s
figure is the hardware-meaningful one; on a directly-attached chip the
small-batch p50 drops to the XLA launch overhead (~100s of µs).

Usage: python scripts/bench_serving.py [--model dcn] [--repeats 30]
Prints one JSON line per request size.
"""

import argparse
import json
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dcn")
    ap.add_argument("--repeats", type=int, default=30)
    ap.add_argument("--sizes", default="1,64,256,4096")
    ap.add_argument("--weights_dtype", default=None,
                    help="e.g. bfloat16: cast f32 params (serve.py)")
    args = ap.parse_args(argv)

    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import default_config
    from rank_tpu.serve import Predictor

    cfg = default_config(args.model)
    # serve from fresh init (latency is checkpoint-independent)
    import flax.linen as nn
    import jax

    from rank_tpu.models import build_model

    sample = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=1, seed=0)
    model = build_model(WECHAT_SCHEMA, cfg)
    variables = nn.meta.unbox(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            {k: jax.numpy.asarray(v) for k, v in sample.items()},
            train=False,
        )
    )
    pred = Predictor(WECHAT_SCHEMA, cfg, variables=variables, min_bucket=1,
                     weights_dtype=args.weights_dtype)

    sizes = [int(s) for s in args.sizes.split(",")]
    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=max(sizes), seed=1)
    for n in sizes:
        req = {k: v[:n] for k, v in data.items() if k != "labels"}
        pred(req)  # compile the bucket
        lats = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = pred(req)
            lats.append(time.perf_counter() - t0)
        lats = np.sort(np.asarray(lats))
        p50 = float(lats[len(lats) // 2])
        p90 = float(lats[int(len(lats) * 0.9)])
        print(
            json.dumps(
                {
                    "metric": f"serving_latency_{args.model}_bs{n}"
                    + (f"_{args.weights_dtype}" if args.weights_dtype else ""),
                    "p50_ms": round(p50 * 1e3, 3),
                    "p90_ms": round(p90 * 1e3, 3),
                    "examples_per_s_at_p50": round(n / p50, 1),
                    "heads": sorted(out),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
