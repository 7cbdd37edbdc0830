"""Serving-path latency/throughput benchmark (rounds 3-4).

The reference has no serving layer; rank_tpu's ``serve.Predictor``
(bucketed static shapes, best-checkpoint weights, optional bf16 weight
storage) is the production-inference surface. Per model this measures,
on the real chip:

  * ``tunnel_p50_ms`` / ``tunnel_p90_ms`` — end-to-end request latency
    through the axon tunnel at batch 64 and at the reference-default
    batch 1024 (``deepfm.py:304``), value-fetch fenced. On this tunnel
    a single dispatch+fence costs ~29 ms (docs/REPRODUCING.md §5), so
    these are transport-dominated;
  * ``device_ms`` — DEVICE-ONLY model latency (VERDICT r3 #6), measured
    by the chained-in-jit method: one jitted program runs the predict
    function CHAIN times with a data dependency threaded through
    (previous output's sum * 1e-38 added to the dense input, so XLA can
    neither parallelise nor elide iterations), and
    device_ms = (t_chain - t_single) / (CHAIN - 1) — tunnel overhead
    cancels in the subtraction;
  * ``throughput_ex_per_s`` — steady-state at batch 8192.

Usage: python scripts/bench_serving.py [--models dcn,bst,din,mmoe]
Writes SERVING_r04.json at the repo root.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CHAIN = 512


def _padded_device_batch(pred, batch_np, bucket):
    """The exact padded device batch Predictor.__call__ builds."""
    import jax.numpy as jnp

    n = next(iter(batch_np.values())).shape[0]
    padded = {}
    for k, v in batch_np.items():
        if k in ("labels", "_valid"):
            continue
        if bucket != n:
            pad = np.repeat(np.asarray(v[:1]), bucket - n, axis=0)
            v = np.concatenate([np.asarray(v), pad], axis=0)
        padded[k] = jnp.asarray(v)
    padded["labels"] = jnp.zeros(
        (bucket, len(pred.schema.labels)), jnp.float32
    )
    return padded


def device_latency_ms(pred, batch_np, repeats=10):
    """Chained-in-jit device-only latency (module docstring)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rank_tpu.serve import _bucket

    n = next(iter(batch_np.values())).shape[0]
    padded = _padded_device_batch(pred, batch_np, _bucket(n, pred.min_bucket))
    apply_fn = pred._apply_fn

    def make_chained(chain):
        def chained(variables, batch):
            def body(i, acc):
                # thread the dependency through EVERY input feature, not
                # just dense: otherwise XLA hoists the loop-invariant
                # id-embedding subgraph out of the fori_loop (LICM) and
                # the chain times only the dense-dependent slice
                # (measured: BST b1024 "62us", 13x below its fwd cost).
                # bump_f is dynamically 0-ish (1e-38) and bump_i exactly
                # 0 at runtime, but neither is foldable at compile time.
                bump_f = acc * jnp.float32(1e-38)
                bump_i = bump_f.astype(jnp.int32)
                b2 = {
                    k: v + (bump_f if jnp.issubdtype(v.dtype, jnp.floating)
                            else bump_i).astype(v.dtype)
                    for k, v in batch.items()
                }
                out = apply_fn(variables, b2)
                return sum(
                    jnp.sum(v.astype(jnp.float32)) for v in out.values()
                )

            return lax.fori_loop(0, chain, body, jnp.float32(0.0))

        return jax.jit(chained, static_argnames=())

    t = {}
    for chain in (1, CHAIN):
        fn = make_chained(chain)
        float(fn(pred.variables, padded))  # compile + warm
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(pred.variables, padded))  # value fetch = fence
            ts.append(time.perf_counter() - t0)
        t[chain] = float(np.median(ts))
    return (t[CHAIN] - t[1]) / (CHAIN - 1) * 1e3


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

    ref_batch = 1024  # reference default (deepfm.py:304)
    data_small = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=small, seed=1)
    data_ref = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=ref_batch, seed=3)
    data_big = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=big, seed=2)
    req_small = {k: v for k, v in data_small.items() if k != "labels"}
    req_ref = {k: v for k, v in data_ref.items() if k != "labels"}
    req_big = {k: v for k, v in data_big.items() if k != "labels"}

    # warmup (compiles all buckets)
    for _ in range(3):
        out = pred(req_small)
        out = pred(req_ref)
        out = pred(req_big)
    _ = float(np.asarray(next(iter(out.values()))).sum())

    def tunnel_lat(req):
        lat = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = pred(req)
            # value fetch IS the fence
            _ = float(np.asarray(next(iter(out.values()))).sum())
            lat.append((time.perf_counter() - t0) * 1e3)
        return lat

    lat_small = tunnel_lat(req_small)
    lat_ref = tunnel_lat(req_ref)

    thr = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            out = pred(req_big)
        _ = float(np.asarray(next(iter(out.values()))).sum())
        thr.append(big * 10 / (time.perf_counter() - t0))

    dev_small = device_latency_ms(pred, req_small)
    dev_ref = device_latency_ms(pred, req_ref)

    return {
        "model": model_name,
        "small_batch": small,
        "tunnel_p50_ms": round(float(np.median(lat_small)), 2),
        "tunnel_p90_ms": round(float(np.percentile(lat_small, 90)), 2),
        "device_ms": round(dev_small, 3),
        "ref_batch": ref_batch,
        "tunnel_p50_ms_b1024": round(float(np.median(lat_ref)), 2),
        "device_ms_b1024": round(dev_ref, 3),
        "big_batch": big,
        "throughput_ex_per_s": round(float(np.median(thr))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="dcn,bst,din,mmoe")
    ap.add_argument("--json_out", default="SERVING_r04.json")
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
