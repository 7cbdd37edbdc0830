"""Interleaved A/B: DIN attention jnp vs Pallas kernel across embedding dims.

Substantiates (or refutes) the 'kernel becomes profitable at larger D'
claim in ops/pallas/din_attention.py with real-chip numbers at
D in {16, 64, 128} (B=8192, T=50). Methodology: docs/REPRODUCING.md §5 —
both backends compiled up front, interleaved timed windows, every window
fenced with a true host value fetch. Forward+backward (training form).

Run: python scripts/bench_din_dims.py [--rounds 5] [--steps 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T = 8192, 50


def build(d: int, backend: str, mode: str):
    from rank_tpu.ops.attention import DINAttention

    att = DINAttention(backend=backend, use_softmax=True)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, d), jnp.float32)
    lengths = jnp.asarray(
        np.random.default_rng(0).integers(1, T + 1, size=B), jnp.int32
    )
    params = att.init(jax.random.PRNGKey(2), q, k, lengths)

    if mode == "fwd":  # serving/eval form (the kernel's intended role)

        @jax.jit
        def fn(params, q, k):
            return jnp.sum(att.apply(params, q, k, lengths))

    else:  # training form; the kernel's custom_vjp recomputes fwd in jnp

        @jax.jit
        def fn(params, q, k):
            def loss(p, q, k):
                return jnp.sum(att.apply(p, q, k, lengths))

            l, g = jax.value_and_grad(loss)(params, q, k)
            # one scalar fence covering the grads (prevents DCE)
            return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    out = fn(params, q, k)  # compile
    float(out)
    return functools.partial(fn, params, q, k)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dims", type=str, default="16,64,128")
    ap.add_argument("--mode", choices=("fwd", "fwdbwd"), default="fwdbwd")
    args = ap.parse_args()

    results = {}
    for d in (int(x) for x in args.dims.split(",")):
        fns = {bk: build(d, bk, args.mode) for bk in ("jnp", "pallas")}
        times = {bk: [] for bk in fns}
        for _ in range(args.rounds):
            for bk, fn in fns.items():
                t0 = time.perf_counter()
                out = None
                for _ in range(args.steps):
                    out = fn()
                float(out)
                times[bk].append(time.perf_counter() - t0)
        row = {}
        for bk, ts in times.items():
            med = sorted(ts)[len(ts) // 2]
            row[bk] = {
                "ms_per_call": 1e3 * med / args.steps,
                "all_s": [round(t, 4) for t in ts],
            }
        row["pallas_speedup"] = (
            row["jnp"]["ms_per_call"] / row["pallas"]["ms_per_call"]
        )
        results[f"D={d} {args.mode}"] = row
        print(f"D={d}: jnp {row['jnp']['ms_per_call']:.2f} ms  "
              f"pallas {row['pallas']['ms_per_call']:.2f} ms  "
              f"speedup {row['pallas_speedup']:.2f}x", flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
