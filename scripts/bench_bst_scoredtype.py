"""Interleaved A/B: BST full-model train-step throughput, f32 vs bf16
(B,T,T) attention score/weight storage (`transformer_score_dtype`).

VERDICT r1 #6 named the padded f32 (B,T,T) score traffic as BST's last
identified headroom (docs/REPRODUCING.md §5b); the bf16 storage option
(ops/transformer.py `score_dtype`, f32 softmax reductions) landed with
AUC-parity tests — this script supplies the missing real-TPU measurement.

Methodology per docs/REPRODUCING.md §5: both variants compiled up front,
then timed in interleaved rounds inside the same window (tunnel
throughput swings 10x+ across windows, so sequential A-then-B comparisons
are meaningless); every timed window ends with a true host value fetch
(block_until_ready does not wait for queued dispatches on this backend).

Run: python scripts/bench_bst_scoredtype.py [--rounds 6] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BATCH = 8192


def build(score_dtype: str):
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer

    trainer = Trainer(
        WECHAT_SCHEMA,
        default_config("bst", transformer_score_dtype=score_dtype),
        TrainConfig(batch_size=BATCH, log_every=0),
    )
    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=BATCH * 2, seed=0)
    batches = []
    for i in range(2):
        b = {k: v[i * BATCH : (i + 1) * BATCH] for k, v in data.items()}
        b["_valid"] = np.ones((BATCH,), np.float32)
        batches.append(trainer._host_to_device(b))
    state = trainer.init_state(batches[0])
    step = trainer._get_compiled("train")
    meters = trainer.meters_init()
    return {"step": step, "state": state, "meters": meters, "batches": batches}


def timed_window(v, steps: int) -> float:
    t0 = time.perf_counter()
    for i in range(steps):
        v["state"], v["meters"] = v["step"](v["state"], v["meters"], v["batches"][i % 2])
    float(v["meters"]["loss"])  # true fence
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    variants = {
        "f32": build("float32"),
        "bf16": build("bfloat16"),
    }
    # warmup both (compile + settle)
    for v in variants.values():
        timed_window(v, 5)

    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, v in variants.items():
            times[name].append(timed_window(v, args.steps))
    out = {}
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        out[name] = {
            "median_s": med,
            "examples_per_s": BATCH * args.steps / med,
            "all_s": [round(t, 4) for t in ts],
        }
    out["speedup_bf16_over_f32"] = (
        out["f32"]["median_s"] / out["bf16"]["median_s"]
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
