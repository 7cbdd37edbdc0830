"""Interleaved A/B: BST train-step throughput, attn_impl vpu vs vpu2.

BYTES_r05.json attributed ~2.7 GB/step of the BST step's real traffic to
per-head slice/concat layout copies (bf16[8192,51,51] copy-dones +
ConcatBitcast custom-calls) produced by the 'vpu' per-head python loop.
'vpu2' (ops/transformer.py) vectorizes the heads into one (B,T,T,h)
expression to remove the reslicing. This measures whether that shows up
as model throughput, with the REPRODUCING.md §5 protocol: both variants'
compiled steps dispatched in interleaved rounds inside the same time
window (tunnel throughput swings 10x+ across windows, so sequential
comparisons are meaningless), every timed window fenced by a real value
fetch.

Run: python scripts/bench_bst_attn_impl.py [--batch 8192] [--rounds 5]
     [--impls vpu,vpu2,einsum] [--json_out ATTNIMPL_r05.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 20


def build(impl, batch):
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer

    cfg = default_config("bst").replace(attn_impl=impl)
    trainer = Trainer(
        WECHAT_SCHEMA, cfg, TrainConfig(batch_size=batch, log_every=0)
    )
    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=batch, seed=0)
    b = {k: v[:batch] for k, v in data.items()}
    b["_valid"] = np.ones((batch,), np.float32)
    b = trainer._host_to_device(b)
    state = trainer.init_state(b)
    meters = trainer.meters_init()
    compiled = trainer._get_compiled("train").lower(state, meters, b).compile()
    return {"step": compiled, "state": state, "meters": meters, "batch": b}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--impls", default="vpu,vpu2")
    ap.add_argument("--json_out", default="ATTNIMPL_r05.json")
    args = ap.parse_args()

    impls = args.impls.split(",")
    rigs = {impl: build(impl, args.batch) for impl in impls}
    # warmup
    for impl, r in rigs.items():
        for _ in range(3):
            r["state"], r["meters"] = r["step"](
                r["state"], r["meters"], r["batch"]
            )
        float(r["meters"]["loss"])

    times = {impl: [] for impl in impls}
    for rnd in range(args.rounds):
        for impl in impls:  # interleaved: same window covers all variants
            r = rigs[impl]
            t0 = time.perf_counter()
            for _ in range(STEPS):
                r["state"], r["meters"] = r["step"](
                    r["state"], r["meters"], r["batch"]
                )
            float(r["meters"]["loss"])
            times[impl].append((time.perf_counter() - t0) / STEPS)

    out = {"batch": args.batch, "steps_per_window": STEPS,
           "rounds": args.rounds, "protocol": "interleaved, float() fence",
           "results": {}}
    for impl in impls:
        med = sorted(times[impl])[len(times[impl]) // 2]
        out["results"][impl] = {
            "step_ms_median": round(med * 1e3, 3),
            "examples_per_s": round(args.batch / med),
            "windows_ms": [round(t * 1e3, 3) for t in times[impl]],
        }
    base = out["results"][impls[0]]["examples_per_s"]
    for impl in impls[1:]:
        out["results"][impl]["speedup_vs_" + impls[0]] = round(
            out["results"][impl]["examples_per_s"] / base, 3
        )
    print(json.dumps(out, indent=1))
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
