"""Relative cost of the three embedding lookup schedules at WeChat dims.

VERDICT r1 #7 asked for a gspmd-vs-explicit microbench at the real vocab
sizes. One tunnel chip cannot host a table-sharded mesh, so this runs the
honest available version: an 8-device virtual CPU mesh ({data:4, table:2})
with the REAL WeChat schema (feedid 106,445 rows x 16, userid 19,627 x 16,
...), comparing full DIN train-step wall time under
``embedding_mode='gspmd' | 'psum' | 'alltoall'`` — interleaved rounds,
median-of-N (docs/REPRODUCING.md §5 methodology; host CPU is far less
noisy than the tunnel but interleaving is free).

What it does/doesn't prove: RELATIVE schedule cost under identical
compilation (collective count + local gather work are real); it does NOT
measure ICI bandwidth — on a real slice the all-to-all exchanges ids+rows
over ICI where gspmd's all-gather moves whole padded row blocks, so the
CPU-mesh ranking is a lower bound on the explicit schedules' advantage at
scale. Run on a pod slice to measure the real thing.

Run: python scripts/bench_embedding_modes.py [--rounds 5] [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import default_config
    from rank_tpu.parallel.mesh import make_mesh
    from rank_tpu.train import TrainConfig, Trainer

    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=args.batch, seed=0)
    data["_valid"] = np.ones((args.batch,), np.float32)

    variants = {}
    for mode in ("gspmd", "psum", "alltoall"):
        mesh = make_mesh(table_parallelism=2)
        trainer = Trainer(
            WECHAT_SCHEMA,
            default_config("din").replace(embedding_mode=mode),
            TrainConfig(
                batch_size=args.batch, log_every=0, table_parallelism=2
            ),
            mesh=mesh,
        )
        batch = trainer._host_to_device(data)
        state = trainer.init_state(batch)
        assert trainer.shard_decisions["sharded"], mode
        variants[mode] = {
            "step": trainer._get_compiled("train"),
            "state": state,
            "meters": trainer.meters_init(),
            "batch": batch,
        }

    def window(v, steps):
        t0 = time.perf_counter()
        for _ in range(steps):
            v["state"], v["meters"] = v["step"](v["state"], v["meters"], v["batch"])
        float(v["meters"]["loss"])
        return time.perf_counter() - t0

    for v in variants.values():  # warmup / compile
        window(v, 2)

    times = {k: [] for k in variants}
    for _ in range(args.rounds):
        for name, v in variants.items():
            times[name].append(window(v, args.steps))

    out = {}
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        out[name] = {
            "median_step_ms": 1e3 * med / args.steps,
            "all_s": [round(t, 4) for t in ts],
        }
    base = out["gspmd"]["median_step_ms"]
    for name in out:
        out[name]["vs_gspmd"] = base / out[name]["median_step_ms"]
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
