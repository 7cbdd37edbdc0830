"""Quantify the block-interleaved staged layout (REPRODUCING §5c).

The round-3 layout change removed the per-step GSPMD redistribution of
each batch (old: contiguous global slices of the P('data')-sharded
matrix → 50 all-gathers per compiled 2-step dispatch on the 8-device
mesh; new: shard-local slices of the (D, N/D, W) view → zero). This
measures what those collectives actually cost: old-layout vs new-layout
staged training throughput, interleaved rounds in the same time window,
on the virtual 8-device CPU mesh (multi-device data parallel — the
setting the layout exists for; the one real chip has D=1 where both
layouts are identical).

Usage: XLA 8-dev CPU mesh is forced in-process. Writes INTERLEAVE_r03.json.
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import tiny_schema
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer
    from rank_tpu.train.staged import StagedRunner, unpack_columns

    schema = tiny_schema(vocab=4096, hist_len=16)
    cfg = default_config("dcn")
    data = make_synthetic_dataset(schema, num_rows=65536, seed=0)
    bs = 2048
    tr = Trainer(schema, cfg, TrainConfig(batch_size=bs, log_every=0))
    runner = StagedRunner(tr, data, data, bs, steps_per_dispatch=8)
    state_new = runner.init_state()
    runner._build()
    spd = runner.steps_per_dispatch
    shuffled3 = runner._shuffle_fn(runner.train_staged, 0)

    # the pre-round-3 layout: contiguous global slices of the (N, W) matrix
    def old_steps(state, meters, shuffled, i0):
        for k in range(spd):
            rows = jax.lax.dynamic_slice_in_dim(shuffled, (i0 + k) * bs, bs, axis=0)
            batch = unpack_columns(rows, runner.train_specs)
            state, meters = tr._train_step(state, meters, batch)
        return state, meters

    old_fn = jax.jit(
        old_steps,
        donate_argnums=(0, 1),
        in_shardings=(tr._state_shardings, None,
                      NamedSharding(tr.mesh, P("data", None)), None),
        out_shardings=(tr._state_shardings, None),
    )
    state_old = runner.init_state()

    n_disp = runner.train_steps // spd

    def run_new(state):
        m = tr.meters_init()
        t0 = time.perf_counter()
        for d in range(n_disp):
            state, m = runner._train_step(state, m, shuffled3, d * spd)
        count = float(m["count"])
        return state, count / (time.perf_counter() - t0)

    shuffled_flat = shuffled3.reshape(-1, shuffled3.shape[-1])

    def run_old(state):
        m = tr.meters_init()
        t0 = time.perf_counter()
        for d in range(n_disp):
            state, m = old_fn(state, m, shuffled_flat, d * spd)
        count = float(m["count"])
        return state, count / (time.perf_counter() - t0)

    # warm both compiles, then interleave timed rounds
    state_new, _ = run_new(state_new)
    state_old, _ = run_old(state_old)
    new_r, old_r = [], []
    for _ in range(5):
        state_new, v = run_new(state_new)
        new_r.append(v)
        state_old, v = run_old(state_old)
        old_r.append(v)
    out = {
        "mesh_devices": 8,
        "batch": bs,
        "old_contiguous_ex_per_s": round(float(np.median(old_r))),
        "new_interleaved_ex_per_s": round(float(np.median(new_r))),
        "speedup": round(float(np.median(new_r) / np.median(old_r)), 2),
    }
    with open("INTERLEAVE_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
