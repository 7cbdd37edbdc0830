"""MFU / roofline artifact (VERDICT r3 #1).

For each benched model this script compiles the REAL jitted train step
(the same `Trainer._get_compiled("train")` executable the bench and the
staged runner dispatch), then reports, per model:

  * FLOPs/example and HBM bytes/example from XLA's analytic cost model of
    the optimized HLO (`Compiled.cost_analysis()` — fusion-aware, so
    "bytes accessed" approximates true HBM traffic, not the sum of every
    logical intermediate);
  * achieved FLOP/s and HBM GB/s from measured steady-state examples/s
    (median-of-5 timed windows, honest `float()` fence — see
    docs/REPRODUCING.md §5 for why `block_until_ready` is not enough);
  * MFU (% of the v5e 197 TFLOP/s bf16 peak) and % of the 819 GB/s HBM
    peak, which resource binds, the roofline-implied examples/s ceiling,
    and what % of that ceiling the measured number reaches.

The XLA counts are grounded by `dcn_hand_count`: a from-first-principles
formula for the DCN train step (tower matmul chain fwd+dgrad+wgrad,
cross layers, embedding gathers + scatter-grads, dense Adam update over
every table row, activation traffic). FLOPs are asserted to agree (they
land within 1% — matmuls dominate and both count 2*M*N*K), grounding the
compiler numbers for the architectures where hand-counting every einsum
is error-prone (BST attention, CIN). The hand BYTES formula is a
perfect-fusion LOWER BOUND (each activation written once fwd + read once
bwd); the compiled program's real traffic is higher because every fusion
boundary costs a write+read and f32->bf16 matmul-input casts are copies —
an HLO tally shows e.g. the (8192,512) tower activation crossing ~20
boundaries. Both are reported: `bytes_per_example` (XLA, = what the step
actually moves, the number the %HBM/roofline uses) and
`hand_count.ideal_bytes_per_example` (the un-reachable perfect-fusion
floor).

The reference publishes no throughput/latency numbers anywhere
(/root/reference/README.md — AUC tables only, hardware unspecified), so
this roofline IS the perf bar: "speed of light" for d=16 CTR models is
the bandwidth line, and pct_of_roofline says how close each step runs.

Usage: python scripts/mfu_roofline.py [--models dcn,bst,din,xdeepfm]
       [--batch 8192] [--json_out MFU_r04.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 30
WARMUP = 5
WINDOWS = 5


def dcn_hand_count(schema, cfg, batch_size):
    """First-principles FLOPs + HBM bytes for one DCN train step.

    Counts (per step of B examples):
      matmul chain  — tower [x0 -> 512 -> 256 -> 128] + output dense:
                      fwd 2*B*M*N, bwd dgrad + wgrad each the same again
                      (factor 3 total);
      cross layers  — per layer a (B,D)x(D,) matvec fwd (2BD) with the
                      same 3x fwd+bwd factor, plus O(BD) elementwise;
      embeddings    — gather B*d_f floats per tower field fwd, scatter-add
                      grads bwd (read+write), plus the dense-Adam update
                      touching every row of every table (read p,m,v +
                      write p,m,v = 6 floats/param) — same 6x for tower
                      params;
      activations   — fwd writes + bwd re-reads of the tower activations
                      and x0 (2 passes of 4 bytes each);
      batch input   — one read of the packed example row.
    """
    from rank_tpu.models.base import TOWER_FIELDS

    B = batch_size
    tag_seq = schema.sequence_feature("manual_tag_seq")
    specs, gather_floats = {}, 0
    for f in TOWER_FIELDS:
        cat = schema.categorical_feature(f)
        specs[f] = (cat.vocab_size, cat.emb_dim)
        # multihot tags gather the whole (B, T_tag, d) window then pool
        gather_floats += B * cat.emb_dim * (
            tag_seq.max_len if f == "manual_tag_list" else 1
        )
    emb_dims = {f: specs[f][1] for f in TOWER_FIELDS}
    d0 = schema.num_dense + sum(emb_dims.values())  # dense16 | cat embs

    widths = [d0, *cfg.hidden_units]
    mm_fwd = sum(2 * B * m * n for m, n in zip(widths[:-1], widths[1:]))
    mm_fwd += 2 * B * (d0 + cfg.hidden_units[-1]) * 1  # output dense
    cross_fwd = cfg.num_cross_layers * (2 * B * d0 + 4 * B * d0)
    flops = 3 * (mm_fwd + cross_fwd)

    tower_params = sum(m * n + n for m, n in zip(widths[:-1], widths[1:]))
    tower_params += d0 + cfg.hidden_units[-1] + 1
    tower_params += cfg.num_cross_layers * 2 * d0
    table_params = sum(specs[f][0] * specs[f][1] for f in TOWER_FIELDS)
    flops += 19 * (tower_params + table_params)  # Adam: ~19 flops/param

    acts = B * (sum(cfg.hidden_units) + (cfg.num_cross_layers + 2) * d0)
    gather = 3 * gather_floats  # fwd read + bwd grad read/write
    row_floats = 16 + 7 + 2 * 51 + 7 + 1  # dense|cat|2 seqs+lens|labels|valid
    bytes_ = 4 * (
        3 * mm_fwd / (2 * B)  # param traffic: fwd+bwd+wgrad reads ~ P each
        + 6 * (tower_params + table_params)  # Adam read/write p,m,v
        + 2 * acts
        + gather
        + B * row_floats
    )
    return {"flops": float(flops), "bytes": float(bytes_)}


def run_one(model_name, batch_size):
    import jax

    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer
    from rank_tpu.utils import roofline as R

    cfg = default_config(model_name)
    trainer = Trainer(
        WECHAT_SCHEMA, cfg, TrainConfig(batch_size=batch_size, log_every=0)
    )
    data = make_synthetic_dataset(
        WECHAT_SCHEMA, num_rows=batch_size * 4, seed=0
    )
    batches = []
    for i in range(4):
        b = {k: v[i * batch_size : (i + 1) * batch_size] for k, v in data.items()}
        b["_valid"] = np.ones((batch_size,), np.float32)
        batches.append(trainer._host_to_device(b))

    state = trainer.init_state(batches[0])
    meters = trainer.meters_init()
    step_jit = trainer._get_compiled("train")
    compiled = step_jit.lower(state, meters, batches[0]).compile()
    costs = R.xla_step_costs(compiled)

    mem = None
    try:
        ma = compiled.memory_analysis()
        mem = {
            "argument_gb": round(ma.argument_size_in_bytes / 2**30, 3),
            "temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
        }
    except Exception:
        pass

    step_fn = compiled  # AOT executable: same program the bench dispatches
    for i in range(WARMUP):
        state, meters = step_fn(state, meters, batches[i % 4])
    float(meters["loss"])  # honest fence (REPRODUCING.md §5)
    times = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, meters = step_fn(state, meters, batches[i % 4])
        float(meters["loss"])
        times.append(time.perf_counter() - t0)
    eps = batch_size * STEPS / sorted(times)[len(times) // 2]

    rec = {"model": model_name, "batch": batch_size,
           "examples_per_s": round(eps)}
    if costs is None:
        rec["error"] = "cost_analysis unavailable on this backend"
        return rec
    rec.update(
        R.roofline(costs["flops"] / batch_size, costs["bytes"] / batch_size, eps)
    )
    if mem:
        rec["memory_analysis"] = mem

    if model_name == "dcn":
        hand = dcn_hand_count(WECHAT_SCHEMA, cfg, batch_size)
        rec["hand_count"] = {
            "flops_per_example": round(hand["flops"] / batch_size, 1),
            "ideal_bytes_per_example": round(hand["bytes"] / batch_size, 1),
            "xla_over_hand_flops": round(costs["flops"] / hand["flops"], 3),
            "xla_bytes_over_ideal": round(costs["bytes"] / hand["bytes"], 3),
        }
        ratio = rec["hand_count"]["xla_over_hand_flops"]
        assert 0.8 < ratio < 1.25, (
            f"XLA/hand FLOP count disagree by {ratio}x — cost model untrusted"
        )

    del state, meters, batches, trainer
    jax.clear_caches()
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="dcn,bst,din,xdeepfm")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--json_out", default="MFU_r04.json")
    args = ap.parse_args()

    from rank_tpu.utils import roofline as R

    out = {
        "chip": "TPU v5e (1 chip)",
        "peak_bf16_tflops": R.V5E_PEAK_FLOPS / 1e12,
        "peak_hbm_gbs": R.V5E_PEAK_HBM / 1e9,
        "protocol": (
            f"XLA cost_analysis of the compiled train step; median-of-"
            f"{WINDOWS} windows x {STEPS} steps, float() fence; "
            "shared-tunnel TPU so examples/s varies across runs "
            "(REPRODUCING.md §5)"
        ),
        "models": [],
    }
    for m in args.models.split(","):
        print(f"=== {m} ===", flush=True)
        rec = run_one(m, args.batch)
        print(json.dumps(rec), flush=True)
        out["models"].append(rec)
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
