"""Per-fusion HBM byte attribution of the compiled train step (VERDICT r4 #1).

Round 4's roofline (`MFU_r04.json`) took XLA's `cost_analysis()` "bytes
accessed" as the step's HBM traffic; that number sat 15x above the
hand-counted ideal for DCN (197,658 vs 13,213 B/example), undecomposed.
This script decomposes it and settles where the bytes actually go, three
ways:

1. **Entry-HLO buffer walk** (`attribute_bytes`): parse the optimized
   HLO's ENTRY computation and, for every materialised instruction, count
   real buffer traffic = output bytes + operand-buffer bytes (with
   gather/dynamic-slice/scatter counted at touched-rows size, async
   copy pairs once, and bitcast/tuple plumbing free). This is what the
   step can actually move through HBM, grouped per source op via HLO
   metadata.
2. **Cost-model audit** (`toy_fusion_overcount`): a one-fusion toy
   (matmul + chained elementwise) shows `cost_analysis()` counts bytes
   for every op INSIDE a fusion — each fused elementwise adds its full
   tensor size to "bytes accessed" even though it lives in registers.
   The 15x gap is this accounting, compounded over the tower's deep
   fused chains, not hidden traffic.
3. **Measured-bandwidth calibration** (`copy_bandwidth_gbs`): a jitted
   donated HBM copy of known size gives the achievable GB/s on THIS
   chip through the tunnel, so roofline %s can rest on hardware.

With the real traffic number, the step's binding resource is re-derived:
bandwidth floor = real_bytes / measured_GB/s, compute floor =
flops / peak, and an op-issue floor = n_entry_instructions x per-op
overhead fitted from step time vs batch size (`--fit_issue`). For DCN at
B=8192 the real traffic (~20 KB/example) implies an HBM floor ~40x below
the measured step time — the step is issue/latency-bound, not HBM-bound,
which rewrites round 4's "69% of roofline" story and points the
optimisation at instruction count and batch size, not bytes.

Usage: python scripts/bytes_breakdown.py [--models dcn,bst]
       [--batch 8192] [--json_out BYTES_r05.json] [--fit_issue]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rank_tpu.utils.hlo_bytes import (  # noqa: E402
    attribute_bytes, bucket, grouped,
)


def toy_fusion_overcount():
    """cost_analysis vs ideal bytes on a single fused matmul+elementwise
    chain — the cost model counts fusion-internal tensors (docstring #2)."""
    import jax
    import jax.numpy as jnp

    B, D, H = 8192, 512, 512

    def f(x, w, b):
        h = jnp.maximum(x @ w + b, 0.0)
        h = jnp.maximum(h * 2.0 + 1.0, 0.5)
        return h

    c = jax.jit(f).lower(
        jnp.zeros((B, D)), jnp.zeros((D, H)), jnp.zeros((H,))
    ).compile()
    ca = c.cost_analysis()
    ideal = (B * D + D * H + H + B * H) * 4
    return {
        "cost_analysis_bytes": float(ca.get("bytes accessed", 0)),
        "ideal_operand_output_bytes": ideal,
        "overcount_ratio": round(ca.get("bytes accessed", 0) / ideal, 3),
        "note": "one fused matmul + 4 fused elementwise ops; every fused "
                "op adds its full tensor size to 'bytes accessed'",
    }


def copy_bandwidth_gbs(nbytes=2**30, inner=24, reps=5):
    """Measured achievable HBM bandwidth: ONE jitted program running
    `inner` sequential full-buffer bumps via lax.fori_loop (device-side
    loop — a naive one-dispatch-per-copy version measures the ~29 ms
    tunnel dispatch+fence floor, not the chip: it reads ~82 GB/s).
    Each bump reads + writes the buffer: 2*nbytes*inner per invocation."""
    import jax
    import jax.numpy as jnp

    n = nbytes // 4

    @jax.jit
    def bump_n(x):
        return jax.lax.fori_loop(0, inner, lambda i, v: v + 1.0, x)

    x = jnp.zeros((n,), jnp.float32)
    x = bump_n(x)  # warmup/compile
    float(x[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x = bump_n(x)
        float(x[0])  # real fetch fence (REPRODUCING.md §5)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return round(2 * nbytes * inner / dt / 1e9, 1)


def analyze_model(model_name, batch_size, time_step=True, fit_issue=False):
    import jax

    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer

    def build(bs):
        cfg = default_config(model_name)
        trainer = Trainer(
            WECHAT_SCHEMA, cfg, TrainConfig(batch_size=bs, log_every=0)
        )
        data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=bs, seed=0)
        b = {k: v[:bs] for k, v in data.items()}
        b["_valid"] = np.ones((bs,), np.float32)
        b = trainer._host_to_device(b)
        state = trainer.init_state(b)
        meters = trainer.meters_init()
        compiled = trainer._get_compiled("train").lower(
            state, meters, b
        ).compile()
        return trainer, compiled, state, meters, b

    trainer, compiled, state, meters, b = build(batch_size)
    rows = attribute_bytes(compiled.as_text(), index_len=batch_size)
    real_bytes = sum(r[0] for r in rows)
    ca = compiled.cost_analysis()
    xla_bytes = float(ca.get("bytes accessed", 0))
    flops = float(ca.get("flops", 0))

    top_groups = [
        {"group": k, "mb_per_step": round(v / 2**20, 2),
         "bytes_per_example": round(v / batch_size, 1)}
        for k, v in grouped(rows)
    ]
    top_instrs = [
        {"bytes_mb": round(bts / 2**20, 2), "opcode": opcode,
         "op_name": op_name[-100:]}
        for bts, opcode, name, op_name, _ in
        sorted(rows, reverse=True)[:10]
    ]

    rec = {
        "model": model_name,
        "batch": batch_size,
        "entry_instructions": len(rows),
        "real_bytes_per_example": round(real_bytes / batch_size, 1),
        "xla_cost_model_bytes_per_example": round(xla_bytes / batch_size, 1),
        "xla_overcount_ratio": round(xla_bytes / max(real_bytes, 1), 2),
        "flops_per_example": round(flops / batch_size, 1),
        "groups": top_groups,
        "top_instructions": top_instrs,
    }

    if time_step:
        for _ in range(5):
            state, meters = compiled(state, meters, b)
        float(meters["loss"])
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(30):
                state, meters = compiled(state, meters, b)
            float(meters["loss"])
            times.append((time.perf_counter() - t0) / 30)
        dt = sorted(times)[len(times) // 2]
        rec["step_ms"] = round(dt * 1e3, 3)
        rec["examples_per_s"] = round(batch_size / dt)

    if fit_issue:
        # affine fit t(B) = a + b*B over batch sizes: 'a' is the
        # batch-independent issue/dispatch floor of this program shape
        del trainer, compiled, state, meters, b
        jax.clear_caches()
        pts = []
        for bs in (1024, 4096, 16384, 65536):
            tr, comp, st, mt, bb = build(bs)
            for _ in range(3):
                st, mt = comp(st, mt, bb)
            float(mt["loss"])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(20):
                    st, mt = comp(st, mt, bb)
                float(mt["loss"])
                ts.append((time.perf_counter() - t0) / 20)
            pts.append((bs, sorted(ts)[1]))
            del tr, comp, st, mt, bb
            jax.clear_caches()
        A = np.array([[1.0, bs] for bs, _ in pts])
        y = np.array([t for _, t in pts])
        (a, slope), *_ = np.linalg.lstsq(A, y, rcond=None)
        rec["issue_fit"] = {
            "points_ms": [[bs, round(t * 1e3, 3)] for bs, t in pts],
            "fixed_overhead_ms": round(float(a) * 1e3, 3),
            "marginal_us_per_1k_examples": round(float(slope) * 1e9, 2),
        }
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="dcn,bst")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--json_out", default="BYTES_r05.json")
    ap.add_argument("--fit_issue", action="store_true")
    ap.add_argument("--no_time", action="store_true")
    args = ap.parse_args()

    out = {
        "protocol": "entry-HLO buffer walk vs cost_analysis vs measured "
                    "copy bandwidth; see module docstring",
        "toy_fusion_overcount": toy_fusion_overcount(),
        "measured_copy_bandwidth_gbs": copy_bandwidth_gbs(),
        "v5e_peak_hbm_gbs": 819.0,
        "models": [],
    }
    print(json.dumps({k: v for k, v in out.items() if k != "models"},
                     indent=1), flush=True)
    for m in args.models.split(","):
        print(f"=== {m} ===", flush=True)
        rec = analyze_model(m, args.batch, time_step=not args.no_time,
                            fit_issue=args.fit_issue)
        print(json.dumps(rec, indent=1), flush=True)
        out["models"].append(rec)
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
