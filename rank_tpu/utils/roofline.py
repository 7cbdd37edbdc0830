"""Roofline/MFU accounting for train steps (VERDICT r3 #1).

Converts a measured examples/s into achieved FLOP/s and HBM GB/s against
the chip peaks, so "at hardware ceilings" claims are checkable numbers:

  * FLOPs/example and HBM bytes/example come from XLA's own cost model of
    the COMPILED program (``Compiled.cost_analysis()`` — an analytic count
    over the optimized HLO, not a measurement; fusion-aware, so "bytes
    accessed" approximates true HBM traffic rather than summing every
    intermediate).
  * For DCN the XLA count is cross-checked against a from-first-principles
    hand formula (Dense-tower matmul chain + embedding gathers,
    ``dcn_hand_count``) in scripts/mfu_roofline.py; FLOPs agree within 1%,
    grounding the compiler numbers for the architectures where
    hand-counting every einsum would be error-prone (BST attention, CIN).
    The hand bytes formula is a perfect-fusion lower bound; the XLA count
    is the compiled program's actual fusion-boundary traffic and is the
    one the roofline uses (see scripts/mfu_roofline.py docstring).

Peaks are TPU v5e (the bench chip): 197 TFLOP/s bf16 MXU, 819 GB/s HBM
(public v5e spec; the platform already runs bf16-input MXU passes for f32
matmuls here, docs/REPRODUCING.md §5). MFU = achieved FLOP/s / bf16 peak.

CTR rank models are overwhelmingly HBM-bound at these dims (d=16
embeddings, 34-66-wide towers): expect single-digit MFU with high %HBM —
the roofline bound is the bandwidth line, and "speed of light" for these
models means saturating it.
"""

from __future__ import annotations

from typing import Dict, Optional

V5E_PEAK_FLOPS = 197e12  # bf16 FLOP/s (MXU)
V5E_PEAK_HBM = 819e9     # bytes/s
V5E_HBM_BYTES = 16 * 2**30


def xla_step_costs(compiled) -> Optional[Dict[str, float]]:
    """FLOPs + bytes-accessed of a compiled step from XLA's cost model.
    Returns None if the backend does not expose cost_analysis."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0] if ca else None
    if not ca:
        return None
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    if flops <= 0:
        return None
    return {"flops": flops, "bytes": byts}


def roofline(
    flops_per_example: float,
    bytes_per_example: float,
    examples_per_s: float,
) -> Dict[str, float]:
    """Achieved rates vs v5e peaks + the roofline-implied ceiling."""
    ach_flops = flops_per_example * examples_per_s
    ach_bw = bytes_per_example * examples_per_s
    mfu = ach_flops / V5E_PEAK_FLOPS
    hbm = ach_bw / V5E_PEAK_HBM
    # the roofline ceiling: the examples/s at which the binding resource
    # saturates (no overlap slack assumed)
    t_flops = flops_per_example / V5E_PEAK_FLOPS
    t_bw = bytes_per_example / V5E_PEAK_HBM
    ceiling = 1.0 / max(t_flops, t_bw) if max(t_flops, t_bw) > 0 else 0.0
    return {
        "flops_per_example": round(flops_per_example, 1),
        "bytes_per_example": round(bytes_per_example, 1),
        "achieved_tflops": round(ach_flops / 1e12, 3),
        "achieved_hbm_gbs": round(ach_bw / 1e9, 1),
        "mfu_pct": round(100 * mfu, 2),
        "hbm_bw_pct": round(100 * hbm, 1),
        "bound": "hbm" if t_bw >= t_flops else "mxu",
        "roofline_ceiling_ex_s": round(ceiling),
        "pct_of_roofline": round(100 * examples_per_s / ceiling, 1)
        if ceiling
        else None,
    }
