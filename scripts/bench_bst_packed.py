"""Measure the packed/lane-dense BST block hypothesis (VERDICT r3 #7).

docs/REPRODUCING.md §5b closed round 3 with one unmeasured lever: the BST
transformer block is lane-padding-bandwidth-bound at d_model=16 (every
(B·T, 16) activation occupies 16 of 128 lanes -> ~8x padded traffic), and
"a packed layout change that de-pads the lanes ... would have to win >30%
on the blocks to clear its layout-conversion costs at the model edges."

This script measures that hypothesis at block level. The lane-dense
candidate is a **d-major layout**: activations carried as (D, T, B)
instead of (B, T, D) —

  * B (8192) in the minor/lane dim: fully dense in 128-lane tiles;
  * T (51) in the sublane dim: pads only 51 -> 56 (~10%);
  * d->d projections become one (16,16) @ (16, T·B) matmul
    (einsum 'de,dtb->etb'): M=16 of 128 MXU rows used, but it is a single
    large-N op, not B·h separate tiny matmuls, so no issue-rate wall;
  * attention scores/context as broadcast-multiply + axis-reduce (the
    same VPU formulation the production block uses), with the (T, S, B)
    score tensor fully lane-dense (vs (B, T, S) padding S 51->128, 2.5x);
  * LayerNorm reductions run over axis 0 (the 16-long major axis).

Identical math + identical flax params (path B consumes path A's param
pytree directly), dropout off, fwd+bwd via value_and_grad, interleaved
A/B/A/B timing windows (tunnel throughput swings are large —
docs/REPRODUCING.md §5), median of repeats, true value-fetch fences.

Three timed paths:
  A  — production `BSTTransformerBlock` (vpu attention, bf16 internals,
       bf16 score storage: the shipping config);
  B  — d-major block, inputs/outputs already (D, T, B) (pure block cost,
       the VERDICT's "no model-edge conversions" comparison);
  B+ — d-major block with (B,T,D) <-> (D,T,B) transposes inside the
       timed region (what a model integration pays at the edges; between
       stacked blocks the d-major layout persists, so per-model cost is
       one entry + one exit conversion, not per-block).

Decision rule (from §5b): B wins >= 30% over A -> integrate behind a
config flag; otherwise record the refutation with the measured number.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_inputs(b, t, d, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, t, d)).astype(np.float32)
    lengths = rng.integers(0, t + 1, size=(b,))
    key_valid = (np.arange(t)[None, :] < lengths[:, None])
    cot = rng.normal(size=(b, t, d)).astype(np.float32)  # fixed cotangent
    return x, key_valid, cot


def dmajor_block(params, x_dtb, key_valid_tb, num_heads, train=False,
                 compute_dtype="bfloat16"):
    """Same math as BSTTransformerBlock (vpu path, bf16 internals, bf16
    score storage), activations in (D, T, B) layout throughout."""
    import jax.numpy as jnp

    f32, bf16 = jnp.float32, jnp.dtype(compute_dtype)
    d, t, bsz = x_dtb.shape
    h = num_heads
    dh = d // h

    pe = params["position_embedding"]["embedding"][:t].T  # (D, T)
    queries = (x_dtb + pe[:, :, None]).astype(bf16)
    values = x_dtb.astype(bf16)

    def dense(name, inp):
        w = params[name]["kernel"].astype(bf16)  # (D_in, D_out)
        bias = params[name]["bias"].astype(bf16)
        return (
            jnp.einsum("de,dtb->etb", w, inp) + bias[:, None, None]
        )

    q = dense("w_q", queries)
    k = dense("w_k", queries)
    v = dense("w_v", values)
    inv_sqrt_dh = jnp.asarray(1.0 / np.sqrt(dh), bf16)

    mask_sb = key_valid_tb[None, :, :]  # (1, S, B) over queries
    neg = jnp.asarray(-1e9, f32)
    ctxs = []
    for hh in range(h):
        sl = slice(hh * dh, (hh + 1) * dh)
        # scores (T, S, B): contraction over d via broadcast-multiply +
        # axis-0 reduce (fused by XLA), lane-dense in B
        sc = jnp.sum(q[sl, :, None, :] * k[sl, None, :, :], axis=0)
        sc = sc * inv_sqrt_dh
        # masked softmax over S (axis 1), f32 reductions, bf16 storage
        scf = jnp.where(mask_sb, sc.astype(f32), neg)
        m = jnp.max(scf, axis=1, keepdims=True)
        e = jnp.exp((scf - m)).astype(bf16)
        e = jnp.where(mask_sb, e, jnp.asarray(0, bf16))
        denom = jnp.sum(e.astype(f32), axis=1, keepdims=True)
        w_att = (e.astype(f32) / jnp.maximum(denom, 1e-9)).astype(bf16)
        # context (dh, T, B): reduce over S
        ctxs.append(jnp.sum(w_att[None, :, :, :] * v[sl, None, :, :], axis=2))
    context = jnp.concatenate(ctxs, axis=0)

    out = dense("w_o", context)

    def layernorm(name, inp_f32):
        mu = jnp.mean(inp_f32, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(inp_f32 - mu), axis=0, keepdims=True)
        nrm = (inp_f32 - mu) * jax_rsqrt(var + 1e-6)
        return (
            nrm * params[name]["scale"][:, None, None]
            + params[name]["bias"][:, None, None]
        )

    h1 = layernorm("norm1", (queries + out).astype(f32)).astype(bf16)
    ffn = dense("ffn_1", h1)
    ffn = jnp.where(ffn >= 0, ffn, 0.01 * ffn)  # leaky_relu
    ffn = dense("ffn_2", ffn)
    return layernorm("norm2", (h1 + ffn).astype(f32))


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--seq", type=int, default=51)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--json_out", default="BSTPACKED_r04.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rank_tpu.ops.transformer import BSTTransformerBlock

    b, t, d, h = args.batch, args.seq, args.dim, args.heads
    x_np, valid_np, cot_np = make_inputs(b, t, d)

    block = BSTTransformerBlock(
        d_model=d, num_heads=h, max_len=t, compute_dtype="bfloat16",
        attn_impl="vpu", score_dtype="bfloat16",
    )
    variables = block.init(
        jax.random.PRNGKey(0), jnp.asarray(x_np), jnp.asarray(valid_np)
    )
    params = variables["params"]

    x = jnp.asarray(x_np)
    valid = jnp.asarray(valid_np)
    cot = jnp.asarray(cot_np)
    x_dtb = jnp.asarray(np.transpose(x_np, (2, 1, 0)).copy())
    valid_tb = jnp.asarray(valid_np.T.copy())
    cot_dtb = jnp.asarray(np.transpose(cot_np, (2, 1, 0)).copy())

    def loss_a(p, xx):
        out = block.apply({"params": p}, xx, valid)
        return jnp.sum(out.astype(jnp.float32) * cot)

    def loss_b(p, xx_dtb):
        out = dmajor_block(p, xx_dtb, valid_tb, h)
        return jnp.sum(out.astype(jnp.float32) * cot_dtb)

    def loss_b_edges(p, xx_btd):
        out = dmajor_block(p, xx_btd.transpose(2, 1, 0), valid_tb, h)
        return jnp.sum(out.transpose(2, 1, 0).astype(jnp.float32) * cot)

    def fwd_bwd(loss_fn):
        def step(p, xx):
            val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(p, xx)
            gsum = sum(
                jnp.sum(g.astype(jnp.float32))
                for g in jax.tree_util.tree_leaves(grads)
            )
            return val + gsum  # one scalar fences the whole backward

        return jax.jit(step)

    step_a = fwd_bwd(loss_a)
    step_b = fwd_bwd(loss_b)
    step_be = fwd_bwd(loss_b_edges)

    # numerical parity gate: run BOTH paths in f32 with the same params —
    # in f32 they agree to ~1e-5 (identical math); comparing the bf16
    # paths directly only measures benign op-order rounding (and w_k
    # bias's true-zero gradient — softmax is invariant to the
    # s-independent q·b_k score shift — which makes relative comparison
    # noise-over-noise).
    block32 = BSTTransformerBlock(
        d_model=d, num_heads=h, max_len=t, compute_dtype="float32",
        attn_impl="vpu", score_dtype="float32",
    )
    # TPU lowers f32 matmuls to bf16-input MXU passes by default
    # (docs/REPRODUCING.md §5); force true-f32 passes for the parity gate
    # so the tight tolerance holds on every platform
    with jax.default_matmul_precision("highest"):
        out_a = np.asarray(
            jax.jit(lambda p, xx: block32.apply({"params": p}, xx, valid))(
                params, x
            )
        )
        out_b = np.asarray(
            jax.jit(
                lambda p, xx: dmajor_block(
                    p, xx, valid_tb, h, compute_dtype="float32"
                )
            )(params, x_dtb)
        )
    out_b = np.transpose(out_b, (2, 1, 0))
    scale_out = float(np.max(np.abs(out_a)))
    rel_b = float(np.max(np.abs(out_a - out_b))) / max(scale_out, 1e-9)
    print(f"f32 forward parity: rel max-abs diff {rel_b:.2e}")
    assert rel_b < 1e-4, "paths diverge — not the same math"

    def loss_a32(p, xx):
        return jnp.sum(block32.apply({"params": p}, xx, valid) * cot)

    def loss_b32(p, xx):
        return jnp.sum(
            dmajor_block(p, xx, valid_tb, h, compute_dtype="float32") * cot_dtb
        )

    with jax.default_matmul_precision("highest"):
        ga = jax.tree_util.tree_leaves(
            jax.jit(jax.grad(loss_a32))(params, x)
        )
        gb = jax.tree_util.tree_leaves(
            jax.jit(jax.grad(loss_b32))(params, x_dtb)
        )
    gmax = max(float(np.max(np.abs(np.asarray(l)))) for l in ga)
    rel_g = max(
        float(np.max(np.abs(np.asarray(la) - np.asarray(lb)))) / gmax
        for la, lb in zip(ga, gb)
    )
    print(f"f32 param-grad parity: worst diff / global grad scale {rel_g:.2e}")
    assert rel_g < 1e-4, "param grads diverge — not the same math"
    rel_be = rel_b  # B+ is B with transposes; forward math identical

    paths = {"A_production_btd": (step_a, x),
             "B_dmajor_dtb": (step_b, x_dtb),
             "B_dmajor_with_edge_transposes": (step_be, x)}
    times = {k: [] for k in paths}
    for r in range(args.rounds):  # interleaved A/B/A/B
        for name, (fn, xx) in paths.items():
            float(fn(params, xx))  # warm + fence
            t0 = time.perf_counter()
            acc = None
            for _ in range(args.steps):
                acc = fn(params, xx)
            float(acc)
            times[name].append((time.perf_counter() - t0) / args.steps)

    rec = {"batch": b, "seq": t, "d_model": d, "heads": h,
           "steps": args.steps, "rounds": args.rounds,
           "parity_rel": {"B": rel_b, "B_edges": rel_be}}
    med = {}
    for name, ts in times.items():
        ts = sorted(ts)
        med[name] = ts[len(ts) // 2]
        rec[name] = {"median_ms": round(med[name] * 1e3, 3),
                     "all_ms": [round(v * 1e3, 3) for v in ts]}
    speed = med["A_production_btd"] / med["B_dmajor_dtb"]
    speed_e = med["A_production_btd"] / med["B_dmajor_with_edge_transposes"]
    rec["dmajor_speedup_block"] = round(speed, 3)
    rec["dmajor_speedup_with_edges"] = round(speed_e, 3)
    rec["verdict"] = (
        "integrate (>=1.30x on the block)" if speed >= 1.30
        else f"refuted: {speed:.2f}x < 1.30x threshold (REPRODUCING §5b)"
    )
    print(json.dumps(rec, indent=1))
    with open(args.json_out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
