"""Interleaved A/B of BST transformer-block formulations on the real TPU.

Measures fwd+bwd wall time per block application for layout variants of the
attention math (docs/REPRODUCING.md §5 methodology: interleaved rounds in the
same time window, every timed window ends with a true host value fetch).

Variants:
  base      — current BSTTransformerBlock math (explicit head transposes,
              f32 scores/softmax).
  noxpose   — head split expressed inside the einsums ('bqhd,bkhd->bhqk');
              no transpose(0,2,1,3) materialization of (B,h,T,dh) tensors.
  bf16sm    — noxpose + softmax computed with f32 max/sum reductions but
              bf16 score/weight storage.
  mergedqkv — bf16sm + one fused d->3d QKV projection.

Run: python scripts/bench_bst_variants.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, D, H = 8192, 51, 16, 2
DH = D // H
NEG = -1e9


def softmax_masked_f32(scores, mask):
    scores = jnp.where(mask, scores.astype(jnp.float32), NEG)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m) * mask
    s = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(s, 1e-9)


def softmax_masked_bf16(scores, mask):
    # f32 reductions, bf16 storage of the weights tensor
    s32 = jnp.where(mask, scores.astype(jnp.float32), NEG)
    m = jnp.max(s32, axis=-1, keepdims=True)
    e = jnp.exp(s32 - m) * mask
    s = jnp.sum(e, axis=-1, keepdims=True)
    return (e / jnp.maximum(s, 1e-9)).astype(jnp.bfloat16)


def make_params(key):
    ks = jax.random.split(key, 8)
    g = lambda k, *s: (jax.random.normal(k, s, jnp.float32) * 0.05)
    return {
        "wq": g(ks[0], D, D), "wk": g(ks[1], D, D), "wv": g(ks[2], D, D),
        "wo": g(ks[3], D, D), "w1": g(ks[4], D, D), "w2": g(ks[5], D, D),
        "pe": g(ks[6], T, D),
    }


def _ln(x):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6)


def block(params, x, key_valid, variant):
    cdt = jnp.bfloat16
    q_in = (x + params["pe"][None]).astype(cdt)
    v_in = x.astype(cdt)
    mask = key_valid[:, None, None, :]

    if variant == "mergedqkv":
        wqkv = jnp.concatenate([params["wq"], params["wk"], params["wv"]], 1)
        qkv = q_in @ wqkv.astype(cdt)  # (B,T,3D); V uses q_in — layout probe only
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = q_in @ params["wq"].astype(cdt)
        k = q_in @ params["wk"].astype(cdt)
        v = v_in @ params["wv"].astype(cdt)

    if variant == "base":
        q4 = q.reshape(B, T, H, DH).transpose(0, 2, 1, 3)
        k4 = k.reshape(B, T, H, DH).transpose(0, 2, 1, 3)
        v4 = v.reshape(B, T, H, DH).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q4, k4) / np.sqrt(DH)
        w = softmax_masked_f32(scores, jnp.broadcast_to(mask, scores.shape))
        ctx = jnp.einsum("bhqk,bhkd->bhqd", w.astype(cdt), v4)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
    elif variant in ("vpu", "vpu16"):
        # no tiny batched matmuls: scores/context as broadcast-mul + reduce
        # (VPU), per head; heads are a python loop (H=2).
        ctxs = []
        for hh in range(H):
            qh = q[..., hh * DH : (hh + 1) * DH]
            kh = k[..., hh * DH : (hh + 1) * DH]
            vh = v[..., hh * DH : (hh + 1) * DH]
            sc = jnp.sum(qh[:, :, None, :] * kh[:, None, :, :], -1) / np.sqrt(DH)
            if variant == "vpu16":
                sc = sc.astype(cdt)  # bf16 score storage, f32 softmax reductions
            w = softmax_masked_bf16(sc, jnp.broadcast_to(key_valid[:, None, :], sc.shape))
            ctxs.append(jnp.sum(w[..., None] * vh[:, None, :, :], axis=2))
        ctx = jnp.concatenate(ctxs, axis=-1)
    else:
        q4 = q.reshape(B, T, H, DH)
        k4 = k.reshape(B, T, H, DH)
        v4 = v.reshape(B, T, H, DH)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q4, k4) / np.sqrt(DH)
        sm = softmax_masked_f32 if variant == "noxpose" else softmax_masked_bf16
        w = sm(scores, jnp.broadcast_to(mask, scores.shape))
        ctx = jnp.einsum("bhqk,bkhd->bqhd", w.astype(cdt), v4).reshape(B, T, D)

    out = ctx @ params["wo"].astype(cdt)
    h1 = _ln((q_in + out).astype(jnp.float32)).astype(cdt)
    f = jax.nn.leaky_relu(h1 @ params["w1"].astype(cdt), 0.01)
    f = f @ params["w2"].astype(cdt)
    return _ln((h1 + f).astype(jnp.float32))


def make_step(variant):
    def loss_fn(params, x, key_valid):
        y = block(params, x, key_valid, variant)
        return jnp.sum(y * y) * 1e-6

    @jax.jit
    def step(params, x, key_valid):
        l, g = jax.value_and_grad(loss_fn)(params, x, key_valid)
        # one scalar touching every grad leaf: backward not DCE-able, and a
        # single host fetch fences the step (tunnel fetches cost ~3 ms each)
        return l + sum(jnp.sum(a) for a in jax.tree.leaves(g))

    return step


def main():
    key = jax.random.PRNGKey(0)
    params = make_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.float32)
    lens = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, T + 1)
    key_valid = (jnp.arange(T)[None] < lens[:, None])

    variants = ["base", "vpu", "vpu16"]
    steps = {v: make_step(v) for v in variants}
    # compile + warm
    for v in variants:
        float(steps[v](params, x, key_valid))

    times = {v: [] for v in variants}
    N = 8
    for _ in range(5):  # interleaved rounds
        for v in variants:
            t0 = time.perf_counter()
            for _ in range(N):
                out = steps[v](params, x, key_valid)
            float(out)  # true fence
            times[v].append((time.perf_counter() - t0) / N * 1e3)

    for v in variants:
        med = float(np.median(times[v]))
        print(f"{v:10s} {med:7.2f} ms/blockstep  rounds={['%.2f' % t for t in times[v]]}")
    # numerics cross-check (loss deltas)
    losses = {v: float(steps[v](params, x, key_valid)) for v in variants}
    print("losses:", losses)


def isolate():
    """Component isolation: fwd-only vs fwd+bwd; no-attention ablation."""
    key = jax.random.PRNGKey(0)
    params = make_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.float32)
    lens = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, T + 1)
    key_valid = (jnp.arange(T)[None] < lens[:, None])

    def block_noattn(params, x, key_valid):
        cdt = jnp.bfloat16
        q_in = (x + params["pe"][None]).astype(cdt)
        ctx = q_in @ params["wv"].astype(cdt)  # stand-in for attention output
        out = ctx @ params["wo"].astype(cdt)
        h1 = _ln((q_in + out).astype(jnp.float32)).astype(cdt)
        f = jax.nn.leaky_relu(h1 @ params["w1"].astype(cdt), 0.01)
        f = f @ params["w2"].astype(cdt)
        return _ln((h1 + f).astype(jnp.float32))

    def attn_only(params, x, key_valid):
        cdt = jnp.bfloat16
        q_in = (x + params["pe"][None]).astype(cdt)
        q = (q_in @ params["wq"].astype(cdt)).reshape(B, T, H, DH)
        k = (q_in @ params["wk"].astype(cdt)).reshape(B, T, H, DH)
        v = (x.astype(cdt) @ params["wv"].astype(cdt)).reshape(B, T, H, DH)
        mask = key_valid[:, None, None, :]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(DH)
        w = softmax_masked_f32(scores, jnp.broadcast_to(mask, scores.shape))
        return jnp.einsum("bhqk,bkhd->bqhd", w.astype(cdt), v).reshape(B, T, D)

    def timed(fn, grad):
        def loss(p):
            y = fn(p, x, key_valid)
            return jnp.sum((y * y).astype(jnp.float32)) * 1e-6

        if grad:
            # ONE returned scalar that depends on every grad leaf: no DCE of
            # the backward, and exactly one host fetch (each fetch through
            # the tunnel costs ~3 ms and would otherwise dominate).
            @jax.jit
            def f(p):
                l, g = jax.value_and_grad(loss)(p)
                return l + sum(jnp.sum(a) for a in jax.tree.leaves(g))
        else:
            f = jax.jit(loss)
        float(f(params))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(8):
                out = f(params)
            float(out)
            ts.append((time.perf_counter() - t0) / 8 * 1e3)
        return float(np.median(ts))

    full = lambda p, x, kv: block(p, x, kv, "noxpose")
    for name, fn in [("full", full), ("noattn", block_noattn), ("attnonly", attn_only)]:
        print(f"{name:9s} fwd={timed(fn, False):6.2f} ms   fwd+bwd={timed(fn, True):6.2f} ms")


if __name__ == "__main__":
    import sys

    if sys.argv[-1] == "isolate":
        isolate()
    else:
        main()
