"""Fused DIN attention Pallas TPU kernel.

The hot op of the DIN model (SURVEY.md section 2.2: (B,T,4d)
cross-features -> MLP(4d->64->32->1) -> masked (softmax) scores ->
weighted pool; reference ``algorithm/DIN/din_attention.py:5-51``).

The jnp reference implementation materialises the (B,T,4d) cross tensor
and two MLP activations in HBM between XLA fusions; this kernel keeps the
whole per-tile computation (cross-feature construction, 3 matmuls, mask,
softmax, pooling) in VMEM, one batch tile per grid step.

Backward runs through the jnp reference via ``jax.custom_vjp`` (the
recompute is cheap at T<=64 and keeps training numerics identical);
the kernel is the serving/eval fast path and the forward of training.

T is padded to a multiple of 8 sublanes on the host side; padded keys are
masked out by the existing length mask.

Honest benchmark (TPU v5e, batch 8192, T=50; scripts/bench_din_dims.py,
interleaved A/B, round 2): the XLA-fused jnp path wins at EVERY measured
dim, both forms. Forward-only (the kernel's intended serving role):
D=16 jnp 1.66 ms vs kernel 3.06 ms (0.54x); D=64 2.13 vs 3.10 (0.69x);
D=128 2.81 vs 3.46 (0.81x). Training fwd+bwd: 0.69-0.74x at D>=64. The
earlier hypothesis that the kernel becomes profitable at larger D is
REFUTED — the gap narrows with D but never crosses 1 up to D=128, so
``DINAttention(backend='auto')`` always selects jnp. The kernel is kept
as a correct, interpret-mode-tested Pallas pattern (fused cross-feature
+ 3-matmul + masked-softmax pooling in one VMEM pass), not as a
dispatched fast path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_NEG = -(2.0**32) + 1.0

_INTERPRET = False  # flipped by tests on CPU


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    q_ref, k_ref, len_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    out_ref, *, t: int, use_softmax: bool, mxu_dtype
):
    q = q_ref[:]              # (TB, D)
    k = k_ref[:]              # (TB, T, D)
    tb, _, d = k.shape
    # w1 acts on [q, k, q-k, q*k]; split its row blocks so the concat is
    # algebraic instead of materialised:
    #   cross @ w1 = q@(w1a+w1c) + k@(w1b-w1c) + (q*k)@w1d
    w1 = w1_ref[:]
    w1a, w1b, w1c, w1d_ = (
        w1[0:d], w1[d : 2 * d], w1[2 * d : 3 * d], w1[3 * d : 4 * d]
    )

    def mm(a, b):
        return jnp.dot(
            a.astype(mxu_dtype), b.astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )

    q_part = mm(q, w1a + w1c)  # (TB, H1), reused for every timestep
    kf = k.reshape(tb * t, d)
    prod = (jnp.broadcast_to(q[:, None, :], k.shape) * k).reshape(tb * t, d)
    h = mm(kf, w1b - w1c) + mm(prod, w1d_)
    h = h.reshape(tb, t, -1) + q_part[:, None, :] + b1_ref[0, :]
    h = jnp.maximum(h, 0.0).reshape(tb * t, -1)
    h = jnp.maximum(mm(h, w2_ref[:]) + b2_ref[0, :], 0.0)  # (TB*T, H2)
    # final (H2 -> 1) projection on the VPU (1-lane MXU output is wasteful)
    scores = (
        jnp.sum(h * w3_ref[:][:, 0][None, :], axis=-1) + b3_ref[0, 0]
    ).reshape(tb, t)
    pos = jax.lax.broadcasted_iota(jnp.int32, (tb, t), 1)
    mask = pos < len_ref[:]  # len_ref is (TB, 1), broadcasts over T
    if use_softmax:
        s = jnp.where(mask, scores, MASK_NEG) / jnp.sqrt(jnp.float32(d))
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m) * mask.astype(jnp.float32)
        w = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-12)
    else:
        w = jnp.where(mask, scores, 0.0)
    out_ref[:] = jnp.sum(w[:, :, None] * k, axis=1)  # (TB, D) weighted pool


def _forward(
    query, keys, lengths, params, use_softmax: bool,
    block_b: int = 128, mxu_dtype=jnp.float32,
):
    w1, b1, w2, b2, w3, b3 = params
    b, t, d = keys.shape
    tp = _round_up(t, 8)
    if tp != t:
        keys = jnp.pad(keys, ((0, 0), (0, tp - t), (0, 0)))
    bp = _round_up(b, block_b)
    if bp != b:
        query = jnp.pad(query, ((0, bp - b), (0, 0)))
        keys = jnp.pad(keys, ((0, bp - b), (0, 0), (0, 0)))
        lengths = jnp.pad(lengths, (0, bp - b))
    lengths2d = lengths.astype(jnp.int32)[:, None]  # 2-D for TPU layouts
    b1r, b2r, b3r = b1[None, :], b2[None, :], b3[None, :]
    grid = (bp // block_b,)
    out = pl.pallas_call(
        functools.partial(
            _kernel, t=tp, use_softmax=use_softmax, mxu_dtype=mxu_dtype
        ),
        out_shape=jax.ShapeDtypeStruct((bp, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * d, w1.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w1.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w3.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(query, keys, lengths2d, w1, b1r, w2, b2r, w3, b3r)
    return out[:b]


def _reference(query, keys, lengths, params, use_softmax: bool):
    """jnp oracle, identical math to ops.attention.DINAttention."""
    w1, b1, w2, b2, w3, b3 = params
    b, t, d = keys.shape
    qb = jnp.broadcast_to(query[:, None, :], keys.shape)
    cross = jnp.concatenate([qb, keys, qb - keys, qb * keys], axis=-1)
    h = jax.nn.relu(cross @ w1 + b1)
    h = jax.nn.relu(h @ w2 + b2)
    scores = (h @ w3 + b3)[..., 0]
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    if use_softmax:
        s = jnp.where(mask, scores, MASK_NEG) / jnp.sqrt(jnp.float32(d))
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m) * mask.astype(jnp.float32)
        w = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-12)
    else:
        w = jnp.where(mask, scores, 0.0)
    return jnp.einsum("bt,btd->bd", w, keys)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def din_attention_fused(query, keys, lengths, params, use_softmax: bool):
    return _forward(query, keys, lengths, params, use_softmax)


def _fwd(query, keys, lengths, params, use_softmax):
    out = _forward(query, keys, lengths, params, use_softmax)
    return out, (query, keys, lengths, params)


def _bwd(use_softmax, residuals, g):
    query, keys, lengths, params = residuals
    _, vjp = jax.vjp(
        lambda q, k, p: _reference(q, k, lengths, p, use_softmax),
        query, keys, params,
    )
    dq, dk, dp = vjp(g)
    return dq, dk, None, dp


din_attention_fused.defvjp(_fwd, _bwd)
