"""Fused CIN (Compressed Interaction Network) layer Pallas TPU kernel.

The xDeepFM hot op (SURVEY.md §2.2 / §7.7; no reference code exists —
xDeepFM is README-only, ``README.md:26`` — implemented from Lian et al.,
KDD 2018, matching ``rank_tpu.ops.cin.CIN``).

The jnp path computes

    z     = einsum('bhd,bfd->bhfd', xk, x0)      # (B, H, F, D) in HBM
    xnext = einsum('bhfd,ohf->bod',  z,  w)

XLA materialises ``z`` between the two contractions: at the default
xDeepFM config (B=8192, H=O=128, F=7, D=16) that is a 470 MB HBM round
trip per layer per direction — measured 1.34 ms/layer on TPU v5e, i.e.
exactly HBM-bound on ``z``. This kernel never touches HBM with ``z``: per
batch tile it builds the pair matrix in VMEM and issues one MXU matmul.

Layout is the whole game at D=16 (16 of 128 lanes). Two designs lost
before this one (measured, same config): a kernel that builds the
(TB*D, H*F) pair matrix via an in-kernel (TB,HF,D)->(TB*D,HF) transpose
pays a full lane/sublane relayout — 14.7 ms, 11x WORSE than jnp; building
it from (TB,D,F,H) broadcasts still materialises 3 VMEM copies of the
pair tensor — 1.42 ms, still behind jnp. The winning form never builds a
pair matrix at all. In the **transposed (B, D, ·) layout**:

    out[m, o] = sum_f x0[m, f] * (xk[m, :] @ w_all[:, f*O + o]),  m=(b,d)

one MXU matmul with perfect shapes (M = TB*D, K = H, N = F*O) plus F
static lane-slice multiply-accumulates — zero relayouts.

``CIN(backend='pallas')`` keeps the transposed layout across the whole
CIN stack (output (B, D, O) feeds the next layer directly; the final
sum-pool contracts D, so no transposes are ever materialised in HBM).

Backward runs through the jnp reference via ``jax.custom_vjp`` (identical
training numerics; the forward kernel is the serving fast path and the
fwd of training).

Honest benchmark (TPU v5e via tunnel, chained-in-jit median — single
dispatched calls through the shared tunnel are async and cannot be timed
honestly; we chain N=50 layer applications inside one jit and fetch):
B=8192, H=O=128, F=7, D=16: jnp 1.18 ms/layer (HBM-bound on z),
this kernel 0.95 ms/layer f32 at block_b=32 (larger blocks are slower —
less pipeline overlap). bf16 MXU is within noise of f32 here: the layer
is HBM-streaming-bound after fusion, not MXU-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(xk_ref, x0_ref, w_ref, out_ref, *, f: int, o: int, mxu_dtype):
    """One batch tile, transposed layout, factored contraction.

    xk_ref: (TB, D, H); x0_ref: (TB, D, F); w_ref: (H, F*O) with column
    index f*O + o; out_ref: (TB, D, O).

        out[m, o] = sum_f x0[m, f] * (xk[m, :] @ w[:, f*O+o])

    One MXU matmul with perfect shapes (M = TB*D, K = H, N = F*O) followed
    by F static lane-slice multiply-accumulates — no pair matrix, no
    broadcasts, no lane/sublane relayouts (those cost 10x the matmul when
    the earlier zmat formulation materialised (TB, D, F*H) in VMEM).
    """
    xk = xk_ref[:]
    tb, d, h = xk.shape
    m = tb * d
    xk_flat = xk.reshape(m, h)          # free merge of leading dims
    x0_flat = x0_ref[:].reshape(m, f)
    y = jnp.dot(
        xk_flat.astype(mxu_dtype), w_ref[:].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    )  # (M, F*O)
    acc = x0_flat[:, 0:1] * y[:, 0:o]
    for fi in range(1, f):
        acc += x0_flat[:, fi : fi + 1] * y[:, fi * o : (fi + 1) * o]
    out_ref[:] = acc.reshape(tb, d, o)


def _pick_block(h: int, f: int, d: int, o: int) -> int:
    # the (M, F*O) matmul product dominates VMEM; stay well under the
    # 16 MB scoped-vmem limit incl. double-buffered inputs/outputs.
    budget = 8 * 1024 * 1024
    per_row = (2 * f * o * d + (h * d + f * d + o * d)) * 4
    block = budget // max(per_row, 1)
    block = 1 << max(block, 1).bit_length() - 1  # floor pow2
    return max(8, min(256, block))


def _forward_t(xk_t, x0_t, w, block_b: int | None = None, mxu_dtype=jnp.float32):
    """Transposed-layout forward: (B,D,H), (B,D,F), (O,H,F) -> (B,D,O)."""
    b, d, h = xk_t.shape
    f = x0_t.shape[2]
    o = w.shape[0]
    if block_b is None:
        block_b = _pick_block(h, f, d, o)
    bp = _round_up(b, block_b)
    if bp != b:
        xk_t = jnp.pad(xk_t, ((0, bp - b), (0, 0), (0, 0)))
        x0_t = jnp.pad(x0_t, ((0, bp - b), (0, 0), (0, 0)))
    # w (O, H, F) -> w_all (H, F*O): column index f*O + o
    w_all = w.transpose(1, 2, 0).reshape(h, f * o)
    grid = (bp // block_b,)
    out = pl.pallas_call(
        functools.partial(_kernel, f=f, o=o, mxu_dtype=mxu_dtype),
        out_shape=jax.ShapeDtypeStruct((bp, d, o), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, f * o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, d, o), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_INTERPRET,
    )(xk_t, x0_t, w_all)
    return out[:b]


def _reference_t(xk_t, x0_t, w):
    """jnp oracle in the transposed layout (identical math to ops.cin.CIN)."""
    z = jnp.einsum("bdh,bdf->bhfd", xk_t, x0_t)
    return jnp.einsum("bhfd,ohf->bdo", z, w)


@jax.custom_vjp
def cin_layer_fused_t(xk_t, x0_t, w):
    """One CIN layer in transposed (B, D, ·) layout, fused Pallas forward."""
    return _forward_t(xk_t, x0_t, w)


def _fwd(xk_t, x0_t, w):
    return _forward_t(xk_t, x0_t, w), (xk_t, x0_t, w)


def _bwd(residuals, g):
    xk_t, x0_t, w = residuals
    _, vjp = jax.vjp(_reference_t, xk_t, x0_t, w)
    return vjp(g)


cin_layer_fused_t.defvjp(_fwd, _bwd)


# -------------------------------------------------- standard-layout wrappers

def _reference(xk, x0, w):
    """jnp oracle, standard layout — identical math to ops.cin.CIN's body."""
    z = jnp.einsum("bhd,bfd->bhfd", xk, x0)
    return jnp.einsum("bhfd,ohf->bod", z, w)


def cin_layer_fused(xk, x0, w):
    """Standard-layout entry: (B,H,D), (B,F,D), (O,H,F) -> (B,O,D).

    Transposes at the boundary; prefer ``cin_layer_fused_t`` chained across
    layers (as ``CIN(backend='pallas')`` does) to keep transposes out of
    the hot path.
    """
    out_t = cin_layer_fused_t(xk.transpose(0, 2, 1), x0.transpose(0, 2, 1), w)
    return out_t.transpose(0, 2, 1)


def cin_layer_auto_t(xk_t, x0_t, w):
    """Transposed-layout dispatch: fused kernel when the jnp path's HBM
    intermediate (B*H*F*D f32) is big enough to matter; jnp otherwise."""
    b, d, h = xk_t.shape
    f = x0_t.shape[2]
    if b * h * f * d * 4 >= 32 * 1024 * 1024 and h * f >= 128:
        return cin_layer_fused_t(xk_t, x0_t, w)
    return _reference_t(xk_t, x0_t, w)
