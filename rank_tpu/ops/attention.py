"""Target attention over behaviour sequences (DIN / DIEN forms).

Parity targets:
  * DIN attention — ``algorithm/DIN/din_attention.py:5-51`` (inline copy
    ``din.py:42-84``): cross-features [q, k, q-k, q*k] -> MLP(4d->64->32->1)
    scores; mask by sequence length; either scaled masked softmax
    (``use_softmax``) or raw masked scores; weighted-sum pool over keys.
    The reference re-creates the attention MLP inside every forward call
    (``din.py:61-67``) so it is never trained; here it is a registered
    submodule, per the paper.
  * DIEN bilinear attention — ``algorithm/DIEN/dien.py:205-218``:
    scores = h . (W . e_target), masked softmax.

Zero-length sequences (tested by the reference's own smoke test,
``din_attention.py:60``) yield an all-zero pooled vector in both paths.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

MASK_NEG = -(2.0**32) + 1.0  # reference padding value, din.py:74


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, T) boolean validity mask."""
    t = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return t < lengths[:, None]


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Numerically-safe softmax that returns zeros where every position is
    masked (rather than NaN, which torch's all(-inf) softmax produces)."""
    neg = jnp.asarray(MASK_NEG, scores.dtype)
    masked = jnp.where(mask, scores, neg)
    m = jnp.max(masked, axis=axis, keepdims=True)
    e = jnp.exp(masked - m) * mask.astype(scores.dtype)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-12)


def masked_softmax_lowp(
    scores: jnp.ndarray, mask: jnp.ndarray, axis: int = -1
) -> jnp.ndarray:
    """masked_softmax with LOW-PRECISION (T,T)-sized storage: every tensor
    with the scores' full shape stays in the scores' dtype (bf16), only
    the exp argument and the normalising sum run through f32 — those casts
    are elementwise/reduction steps XLA keeps in registers, so the HBM
    score-side traffic halves vs a f32 softmax. bf16 shares f32's exponent
    range, so the MASK_NEG sentinel and max-subtraction are safe."""
    neg = jnp.asarray(MASK_NEG, scores.dtype)
    masked = jnp.where(mask, scores, neg)
    m = jnp.max(masked, axis=axis, keepdims=True)
    e = (
        jnp.exp((masked - m).astype(jnp.float32))
        * mask.astype(jnp.float32)
    ).astype(scores.dtype)
    denom = jnp.sum(e.astype(jnp.float32), axis=axis, keepdims=True)
    inv = jnp.reciprocal(jnp.maximum(denom, 1e-12)).astype(scores.dtype)
    return e * inv


def softmax_lowp(scores: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Unmasked variant of masked_softmax_lowp — same storage/precision
    contract (score-dtype storage, f32 exp argument and normalising sum);
    shared by the AutoInt interacting layer."""
    m = jnp.max(scores, axis=axis, keepdims=True)
    e = jnp.exp((scores - m).astype(jnp.float32)).astype(scores.dtype)
    denom = jnp.sum(e.astype(jnp.float32), axis=axis, keepdims=True)
    return e * jnp.reciprocal(jnp.maximum(denom, 1e-12)).astype(scores.dtype)


class DINAttention(nn.Module):
    """DIN local-activation unit with a registered scoring MLP.

    backend: 'jnp' (pure XLA), 'pallas' (fused TPU kernel,
    ops/pallas/din_attention.py), or 'auto' (pallas on TPU, jnp elsewhere).
    Both paths share the same parameters and numerics.
    """

    hidden_units: Sequence[int] = (64, 32)
    use_softmax: bool = False
    backend: str = "auto"
    dense_init: str = "lecun"  # lecun | torch (ops/mlp.py dense_init_kwargs)

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,   # (B, D) target item embedding
        keys: jnp.ndarray,    # (B, T, D) behaviour sequence embeddings
        lengths: jnp.ndarray, # (B,) valid lengths
    ) -> jnp.ndarray:
        b, t, d = keys.shape
        h1, h2 = self.hidden_units
        if self.dense_init == "torch":
            from .mlp import torch_uniform_init

            kinit = binit = torch_uniform_init
        else:
            kinit = lambda _: nn.initializers.lecun_normal()
            binit = lambda _: nn.initializers.zeros
        w1 = self.param("w1", kinit(4 * d), (4 * d, h1))
        b1 = self.param("b1", binit(4 * d), (h1,))
        w2 = self.param("w2", kinit(h1), (h1, h2))
        b2 = self.param("b2", binit(h1), (h2,))
        w3 = self.param("w3", kinit(h2), (h2, 1))
        b3 = self.param("b3", binit(h2), (1,))

        backend = self.backend
        if backend == "auto":
            # Measured on TPU v5e (batch 8192, T=50, scripts/
            # bench_din_dims.py): the XLA-fused jnp path wins at every
            # dim tried (D=16/64/128, forward and fwd+bwd), so 'auto'
            # always resolves to jnp. The kernel stays available via
            # backend='pallas' as a tested pattern, not a fast path.
            backend = "jnp"
        if backend == "pallas":
            from .pallas.din_attention import din_attention_fused

            return din_attention_fused(
                query, keys, lengths, (w1, b1, w2, b2, w3, b3), self.use_softmax
            )

        q = jnp.broadcast_to(query[:, None, :], keys.shape)
        cross = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)  # (B,T,4D)
        h = nn.relu(cross @ w1 + b1)
        h = nn.relu(h @ w2 + b2)
        scores = (h @ w3 + b3)[..., 0]  # (B, T)
        mask = length_mask(lengths, t)
        if self.use_softmax:
            # reference scales by sqrt(d) AFTER masking (din.py:74-77)
            scores = jnp.where(mask, scores, jnp.asarray(MASK_NEG, scores.dtype))
            scores = scores / jnp.sqrt(jnp.asarray(d, scores.dtype))
            weights = masked_softmax(scores, mask)
        else:
            weights = jnp.where(mask, scores, 0.0)
        return jnp.einsum("bt,btd->bd", weights, keys)


class BilinearAttention(nn.Module):
    """DIEN's paper-form attention: score_t = h_t . (W e_target)."""

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,   # (B, Dq)
        keys: jnp.ndarray,    # (B, T, Dk)
        lengths: jnp.ndarray, # (B,)
    ) -> jnp.ndarray:
        b, t, dk = keys.shape
        w = self.param(
            "w", nn.initializers.xavier_normal(), (query.shape[-1], dk)
        )
        proj = query @ w  # (B, Dk)
        scores = jnp.einsum("btd,bd->bt", keys, proj)
        mask = length_mask(lengths, t)
        return masked_softmax(scores, mask)  # (B, T) attention weights
