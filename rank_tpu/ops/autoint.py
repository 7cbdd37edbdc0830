"""AutoInt interacting layer (multi-head self-attention over fields).

No reference code exists — AutoInt is on the reference's to-do list
(``README.md:61``); implemented from Song et al., CIKM 2019
("AutoInt: Automatic Feature Interaction Learning via Self-Attentive
Neural Networks"), eq. (4)-(7): per-head attention with plain inner
products (no sqrt(d) scaling, per the paper), concatenated heads, a
residual projection W_res, and ReLU.

Field count is ~23 (7 categorical + 16 numeric embeddings), so the
(B, H, F, F) attention is tiny and XLA-fused; no Pallas kernel needed
(same reasoning as the BST block, docs/REPRODUCING.md §6).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class AutoIntLayer(nn.Module):
    num_heads: int = 2
    att_dim: int = 32  # per-head dim d' (paper default 32)
    # same bandwidth argument as the BST block (lane padding at small
    # minor dims); softmax stays f32
    compute_dtype: str = "bfloat16"
    # 'vpu': scores/context as broadcast-multiply + reduce instead of B*h
    # tiny (F x d')@(d' x F) batched matmuls, which are MXU issue-rate
    # bound at F~23, d'=32 (same finding as the BST block,
    # scripts/bench_bst_variants.py). 'einsum' keeps the matmul form.
    attn_impl: str = "vpu"
    # dtype of the (B,F,F)-sized score/weight storage in the vpu path
    # (F~23 pads to 128 lanes, same traffic argument as the BST block);
    # softmax reductions stay f32 via masked-free low-precision softmax.
    score_dtype: str = "float32"

    @nn.compact
    def __call__(self, e: jnp.ndarray) -> jnp.ndarray:
        """e: (B, F, D_in) -> (B, F, num_heads * att_dim)."""
        b, f, _ = e.shape
        h, da = self.num_heads, self.att_dim
        cdt = jnp.dtype(self.compute_dtype)
        ec = e.astype(cdt)
        dg = lambda name: nn.DenseGeneral((h, da), use_bias=False, name=name, dtype=cdt)
        q = dg("w_q")(ec)  # (B,F,h,d')
        k = dg("w_k")(ec)
        v = dg("w_v")(ec)
        if self.attn_impl == "vpu":
            lowp = self.score_dtype == "bfloat16" and cdt != jnp.float32
            outs = []
            for hh in range(h):
                sc = jnp.sum(
                    q[:, :, None, hh, :] * k[:, None, :, hh, :], axis=-1
                )
                if lowp:
                    from .attention import softmax_lowp

                    w = softmax_lowp(sc)
                else:
                    w = jax.nn.softmax(  # unscaled, per the paper
                        sc.astype(jnp.float32), axis=-1
                    ).astype(cdt)
                outs.append(
                    jnp.sum(w[..., None] * v[:, None, :, hh, :], axis=2)
                )
            out = jnp.concatenate(outs, axis=-1)
        else:
            scores = jnp.einsum("bfhd,bghd->bhfg", q, k).astype(jnp.float32)
            weights = jax.nn.softmax(scores, axis=-1)  # unscaled, per the paper
            out = jnp.einsum(
                "bhfg,bghd->bfhd", weights.astype(cdt), v
            ).reshape(b, f, h * da)
        res = nn.Dense(h * da, use_bias=False, name="w_res", dtype=cdt)(ec)
        return nn.relu(out + res).astype(jnp.float32)
