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

    @nn.compact
    def __call__(self, e: jnp.ndarray) -> jnp.ndarray:
        """e: (B, F, D_in) -> (B, F, num_heads * att_dim)."""
        b, f, _ = e.shape
        h, da = self.num_heads, self.att_dim
        q = nn.DenseGeneral((h, da), use_bias=False, name="w_q")(e)  # (B,F,h,d')
        k = nn.DenseGeneral((h, da), use_bias=False, name="w_k")(e)
        v = nn.DenseGeneral((h, da), use_bias=False, name="w_v")(e)
        scores = jnp.einsum("bfhd,bghd->bhfg", q, k)  # inner product, unscaled
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhfg,bghd->bfhd", weights, v).reshape(b, f, h * da)
        res = nn.Dense(h * da, use_bias=False, name="w_res")(e)
        return nn.relu(out + res)
