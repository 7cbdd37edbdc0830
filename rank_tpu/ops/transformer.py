"""BST transformer block.

Parity target: ``algorithm/BST/bst.py:42-91`` (class variant, the one the
model actually uses — the functional copy ``transformer_layer.py`` has the
fresh-params-per-call bug and is dead code):

  * learned positional embedding of size ``max_len`` added to Q and K
    inputs (not V), ``bst.py:68-71``;
  * multi-head attention with key-padding mask;
  * residual + LayerNorm, then FFN (d -> d with LeakyReLU) + residual +
    LayerNorm.

Divergence from the reference (documented): a fully-padded row would give
torch's softmax NaN (all scores -inf); our masked softmax yields zero
attention output instead, so zero-length histories are well-defined.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .attention import masked_softmax


class BSTTransformerBlock(nn.Module):
    d_model: int
    num_heads: int
    max_len: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,          # (B, T, D) sequence embeddings
        key_valid: jnp.ndarray,  # (B, T) True where the position is real
        train: bool = False,
    ) -> jnp.ndarray:
        b, t, d = x.shape
        h = self.num_heads
        assert d % h == 0, f"d_model {d} not divisible by heads {h}"
        dh = d // h

        pos_emb = nn.Embed(self.max_len, d, name="position_embedding")
        positions = jnp.arange(t)
        pe = pos_emb(positions)[None, :, :]
        queries = x + pe
        keys = x + pe
        values = x  # reference adds positions to Q/K only (bst.py:70-71)

        q = nn.Dense(d, name="w_q")(queries).reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        k = nn.Dense(d, name="w_k")(keys).reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        v = nn.Dense(d, name="w_v")(values).reshape(b, t, h, dh).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(dh, x.dtype)
        )
        mask = key_valid[:, None, None, :]  # broadcast over heads & queries
        weights = masked_softmax(scores, jnp.broadcast_to(mask, scores.shape))
        context = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        context = context.transpose(0, 2, 1, 3).reshape(b, t, d)

        out = nn.Dense(d, name="w_o")(context)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        h1 = nn.LayerNorm(name="norm1")(queries + out)

        ffn = nn.Dense(d, name="ffn_1")(h1)
        ffn = nn.leaky_relu(ffn, negative_slope=0.01)
        ffn = nn.Dropout(self.dropout_rate, deterministic=not train)(ffn)
        ffn = nn.Dense(d, name="ffn_2")(ffn)
        ffn = nn.Dropout(self.dropout_rate, deterministic=not train)(ffn)
        return nn.LayerNorm(name="norm2")(h1 + ffn)
