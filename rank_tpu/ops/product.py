"""PNN product layers (inner / outer).

No reference code exists (PNN is a README-only model, README.md:21);
implemented from Qu et al., ICDM 2016.

  * IPNN: l_p = all pairwise inner products <v_i, v_j>            (B, P)
  * OPNN: with sum-pooling approximation p = (sum_f v)(sum_f v)^T; l_p is a
    learned projection of p — computed as quadratic forms
    theta_k = || sum_f v * w_k ||-style contractions per the paper's
    efficient form, here directly einsum over the (D, D) outer product.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .fm import pairwise_dot


class InnerProductLayer(nn.Module):
    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        """(B, F, D) -> (B, P) pairwise inner products."""
        return pairwise_dot(emb)


class OuterProductLayer(nn.Module):
    num_outputs: int = 64

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        """(B, F, D) -> (B, num_outputs) projected outer-product signal."""
        s = jnp.sum(emb, axis=1)  # (B, D) sum pooling per paper eq. (9)
        w = self.param(
            "w", nn.initializers.xavier_uniform(), (self.num_outputs, s.shape[-1], s.shape[-1])
        )
        # l_k = s^T W_k s  — avoids materialising the (B, D, D) outer product
        return jnp.einsum("bd,kde,be->bk", s, w, s)
