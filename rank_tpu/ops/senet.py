"""SENET field reweighting + bilinear field interaction (FiBiNet).

No reference code exists (FiBiNet is a README-only model, README.md:30);
implemented from Huang et al., RecSys 2019.

  * SENET: squeeze field embeddings (mean over D) -> excitation MLP
    F -> F/r -> F (ReLU both, per paper) -> per-field scalar reweighting.
  * Bilinear interaction: p_ij = (v_i . W) * v_j for each field pair, with
    three weight-sharing modes: 'all' (one shared W), 'each' (per-field
    W_i), 'interaction' (per-pair W_ij).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .fm import pair_indices


class SENETLayer(nn.Module):
    reduction_ratio: int = 3

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        """emb: (B, F, D) -> reweighted (B, F, D)."""
        b, f, d = emb.shape
        z = jnp.mean(emb, axis=-1)  # squeeze (B, F)
        mid = max(1, f // self.reduction_ratio)
        a = nn.relu(nn.Dense(mid, use_bias=False)(z))
        a = nn.relu(nn.Dense(f, use_bias=False)(a))  # (B, F)
        return emb * a[:, :, None]


class BilinearInteraction(nn.Module):
    bilinear_type: str = "interaction"  # all | each | interaction

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        """emb: (B, F, D) -> (B, P, D) pair interactions."""
        b, f, d = emb.shape
        i, j = pair_indices(f)
        init = nn.initializers.xavier_uniform()
        if self.bilinear_type == "all":
            w = self.param("w", init, (d, d))
            left = jnp.einsum("bfd,de->bfe", emb, w)
            return left[:, i, :] * emb[:, j, :]
        if self.bilinear_type == "each":
            w = self.param("w", init, (f, d, d))
            left = jnp.einsum("bfd,fde->bfe", emb, w)
            return left[:, i, :] * emb[:, j, :]
        if self.bilinear_type == "interaction":
            p = len(i)
            w = self.param("w", init, (p, d, d))
            vi = emb[:, i, :]  # (B, P, D)
            left = jnp.einsum("bpd,pde->bpe", vi, w)
            return left * emb[:, j, :]
        raise ValueError(f"unknown bilinear_type {self.bilinear_type!r}")
