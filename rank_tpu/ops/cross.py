"""DCN cross network and DeepCrossing residual units.

Parity targets:
  * Cross layer — ``algorithm/DCN/cross_layer.py:4-25`` / inline copy
    ``dcn.py:25-50``: x_{l+1} = x0 * (x_l . w_l) + b_l + x_l.
    NOTE the reference creates fresh ``nn.Parameter``s inside ``forward``
    every call, so its cross weights are never trained (and its published
    DCN AUC was achieved with an untrained random cross stack). Here the
    weights are registered module parameters, per the paper.
  * Residual unit — ``algorithm/DeepCrossing/residual_unit.py:4-21``:
    ReLU(x + W2.ReLU(W1.x)); same fresh-parameter bug fixed.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class CrossNetwork(nn.Module):
    """Stack of DCN-v1 cross layers over a shared x0."""

    num_layers: int

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        d = x0.shape[-1]
        x = x0
        for l in range(self.num_layers):
            w = self.param(f"w_{l}", nn.initializers.xavier_normal(), (d, 1))
            b = self.param(f"b_{l}", nn.initializers.zeros, (d,))
            xw = x @ w  # (B, 1)
            x = x0 * xw + b + x
        return x


class ResidualUnit(nn.Module):
    """DeepCrossing residual block: ReLU(x + W2 ReLU(W1 x))."""

    internal_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.internal_dim)(x))
        h = nn.Dense(x.shape[-1])(h)
        return nn.relu(x + h)


class ResidualStack(nn.Module):
    internal_dim: int
    num_units: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for _ in range(self.num_units):
            x = ResidualUnit(self.internal_dim)(x)
        return x
