"""Activations: Dice, PReLU, LeakyReLU.

Behavioural parity targets in the reference:
  * Dice — ``algorithm/DIN/activations.py:31-68`` and the inline variant
    ``algorithm/DIN/din.py:26-36``: ``alpha*(1-p)*x + p*x`` with
    ``p = sigmoid(BatchNorm(x))``, BatchNorm affine=False. The torch BN
    momentum 0.01 corresponds to an EMA decay of 0.99 in Flax convention.
  * PReLU — ``algorithm/DIN/activations.py:5-29``.
  * manual LeakyReLU — ``algorithm/BST/leakyrelu.py:3-14``:
    ``f1*x + f2*|x|`` with ``f1=0.5*(1+leak)``, ``f2=0.5*(1-leak)``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Dice(nn.Module):
    """Data-adaptive activation from the DIN paper, with learned alpha.

    Under data parallelism the BatchNorm statistics are per-device batch
    statistics (reference-faithful: the reference is single-device, so its
    statistics are whole-batch; with per-device batches of >=128 rows the
    difference is noise). Pass ``axis_name`` to average over the mesh
    instead.
    """

    momentum: float = 0.99  # torch momentum 0.01 == flax decay 0.99
    epsilon: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],))
        normed = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_bias=False,
            use_scale=False,
            axis_name=self.axis_name,
        )(x)
        p = nn.sigmoid(normed)
        return alpha * (1.0 - p) * x + p * x


class PReLU(nn.Module):
    """Parametric ReLU with a learned alpha.

    Default matches torch ``nn.PReLU()`` as used by the reference
    (``din.py:279``): a single shared alpha initialised to 0.25. Set
    ``per_channel=True`` for the DIN paper's per-channel form."""

    init: float = 0.25
    per_channel: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = (x.shape[-1],) if self.per_channel else (1,)
        alpha = self.param(
            "alpha", nn.initializers.constant(self.init), shape
        )
        return jnp.maximum(x, 0.0) + alpha * jnp.minimum(x, 0.0)


def prelu(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    """Functional PReLU with fixed alpha (din.py:38-39)."""
    return jnp.maximum(x, 0.0) + alpha * jnp.minimum(x, 0.0)


def leaky_relu(x: jnp.ndarray, leak: float = 0.01) -> jnp.ndarray:
    """BST's |x|-form LeakyReLU (bst.py:36-39); identical to the standard
    max(x, leak*x) but written as f1*x + f2*|x|."""
    f1 = 0.5 * (1.0 + leak)
    f2 = 0.5 * (1.0 - leak)
    return f1 * x + f2 * jnp.abs(x)
