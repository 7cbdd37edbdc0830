"""Configurable MLP tower.

One module replaces the four distinct hand-rolled tower loops in the
reference, preserving each model's layer ordering via ``order``:

  * DeepFM (``deepfm.py:100-110``): Linear -> BN -> ReLU -> Dropout
  * DIN    (``din.py:272-284``):    Linear -> Dice/PReLU -> BN -> Dropout
  * BST    (``bst.py:203-214``):    Linear -> BN -> LeakyReLU -> Dropout
  * DCN    (``dcn.py:144-150``):    Linear -> ReLU (no BN/dropout)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .activations import Dice, PReLU, leaky_relu


class MLPTower(nn.Module):
    hidden_units: Sequence[int]
    activation: str = "relu"  # relu | dice | prelu | leakyrelu
    batch_norm: bool = True
    dropout_rate: float = 0.1
    order: str = "bn_act"  # bn_act (BN before activation) | act_bn
    final_logit: bool = False  # append a Dense(1) output layer

    def _act(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "dice":
            return Dice()(x, train=train)
        if self.activation == "prelu":
            return PReLU()(x)
        if self.activation == "leakyrelu":
            return leaky_relu(x, 0.01)
        raise ValueError(f"unknown activation {self.activation!r}")

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for width in self.hidden_units:
            x = nn.Dense(width)(x)
            if self.order == "bn_act":
                if self.batch_norm:
                    x = nn.BatchNorm(use_running_average=not train)(x)
                x = self._act(x, train)
            else:  # act_bn — DIN ordering
                x = self._act(x, train)
                if self.batch_norm:
                    x = nn.BatchNorm(use_running_average=not train)(x)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.final_logit:
            x = nn.Dense(1)(x)
        return x
