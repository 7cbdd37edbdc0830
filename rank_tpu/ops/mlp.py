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
import jax
import jax.numpy as jnp

from .activations import Dice, PReLU, leaky_relu


def torch_uniform_init(fan_in: int):
    """torch ``nn.Linear`` default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    BOTH kernel and bias (``kaiming_uniform_(a=sqrt(5))`` reduces to
    exactly this bound; torch/nn/modules/linear.py reset_parameters)."""
    bound = float(fan_in) ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dense_init_kwargs(dense_init: str, fan_in: int) -> dict:
    """kernel_init/bias_init kwargs for ``nn.Dense``.

    ``lecun`` -> {} (flax defaults: lecun_normal kernel, zero bias);
    ``torch`` -> torch nn.Linear defaults (uniform +-1/sqrt(fan_in) for
    kernel AND bias). The torch option exists so calibrated-regime
    head-to-heads vs the bench.py torch mirrors compare learning dynamics,
    not init families (PARITY_CALIB_r04.md "HONEST OPEN ITEM"): the
    3-epoch imbalanced-label runs are sensitive to the tower-init family.
    """
    if dense_init == "torch":
        u = torch_uniform_init(fan_in)
        return {"kernel_init": u, "bias_init": u}
    if dense_init != "lecun":
        raise ValueError(f"unknown dense_init {dense_init!r}")
    return {}


class MLPTower(nn.Module):
    hidden_units: Sequence[int]
    activation: str = "relu"  # relu | dice | prelu | leakyrelu
    batch_norm: bool = True
    dropout_rate: float = 0.1
    order: str = "bn_act"  # bn_act (BN before activation) | act_bn
    final_logit: bool = False  # append a Dense(1) output layer
    dense_init: str = "lecun"  # lecun | torch (see dense_init_kwargs)

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
            x = nn.Dense(
                width, **dense_init_kwargs(self.dense_init, x.shape[-1])
            )(x)
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
            x = nn.Dense(1, **dense_init_kwargs(self.dense_init, x.shape[-1]))(x)
        return x
