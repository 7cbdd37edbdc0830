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

from .mlp import dense_init_kwargs


class CrossNetwork(nn.Module):
    """Stack of DCN-v1 cross layers over a shared x0.

    ``dense_init='torch'`` swaps the xavier_normal cross weights (std
    ~0.24 at d=34) for N(0, 0.02) — the scale the torch parity mirror
    (bench.py TorchDCN) trains with. At xavier scale the term
    x0*(x.w) starts ~6x larger per layer, which the 3-epoch calibrated
    runs are sensitive to (one of three DCN seeds collapsed to 0.9252
    in PARITY_CALIB_r04.md; see the round-5 rerun for the fix evidence).
    """

    num_layers: int
    dense_init: str = "lecun"
    # reference-mechanism emulation: the reference re-creates its cross
    # parameters inside forward on every call (cross_layer.py:16-20,
    # torch.randn — std 1), so its published cross-depth gains come from
    # UNTRAINED random quadratic features feeding the trained output
    # layer. frozen_random=True reproduces that mechanism faithfully
    # (N(0,1) weights held at init via stop_gradient) so the sweep
    # replay can attribute the reference's direction to it — see
    # scripts/check_sweep_directions.py and REPRODUCING.md §5f.
    frozen_random: bool = False

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        import jax

        d = x0.shape[-1]
        x = x0
        if self.frozen_random:
            w_init = nn.initializers.normal(stddev=1.0)
        elif self.dense_init == "torch":
            w_init = nn.initializers.normal(stddev=0.02)
        else:
            w_init = nn.initializers.xavier_normal()
        for l in range(self.num_layers):
            w = self.param(f"w_{l}", w_init, (d, 1))
            b = self.param(f"b_{l}", nn.initializers.zeros, (d,))
            if self.frozen_random:
                w = jax.lax.stop_gradient(w)
                b = jax.lax.stop_gradient(b)
            xw = x @ w  # (B, 1)
            x = x0 * xw + b + x
        return x


class ResidualUnit(nn.Module):
    """DeepCrossing residual block: ReLU(x + W2 ReLU(W1 x))."""

    internal_dim: int
    dense_init: str = "lecun"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(
            nn.Dense(
                self.internal_dim,
                **dense_init_kwargs(self.dense_init, x.shape[-1]),
            )(x)
        )
        h = nn.Dense(
            x.shape[-1], **dense_init_kwargs(self.dense_init, h.shape[-1])
        )(h)
        return nn.relu(x + h)


class ResidualStack(nn.Module):
    internal_dim: int
    num_units: int
    dense_init: str = "lecun"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for _ in range(self.num_units):
            x = ResidualUnit(self.internal_dim, dense_init=self.dense_init)(x)
        return x
