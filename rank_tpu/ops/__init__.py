"""Interaction-op library: pure-JAX reference implementations.

Hot ops have Pallas TPU kernels under ``rank_tpu.ops.pallas`` (gated by
config with these jnp versions as fallback/oracle).
"""

from .activations import Dice, PReLU, leaky_relu, prelu
from .attention import BilinearAttention, DINAttention, length_mask, masked_softmax
from .autoint import AutoIntLayer
from .cin import CIN
from .cross import CrossNetwork, ResidualStack, ResidualUnit
from .fm import (
    ffm_interaction,
    flen_field_wise_bi_interaction,
    fm_first_order,
    fm_second_order,
    fm_second_order_vector,
    fwfm_interaction,
    pair_indices,
    pairwise_dot,
    pairwise_hadamard,
)
from .mlp import MLPTower
from .product import InnerProductLayer, OuterProductLayer
from .rnn import AttentionalGRU
from .senet import BilinearInteraction, SENETLayer
from .transformer import BSTTransformerBlock

__all__ = [
    "Dice", "PReLU", "leaky_relu", "prelu",
    "BilinearAttention", "DINAttention", "length_mask", "masked_softmax",
    "AutoIntLayer",
    "CIN", "CrossNetwork", "ResidualStack", "ResidualUnit",
    "ffm_interaction", "flen_field_wise_bi_interaction",
    "fm_first_order", "fm_second_order", "fm_second_order_vector",
    "fwfm_interaction", "pair_indices",
    "pairwise_dot", "pairwise_hadamard",
    "MLPTower", "InnerProductLayer", "OuterProductLayer",
    "AttentionalGRU", "BilinearInteraction", "SENETLayer",
    "BSTTransformerBlock",
]
