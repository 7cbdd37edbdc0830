"""Factorization-machine interactions (FM / FwFM / FFM / AFM pooling).

Parity targets:
  * FM first order  — ``algorithm/DeepFM/deepfm.py:122-127``
  * FM second order — ``deepfm.py:128-140`` (0.5*((sum v)^2 - sum v^2))
  * FwFM pairwise   — ``algorithm/FwFM/fwfm.py:125-137``: r_ij * <v_i, v_j>
  * FFM             — README.md:19 (Juan et al. 2016), no reference code;
    field-aware embeddings v_{i,f_j}, pair term <v_{i,f_j}, v_{j,f_i}>.

All ops take a stacked field-embedding tensor ``(B, F, D)`` (FM-family
models embed every field at one shared dim) and are batched-vectorised (no Python loops over pairs at runtime; pair indices are
static numpy, so XLA sees fixed gathers feeding one fused contraction).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def pair_indices(num_fields: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static upper-triangle (i<j) field pair indices."""
    iu, ju = np.triu_indices(num_fields, k=1)
    return iu.astype(np.int32), ju.astype(np.int32)


def fm_first_order(weights: jnp.ndarray) -> jnp.ndarray:
    """Sum of per-field scalar weights. weights: (B, F) or (B, F, 1)."""
    if weights.ndim == 3:
        weights = weights[..., 0]
    return jnp.sum(weights, axis=-1, keepdims=True)  # (B, 1)


def fm_second_order(emb: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """Classic FM identity: 0.5 * ((sum_f v)^2 - sum_f v^2), summed over D.

    emb: (B, F, D) -> (B, 1) logit contribution.
    """
    sum_emb = jnp.sum(emb, axis=1)  # (B, D)
    sum_sq = jnp.square(sum_emb)
    sq_sum = jnp.sum(jnp.square(emb), axis=1)  # (B, D)
    out = 0.5 * jnp.sum(sum_sq - sq_sum, axis=-1, keepdims=keepdims)
    return out


def fm_second_order_vector(emb: jnp.ndarray) -> jnp.ndarray:
    """Bi-interaction pooling (NFM form): 0.5*((sum_f v)^2 - sum_f v^2)
    kept as a vector. emb: (B, F, D) -> (B, D)."""
    sum_emb = jnp.sum(emb, axis=1)
    return 0.5 * (jnp.square(sum_emb) - jnp.sum(jnp.square(emb), axis=1))


def flen_field_wise_bi_interaction(
    emb: jnp.ndarray,
    group_slices: Tuple[Tuple[int, int], ...],
    r_intra: jnp.ndarray,
    r_inter: jnp.ndarray,
) -> jnp.ndarray:
    """FLEN's FwBI interaction vector h_MF + h_FM (Feng et al. 2020,
    arXiv:1911.04690 §3.2; reference to-do README.md:61, no code).

    emb: (B, F, D) with fields ordered so each field GROUP is a contiguous
    [start, stop) slice. h_MF sums r_inter-weighted elementwise products of
    the M group-sum embeddings over group pairs; h_FM sums r_intra-weighted
    intra-group bi-interaction poolings. Returns (B, D).
    """
    group_sums = jnp.stack(
        [jnp.sum(emb[:, a:b, :], axis=1) for a, b in group_slices], axis=1
    )  # (B, M, D)
    i, j = pair_indices(len(group_slices))
    h_mf = jnp.sum(
        group_sums[:, i, :] * group_sums[:, j, :] * r_inter[None, :, None],
        axis=1,
    )
    h_fm = sum(
        r_intra[m] * fm_second_order_vector(emb[:, a:b, :])
        for m, (a, b) in enumerate(group_slices)
    )
    return h_mf + h_fm


def pairwise_hadamard(emb: jnp.ndarray) -> jnp.ndarray:
    """All F*(F-1)/2 elementwise pair products, (B, F, D) -> (B, P, D).

    The AFM interaction tensor (afm.py:100-108), without the Python loop.
    """
    i, j = pair_indices(emb.shape[1])
    return emb[:, i, :] * emb[:, j, :]


def pairwise_dot(emb: jnp.ndarray) -> jnp.ndarray:
    """All pair inner products, (B, F, D) -> (B, P)."""
    return jnp.sum(pairwise_hadamard(emb), axis=-1)


def fwfm_interaction(emb: jnp.ndarray, field_weights: jnp.ndarray) -> jnp.ndarray:
    """Field-weighted FM pair term: sum_p r_p * <v_i, v_j>.

    emb: (B, F, D); field_weights: (P,) learned, P = F*(F-1)/2.
    Returns (B, 1). Matches fwfm.py:127-135 semantics.
    """
    dots = pairwise_dot(emb)  # (B, P)
    return jnp.sum(dots * field_weights[None, :], axis=-1, keepdims=True)


def ffm_interaction(field_aware_emb: jnp.ndarray) -> jnp.ndarray:
    """Field-aware FM pair term.

    field_aware_emb: (B, F, F, D) where [:, i, j] is v_{i, f_j} — field i's
    embedding specialised for interacting with field j.
    Returns (B, 1): sum over pairs of <v_{i,f_j}, v_{j,f_i}>.
    """
    i, j = pair_indices(field_aware_emb.shape[1])
    vi = field_aware_emb[:, i, j, :]  # (B, P, D)
    vj = field_aware_emb[:, j, i, :]  # (B, P, D)
    return jnp.sum(vi * vj, axis=(1, 2))[:, None]
