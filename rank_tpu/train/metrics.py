"""On-device metrics: exact AUC and streaming accumulators.

Replaces the reference's host-side sklearn metrics computed from Python
lists accumulated every batch (``deepfm.py:174-180`` — a major throughput
sink: every train step round-trips predictions to the CPU). Here metric
state lives on device; the exact AUC matches ``sklearn.roc_auc_score``
(rank-sum / Mann-Whitney form with average ranks for ties) and a bucketed
streaming variant supports constant-memory accumulation across eval steps.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

NUM_BUCKETS = 16384


def exact_auc(
    scores: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Exact ROC AUC via average ranks (ties handled like sklearn).

    scores: (N,) predicted scores; labels: (N,) in {0,1};
    valid: optional (N,) 0/1 mask for padded rows.
    """
    n = scores.shape[0]
    if valid is None:
        valid = jnp.ones((n,), jnp.float32)
    valid = valid.astype(jnp.float32)
    labels = labels.astype(jnp.float32) * valid

    # Push invalid rows to the bottom of the sort; they get ranks but
    # contribute 0 to both pos_rank_sum and counts.
    neg_inf = jnp.finfo(scores.dtype).min
    s = jnp.where(valid > 0, scores, neg_inf)

    order = jnp.argsort(s)
    sorted_s = s[order]
    ranks_in_order = jnp.arange(1, n + 1, dtype=jnp.float32)

    # average ranks over tie groups: segment mean of ranks keyed by value
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_s[1:] != sorted_s[:-1]]
    )
    group_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    group_sum = jax.ops.segment_sum(ranks_in_order, group_id, num_segments=n)
    group_cnt = jax.ops.segment_sum(
        jnp.ones_like(ranks_in_order), group_id, num_segments=n
    )
    avg_rank_per_group = group_sum / jnp.maximum(group_cnt, 1.0)
    avg_ranks_sorted = avg_rank_per_group[group_id]

    ranks = jnp.zeros((n,), jnp.float32).at[order].set(avg_ranks_sorted)

    n_pos = jnp.sum(labels)
    n_valid = jnp.sum(valid)
    n_neg = n_valid - n_pos
    pos_rank_sum = jnp.sum(ranks * labels)
    # ranks counted invalid rows below every valid one; subtract their count
    n_invalid = jnp.asarray(n, jnp.float32) - n_valid
    pos_rank_sum = pos_rank_sum - n_invalid * n_pos
    auc = (pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / jnp.maximum(
        n_pos * n_neg, 1.0
    )
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, 0.5)


# ---------------------------------------------------------------------------
# Streaming (bucketed) AUC — constant memory across eval steps
# ---------------------------------------------------------------------------

def auc_state_init(num_buckets: int = NUM_BUCKETS) -> Dict[str, jnp.ndarray]:
    return {
        "pos": jnp.zeros((num_buckets,), jnp.float32),
        "neg": jnp.zeros((num_buckets,), jnp.float32),
    }


def auc_state_update(
    state: Dict[str, jnp.ndarray],
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> Dict[str, jnp.ndarray]:
    """Accumulate probability histogram per class. probs in [0, 1]."""
    nb = state["pos"].shape[0]
    if valid is None:
        valid = jnp.ones_like(probs)
    valid = valid.astype(jnp.float32)
    b = jnp.clip((probs * nb).astype(jnp.int32), 0, nb - 1)
    pos_w = labels.astype(jnp.float32) * valid
    neg_w = (1.0 - labels.astype(jnp.float32)) * valid
    return {
        "pos": state["pos"].at[b].add(pos_w),
        "neg": state["neg"].at[b].add(neg_w),
    }


def auc_state_result(state: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Trapezoidal AUC from class histograms (ties within a bucket get the
    standard 0.5 credit, so this converges to the exact AUC as buckets
    grow; with 16k buckets the error on 600k rows is < 1e-4)."""
    pos, neg = state["pos"], state["neg"]
    total_pos = jnp.maximum(jnp.sum(pos), 1e-12)
    total_neg = jnp.maximum(jnp.sum(neg), 1e-12)
    # descending threshold sweep
    p = pos[::-1]
    nneg = neg[::-1]
    # For each bucket (desc order), negatives in strictly lower buckets:
    neg_lower = total_neg - jnp.cumsum(nneg)
    auc = jnp.sum(p * (neg_lower + 0.5 * nneg)) / (total_pos * total_neg)
    return auc


def binary_accuracy(
    probs: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (num_correct, num_valid) for round(prob)==label accuracy
    (deepfm.py:178 uses np.round)."""
    if valid is None:
        valid = jnp.ones_like(probs)
    valid = valid.astype(jnp.float32)
    correct = (jnp.round(probs) == labels).astype(jnp.float32) * valid
    return jnp.sum(correct), jnp.sum(valid)
