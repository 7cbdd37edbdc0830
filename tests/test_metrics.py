"""On-device AUC vs sklearn.roc_auc_score (the reference metric,
deepfm.py:179)."""

import jax.numpy as jnp
import numpy as np
from sklearn.metrics import roc_auc_score

from rank_tpu.train import metrics as M


def test_exact_auc_matches_sklearn():
    rng = np.random.default_rng(0)
    for trial in range(3):
        n = 5001
        scores = rng.random(n).astype(np.float32)
        labels = (rng.random(n) < 0.1).astype(np.float32)
        want = roc_auc_score(labels, scores)
        got = float(M.exact_auc(jnp.asarray(scores), jnp.asarray(labels)))
        assert abs(got - want) < 1e-5, (trial, got, want)


def test_exact_auc_with_ties():
    rng = np.random.default_rng(1)
    scores = np.round(rng.random(4000) * 20) / 20  # heavy ties
    labels = (rng.random(4000) < 0.3).astype(np.float32)
    want = roc_auc_score(labels, scores)
    got = float(M.exact_auc(jnp.asarray(scores, jnp.float32), jnp.asarray(labels)))
    assert abs(got - want) < 1e-5


def test_exact_auc_valid_mask():
    rng = np.random.default_rng(2)
    scores = rng.random(1000).astype(np.float32)
    labels = (rng.random(1000) < 0.2).astype(np.float32)
    valid = np.ones(1000, np.float32)
    valid[800:] = 0.0
    # poison invalid rows: they must not affect the result
    scores2 = scores.copy()
    scores2[800:] = 0.999
    labels2 = labels.copy()
    labels2[800:] = 1.0
    want = roc_auc_score(labels[:800], scores[:800])
    got = float(
        M.exact_auc(jnp.asarray(scores2), jnp.asarray(labels2), jnp.asarray(valid))
    )
    assert abs(got - want) < 1e-5


def test_streaming_auc_converges():
    rng = np.random.default_rng(3)
    n = 60_000
    scores = rng.beta(2, 5, size=n).astype(np.float32)
    labels = (rng.random(n) < scores).astype(np.float32)  # correlated
    want = roc_auc_score(labels, scores)
    state = M.auc_state_init()
    for i in range(0, n, 8192):
        state = M.auc_state_update(
            state, jnp.asarray(scores[i : i + 8192]), jnp.asarray(labels[i : i + 8192])
        )
    got = float(M.auc_state_result(state))
    assert abs(got - want) < 5e-4, (got, want)


def test_degenerate_all_one_class():
    scores = jnp.asarray(np.random.default_rng(0).random(100), jnp.float32)
    ones = jnp.ones(100)
    assert float(M.exact_auc(scores, ones)) == 0.5
    assert float(M.exact_auc(scores, jnp.zeros(100))) == 0.5
