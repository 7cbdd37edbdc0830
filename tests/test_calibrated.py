"""Calibrated synthetic log: marginal fidelity + feature predictiveness.

The generator's whole point (VERDICT r3 #2) is that its statistics match
what the reference's EDA notebook measured on the real competition data
(``EDA.ipynb`` cells 15/16/27/30/31) and that the ETL-derived aggregate
features genuinely predict the labels (the property behind the
reference's 0.85-0.92 AUC regime). These tests pin both, at a small
scale so CI stays fast; scripts/calibrate_synthetic.py re-checks at a
larger scale and writes the round artifact.
"""

import numpy as np
import pytest

from rank_tpu.data.calibrated import (
    ACTION_RATES,
    ACTIONS,
    PER_DAY_FEED_UNIQUE,
    PER_DAY_UV,
    CalibratedLogConfig,
    make_calibrated_dataset,
    make_calibrated_log,
)

SCALE = 0.02


@pytest.fixture(scope="module")
def log_stats(tmp_path_factory):
    out = tmp_path_factory.mktemp("cal_log")
    return make_calibrated_log(str(out), CalibratedLogConfig(scale=SCALE, seed=3))


def test_action_rates_hit_eda_targets(log_stats):
    """Training-window positive rates match EDA cells 15/30. Common
    actions within 15% relative; forward (0.36% -> ~300 positives here,
    with shared user/author/pair latents clustering the draws well beyond
    Bernoulli noise) gets 25%; rare ones (comment 0.04%) only get a few
    dozen positives at this scale — assert order of magnitude. At scale
    1.0 scripts/calibrate_synthetic.py pins all seven within 1-8%
    (CALIBRATION_r04.json)."""
    got = log_stats["realized_rates"]
    for action in ("read_comment", "like", "click_avatar"):
        assert abs(got[action] / ACTION_RATES[action] - 1) < 0.15, (
            action, got[action], ACTION_RATES[action])
    assert abs(got["forward"] / ACTION_RATES["forward"] - 1) < 0.25, (
        got["forward"], ACTION_RATES["forward"])
    for action in ("comment", "follow", "favorite"):
        assert 0.2 < got[action] / ACTION_RATES[action] < 5.0, (
            action, got[action])


def test_daily_uv_and_feed_uniques_track_eda_trajectories(log_stats):
    """Daily unique users within 25% of the (scaled) cell-15 UV column;
    daily unique feeds within 15% — the round-5 per-day exposure
    temperature (calibrated.py:_temper_for_uniques) pins each day's
    expected distinct-feed count to its EDA target, replacing the global
    alpha fit whose day-by-day shape drifted up to ~40% at small scales.
    Both must also reproduce the upward trend across the 14 days."""
    uv, uv_t = log_stats["realized_uv"], log_stats["target_uv"]
    fu, fu_t = log_stats["realized_feed_unique"], log_stats["target_feed_unique"]
    for got, tgt in zip(uv, uv_t):
        assert abs(got / tgt - 1) < 0.25, (got, tgt)
    for got, tgt in zip(fu, fu_t):
        assert abs(got / tgt - 1) < 0.15, (got, tgt)
    assert np.mean(uv[-3:]) > np.mean(uv[:3])
    assert np.mean(fu[-3:]) > np.mean(fu[:3])


def test_bayes_ceiling_in_reference_regime(log_stats):
    """The generator-known Bayes-optimal AUC on the test day sits above
    the reference's best trained AUC (0.911 for read_comment) — trained
    models land below the ceiling, inside the 0.85+ band."""
    bayes = log_stats["bayes_auc_test_day"]
    assert 0.92 < bayes["read_comment"] < 0.99, bayes
    for action in ACTIONS:
        if action in bayes:
            assert bayes[action] > 0.85, (action, bayes)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    cache = tmp_path_factory.mktemp("cal_ds")
    return make_calibrated_dataset(scale=SCALE, seed=4, cache_dir=str(cache))


def test_etl_dataset_shapes_and_sequences(dataset):
    train, test, schema = dataset
    # train window (8-13) carries ~5.5x the test day's rows (cell 15)
    assert 4.0 < len(train["labels"]) / len(test["labels"]) < 7.0
    assert train["labels"].shape[1] == 7
    sl = train["his_read_comment_7d_seq_length"]
    # emergent sequence stats: a mix of empty, mid, and capped-at-50 rows
    # (DataGenerator.py:273-279 semantics — last 50 read_comment feeds)
    assert (sl == 0).mean() < 0.6
    assert (sl == 50).mean() > 0.01
    assert 3.0 < sl[sl > 0].mean() < 40.0
    seq = train["his_read_comment_7d_seq"]
    mask = np.arange(seq.shape[1])[None, :] < sl[:, None]
    assert (seq[mask] > 0).all()  # real ids inside the length
    assert (seq[~mask] == 0).all()  # zero-padded beyond it


def test_aggregate_features_are_predictive(dataset):
    """The i_read_comment_7d_sum dense feature alone must rank the test
    day's read_comment labels well above chance — the structural property
    (labels and aggregates driven by shared latents) that puts trained
    models in the reference's AUC regime. Uniform-id synthetic data has
    no such property."""
    train, test, schema = dataset
    dense_names = list(schema.dense_names)
    u_rc = test["dense"][:, dense_names.index("u_read_comment_7d_sum")]
    c_rc = test["dense"][:, dense_names.index(
        "c_user_author_read_comment_7d_sum")]
    i_rc = test["dense"][:, dense_names.index("i_read_comment_7d_sum")]
    y = test["labels"][:, 0]

    def auc(score, y):
        order = np.argsort(score, kind="stable")
        ranks = np.empty(len(score))
        ranks[order] = np.arange(1, len(score) + 1)
        n_pos, n_neg = y.sum(), (1 - y).sum()
        return (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)

    # user-side history and user-x-author cross are the strong signals
    # (feed-side sums are diluted by exposure: test-day feeds are largely
    # fresh — the same cold-start shape real logs have)
    assert auc(u_rc, y) > 0.65, auc(u_rc, y)
    assert auc(c_rc, y) > 0.60, auc(c_rc, y)
    assert auc(i_rc, y) > 0.53, auc(i_rc, y)
    assert auc(u_rc + i_rc, y) > 0.62, auc(u_rc + i_rc, y)


def test_scale_one_row_counts_match_reference_split():
    """At scale=1 the per-day sample table IS cell 15's, so the train
    split (date_ 8-13) must land within ~0.1% of the reference's
    3,322,313 / 609,037 rows (dataset/README.md:8). Checked without
    generating: the counts are deterministic functions of the table."""
    from rank_tpu.data.calibrated import PER_DAY_SAMPLES

    train_rows = sum(PER_DAY_SAMPLES[7:13])
    test_rows = PER_DAY_SAMPLES[13]
    assert abs(train_rows - 3_322_313) / 3_322_313 < 0.001, train_rows
    assert abs(test_rows - 609_037) / 609_037 < 0.001, test_rows
