"""ArrayLoader / process-sharding edge cases."""

import numpy as np
import pytest

from rank_tpu.data.loader import (
    ArrayLoader,
    num_rows,
    shard_for_process,
    split_train_test,
)


def _data(n=100):
    return {
        "x": np.arange(n, dtype=np.int32),
        "y": np.arange(n, dtype=np.float32)[:, None] * 2,
    }


def test_drop_remainder_counts():
    loader = ArrayLoader(_data(100), 32, drop_remainder=True)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    assert all(b["x"].shape == (32,) for b in batches)


def test_pad_last_batch_valid_mask():
    loader = ArrayLoader(_data(100), 32, drop_remainder=False)
    assert len(loader) == 4
    batches = list(loader)
    last = batches[-1]
    assert last["x"].shape == (32,)
    assert last["_valid"].sum() == 100 - 96
    # all 100 rows covered exactly once among valid slots
    seen = np.concatenate([b["x"][b["_valid"] > 0] for b in batches])
    assert sorted(seen.tolist()) == list(range(100))


def test_shuffle_is_seeded_and_complete():
    l1 = list(ArrayLoader(_data(64), 16, shuffle=True, seed=7))
    l2 = list(ArrayLoader(_data(64), 16, shuffle=True, seed=7))
    l3 = list(ArrayLoader(_data(64), 16, shuffle=True, seed=8))
    a1 = np.concatenate([b["x"] for b in l1])
    a2 = np.concatenate([b["x"] for b in l2])
    a3 = np.concatenate([b["x"] for b in l3])
    np.testing.assert_array_equal(a1, a2)
    assert not np.array_equal(a1, a3)
    assert sorted(a1.tolist()) == list(range(64))


def test_shard_for_process_partitions():
    d = _data(10)
    shards = [shard_for_process(d, i, 3) for i in range(3)]
    all_rows = np.concatenate([s["x"] for s in shards])
    assert sorted(all_rows.tolist()) == list(range(10))
    assert shard_for_process(d, 0, 1)["x"].shape == (10,)


def test_split_train_test_disjoint():
    d = _data(200)
    tr, te = split_train_test(d, 0.25, seed=1)
    assert num_rows(tr) == 150 and num_rows(te) == 50
    assert not set(tr["x"].tolist()) & set(te["x"].tolist())


def test_num_batches_pads_invalid_batches():
    """Agreed-step padding: a loader asked for more batches than its rows
    need emits fully-invalid extra batches (multi-host peers with bigger
    shards own those steps' gradient)."""
    data = {"x": np.arange(70, dtype=np.int32)}
    loader = ArrayLoader(
        data, 32, drop_remainder=False, num_batches=4
    )
    assert len(loader) == 4
    batches = list(loader)
    assert len(batches) == 4
    valid_total = sum(b["_valid"].sum() for b in batches)
    assert valid_total == 70
    # every row appears exactly once among valid positions
    seen = np.concatenate([b["x"][b["_valid"] > 0] for b in batches])
    np.testing.assert_array_equal(np.sort(seen), np.arange(70))
    # the padding batches are fully invalid
    assert batches[3]["_valid"].sum() == 0

    with pytest.raises(ValueError, match="num_batches"):
        ArrayLoader(data, 32, drop_remainder=True, num_batches=4)
    with pytest.raises(ValueError, match="cannot cover"):
        ArrayLoader(data, 32, drop_remainder=False, num_batches=2)


def test_streaming_training_covers_all_rows():
    """VERDICT r2 #9: the streaming train path must train on EVERY row —
    the remainder batch is padded + masked, not dropped (reference
    DataLoader keep-last default, deepfm.py:222-227)."""
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import tiny_schema
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer

    schema = tiny_schema(vocab=32, hist_len=4)
    data = make_synthetic_dataset(schema, num_rows=100, seed=0)  # 100 % 32 != 0
    cfg = default_config("dcn").replace(hidden_units=(8,), num_cross_layers=1)
    trainer = Trainer(schema, cfg, TrainConfig(batch_size=32, log_every=0))
    loader = ArrayLoader(
        data, 32, shuffle=True, seed=1, drop_remainder=False, num_batches=4
    )
    state = trainer.init_state(next(iter(loader)))
    state, stats = trainer.train_epoch(state, loader)
    # the meters count only _valid rows: all 100 rows trained
    assert int(stats["count"]) == 100
