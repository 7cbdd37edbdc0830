"""ArrayLoader / process-sharding edge cases."""

import numpy as np

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
