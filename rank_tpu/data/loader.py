"""In-memory array dataset + batch iterator.

Replaces the reference's per-model ``WechatDataset``/``DataLoader``
(``algorithm/DeepFM/deepfm.py:26-70``, ``algorithm/DIN/din.py:87-222``):
the full dataset (~4M rows) fits in host RAM as flat numpy arrays, so the
input pipeline is a zero-copy slice per step instead of a Python-object
Dataset with worker processes. Batches have fully static shapes (fixed
sequence length instead of the reference's pad-to-batch-max collate,
``din.py:176-222``), which is what XLA wants.

For multi-host training each process keeps only its shard of the rows
(``process_index``-strided), and the iterator yields per-host batches that
``jax.make_array_from_process_local_data`` can assemble into a global
data-parallel batch.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from .. import native

Batch = Dict[str, np.ndarray]


def num_rows(data: Batch) -> int:
    return next(iter(data.values())).shape[0]


def shard_for_process(data: Batch, process_index: int, process_count: int) -> Batch:
    """Keep this host's strided shard of the rows."""
    if process_count <= 1:
        return data
    return {k: v[process_index::process_count] for k, v in data.items()}


class ArrayLoader:
    """Batched iteration over a dict-of-arrays dataset.

    ``drop_remainder=False`` pads the final short batch by repeating row 0
    and reports the true count via the ``_valid`` mask key, so eval — and
    since round 3, streaming TRAINING too (the loss/metrics all weight by
    ``_valid``, so padding rows contribute zero gradient) — covers every
    row, matching the reference DataLoader's keep-last default
    (``deepfm.py:222-227``), while every step keeps the same static shape.

    ``num_batches`` (only with ``drop_remainder=False``) pads the epoch
    with additional fully-invalid batches up to an agreed count: under
    multi-host, processes with unequal shard sizes must still run the
    same number of (collective) steps.

    Known divergence (docs/REPRODUCING.md §4.7): the ``_valid`` mask
    zeroes padded rows out of loss/metrics/gradients, but BatchNorm
    (``use_norm`` models, ops/mlp.py) still computes train-mode batch
    statistics over the duplicated padding rows — the one short batch per
    epoch normalizes slightly differently than the reference's genuinely
    smaller last batch. Accepted: sub-noise at reference scale (one batch
    in ~3,245), and masking BN stats would fork flax's BatchNorm.
    """

    def __init__(
        self,
        data: Batch,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 42,
        drop_remainder: bool = True,
        num_batches: Optional[int] = None,
    ):
        self.data = data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self._rng = np.random.default_rng(seed)
        self.n = num_rows(data)
        if num_batches is not None:
            if drop_remainder:
                raise ValueError("num_batches requires drop_remainder=False")
            if num_batches < -(-self.n // batch_size):
                raise ValueError(
                    f"num_batches={num_batches} cannot cover "
                    f"{self.n} rows at batch_size={batch_size}"
                )
        self.num_batches = num_batches

    def __len__(self) -> int:
        if self.num_batches is not None:
            return self.num_batches
        if self.drop_remainder:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def __iter__(self) -> Iterator[Batch]:
        order = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        num_full = self.n // bs
        take = native.take_rows  # threaded memcpy gather (numpy if no lib)
        emitted = 0
        for i in range(num_full):
            idx = order[i * bs : (i + 1) * bs]
            batch = {k: take(v, idx) for k, v in self.data.items()}
            batch["_valid"] = np.ones((bs,), np.float32)
            emitted += 1
            yield batch
        rem = self.n - num_full * bs
        if rem and not self.drop_remainder:
            idx = np.concatenate([order[num_full * bs :], np.zeros(bs - rem, np.int64)])
            batch = {k: take(v, idx) for k, v in self.data.items()}
            valid = np.zeros((bs,), np.float32)
            valid[:rem] = 1.0
            batch["_valid"] = valid
            emitted += 1
            yield batch
        # agreed-step padding: fully-invalid batches (multi-host peers
        # with more rows contribute the real gradient for these steps)
        while self.num_batches is not None and emitted < self.num_batches:
            idx = np.zeros(bs, np.int64)
            batch = {k: take(v, idx) for k, v in self.data.items()}
            batch["_valid"] = np.zeros((bs,), np.float32)
            emitted += 1
            yield batch


def split_train_test(data: Batch, test_fraction: float = 0.15, seed: int = 0):
    """Deterministic row split (synthetic-data stand-in for the reference's
    date_-based train/test split, DataGenerator.py:371-372)."""
    n = num_rows(data)
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    cut = int(n * (1.0 - test_fraction))
    tr, te = order[:cut], order[cut:]
    return ({k: v[tr] for k, v in data.items()}, {k: v[te] for k, v in data.items()})
