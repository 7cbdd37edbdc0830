"""Device-resident (staged) runner vs the streaming loop: evaluation must
be bit-identical for the same state; training must learn equivalently."""

import jax
import numpy as np

from rank_tpu.data.loader import ArrayLoader, split_train_test
from rank_tpu.data.synthetic import make_synthetic_dataset
from rank_tpu.features import tiny_schema
from rank_tpu.models import default_config
from rank_tpu.train import TrainConfig, Trainer
from rank_tpu.train.staged import StagedRunner

SCHEMA = tiny_schema(vocab=128, hist_len=8)
DATA = make_synthetic_dataset(SCHEMA, num_rows=4096, seed=0)
TRAIN, TEST = split_train_test(DATA, test_fraction=0.25)


def _trainer():
    cfg = default_config("dcn").replace(hidden_units=(32, 16), num_cross_layers=2)
    return Trainer(SCHEMA, cfg, TrainConfig(batch_size=256, log_every=0))


def test_staged_eval_matches_streaming():
    trainer = _trainer()
    runner = StagedRunner(trainer, TRAIN, TEST, 256)
    state = runner.init_state()
    staged = runner.evaluate(state, 1)
    streaming = trainer.evaluate(
        state, ArrayLoader(TEST, 256, drop_remainder=False), 1
    )
    assert abs(staged["auc"] - streaming["auc"]) < 1e-6
    assert abs(staged["loss"] - streaming["loss"]) < 1e-5
    n_valid = int(streaming["valid"].sum())
    task = next(iter(staged["predictions"]))
    np.testing.assert_allclose(
        staged["predictions"][task][:n_valid],
        streaming["predictions"][task][:n_valid],
        rtol=1e-5, atol=1e-7,
    )


def test_staged_training_learns():
    trainer = _trainer()
    runner = StagedRunner(trainer, TRAIN, TEST, 256)
    state = runner.init_state()
    for epoch in range(1, 4):
        state, stats = runner.train_epoch(state, epoch)
    assert stats["auc"] > 0.6, stats
    ev = runner.evaluate(state, 3)
    assert ev["auc"] > 0.6, ev


def test_fresh_meters_and_state_scalars_are_mesh_committed():
    """Fresh meters / step / rng must carry the mesh's replicated sharding:
    an empty-sharding aval differs from the compiled step's output aval and
    forces a full recompile at every epoch's first dispatch (~12 s each
    through the TPU tunnel; fixed in Trainer.meters_init/init_state)."""
    import jax
    from rank_tpu.data.loader import ArrayLoader
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import tiny_schema
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer

    schema = tiny_schema(vocab=64, hist_len=4)
    data = make_synthetic_dataset(schema, num_rows=256, seed=0)
    t = Trainer(schema, default_config("dcn"), TrainConfig(batch_size=128, log_every=0))
    state = t.init_state(next(iter(ArrayLoader(data, 128))))
    repl = t._repl
    for key in ("step", "rng"):
        assert state[key].sharding == repl, (key, state[key].sharding)
    for k, v in t.meters_init().items():
        assert v.sharding == repl, (k, v.sharding)


def test_pack_unpack_roundtrip():
    """pack_columns -> unpack_columns must reproduce every column exactly
    (f32 via bitcast, ints via widening)."""
    import jax.numpy as jnp
    import numpy as np

    from rank_tpu.train.staged import pack_columns, unpack_columns

    rng = np.random.default_rng(0)
    data = {
        "dense": rng.normal(size=(17, 5)).astype(np.float32),
        "ids": rng.integers(0, 1000, size=(17,)).astype(np.int32),
        "seq": rng.integers(0, 1000, size=(17, 6)).astype(np.int32),
        "labels": (rng.random((17, 3)) < 0.3).astype(np.float32),
        "small": rng.integers(0, 100, size=(17,)).astype(np.int16),
    }
    packed, specs = pack_columns(data)
    assert packed.dtype == np.int32
    out = unpack_columns(jnp.asarray(packed), specs)
    for k, v in data.items():
        assert out[k].dtype == v.dtype, k
        np.testing.assert_array_equal(np.asarray(out[k]), v, err_msg=k)


def test_interleaved_layout_bitmatches_contiguous_and_drops_gathers():
    """Block-interleaved staging (REPRODUCING §5c): (a) every step's batch
    is BIT-IDENTICAL to the old contiguous-global-slice layout (the
    interleave map is composed into the epoch permutation), and (b) the
    compiled train step contains ZERO data-redistribution collectives
    (all-gather / all-to-all), while the old layout's contiguous slicing
    over the P('data')-sharded matrix emits them every step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rank_tpu.train.staged import unpack_columns

    schema = tiny_schema(vocab=64, hist_len=6)
    cfg = default_config("dcn").replace(hidden_units=(16, 8), num_cross_layers=2)
    data = make_synthetic_dataset(schema, num_rows=512, seed=1)
    tr = Trainer(schema, cfg, TrainConfig(batch_size=64, log_every=0))
    runner = StagedRunner(tr, data, data, 64, steps_per_dispatch=2)
    state = runner.init_state()
    runner._build()
    bs = runner.global_bs
    d_data = tr.mesh.shape["data"]
    assert d_data == 8  # the conftest virtual mesh — sigma is non-trivial
    bpd = bs // d_data

    # (a) bit-identical step batches vs the old layout
    seed = 7
    shuffled3 = runner._shuffle_fn(runner.train_staged, seed)
    n = runner.train_steps * bs
    perm = np.asarray(jax.random.permutation(jax.random.PRNGKey(seed), n))
    old_shuffled = np.asarray(runner.train_staged)[perm]
    got3 = np.asarray(shuffled3)
    for i in range(runner.train_steps):
        new_batch = got3[:, i * bpd:(i + 1) * bpd, :].reshape(bs, -1)
        np.testing.assert_array_equal(
            new_batch, old_shuffled[i * bs:(i + 1) * bs]
        )

    # (b) collective inventory
    def gathers(compiled):
        txt = compiled.as_text()
        return txt.count("all-gather") + txt.count("all-to-all")

    new_compiled = runner._train_step.lower(
        state, tr.meters_init(), shuffled3, 0
    ).compile()
    assert gathers(new_compiled) == 0

    def old_steps(state, meters, shuffled, i0):
        for k in range(2):
            rows = jax.lax.dynamic_slice_in_dim(shuffled, (i0 + k) * bs, bs, axis=0)
            batch = unpack_columns(rows, runner.train_specs)
            state, meters = tr._train_step(state, meters, batch)
        return state, meters

    old_fn = jax.jit(
        old_steps,
        in_shardings=(
            tr._state_shardings, None, NamedSharding(tr.mesh, P("data", None)), None,
        ),
        out_shardings=(tr._state_shardings, None),
    )
    old_compiled = old_fn.lower(
        state, tr.meters_init(), runner.train_staged, 0
    ).compile()
    assert gathers(old_compiled) > 0

    # eval data got the same one-time reorder: slicing the 3-D view gives
    # the original contiguous eval batches. (The pre-interleave device
    # copy is freed after _build — recompute the expected packing on host.)
    from rank_tpu.train.staged import _pad_rows, pack_columns

    assert runner.eval_staged is None  # HBM copy dropped (ADVICE r3)
    ev3 = np.asarray(runner._eval_staged3)
    ev, _ = pack_columns(_pad_rows(data, 64)[0])
    for i in range(runner.eval_steps):
        np.testing.assert_array_equal(
            ev3[:, i * bpd:(i + 1) * bpd, :].reshape(bs, -1),
            ev[i * bs:(i + 1) * bs],
        )


def test_local_shuffle_mode_is_collective_free_and_covers_all_rows():
    """shuffle_mode='local': per-shard epoch permutation — the compiled
    shuffle contains ZERO collectives (vs the global mode's cross-shard
    permutation gather), every shard keeps exactly its own rows (each
    exactly once), and a training epoch still trains every valid row."""
    schema = tiny_schema(vocab=64, hist_len=6)
    cfg = default_config("dcn").replace(hidden_units=(16, 8), num_cross_layers=2)
    data = make_synthetic_dataset(schema, num_rows=512, seed=1)
    tr = Trainer(schema, cfg, TrainConfig(batch_size=64, log_every=0))
    runner = StagedRunner(tr, data, data, 64, steps_per_dispatch=2,
                          shuffle_mode="local")
    state = runner.init_state()
    runner._build()
    d_data = tr.mesh.shape["data"]
    n = runner.train_steps * runner.global_bs

    def collectives(compiled):
        txt = compiled.as_text()
        return sum(txt.count(c) for c in
                   ("all-gather", "all-to-all", "all-reduce",
                    "collective-permute", "reduce-scatter"))

    shuffle_c = runner._shuffle_fn.lower(runner.train_staged, 3).compile()
    assert collectives(shuffle_c) == 0

    # the one-time stride interleave ran at build: device shard d holds
    # dataset rows d, d+D, d+2D, ... (NOT a contiguous block of the input
    # order), so per-shard permutation stays unbiased on sorted inputs
    from rank_tpu.train.staged import _pad_rows, pack_columns

    orig, _ = pack_columns(_pad_rows(data, 64)[0])
    staged_now = np.asarray(runner.train_staged).reshape(d_data, n // d_data, -1)
    for d in range(d_data):
        np.testing.assert_array_equal(staged_now[d], orig[d::d_data])

    # per-shard row multiset preserved exactly
    staged3 = np.asarray(runner.train_staged).reshape(d_data, n // d_data, -1)
    got3 = np.asarray(runner._shuffle_fn(runner.train_staged, 3))
    for d in range(d_data):
        a = staged3[d][np.lexsort(staged3[d].T)]
        b = got3[d][np.lexsort(got3[d].T)]
        np.testing.assert_array_equal(a, b)
    # and it actually permuted within shards
    assert not np.array_equal(staged3, got3)

    # a full epoch trains every valid row exactly once
    state, stats = runner.train_epoch(state, 1)
    assert int(stats["count"]) == 512

    # invalid CLI-facing value fails loudly
    import pytest

    with pytest.raises(ValueError, match="global|local"):
        StagedRunner(tr, data, data, 64, shuffle_mode="bogus")
