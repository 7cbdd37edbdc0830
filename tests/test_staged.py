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
