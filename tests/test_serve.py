"""Serving path: checkpoint -> Predictor -> probabilities matching the
trainer's eval predictions."""

import numpy as np

from rank_tpu.data.loader import ArrayLoader, split_train_test
from rank_tpu.data.synthetic import make_synthetic_dataset
from rank_tpu.features import tiny_schema
from rank_tpu.models import default_config
from rank_tpu.serve import Predictor
from rank_tpu.train import CheckpointManager, TrainConfig, Trainer

SCHEMA = tiny_schema(vocab=64, hist_len=6)
DATA = make_synthetic_dataset(SCHEMA, num_rows=1024, seed=0)
TRAIN, TEST = split_train_test(DATA, 0.25)


def test_predictor_matches_eval(tmp_path):
    cfg = default_config("dcn").replace(hidden_units=(16, 8), num_cross_layers=2)
    trainer = Trainer(SCHEMA, cfg, TrainConfig(batch_size=128, log_every=0))
    loader = ArrayLoader(TRAIN, 128, shuffle=True)
    state = trainer.init_state(next(iter(loader)))
    state, _ = trainer.train_epoch(state, loader, 1)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_best(state)

    stats = trainer.evaluate(
        state, ArrayLoader(TEST, 128, drop_remainder=False), 1
    )
    want = stats["predictions"]["read_comment"]
    n_valid = int(stats["valid"].sum())

    pred = Predictor(SCHEMA, cfg, model_dir=str(tmp_path), min_bucket=64)
    got = pred({k: v for k, v in TEST.items() if k != "labels"})["score"]
    np.testing.assert_allclose(got[:n_valid], want[:n_valid], rtol=1e-5, atol=1e-6)


def test_predictor_bf16_weights_track_f32(tmp_path):
    """weights_dtype='bfloat16' (halved weight/gather traffic for serving)
    must keep probabilities within bf16 resolution of the f32 predictor,
    and must NOT cast the BatchNorm running statistics."""
    import jax.numpy as jnp

    cfg = default_config("dcn").replace(hidden_units=(16, 8), num_cross_layers=2)
    trainer = Trainer(SCHEMA, cfg, TrainConfig(batch_size=128, log_every=0))
    loader = ArrayLoader(TRAIN, 128, shuffle=True)
    state = trainer.init_state(next(iter(loader)))
    state, _ = trainer.train_epoch(state, loader, 1)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_best(state)

    req = {k: v for k, v in TEST.items() if k != "labels"}
    f32 = Predictor(SCHEMA, cfg, model_dir=str(tmp_path), min_bucket=64)
    bf16 = Predictor(
        SCHEMA, cfg, model_dir=str(tmp_path), min_bucket=64,
        weights_dtype="bfloat16",
    )
    import jax

    assert all(
        x.dtype == jnp.bfloat16
        for x in jax.tree_util.tree_leaves(bf16.variables["params"])
        if jnp.asarray(x).dtype != jnp.int32
    )
    if "batch_stats" in bf16.variables:
        assert all(
            jnp.asarray(x).dtype == jnp.float32
            for x in jax.tree_util.tree_leaves(bf16.variables["batch_stats"])
        )
    a = f32(req)["score"]
    b = bf16(req)["score"]
    np.testing.assert_allclose(a, b, atol=2e-2)
    assert np.isfinite(b).all()


def test_predictor_odd_batch_sizes(tmp_path):
    cfg = default_config("deepfm").replace(hidden_units=(8,), embedding_dim=4)
    trainer = Trainer(SCHEMA, cfg, TrainConfig(batch_size=128, log_every=0))
    loader = ArrayLoader(TRAIN, 128)
    state = trainer.init_state(next(iter(loader)))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_best(state)
    pred = Predictor(SCHEMA, cfg, model_dir=str(tmp_path), min_bucket=16)
    for n in (1, 7, 16, 33):
        req = {k: v[:n] for k, v in TEST.items() if k != "labels"}
        out = pred(req)["score"]
        assert out.shape == (n,)
        assert np.all((out >= 0) & (out <= 1))


def test_stablehlo_export_roundtrip(tmp_path):
    """export_serving_artifact -> load_serving_artifact must reproduce the
    Predictor's probabilities exactly (weights baked as constants)."""
    import numpy as np

    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import tiny_schema
    from rank_tpu.models import default_config
    from rank_tpu.serve import (
        Predictor, export_serving_artifact, load_serving_artifact,
    )

    schema = tiny_schema(vocab=64, hist_len=4)
    cfg = default_config("dcn").replace(
        hidden_units=(16, 8), embedding_dim=4, num_cross_layers=2
    )
    import flax.linen as nn
    import jax
    from rank_tpu.models import build_model

    model = build_model(schema, cfg)
    sample = make_synthetic_dataset(schema, num_rows=8, seed=0)
    variables = nn.meta.unbox(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            {k: v for k, v in sample.items()},
            train=False,
        )
    )
    pred = Predictor(schema, cfg, variables=variables, min_bucket=8)
    path = str(tmp_path / "serving.stablehlo")
    export_serving_artifact(pred, path, batch_size=8)

    want = pred(sample)
    fn = load_serving_artifact(path)
    batch = {k: v for k, v in sample.items() if k not in ("labels", "_valid")}
    batch["labels"] = np.zeros((8, len(schema.labels)), np.float32)
    got = fn(batch)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-7)
