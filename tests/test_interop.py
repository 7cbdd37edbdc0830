"""Reference-checkpoint import (rank_tpu/interop.py): warm-starting flax
models from the reference's trained .pth files."""

import os

import numpy as np
import pytest

DCN_PTH = "/root/reference/algorithm/DCN/model_dir/best_model.pth"

needs_ckpt = pytest.mark.skipif(
    not os.path.exists(DCN_PTH), reason="reference DCN checkpoint not present"
)


@needs_ckpt
def test_import_dcn_checkpoint_into_trainer_state():
    torch = pytest.importorskip("torch")
    import jax

    from rank_tpu.data.loader import ArrayLoader
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.interop import import_reference_checkpoint
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer

    trainer = Trainer(
        WECHAT_SCHEMA, default_config("dcn"),
        TrainConfig(batch_size=32, log_every=0),
    )
    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=64, seed=0)
    loader = ArrayLoader(data, 32)
    state = trainer.init_state(next(iter(loader)))

    host_params = jax.device_get(state["params"])
    new_params, report = import_reference_checkpoint(
        DCN_PTH, "dcn", host_params
    )
    # every checkpoint tensor landed somewhere
    sd = torch.load(DCN_PTH, map_location="cpu", weights_only=True)
    assert set(report) == set(sd)
    # imported verbatim (spot-check the userid table + first dnn kernel)
    np.testing.assert_array_equal(
        np.asarray(new_params["tables"]["table_userid"]["embedding"]),
        sd["embeddings.userid.weight"].numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(new_params["dnn"]["Dense_0"]["kernel"]),
        sd["dnn.0.weight"].numpy().T,
    )
    # cross weights were NOT in the checkpoint (reference fresh-param bug)
    # and keep their fresh init
    np.testing.assert_array_equal(
        np.asarray(new_params["cross"]["w_0"]),
        np.asarray(host_params["cross"]["w_0"]),
    )

    # the warm-started state trains: one step, finite loss
    state["params"] = jax.device_put(
        new_params, trainer._state_shardings["params"]
    )
    step_fn = trainer._get_compiled("train")
    meters = trainer.meters_init()
    state, meters = step_fn(
        state, meters, trainer._host_to_device(next(iter(loader)))
    )
    assert np.isfinite(float(meters["loss"]))


@needs_ckpt
def test_import_into_table_sharded_trainer():
    """Warm-start must compose with automatic vocab padding: with
    table_parallelism=2 the real (odd) vocab sizes are padded up one row
    (train/loop.py), so the checkpoint rows are zero-padded on import
    instead of crashing on a shape mismatch."""
    pytest.importorskip("torch")
    import jax

    from rank_tpu.data.loader import ArrayLoader
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.interop import import_reference_checkpoint
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer

    trainer = Trainer(
        WECHAT_SCHEMA, default_config("dcn"),
        TrainConfig(batch_size=32, log_every=0, table_parallelism=2),
    )
    assert trainer.table_padding  # odd real vocabs got padded
    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=64, seed=0)
    loader = ArrayLoader(data, 32)
    state = trainer.init_state(next(iter(loader)))

    host_params = jax.device_get(state["params"])
    # a bare import (no table_padding map) must refuse the row deficit:
    # without knowing the mesh padding, a smaller checkpoint table could
    # mean a different vocab file, and zero-filled rows would be REACHABLE
    with pytest.raises(ValueError, match="shape mismatch"):
        import_reference_checkpoint(DCN_PTH, "dcn", host_params)
    new_params, report = import_reference_checkpoint(
        DCN_PTH, "dcn", host_params, table_padding=trainer.table_padding
    )
    import torch

    sd = torch.load(DCN_PTH, map_location="cpu", weights_only=True)
    assert set(report) == set(sd)
    got = np.asarray(new_params["tables"]["table_userid"]["embedding"])
    ref = sd["embeddings.userid.weight"].numpy()
    assert got.shape[0] > ref.shape[0]  # padded table
    np.testing.assert_array_equal(got[: ref.shape[0]], ref)
    np.testing.assert_array_equal(got[ref.shape[0] :], 0.0)

    state["params"] = jax.device_put(
        new_params, trainer._state_shardings["params"]
    )
    step_fn = trainer._get_compiled("train")
    meters = trainer.meters_init()
    state, meters = step_fn(
        state, meters, trainer._host_to_device(next(iter(loader)))
    )
    assert np.isfinite(float(meters["loss"]))


@needs_ckpt
def test_import_rejects_non_padding_row_deficit(tmp_path):
    """A checkpoint whose table is smaller for any reason OTHER than the
    known mesh padding (e.g. built against an older/smaller vocab file)
    must fail loudly, not zero-fill reachable ids (ADVICE r2 #1)."""
    torch = pytest.importorskip("torch")
    import jax

    from rank_tpu.data.loader import ArrayLoader
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.interop import import_reference_checkpoint
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer

    trainer = Trainer(
        WECHAT_SCHEMA, default_config("dcn"),
        TrainConfig(batch_size=32, log_every=0, table_parallelism=2),
    )
    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=64, seed=0)
    state = trainer.init_state(next(iter(ArrayLoader(data, 32))))
    host_params = jax.device_get(state["params"])

    sd = torch.load(DCN_PTH, map_location="cpu", weights_only=True)
    # shrink userid by one row: deficit no longer equals the mesh padding
    sd["embeddings.userid.weight"] = sd["embeddings.userid.weight"][:-1]
    bad = tmp_path / "smaller_vocab.pth"
    torch.save(sd, bad)
    with pytest.raises(ValueError, match="known mesh padding"):
        import_reference_checkpoint(
            str(bad), "dcn", host_params, table_padding=trainer.table_padding
        )


@needs_ckpt
def test_import_rejects_unknown_tensors(tmp_path):
    torch = pytest.importorskip("torch")

    from rank_tpu.interop import import_reference_checkpoint

    sd = torch.load(DCN_PTH, map_location="cpu", weights_only=True)
    sd["mystery.weight"] = torch.zeros(3)
    bad = tmp_path / "bad.pth"
    torch.save(sd, bad)
    with pytest.raises(ValueError, match="no flax home"):
        import_reference_checkpoint(str(bad), "dcn", {})


def test_mapping_unknown_model():
    from rank_tpu.interop import reference_mapping

    with pytest.raises(ValueError, match="dcn and deepcrossing"):
        reference_mapping("bst")
