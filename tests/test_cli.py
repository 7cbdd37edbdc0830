"""CLI argument -> config mapping and end-to-end CLI run on the CPU mesh."""

import os

import pytest

from rank_tpu.cli import build_parser, main, model_config_from_args


def _args(argv):
    return build_parser().parse_args(argv)


def test_reference_flag_names_map():
    a = _args(
        [
            "--model=din", "--hidden_units=128,64", "--activation=prelu",
            "--use_softmax=false", "--l2_lambda=0.1",
            "--mini_batch_aware_regularization=true", "--dropout_rate=0.2",
            "--batch_norm=false",
        ]
    )
    cfg = model_config_from_args(a)
    assert cfg.hidden_units == (128, 64)
    assert cfg.activation == "prelu"
    assert cfg.use_softmax is False
    assert cfg.l2_lambda == 0.1
    assert cfg.mini_batch_aware_regularization is True
    assert cfg.dropout_rate == 0.2
    assert cfg.batch_norm is False


def test_model_specific_aliases():
    cfg = model_config_from_args(_args(["--model=dcn", "--num_cross_layer=5"]))
    assert cfg.num_cross_layers == 5
    cfg = model_config_from_args(
        _args(["--model=deepcrossing", "--residual_network_num=4",
               "--residual_internal_dim=64"])
    )
    assert cfg.num_residual_units == 4
    assert cfg.residual_internal_dim == 64
    cfg = model_config_from_args(
        _args(["--model=bst", "--nhead=4", "--num_transformer_blocks=3",
               "--pooling_method=sum"])
    )
    assert cfg.num_heads == 4
    assert cfg.num_transformer_blocks == 3
    assert cfg.pooling_method == "sum"
    cfg = model_config_from_args(_args(["--model=mmoe", "--tasks=read_comment,like"]))
    assert cfg.tasks == ("read_comment", "like")


def test_unknown_model_exits():
    with pytest.raises(SystemExit):
        model_config_from_args(_args(["--model=nope"]))


def test_defaults_follow_result_md_best():
    """Per-model defaults = each reference result.md best row (BASELINE.md)."""
    assert model_config_from_args(_args(["--model=dcn"])).num_cross_layers == 3
    assert model_config_from_args(_args(["--model=afm"])).embedding_dim == 32
    assert model_config_from_args(_args(["--model=bst"])).pooling_method == "mean"
    din = model_config_from_args(_args(["--model=din"]))
    assert din.activation == "dice" and din.use_softmax is True
    assert not din.mini_batch_aware_regularization


def test_cli_end_to_end_synthetic(tmp_path):
    rc = main(
        [
            "--model=fwfm", "--synthetic=4096", "--num_epochs=1",
            "--batch_size=512", f"--model_dir={tmp_path}/m",
            f"--output_dir={tmp_path}/o", "--device_resident=true",
        ]
    )
    assert rc == 0
    assert os.path.exists(tmp_path / "o" / "predictions.csv")
    assert os.path.exists(tmp_path / "m" / "best_model")


def test_cli_esmm_export_uses_first_task_label(tmp_path):
    """ESMM's prediction export: the primary head is 'ctr', which is not a
    label column — predictions.csv labels must come from tasks[0]
    (read_comment). VERDICT r1 #10."""
    import numpy as np

    rc = main(
        [
            "--model=esmm", "--synthetic=2048", "--num_epochs=1",
            "--batch_size=256", f"--model_dir={tmp_path}/m",
            f"--output_dir={tmp_path}/o", "--device_resident=true",
            "--tasks=read_comment,like",
        ]
    )
    assert rc == 0
    path = tmp_path / "o" / "predictions.csv"
    assert os.path.exists(path)
    rows = np.loadtxt(path, delimiter=",", skiprows=1)
    labels = rows[:, 0]
    # labels are binary and drawn from the read_comment column: compare
    # the exported positive rate with the synthetic dataset's rate for
    # tasks[0] (regenerating the same deterministic synthetic split)
    from rank_tpu.data.loader import split_train_test
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA

    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=2048)
    _, eval_data = split_train_test(data, test_fraction=0.15)
    col = WECHAT_SCHEMA.labels.index("read_comment")
    np.testing.assert_array_equal(
        np.sort(labels), np.sort(eval_data["labels"][:, col])
    )


def test_new_flags_map_to_configs():
    from rank_tpu.cli import build_parser, model_config_from_args

    args = build_parser().parse_args([
        "--model=mmoe", "--task_weighting=gradnorm", "--gradnorm_alpha=0.5",
        "--gradnorm_lr=0.01", "--matmul_precision=highest", "--synthetic=8",
    ])
    cfg = model_config_from_args(args)
    assert cfg.task_weighting == "gradnorm"
    assert cfg.gradnorm_alpha == 0.5
    assert cfg.gradnorm_lr == 0.01
    assert args.matmul_precision == "highest"
