"""Single config-driven CLI for all 16 models.

Replaces the reference's per-model argparse mains (README.md:47-56,
``deepfm.py:295-313``, ``din.py:487-508``, ...) with one entry point:

    python -m rank_tpu.cli --model=din --train_data=train.parquet \
        --eval_data=test.parquet --vocabulary_dir=vocabulary \
        --use_softmax=true --activation=dice

Hyperparameter names follow the reference CLIs where they exist. Data may
be the ETL's parquet (encoded on the fly), a pre-encoded .npz, or
``--synthetic=N`` rows for demos/benchmarks.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from .data.encode import encode_dataframe, load_npz
from .data.loader import ArrayLoader, shard_for_process, split_train_test
from .data.synthetic import make_synthetic_dataset
from .features import WECHAT_SCHEMA, schema_from_vocab_dir
from .models import default_config
from .train import CheckpointManager, TrainConfig, Trainer, export_predictions


def _str2bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes", "y")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native CTR rank-model zoo")
    p.add_argument("--model", type=str, required=True,
                   help="one of the 16 zoo models, e.g. dcn, din, bst, mmoe")
    # data
    p.add_argument("--train_data", type=str, default=None)
    p.add_argument("--eval_data", type=str, default=None)
    p.add_argument("--vocabulary_dir", type=str, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic rows instead of real data")
    p.add_argument("--synthetic_calibrated", type=float, default=0.0,
                   help="train on the EDA-calibrated synthetic log at this "
                   "scale (1.0 = the reference's 3.32M/609k split; the "
                   "log is generated once, run through the full WeChatETL "
                   "and cached — data/calibrated.py)")
    # reference-named training flags (deepfm.py:295-313)
    p.add_argument("--model_dir", type=str, default="./model_dir")
    p.add_argument("--output_dir", type=str, default="./output_dir")
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--learning_rate", type=float, default=0.005)
    p.add_argument("--save_checkpoints_steps", type=int, default=1000)
    p.add_argument("--resume", type=_str2bool, default=False)
    p.add_argument("--init_from_reference", type=str, default=None,
                   help="warm-start from a reference best_model.pth "
                   "(dcn/deepcrossing): trained tensors are imported, "
                   "layers absent from the checkpoint keep fresh init")
    # model hyperparameters (union; reference names)
    p.add_argument("--hidden_units", type=str, default=None)
    p.add_argument("--embedding_dim", type=int, default=None)
    p.add_argument("--dropout_rate", type=float, default=None)
    p.add_argument("--batch_norm", type=_str2bool, default=None)
    p.add_argument("--activation", type=str, default=None)
    p.add_argument("--use_softmax", type=_str2bool, default=None)
    p.add_argument("--l2_lambda", type=float, default=None)
    p.add_argument("--mini_batch_aware_regularization", type=_str2bool, default=None)
    p.add_argument("--num_cross_layer", type=int, default=None)
    p.add_argument("--cross_frozen_random", type=_str2bool, default=None,
                   help="reference-bug emulation: untrained N(0,1) cross "
                   "weights (ops/cross.py CrossNetwork.frozen_random)")
    p.add_argument("--residual_internal_dim", type=int, default=None)
    p.add_argument("--residual_network_num", type=int, default=None)
    p.add_argument("--attention_factor", type=int, default=None)
    p.add_argument("--nhead", type=int, default=None)
    p.add_argument("--num_transformer_blocks", type=int, default=None)
    p.add_argument("--attn_impl", type=str, default=None,
                   choices=("vpu", "vpu2", "einsum"))
    p.add_argument("--pooling_method", type=str, default=None)
    p.add_argument("--tasks", type=str, default=None,
                   help="comma list for multi-task models")
    p.add_argument("--task_weighting", type=str, default=None,
                   choices=("sum", "uncertainty", "gradnorm", "pcgrad"),
                   help="multi-task strategy: uncertainty = learned "
                   "log-variances (Kendall 2018); gradnorm = adaptive task "
                   "weights (Chen 2018); pcgrad = gradient surgery (Yu 2020)")
    p.add_argument("--gradnorm_alpha", type=float, default=None)
    p.add_argument("--gradnorm_lr", type=float, default=None)
    p.add_argument("--autoint_layers", type=int, default=None)
    p.add_argument("--autoint_heads", type=int, default=None)
    p.add_argument("--autoint_att_dim", type=int, default=None)
    # parallelism / performance
    p.add_argument("--table_parallelism", type=int, default=1)
    p.add_argument("--embedding_mode", type=str, default=None,
                   choices=("gspmd", "psum", "alltoall"),
                   help="embedding lookup schedule on a table-sharded "
                   "mesh: gspmd (XLA-inserted collectives, default) or "
                   "the explicit shard_map schedules psum/alltoall")
    p.add_argument("--label", type=str, default="read_comment")
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--gradient_clip_norm", type=float, default=0.0)
    p.add_argument("--matmul_precision", type=str, default=None,
                   choices=("bfloat16", "float32", "highest"),
                   help="MXU matmul pass precision (default: XLA default, "
                   "which already runs bf16-input passes here; "
                   "'highest' measured free at the WeChat dims — see "
                   "docs/REPRODUCING.md section 5)")
    p.add_argument("--multihot_tags", type=_str2bool, default=None)
    p.add_argument("--dense_init", type=str, default=None,
                   choices=("lecun", "torch"),
                   help="dense-layer init family: flax lecun defaults or "
                   "torch nn.Linear defaults (ops/mlp.py dense_init_kwargs)")
    p.add_argument("--embedding_init", type=str, default=None,
                   choices=("normal", "normal_small", "truncated_normal",
                            "xavier_uniform"),
                   help="embedding table init; 'normal' is the reference's "
                   "torch default, 'normal_small' (std 0.1) is required "
                   "for second-order id-pair learning (embedding/"
                   "collection.py INITIALIZERS)")
    p.add_argument(
        "--device_resident", type=_str2bool, default=True,
        help="stage the whole dataset in HBM and run each epoch as one "
        "jitted scan (single-process; falls back to streaming otherwise)",
    )
    p.add_argument(
        "--staged_shuffle", choices=("global", "local"), default="global",
        help="epoch shuffle on the staged path: 'global' = one uniform "
        "permutation over all rows (one cross-shard gather/epoch, "
        "reference DataLoader semantics); 'local' = per-data-shard "
        "permutation (zero data collectives on a pod)",
    )
    return p


_CFG_MAP = {
    "hidden_units": lambda v: tuple(int(x) for x in v.split(",")),
    "embedding_dim": int,
    "dropout_rate": float,
    "batch_norm": bool,
    "activation": str,
    "use_softmax": bool,
    "l2_lambda": float,
    "mini_batch_aware_regularization": bool,
    "attention_factor": int,
    "num_transformer_blocks": int,
    "attn_impl": str,
    "pooling_method": str,
    "residual_internal_dim": int,
    "multihot_tags": bool,
    "tasks": lambda v: tuple(v.split(",")),
    "task_weighting": str,
    "gradnorm_alpha": float,
    "gradnorm_lr": float,
    "autoint_layers": int,
    "autoint_heads": int,
    "autoint_att_dim": int,
    "embedding_mode": str,
    "dense_init": str,
    "embedding_init": str,
    "cross_frozen_random": bool,
}


def model_config_from_args(args) -> "ModelConfig":
    from .models import DEFAULT_CONFIGS

    if args.model not in DEFAULT_CONFIGS:
        raise SystemExit(
            f"unknown model {args.model!r}; available: {sorted(DEFAULT_CONFIGS)}"
        )
    overrides = {}
    for k, conv in _CFG_MAP.items():
        v = getattr(args, k, None)
        if v is not None:
            overrides[k] = conv(v) if not isinstance(v, (bool, int, float, tuple)) else v
    if args.num_cross_layer is not None:
        overrides["num_cross_layers"] = args.num_cross_layer
    if args.residual_network_num is not None:
        overrides["num_residual_units"] = args.residual_network_num
    if args.nhead is not None:
        overrides["num_heads"] = args.nhead
    return default_config(args.model, **overrides)


def _load_split(path: str, schema, vocab_dir):
    if path.endswith(".npz"):
        return load_npz(path)
    import pandas as pd

    df = pd.read_parquet(path)
    return encode_dataframe(df, schema, vocab_dir)


def _restore_normal_form(trainer, state, what, restore_fn):
    """Restore a checkpoint saved in the depadded normal form (table rows
    at caller-schema vocab sizes, ``Trainer.depad_state``), re-pad for
    this run's mesh, and commit to this trainer's shardings.

    Falls back to a PADDED template for legacy checkpoints written by
    table-sharded runs before the normal form landed (their tables were
    saved with mesh padding), naming the format change so the failure
    mode is not a bare orbax shape mismatch."""
    try:
        restored = restore_fn(trainer.depad_state(state))
        return trainer.commit_state(trainer.repad_state(restored, like=state))
    except Exception as e:
        if not trainer.table_padding:
            raise
        print(
            f"[checkpoint] restoring {what} with a depadded template failed "
            f"({type(e).__name__}); retrying with the padded template — "
            "this checkpoint likely predates the depadded normal form "
            "(tables saved WITH mesh padding). It only restores under the "
            "same table_parallelism; re-save from this run to migrate."
        )
        return trainer.commit_state(restore_fn(state))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.synthetic_calibrated:
        from .data.calibrated import make_calibrated_dataset

        train_data, eval_data, schema = make_calibrated_dataset(
            scale=args.synthetic_calibrated
        )
    elif args.synthetic:
        schema = WECHAT_SCHEMA
        data = make_synthetic_dataset(schema, num_rows=args.synthetic)
        train_data, eval_data = split_train_test(data, test_fraction=0.15)
    else:
        if not (args.train_data and args.eval_data and args.vocabulary_dir):
            print(
                "need --train_data/--eval_data/--vocabulary_dir or --synthetic=N",
                file=sys.stderr,
            )
            return 2
        # fail loudly on a wrong vocabulary dir: load_vocabulary returns []
        # for missing files, which would silently train on 100% OOV ids
        missing = [
            f.vocab_file
            for f in WECHAT_SCHEMA.categorical
            if not os.path.exists(
                os.path.join(args.vocabulary_dir, f.vocab_file)
            )
        ]
        if missing:
            print(
                f"vocabulary files missing in {args.vocabulary_dir!r}: "
                f"{missing} — wrong --vocabulary_dir?",
                file=sys.stderr,
            )
            return 2
        schema = schema_from_vocab_dir(WECHAT_SCHEMA, args.vocabulary_dir)
        train_data = _load_split(args.train_data, schema, args.vocabulary_dir)
        eval_data = _load_split(args.eval_data, schema, args.vocabulary_dir)

    import jax

    train_data = shard_for_process(
        train_data, jax.process_index(), jax.process_count()
    )
    eval_data = shard_for_process(
        eval_data, jax.process_index(), jax.process_count()
    )

    model_cfg = model_config_from_args(args)
    train_cfg = TrainConfig(
        model_dir=args.model_dir,
        output_dir=args.output_dir,
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        save_checkpoints_steps=args.save_checkpoints_steps,
        label=args.label,
        table_parallelism=args.table_parallelism,
        profile_dir=args.profile_dir,
        gradient_clip_norm=args.gradient_clip_norm,
        matmul_precision=args.matmul_precision,
    )
    trainer = Trainer(schema, model_cfg, train_cfg)
    per_host_bs = max(
        train_cfg.batch_size // jax.process_count(), jax.local_device_count()
    )

    # device-resident epochs work under multi-host too: each process
    # stages its shard, the global packed matrix is assembled via
    # make_array_from_process_local_data (train/staged.py)
    use_staged = args.device_resident
    runner = None
    if use_staged:
        from .train.staged import StagedRunner

        runner = StagedRunner(trainer, train_data, eval_data, per_host_bs,
                              shuffle_mode=args.staged_shuffle)
        state = runner.init_state()
    else:
        sample = next(iter(ArrayLoader(train_data, per_host_bs)))
        state = trainer.init_state(sample)
    if args.init_from_reference:
        from .interop import import_reference_checkpoint

        new_params, report = import_reference_checkpoint(
            args.init_from_reference, args.model,
            jax.device_get(state["params"]),
            table_padding=trainer.table_padding,
        )
        state["params"] = jax.device_put(
            new_params, trainer._state_shardings["params"]
        )
        print(
            f"warm-started {len(report)} tensors from "
            f"{args.init_from_reference}"
        )
    mgr = CheckpointManager(args.model_dir)

    start_epoch = 1
    best_auc = 0.0
    if args.resume and mgr.latest_epoch() is not None:
        # checkpoints on disk are in unpadded (caller-schema) table shapes
        # (Trainer.depad_state); restore via a depadded template, then
        # re-pad for this run's mesh and commit every leaf to this
        # trainer's shardings (orbax restores with the file's shardings,
        # which may come from a different mesh/table_parallelism)
        epoch = mgr.latest_epoch()
        restored = _restore_normal_form(
            trainer, state, f"checkpoint_epoch_{epoch}",
            lambda tpl: mgr.restore_epoch(tpl, epoch)[0],
        )
        state = restored
        start_epoch = epoch + 1
        best_auc = mgr.epoch_metrics(epoch).get("best_auc", 0.0)
        print(f"resumed from checkpoint_epoch_{epoch} (best_auc={best_auc:.4f})")

    # streaming loaders keep the remainder batch (pad + _valid mask, like
    # eval — up to batch_size-1 rows per epoch trained nowhere before) and
    # agree on a cross-process batch count so unequal multi-host shards
    # still run the same number of collective steps
    from .data.loader import num_rows as _num_rows
    from .train.staged import _agreed_steps

    train_batches = _agreed_steps(_num_rows(train_data), per_host_bs)
    eval_batches = _agreed_steps(_num_rows(eval_data), per_host_bs)

    def run_eval(epoch):
        if runner is not None:
            return runner.evaluate(state, epoch)
        loader = ArrayLoader(
            eval_data, per_host_bs, drop_remainder=False,
            num_batches=eval_batches,
        )
        return trainer.evaluate(state, loader, epoch)

    import json

    os.makedirs(args.output_dir, exist_ok=True)
    history_path = os.path.join(args.output_dir, "metrics_history.jsonl")

    for epoch in range(start_epoch, args.num_epochs + 1):
        if runner is not None:
            state, train_stats = runner.train_epoch(state, epoch, train_cfg.seed)
        else:
            loader = ArrayLoader(
                train_data, per_host_bs, shuffle=True,
                seed=train_cfg.seed + epoch, drop_remainder=False,
                num_batches=train_batches,
            )
            state, train_stats = trainer.train_epoch(state, loader, epoch)
        stats = run_eval(epoch)
        if jax.process_index() == 0:
            with open(history_path, "a") as f:
                f.write(json.dumps({
                    "epoch": epoch,
                    "train_loss": train_stats["loss"],
                    "train_auc": train_stats["auc"],
                    "train_examples_per_s": train_stats.get("examples_per_s"),
                    "eval_loss": stats["loss"],
                    "eval_auc": stats["auc"],
                    "eval_task_aucs": stats.get("task_aucs"),
                }) + "\n")
        if stats["auc"] > best_auc:
            best_auc = stats["auc"]
            mgr.save_best(trainer.depad_state(state))
            print(f"Model saved at epoch {epoch} with best AUC: {best_auc:.4f}")
        if epoch % args.save_checkpoints_steps == 0:
            mgr.save_epoch(
                trainer.depad_state(state), epoch,
                {"eval_auc": stats["auc"], "best_auc": best_auc},
            )

    # reload best, export predictions (deepfm.py:273-293)
    if mgr.has_best():
        state = _restore_normal_form(trainer, state, "best_model", mgr.restore_best)
    stats = run_eval(args.num_epochs)
    primary = "ctr" if "ctr" in stats["predictions"] else next(iter(trainer.label_cols))
    preds = stats["predictions"][primary]
    mask = stats["valid"] > 0
    if primary in trainer.label_cols:
        label_col = trainer.label_cols[primary]
    else:
        # ESMM's primary head is "ctr", which predicts the first task's
        # label (models/multitask.py); its name is not a label column.
        label_col = trainer.label_cols[model_cfg.tasks[0]]
    path = export_predictions(
        args.output_dir,
        stats["labels"][mask, label_col],
        preds[mask],
        label_name=args.label,
    )
    print(f"Predictions saved to {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
