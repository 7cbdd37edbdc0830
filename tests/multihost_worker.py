"""Worker for the 2-process multi-host test (run via test_multihost.py).

Each process: 4 virtual CPU devices, jax.distributed over a local
coordinator, per-process data shard, streaming Trainer (the multi-host
path: make_array_from_process_local_data + process_allgather eval).
Prints 'EVAL_AUC <value>' at the end; the parent asserts both processes
agree.
"""

import os
import sys


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes

    from rank_tpu.data.loader import ArrayLoader, shard_for_process, split_train_test
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import tiny_schema
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer

    schema = tiny_schema(vocab=64, hist_len=6)
    data = make_synthetic_dataset(schema, num_rows=2048, seed=0)
    train_d, eval_d = split_train_test(data, 0.25)
    train_d = shard_for_process(train_d, process_id, num_processes)
    eval_d = shard_for_process(eval_d, process_id, num_processes)

    global_batch = 256
    per_host = global_batch // num_processes
    trainer = Trainer(
        schema,
        default_config("dcn").replace(hidden_units=(16, 8), num_cross_layers=2),
        TrainConfig(batch_size=global_batch, log_every=0),
    )
    loader = ArrayLoader(train_d, per_host, shuffle=True, seed=1)
    state = trainer.init_state(next(iter(loader)))
    state, _ = trainer.train_epoch(state, loader, 1)
    stats = trainer.evaluate(
        state, ArrayLoader(eval_d, per_host, drop_remainder=False), 1
    )
    print(f"EVAL_AUC {stats['auc']:.6f} ROWS {int(stats['valid'].sum())}")

    # -- device-resident epochs under multi-host (VERDICT r1 #4) --------
    from rank_tpu.train.staged import StagedRunner

    runner = StagedRunner(trainer, train_d, eval_d, per_host)
    # exact plumbing check: staged eval of the STREAMING-trained state
    # must reproduce the streaming eval AUC bit-for-bit (same params,
    # same eval rows; eval-mode BN is row-independent so batching
    # composition cannot change any prediction)
    staged_eval = runner.evaluate(state, 1)
    print(f"STAGED_EVAL_OF_STREAM_STATE {staged_eval['auc']:.6f}")

    # and a full staged training epoch from a fresh state: finite loss,
    # all processes agree on the global eval AUC
    state2 = runner.init_state()
    state2, train_stats = runner.train_epoch(state2, 1, seed=7)
    stats2 = runner.evaluate(state2, 1)
    print(
        f"STAGED_AUC {stats2['auc']:.6f} LOSS {train_stats['loss']:.6f} "
        f"ROWS {int(stats2['valid'].sum())}"
    )


if __name__ == "__main__":
    main()
