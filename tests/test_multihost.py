"""True multi-process 'multi-host' validation on CPU: two jax.distributed
processes (4 virtual devices each) train data-parallel and evaluate with
process-allgathered predictions. Both processes must report the same AUC
over the full (un-duplicated) eval set."""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_eval():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip axon registration races
    # the worker script lives in tests/, so Python puts tests/ (not the repo
    # root) on sys.path — make rank_tpu importable regardless of install state
    repo_root = str(WORKER.parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=str(WORKER.parent.parent),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\nstdout:{out}\nstderr:{err[-3000:]}"
    aucs, rows = [], []
    staged_of_stream, staged_aucs, staged_losses, staged_rows = [], [], [], []
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith("EVAL_AUC"):
                parts = line.split()
                aucs.append(float(parts[1]))
                rows.append(int(parts[3]))
            elif line.startswith("STAGED_EVAL_OF_STREAM_STATE"):
                staged_of_stream.append(float(line.split()[1]))
            elif line.startswith("STAGED_AUC"):
                parts = line.split()
                staged_aucs.append(float(parts[1]))
                staged_losses.append(float(parts[3]))
                staged_rows.append(int(parts[5]))
    assert len(aucs) == 2, outs
    # both processes computed the same global AUC over all 512 eval rows
    assert abs(aucs[0] - aucs[1]) < 1e-6, aucs
    assert rows[0] == rows[1] == 512, rows
    # staged eval plumbing reproduces the streaming eval on the SAME
    # state (exact: order-invariant AUC over identical per-row probs)
    assert len(staged_of_stream) == 2, outs
    for s in staged_of_stream:
        assert abs(s - aucs[0]) < 1e-5, (s, aucs[0])
    # staged multi-host TRAINING ran: finite loss, both processes agree
    assert len(staged_aucs) == 2, outs
    assert abs(staged_aucs[0] - staged_aucs[1]) < 1e-6, staged_aucs
    assert staged_rows[0] == staged_rows[1] == 512, staged_rows
    import math

    assert all(math.isfinite(l) for l in staged_losses), staged_losses
