"""Device-resident epochs: the whole dataset staged in HBM once; each
train step gathers its minibatch on device.

Rationale (measured on the v5e chip):
  * the naive streaming loop pays a synchronous host->device batch upload
    per step (~230 ms/step at batch 4096 through this environment's
    tunnel) — 400x the step's compute (~0.6 ms);
  * a whole-epoch ``lax.scan`` removes dispatches but the carried
    train-state is NOT aliased in-place across while-loop iterations on
    this backend: a carry-only scan costs ~27 ms/step in pure state
    copies (measured), and the full step ~210 ms/step;
  * the winning layout: stage the dataset in HBM (WeChat train split is
    ~1.3 GB vs 16 GB HBM), keep the dispatched python-loop step (donated
    state, in-place update, 0.6 ms), and per step ship only a scalar step
    index — the permutation lives on device too
    (``jax.random.permutation`` once per epoch).

Shuffling is a fresh on-device permutation per epoch, matching the
reference DataLoader(shuffle=True) semantics (deepfm.py:222-227).

Multi-device note: under a >1-device 'data' axis the permuted gather
crosses shard boundaries and GSPMD inserts collectives; single-chip (the
bench hardware) and replicated meshes run collective-free. The streaming
path remains for multi-host input sharding.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import metrics as M


def stage(trainer, data: Dict[str, np.ndarray], batch_size: int):
    """Pad rows to a batch multiple, add the validity mask, upload once."""
    n = next(iter(data.values())).shape[0]
    steps = -(-n // batch_size)
    padded_n = steps * batch_size
    out = {}
    for k, v in data.items():
        if padded_n != n:
            pad = np.repeat(v[:1], padded_n - n, axis=0)
            v = np.concatenate([v, pad], axis=0)
        out[k] = v
    valid = np.zeros((padded_n,), np.float32)
    valid[:n] = 1.0
    out["_valid"] = valid
    return trainer._host_to_device(out), steps


class StagedRunner:
    """Drives device-resident train/eval for one Trainer + dataset pair.

    ``steps_per_dispatch`` unrolls several train steps into one jitted
    program (a python loop inside jit, NOT lax.scan — within a single
    program XLA aliases the state updates in place, avoiding the
    while-loop carry copies documented above) to amortise the dispatch
    round-trip through the tunnel.
    """

    def __init__(
        self,
        trainer,
        train_data,
        eval_data,
        batch_size: int,
        steps_per_dispatch: int = 8,
    ):
        self.trainer = trainer
        self.batch_size = batch_size
        self.steps_per_dispatch = max(1, steps_per_dispatch)
        self.train_staged, self.train_steps = stage(trainer, train_data, batch_size)
        self.eval_staged, self.eval_steps = stage(trainer, eval_data, batch_size)
        self._fns_built = False
        self._eval_labels = np.asarray(jax.device_get(self.eval_staged["labels"]))
        self._eval_valid = np.asarray(jax.device_get(self.eval_staged["_valid"]))

    def init_state(self):
        sample = {k: v[: self.batch_size] for k, v in self.train_staged.items()}
        return self.trainer.init_state(jax.device_get(sample))

    # -- jitted pieces (need state shardings -> built after init_state) --

    def _build(self):
        if self._fns_built:
            return
        tr = self.trainer
        bs = self.batch_size

        spd = min(self.steps_per_dispatch, self.train_steps)
        # prefer a divisor of train_steps (down to half the requested
        # unroll): a zero remainder needs no second compiled program,
        # saving one ~5-10 s tunnel compile per process
        for d in range(spd, max(1, spd // 2) - 1, -1):
            if self.train_steps % d == 0:
                spd = d
                break
        self.steps_per_dispatch = spd

        def make_train_fn(n_unrolled):
            def train_steps(state, meters, data, perm, i0):
                # unrolled python loop: one program, n sequential steps
                for k in range(n_unrolled):
                    idx = jax.lax.dynamic_slice_in_dim(perm, (i0 + k) * bs, bs)
                    batch = {
                        kk: jnp.take(v, idx, axis=0) for kk, v in data.items()
                    }
                    state, meters = tr._train_step(state, meters, batch)
                return state, meters

            return jax.jit(
                train_steps,
                donate_argnums=(0, 1),
                in_shardings=(tr._state_shardings, None, None, None, None),
                out_shardings=(tr._state_shardings, None),
            )

        self._train_step = make_train_fn(spd)
        rem = self.train_steps % spd
        self._train_step_rem = make_train_fn(rem) if rem else None
        self._rem_steps = rem

        def eval_step(state, data, i):
            idx = i * bs + jnp.arange(bs)
            batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            return tr._eval_step(state, batch)

        self._eval_step = jax.jit(
            eval_step, in_shardings=(tr._state_shardings, None, None)
        )
        n = self.train_steps * bs
        self._perm_fn = jax.jit(
            lambda seed: jax.random.permutation(jax.random.PRNGKey(seed), n)
        )
        self._fns_built = True

    # -- epochs ----------------------------------------------------------

    def train_epoch(self, state, epoch: int, seed: int = 42):
        import time

        self._build()
        perm = self._perm_fn(seed + epoch)
        meters = self.trainer.meters_init()
        spd = self.steps_per_dispatch
        full_dispatches = self.train_steps // spd
        t0 = time.time()
        for d in range(full_dispatches):
            state, meters = self._train_step(
                state, meters, self.train_staged, perm, d * spd
            )
        if self._train_step_rem is not None:
            state, meters = self._train_step_rem(
                state, meters, self.train_staged, perm, full_dispatches * spd
            )
        jax.block_until_ready(meters)
        dt = time.time() - t0
        count = float(meters["count"])
        out = {
            "loss": float(meters["loss"]) / self.train_steps,
            "accuracy": float(meters["correct"]) / max(count, 1),
            "auc": float(M.auc_state_result(
                {"pos": meters["pos"], "neg": meters["neg"]}
            )),
            "examples_per_s": count / max(dt, 1e-9),
        }
        print(
            f"Epoch {epoch}, Train Loss: {out['loss']:.4f}, "
            f"Train Accuracy: {out['accuracy']:.4f}, "
            f"Train AUC: {out['auc']:.4f} "
            f"({out['examples_per_s']:,.0f} examples/s)"
        )
        return state, out

    def evaluate(self, state, epoch: int = 1):
        self._build()
        loss_sum = None
        chunks: Dict[str, list] = {}
        for i in range(self.eval_steps):
            loss, probs = self._eval_step(state, self.eval_staged, i)
            loss_sum = loss if loss_sum is None else loss_sum + loss
            for k, v in probs.items():
                chunks.setdefault(k, []).append(v)
        preds = {
            k: np.asarray(jax.device_get(jnp.concatenate(v)))
            for k, v in chunks.items()
        }
        loss = float(loss_sum) / self.eval_steps
        labels, valid = self._eval_labels, self._eval_valid
        trainer, cfg = self.trainer, self.trainer.model_cfg
        task_aucs = {}
        for task, p in preds.items():
            if task == "ctr":
                y = labels[:, trainer.label_cols[cfg.tasks[0]]]
            elif task == "ctcvr":
                y = (
                    labels[:, trainer.label_cols[cfg.tasks[0]]]
                    * labels[:, trainer.label_cols[cfg.tasks[1]]]
                )
            else:
                y = labels[:, trainer.label_cols[task]]
            task_aucs[task] = float(
                M.exact_auc(jnp.asarray(p), jnp.asarray(y), jnp.asarray(valid))
            )
        primary = "ctr" if "ctr" in preds else next(iter(trainer.label_cols))
        p0 = preds[primary]
        y0 = (
            labels[:, trainer.label_cols[primary]]
            if primary in trainer.label_cols
            else labels[:, trainer.label_cols[cfg.tasks[0]]]
        )
        accuracy = float(
            np.sum((np.round(p0) == y0) * valid) / max(valid.sum(), 1)
        )
        out = {
            "loss": loss,
            "accuracy": accuracy,
            "auc": task_aucs[primary],
            "task_aucs": task_aucs,
            "predictions": preds,
            "labels": labels,
            "valid": valid,
        }
        print(
            f"Epoch {epoch}, Eval Loss: {out['loss']:.4f}, "
            f"Eval Accuracy: {out['accuracy']:.4f}, Eval AUC: {out['auc']:.4f}"
            + (f", task AUCs: {task_aucs}" if len(task_aucs) > 1 else "")
        )
        return out
