"""Unified, config-driven train/eval/predict loop.

Replaces the per-model copies of ``train``/``evaluate``/``main`` in every
reference script (e.g. ``algorithm/DeepFM/deepfm.py:154-293``,
``algorithm/DIN/din.py:326-485``) with one jit-compiled step:

  * loss is BCE-with-logits everywhere (numerically safer than the
    reference's BCELoss-on-probabilities used by deepfm/din/afm/fwfm);
    ESMM uses BCE on probabilities because its CTCVR head is a product of
    sigmoids (see models/multitask.py).
  * Adam(lr=0.005, betas 0.9/0.999) matching the reference defaults
    (deepfm.py:246, din.py:435).
  * metrics accumulate on device (streaming bucketed AUC + loss/accuracy
    sums); predictions stream back to host once per step for the final
    exact AUC (matches sklearn) and predictions.csv export.
  * best-model checkpointing on eval AUC (deepfm.py:259-262) plus periodic
    full checkpoints with optimizer state (deepfm.py:264-272) via Orbax,
    with resume support (the reference saved resumable checkpoints but had
    no resume code — SURVEY.md section 5).

Parallelism: the step is jitted over a (data x table) mesh; batches are
sharded over 'data', embedding tables optionally row-sharded over 'table',
everything else replicated. XLA/GSPMD inserts all collectives.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..features import FeatureSchema
from ..models import MULTI_TASK_MODELS, ModelConfig, build_model
from ..parallel.mesh import DATA_AXIS, TABLE_AXIS, make_mesh
from . import metrics as M
from . import mtl


@dataclasses.dataclass
class TrainConfig:
    """Reference CLI names preserved where they exist (deepfm.py:295-313)."""

    model_dir: str = "./model_dir"
    output_dir: str = "./output_dir"
    num_epochs: int = 1
    batch_size: int = 1024
    learning_rate: float = 0.005
    save_checkpoints_steps: int = 1000  # epochs, as in the reference
    seed: int = 42
    label: str = "read_comment"
    table_parallelism: int = 1
    log_every: int = 100
    profile_dir: Optional[str] = None  # jax.profiler trace output
    # tables smaller than this stay replicated even on a table-sharded mesh
    min_rows_to_shard: int = 1024
    # MXU matmul passes: None -> XLA default. Measured on this TPU
    # (interleaved A/B at the WeChat dims): the default already runs
    # bf16-input passes (explicit 'bfloat16' is bit-identical) and even
    # 'highest' costs no throughput — the models are bandwidth-bound, not
    # MXU-bound. The knob matters for precision-sensitive large-dim
    # configs; see docs/REPRODUCING.md §5.
    matmul_precision: Optional[str] = None
    # global-norm gradient clipping; 0 disables (reference trains unclipped)
    gradient_clip_norm: float = 0.0


def _labels_for(model_cfg: ModelConfig, train_cfg: TrainConfig, schema: FeatureSchema):
    """task name -> column index into the (B, 7) label matrix."""
    cols = {name: i for i, name in enumerate(schema.labels)}
    if model_cfg.name in MULTI_TASK_MODELS:
        return {t: cols[t] for t in model_cfg.tasks}
    return {train_cfg.label: cols[train_cfg.label]}


def make_loss_fn(model, model_cfg: ModelConfig, label_cols: Dict[str, int]):
    multi = model_cfg.name in MULTI_TASK_MODELS

    def loss_fn(params, extra, batch, rng, train: bool):
        variables = {"params": params, **extra}
        kwargs = dict(train=train)
        if train:
            out, mutated = model.apply(
                variables, batch, mutable=["batch_stats"],
                rngs={"dropout": rng}, **kwargs
            )
        else:
            out = model.apply(variables, batch, **kwargs)
            mutated = {}
        valid = batch.get("_valid", jnp.ones(batch["labels"].shape[0]))
        denom = jnp.maximum(jnp.sum(valid), 1.0)

        probs: Dict[str, jnp.ndarray] = {}
        total = 0.0
        if multi and "probs" in out:  # ESMM
            eps = 1e-7
            y_ctr = batch["labels"][:, label_cols[model_cfg.tasks[0]]]
            y_cvr = batch["labels"][:, label_cols[model_cfg.tasks[1]]]
            y_ctcvr = y_ctr * y_cvr
            for task_name, p, y in (
                ("ctr", out["probs"]["ctr"], y_ctr),
                ("ctcvr", out["probs"]["ctcvr"], y_ctcvr),
            ):
                p = jnp.clip(p, eps, 1.0 - eps)
                ll = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
                total = total + jnp.sum(ll * valid) / denom
                probs[task_name] = p
        elif multi:
            log_vars = out.get("task_log_vars", {})
            for task in model_cfg.tasks:
                logit = out["logits"][task]
                y = batch["labels"][:, label_cols[task]]
                ll = optax.sigmoid_binary_cross_entropy(logit, y)
                task_loss = jnp.sum(ll * valid) / denom
                if task in log_vars:
                    # uncertainty weighting (Kendall et al. 2018):
                    # exp(-s)*L + s/2 with s = log sigma^2, init 0
                    s = log_vars[task]
                    task_loss = jnp.exp(-s) * task_loss + 0.5 * s
                total = total + task_loss
                probs[task] = jax.nn.sigmoid(logit)
        else:
            (task,) = label_cols.keys()
            logit = out["logits"]
            y = batch["labels"][:, label_cols[task]]
            ll = optax.sigmoid_binary_cross_entropy(logit, y)
            total = jnp.sum(ll * valid) / denom
            probs[task] = jax.nn.sigmoid(logit)

        total = total + out.get("aux_loss", 0.0)
        return total, (probs, mutated)

    return loss_fn


def make_task_losses_fn(model, model_cfg: ModelConfig, label_cols: Dict[str, int]):
    """Per-task loss VECTOR (T,) for gradient-level MTL strategies
    (PCGrad/GradNorm). Logit-head multi-task models only (MMOE/PLE);
    ESMM's product-of-probs CTCVR loss is not task-separable this way."""

    def task_losses_fn(params, extra, batch, rng, train: bool):
        variables = {"params": params, **extra}
        if train:
            out, mutated = model.apply(
                variables, batch, mutable=["batch_stats"],
                rngs={"dropout": rng}, train=True,
            )
        else:
            out = model.apply(variables, batch, train=False)
            mutated = {}
        valid = batch.get("_valid", jnp.ones(batch["labels"].shape[0]))
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        losses, probs = [], {}
        for task in model_cfg.tasks:
            logit = out["logits"][task]
            y = batch["labels"][:, label_cols[task]]
            ll = optax.sigmoid_binary_cross_entropy(logit, y)
            losses.append(jnp.sum(ll * valid) / denom)
            probs[task] = jax.nn.sigmoid(logit)
        vec = jnp.stack(losses)
        # the loss vector rides along in aux so jacrev callers get the
        # primal values without a second forward pass
        return vec, (vec, probs, mutated)

    return task_losses_fn


class Trainer:
    def __init__(
        self,
        schema: FeatureSchema,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig = TrainConfig(),
        mesh: Optional[Mesh] = None,
    ):
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.mesh = mesh or make_mesh(
            table_parallelism=train_cfg.table_parallelism
        )
        # Pad vocab rows up to a multiple of the table axis so row-sharding
        # is never silently skipped: the real vocab sizes (+1 OOV) are odd
        # for exactly the biggest tables (feedid 106,445, userid 19,627).
        # Padding rows are unreachable ids — encoders never emit them —
        # so they are gradient-dead. Data encoding still uses the caller's
        # unpadded schema; only table shapes change.
        self.table_padding = {}
        table_axis_size = self.mesh.shape[TABLE_AXIS]
        if table_axis_size > 1:
            schema, self.table_padding = schema.padded_for_table_sharding(
                table_axis_size, min_rows=train_cfg.min_rows_to_shard
            )
            if self.table_padding:
                pads = ", ".join(
                    f"{k}: {a}->{b}" for k, (a, b) in self.table_padding.items()
                )
                print(f"[sharding] padded vocab rows to table={table_axis_size} multiple: {pads}")
                # _padded_table_dims matches table modules by name suffix
                # ("_" + feature); if ANY schema feature's name — padded
                # or not (an unpadded "x_feedid" can still collide if its
                # row count coincides, ADVICE r3) — were a suffix-extension
                # of a padded one, a module of the longer feature would
                # also match the shorter one and depad/repad could
                # silently pick the wrong dims. Refuse that schema here
                # rather than mis-slice a checkpoint later.
                from ..embedding.collection import table_specs as _tspecs

                for f1 in self.table_padding:
                    for f2 in _tspecs(schema):
                        if f1 != f2 and (f2.endswith("_" + f1) or f2 == "table_" + f1):
                            raise ValueError(
                                f"padded feature name {f1!r} is a suffix of "
                                f"{f2!r}: table-module suffix matching in "
                                "_padded_table_dims would be ambiguous — "
                                "rename one feature"
                            )
        self.schema = schema
        # tables the explicit embedding schedules (embedding_mode psum/
        # alltoall) may shard_map over — same decision rule as _pick in
        # init_state (divisible rows after padding, big enough to scatter)
        from ..embedding.collection import table_specs

        self.sharded_table_names = tuple(
            sorted(
                name
                for name, (vocab, _) in table_specs(schema).items()
                if table_axis_size > 1
                and vocab % table_axis_size == 0
                and vocab >= train_cfg.min_rows_to_shard
            )
        )
        self.model = build_model(
            schema, model_cfg, mesh=self.mesh,
            sharded_tables=self.sharded_table_names,
        )
        self.label_cols = _labels_for(model_cfg, train_cfg, schema)
        self.loss_fn = make_loss_fn(self.model, model_cfg, self.label_cols)
        self.mtl_mode = None
        if model_cfg.task_weighting in ("pcgrad", "gradnorm"):
            if model_cfg.name not in MULTI_TASK_MODELS or model_cfg.name == "esmm":
                raise ValueError(
                    f"task_weighting={model_cfg.task_weighting!r} needs a "
                    "logit-head multi-task model (mmoe/ple), got "
                    f"{model_cfg.name!r}"
                )
            self.mtl_mode = model_cfg.task_weighting
            self.task_losses_fn = make_task_losses_fn(
                self.model, model_cfg, self.label_cols
            )
        adam = optax.adam(train_cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8)
        if train_cfg.gradient_clip_norm > 0:
            self.tx = optax.chain(
                optax.clip_by_global_norm(train_cfg.gradient_clip_norm), adam
            )
        else:
            self.tx = adam
        self._compiled = {}
        self._batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        self._repl = NamedSharding(self.mesh, P())
        # filled by init_state with the actual per-table decisions
        self.shard_decisions = {"sharded": [], "replicated": []}

    # -- state ------------------------------------------------------------

    def init_state(self, sample_batch) -> Dict[str, Any]:
        """Build (and shard) params/opt_state. Embedding tables annotated
        with the 'table' logical axis land row-sharded when the mesh has a
        nontrivial table axis."""
        rngs = {
            "params": jax.random.PRNGKey(self.cfg.seed),
            "dropout": jax.random.PRNGKey(self.cfg.seed + 1),
        }
        batch = self._host_to_device(sample_batch)

        abstract = jax.eval_shape(
            partial(self.model.init, train=True), rngs, batch
        )
        specs = nn.get_partition_spec(abstract)

        def unboxed_init(rngs, batch):
            variables = self.model.init(rngs, batch, train=True)
            return nn.meta.unbox(variables)

        # Row-shard a table only when its vocab axis divides the table-mesh
        # axis and is big enough to be worth scattering; small tables
        # (device: 3 rows, tags: 351) stay replicated — gathers on them are
        # cheap and replication avoids tiny uneven shards.
        table_size = self.mesh.shape[TABLE_AXIS]
        min_rows_to_shard = self.cfg.min_rows_to_shard

        decisions = {"sharded": [], "replicated": []}

        def _pick(path, spec, abstract_leaf):
            is_table = spec and len(spec) > 0 and spec[0] == "table"
            if is_table and (
                abstract_leaf.shape[0] % table_size != 0
                or abstract_leaf.shape[0] < min_rows_to_shard
            ):
                spec = P()
                if table_size > 1:
                    decisions["replicated"].append(
                        f"{jax.tree_util.keystr(path)}{abstract_leaf.shape}"
                    )
            else:
                spec = P(*[TABLE_AXIS if s == "table" else s for s in spec])
                if is_table and table_size > 1:
                    decisions["sharded"].append(
                        f"{jax.tree_util.keystr(path)}{abstract_leaf.shape}"
                    )
            return NamedSharding(self.mesh, spec)

        var_shardings = jax.tree_util.tree_map_with_path(
            _pick,
            nn.meta.unbox(specs),
            nn.meta.unbox(abstract),
            is_leaf=lambda x: isinstance(x, P),
        )
        if table_size > 1:
            # visible record of which tables actually shard (VERDICT r1 #1:
            # the silent replicated fallback at real vocab sizes)
            print(
                f"[sharding] row-sharded {len(decisions['sharded'])} tables "
                f"over table={table_size}: {decisions['sharded']}; "
                f"replicated (small/indivisible): {decisions['replicated']}"
            )
        self.shard_decisions = decisions
        variables = jax.jit(unboxed_init, out_shardings=var_shardings)(
            rngs, batch
        )
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        param_shardings = var_shardings["params"]
        # optimizer-state shardings mirror the param shardings (row-sharded
        # tables get row-sharded Adam moments); fresh scalars replicated.
        abstract_opt = jax.eval_shape(self.tx.init, params)
        opt_shardings = optax.tree_map_params(
            self.tx,
            lambda _, s: s,
            abstract_opt,
            param_shardings,
            transform_non_params=lambda _: self._repl,
        )
        opt_state = jax.jit(self.tx.init, out_shardings=opt_shardings)(params)
        state = {
            "params": params,
            "extra": extra,
            "opt_state": opt_state,
            # committed replicated: see meters_init on why plain
            # host-created scalars would trigger a dispatch-1 recompile
            "step": jax.device_put(jnp.zeros((), jnp.int32), self._repl),
            "rng": jax.device_put(
                jax.random.PRNGKey(self.cfg.seed + 2), self._repl
            ),
        }
        if self.mtl_mode == "gradnorm":
            state["mtl"] = jax.device_put(
                mtl.gradnorm_init(len(self.model_cfg.tasks)), self._repl
            )
        self._state_shardings = {
            "params": param_shardings,
            "extra": jax.tree_util.tree_map(
                lambda _: self._repl, extra
            ),
            "opt_state": jax.tree_util.tree_map(
                lambda x: x.sharding, opt_state
            ),
            "step": self._repl,
            "rng": self._repl,
        }
        if "mtl" in state:
            self._state_shardings["mtl"] = jax.tree_util.tree_map(
                lambda _: self._repl, state["mtl"]
            )
        return state

    # -- checkpoint normal form (padded tables) ---------------------------

    def _padded_table_dims(self, path, shape):
        """(orig_rows, padded_rows) if this leaf is a row-padded embedding
        table (matched by param name AND row count), else None."""
        if not self.table_padding:
            return None
        keys = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        if len(keys) < 2 or keys[-1] != "embedding" or len(shape) < 1:
            return None
        seg = keys[-2]
        for f, (orig, padded) in self.table_padding.items():
            named = seg == f or seg == f"table_{f}" or seg.endswith("_" + f)
            if named and shape[0] in (orig, padded):
                return orig, padded
        return None

    def depad_state(self, tree):
        """Slice row-padded embedding tables (and their optimizer moments)
        back to the caller-schema vocab sizes, so checkpoints on disk are
        always in unpadded shapes — restorable by Predictor / a resume
        with a different table_parallelism. The sliced-off rows are
        unreachable ids (gradient-dead), so nothing trained is lost."""
        if not self.table_padding:
            return tree

        def fix(path, leaf):
            dims = self._padded_table_dims(path, getattr(leaf, "shape", ()))
            if dims and dims[0] != dims[1] and leaf.shape[0] == dims[1]:
                return leaf[: dims[0]]
            return leaf

        return jax.tree_util.tree_map_with_path(fix, tree)

    def repad_state(self, tree, like):
        """Inverse of depad_state: zero-fill the padding rows back and
        commit each re-padded leaf to its mesh sharding (from the matching
        leaf of ``like``, a live padded state)."""
        if not self.table_padding:
            return tree

        def fix(path, leaf, ref):
            dims = self._padded_table_dims(path, getattr(leaf, "shape", ()))
            if dims and dims[0] != dims[1] and leaf.shape[0] == dims[0]:
                pad = jnp.zeros(
                    (dims[1] - dims[0],) + tuple(leaf.shape[1:]),
                    jnp.asarray(leaf).dtype,
                )
                out = jnp.concatenate([jnp.asarray(leaf), pad], axis=0)
                return jax.device_put(out, ref.sharding)
            return leaf

        return jax.tree_util.tree_map_with_path(fix, tree, like)

    def commit_state(self, state):
        """device_put every state leaf onto THIS trainer's mesh shardings.
        Needed after an orbax restore: orbax places leaves with the
        sharding recorded in the checkpoint file (the saving run's mesh),
        which is a different cache-key/aval when resuming under a
        different table_parallelism or device count."""
        return jax.tree_util.tree_map(
            jax.device_put, state, self._state_shardings
        )

    # -- steps ------------------------------------------------------------

    def meters_init(self):
        m = M.auc_state_init()
        m.update(
            loss=jnp.zeros(()), correct=jnp.zeros(()), count=jnp.zeros(()),
            steps=jnp.zeros(()),
        )
        # committed to the mesh (replicated): a fresh host-created meter
        # has an empty-sharding aval that differs from the step's output
        # aval and forces a full recompile on the FIRST dispatch of every
        # epoch (measured ~12 s each through the tunnel)
        return jax.device_put(m, self._repl)

    def _train_step(self, state, meters, batch):
        if self.cfg.matmul_precision:
            with jax.default_matmul_precision(self.cfg.matmul_precision):
                return self._train_step_inner(state, meters, batch)
        return self._train_step_inner(state, meters, batch)

    def _train_step_inner(self, state, meters, batch):
        rng, new_rng = jax.random.split(state["rng"])
        new_mtl = state.get("mtl")
        if self.mtl_mode is not None:
            # per-task grads: one forward + T backward passes via jacrev;
            # leaves carry a leading task axis (T, *param.shape)
            jac_fn = jax.jacrev(self.task_losses_fn, has_aux=True)
            stacked, (task_losses, probs, mutated) = jac_fn(
                state["params"], state["extra"], batch, rng, True
            )
            if self.mtl_mode == "pcgrad":
                gram = mtl.gram_matrix(stacked)
                weights = mtl.pcgrad_weights(gram, rng)
                loss = jnp.sum(task_losses)
            else:  # gradnorm
                mask = mtl.shared_param_mask(
                    state["params"], mtl.default_task_specific
                )
                norms = mtl.shared_grad_norms(stacked, mask)
                weights, new_mtl = mtl.gradnorm_update(
                    state["mtl"], task_losses, norms,
                    self.model_cfg.gradnorm_alpha, self.model_cfg.gradnorm_lr,
                )
                loss = jnp.sum(weights * task_losses)
            grads = mtl.combine_stacked(stacked, weights)
        else:
            grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
            (loss, (probs, mutated)), grads = grad_fn(
                state["params"], state["extra"], batch, rng, True
            )
        updates, opt_state = self.tx.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        extra = dict(state["extra"])
        if mutated:
            extra.update(mutated)
        new_state = {
            "params": params,
            "extra": extra,
            "opt_state": opt_state,
            "step": state["step"] + 1,
            "rng": new_rng,
        }
        if new_mtl is not None:
            new_state["mtl"] = new_mtl
        # metrics on the primary head, folded into the carried meters so an
        # epoch needs zero extra dispatches/host syncs per step
        if "ctr" in probs:  # ESMM: CTR head's label is tasks[0]
            task = "ctr"
            y = batch["labels"][:, self.label_cols[self.model_cfg.tasks[0]]]
        else:
            task = next(iter(self.label_cols))
            y = batch["labels"][:, self.label_cols[task]]
        valid = batch.get("_valid", jnp.ones_like(y))
        auc_part = M.auc_state_update(
            {"pos": meters["pos"], "neg": meters["neg"]}, probs[task], y, valid
        )
        correct, count = M.binary_accuracy(probs[task], y, valid)
        new_meters = {
            "pos": auc_part["pos"],
            "neg": auc_part["neg"],
            "loss": meters["loss"] + loss,
            "correct": meters["correct"] + correct,
            "count": meters["count"] + count,
            "steps": meters["steps"] + 1.0,
        }
        return new_state, new_meters

    def _eval_step(self, state, loss_acc, batch):
        """loss_acc is a carried device scalar — evaluation makes ZERO
        per-step host syncs (VERDICT r1 #9: a float(loss) per step cost
        ~3 ms each through the tunnel, ~2 s over a 595-step eval)."""
        loss, (probs, _) = self.loss_fn(
            state["params"], state["extra"], batch, jax.random.PRNGKey(0), False
        )
        return loss_acc + loss, probs

    def _get_compiled(self, name: str) -> Callable:
        if name in self._compiled:
            return self._compiled[name]
        if name == "train":
            fn = jax.jit(
                self._train_step,
                in_shardings=(self._state_shardings, None, self._batch_sharding),
                out_shardings=(self._state_shardings, None),
                donate_argnums=(0, 1),
            )
        elif name == "eval":
            fn = jax.jit(
                self._eval_step,
                in_shardings=(
                    self._state_shardings, self._repl, self._batch_sharding
                ),
                donate_argnums=(1,),
            )
        self._compiled[name] = fn
        return self._compiled[name]

    def _host_all(self, x, tiled: bool = True) -> np.ndarray:
        """Bring an array to host as the full GLOBAL value.

        Single-process: plain device_get. Multi-host: process_allgather —
        works both for globally-sharded jax.Arrays (eval probs) and for
        process-local numpy arrays (labels/valid), concatenating the
        latter in process order, which matches the device order of the
        P('data') batch sharding (jax.devices() is process-major)."""
        if jax.process_count() == 1:
            return np.asarray(x)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=tiled))

    def _host_to_device(self, batch):
        """Per-host batch dict (or a single per-host array, e.g. the
        staged packed matrix) -> global P('data')-sharded device value."""
        if jax.process_count() > 1:
            make = partial(
                jax.make_array_from_process_local_data, self._batch_sharding
            )
            if isinstance(batch, dict):
                return {k: make(v) for k, v in batch.items()}
            return make(batch)
        return jax.device_put(batch, self._batch_sharding)

    # -- epochs -----------------------------------------------------------

    def train_epoch(self, state, loader, epoch: int = 1):
        step_fn = self._get_compiled("train")
        profiled = False
        if self.cfg.profile_dir and epoch == 1:
            # tracing/profiling subsystem (SURVEY.md section 5: the
            # reference has only tqdm bars; this captures a real XLA trace)
            try:
                jax.profiler.start_trace(self.cfg.profile_dir)
                profiled = True
            except Exception as e:  # profiler may be unsupported here
                print(f"profiler unavailable: {e}")
        # Metrics live inside the carried device meters: a per-step
        # float(stats['loss']) would force a host sync every step (the
        # reference's all_preds.extend(...cpu()...) pattern,
        # deepfm.py:174-175, is exactly this sink). One read per epoch.
        meters = self.meters_init()
        nsteps = 0
        t0 = time.time()
        for batch in loader:
            dev_batch = self._host_to_device(batch)
            state, meters = step_fn(state, meters, dev_batch)
            nsteps += 1
            if self.cfg.log_every and nsteps % self.cfg.log_every == 0:
                eps = float(meters["count"]) / max(time.time() - t0, 1e-9)
                print(
                    f"epoch {epoch} step {nsteps}: "
                    f"loss={float(meters['loss'])/nsteps:.4f} "
                    f"examples/s={eps:,.0f}"
                )
        # block_until_ready is a NO-OP for still-queued dispatches on this
        # backend (measured: wall 1.9 ms "blocked" vs a 6.3 s true value
        # fetch); a real host fetch is the only honest fence
        loss_sum = float(meters["loss"])
        if profiled:
            jax.profiler.stop_trace()
            print(f"profile trace written to {self.cfg.profile_dir}")
        correct = float(meters["correct"])
        count = float(meters["count"])
        train_auc = float(
            M.auc_state_result({"pos": meters["pos"], "neg": meters["neg"]})
        )
        out = {
            "loss": loss_sum / max(nsteps, 1),
            "accuracy": correct / max(count, 1),
            "auc": train_auc,
            "count": count,  # _valid rows actually trained this epoch
            "examples_per_s": count / max(time.time() - t0, 1e-9),
        }
        if not np.isfinite(out["loss"]):
            raise FloatingPointError(
                f"non-finite training loss at epoch {epoch} "
                f"(loss={out['loss']}); the last good checkpoint can be "
                "resumed with --resume=true; consider --gradient_clip_norm"
            )
        print(
            f"Epoch {epoch}, Train Loss: {out['loss']:.4f}, "
            f"Train Accuracy: {out['accuracy']:.4f}, Train AUC: {out['auc']:.4f}"
        )
        return state, out

    def _host_all_steps(self, chunks) -> np.ndarray:
        """Per-step PROCESS-LOCAL host arrays -> the global array in
        step-major order (matching per-step global device batches, which
        concatenate processes process-major WITHIN each step)."""
        local = np.stack(chunks)  # (S, B_local, ...)
        if jax.process_count() == 1:
            return local.reshape((-1,) + local.shape[2:])
        from jax.experimental import multihost_utils

        g = np.asarray(
            multihost_utils.process_allgather(local, tiled=False)
        )  # (P, S, B_local, ...)
        g = np.swapaxes(g, 0, 1)  # (S, P, B_local, ...)
        return g.reshape((-1,) + g.shape[3:])

    def evaluate(self, state, loader, epoch: int = 1):
        """Full eval pass; exact AUC (sklearn-matching) per task + loss.

        Zero host syncs inside the step loop: loss rides in a carried
        device scalar, per-step probs stay on device and are concatenated
        + fetched ONCE at the end (VERDICT r1 #9)."""
        step_fn = self._get_compiled("eval")
        loss_acc = jax.device_put(jnp.zeros(()), self._repl)
        nsteps = 0
        probs_dev: Dict[str, list] = {}
        labels_acc, valid_acc = [], []
        for batch in loader:
            dev_batch = self._host_to_device(batch)
            loss_acc, probs = step_fn(state, loss_acc, dev_batch)
            nsteps += 1
            for k, v in probs.items():
                probs_dev.setdefault(k, []).append(v)
            labels_acc.append(batch["labels"])
            valid_acc.append(batch["_valid"])
        loss_sum = float(loss_acc)
        probs_acc = {
            k: [self._host_all(jnp.concatenate(v))]
            for k, v in probs_dev.items()
        }
        labels = self._host_all_steps(labels_acc)
        valid = self._host_all_steps(valid_acc)
        task_aucs = {}
        accuracy = 0.0
        for task, chunks in probs_acc.items():
            p = np.concatenate(chunks)
            if task == "ctr":
                y = labels[:, self.label_cols[self.model_cfg.tasks[0]]]
            elif task == "ctcvr":
                y = (
                    labels[:, self.label_cols[self.model_cfg.tasks[0]]]
                    * labels[:, self.label_cols[self.model_cfg.tasks[1]]]
                )
            else:
                y = labels[:, self.label_cols[task]]
            task_aucs[task] = float(
                M.exact_auc(jnp.asarray(p), jnp.asarray(y), jnp.asarray(valid))
            )
        primary = "ctr" if "ctr" in probs_acc else next(iter(self.label_cols))
        p0 = np.concatenate(probs_acc[primary])
        y0 = (
            labels[:, self.label_cols[primary]]
            if primary in self.label_cols
            else labels[:, self.label_cols[self.model_cfg.tasks[0]]]
        )
        accuracy = float(
            np.sum((np.round(p0) == y0) * valid) / max(valid.sum(), 1)
        )
        out = {
            "loss": loss_sum / max(nsteps, 1),
            "accuracy": accuracy,
            "auc": task_aucs[primary],
            "task_aucs": task_aucs,
            "predictions": {k: np.concatenate(v) for k, v in probs_acc.items()},
            "labels": labels,
            "valid": valid,
        }
        print(
            f"Epoch {epoch}, Eval Loss: {out['loss']:.4f}, "
            f"Eval Accuracy: {out['accuracy']:.4f}, Eval AUC: {out['auc']:.4f}"
            + (
                f", task AUCs: {task_aucs}"
                if len(task_aucs) > 1
                else ""
            )
        )
        return out
