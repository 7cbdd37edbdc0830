"""Multi-task models: ESMM, MMOE, PLE.

All three are README-only in the reference (README.md:40-45, no code);
implemented from the papers (Ma et al. SIGIR'18; Ma et al. KDD'18; Tang
et al. RecSys'20) with the shared input representation (dense + per-field
embeddings, like DCN's x0) and the README's 3-task setting
read_comment / like / click_avatar (README.md:41-42). The 7-label vector
is already present in every batch (DataGenerator.py:99-107).

Output convention: {"logits": {task: (B,)}} for MMOE/PLE;
ESMM returns {"probs": {...}} because its CTCVR head is a *product of
probabilities* (pCTR * pCVR) and must be trained with BCE on probs.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from .. import ops
from ..embedding.collection import EmbeddingCollection
from ..ops.mlp import dense_init_kwargs
from .base import Batch, RankModel


class _Expert(nn.Module):
    units: tuple
    dense_init: str = "lecun"

    @nn.compact
    def __call__(self, x, train=False):
        for w in self.units:
            x = nn.relu(
                nn.Dense(w, **dense_init_kwargs(self.dense_init, x.shape[-1]))(x)
            )
        return x


class _TaskTower(nn.Module):
    units: tuple
    dense_init: str = "lecun"

    @nn.compact
    def __call__(self, x, train=False):
        for w in self.units:
            x = nn.relu(
                nn.Dense(w, **dense_init_kwargs(self.dense_init, x.shape[-1]))(x)
            )
        return nn.Dense(1, **dense_init_kwargs(self.dense_init, x.shape[-1]))(x)[..., 0]


def _task_log_vars(model: RankModel) -> Dict[str, jnp.ndarray]:
    """Learned per-task log-variances for uncertainty weighting (Kendall,
    Gal & Cipolla, CVPR 2018 — the reference's MTL-trick to-do,
    README.md:59). The loss combiner applies exp(-s)*L + s/2 per task;
    s initialised to 0 recovers the plain sum at step 0."""
    if model.cfg.task_weighting != "uncertainty":
        return {}
    return {
        t: model.param(f"task_log_var_{t}", nn.initializers.zeros, ())
        for t in model.cfg.tasks
    }


def _shared_input(model: RankModel, batch: Batch) -> jnp.ndarray:
    coll = model.embedding_collection()
    field_embs = model.tower_field_embeddings(coll, batch)
    target = coll.lookup("feedid", batch["feedid"])
    return jnp.concatenate([model.dense_input(batch)] + field_embs + [target], axis=-1)


class MMOE(RankModel):
    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        x0 = _shared_input(self, batch)
        experts = jnp.stack(
            [
                _Expert(cfg.expert_units, dense_init=cfg.dense_init,
                        name=f"expert_{i}")(x0, train)
                for i in range(cfg.num_experts)
            ],
            axis=1,
        )  # (B, E, H)
        logits: Dict[str, jnp.ndarray] = {}
        for task in cfg.tasks:
            gate = nn.softmax(
                self.dense(cfg.num_experts, x0.shape[-1], name=f"gate_{task}")(x0),
                axis=-1,
            )  # (B, E)
            mixed = jnp.einsum("be,beh->bh", gate, experts)
            logits[task] = _TaskTower(
                cfg.tower_units, dense_init=cfg.dense_init, name=f"tower_{task}"
            )(mixed, train)
        return {"logits": logits, "aux_loss": jnp.asarray(0.0),
                "task_log_vars": _task_log_vars(self)}


class PLE(RankModel):
    """Progressive Layered Extraction with ``num_levels`` CGC layers."""

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        x0 = _shared_input(self, batch)
        n_tasks = len(cfg.tasks)

        # inputs per selector: one per task + one shared
        inputs = [x0] * (n_tasks + 1)
        for level in range(cfg.num_levels):
            last = level == cfg.num_levels - 1
            # experts
            task_experts = []  # per task: (B, k, H)
            for ti in range(n_tasks):
                es = [
                    _Expert(cfg.expert_units, dense_init=cfg.dense_init,
                            name=f"L{level}_t{ti}_e{k}")(inputs[ti], train)
                    for k in range(cfg.specific_experts_per_task)
                ]
                task_experts.append(jnp.stack(es, axis=1))
            shared_experts = jnp.stack(
                [
                    _Expert(cfg.expert_units, dense_init=cfg.dense_init,
                            name=f"L{level}_shared_e{k}")(inputs[-1], train)
                    for k in range(cfg.shared_experts)
                ],
                axis=1,
            )
            new_inputs = []
            for ti in range(n_tasks):
                pool = jnp.concatenate([task_experts[ti], shared_experts], axis=1)
                gate = nn.softmax(
                    self.dense(pool.shape[1], inputs[ti].shape[-1],
                               name=f"L{level}_gate_t{ti}")(inputs[ti]),
                    axis=-1,
                )
                new_inputs.append(jnp.einsum("be,beh->bh", gate, pool))
            if not last:
                pool = jnp.concatenate(task_experts + [shared_experts], axis=1)
                gate = nn.softmax(
                    self.dense(pool.shape[1], inputs[-1].shape[-1],
                               name=f"L{level}_gate_shared")(inputs[-1]),
                    axis=-1,
                )
                new_inputs.append(jnp.einsum("be,beh->bh", gate, pool))
            else:
                new_inputs.append(new_inputs[-1])  # unused
            inputs = new_inputs

        logits = {
            task: _TaskTower(
                cfg.tower_units, dense_init=cfg.dense_init, name=f"tower_{task}"
            )(inputs[ti], train)
            for ti, task in enumerate(cfg.tasks)
        }
        return {"logits": logits, "aux_loss": jnp.asarray(0.0),
                "task_log_vars": _task_log_vars(self)}


class ESMM(RankModel):
    """Entire-space multi-task: pCTR head + pCTCVR = pCTR * pCVR head.

    tasks[0] is the 'click' label (CTR), tasks[1] the 'conversion' label;
    the CTCVR target label is click AND conversion, built in the loss fn.
    """

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        x0 = _shared_input(self, batch)
        ctr_logit = _TaskTower(
            cfg.expert_units + cfg.tower_units, dense_init=cfg.dense_init,
            name="ctr_tower",
        )(x0, train)
        cvr_logit = _TaskTower(
            cfg.expert_units + cfg.tower_units, dense_init=cfg.dense_init,
            name="cvr_tower",
        )(x0, train)
        p_ctr = nn.sigmoid(ctr_logit)
        p_ctcvr = p_ctr * nn.sigmoid(cvr_logit)
        return {
            "probs": {"ctr": p_ctr, "ctcvr": p_ctcvr},
            "aux_loss": jnp.asarray(0.0),
        }
