"""Explicit-interaction tower models: DCN, DeepCrossing, xDeepFM, FiBiNet.

Parity targets:
  * DCN — ``algorithm/DCN/dcn.py:114-180``: x0 = [dense16 | per-field cat
    embeddings] (34-dim); N cross layers (weights properly registered here,
    unlike cross_layer.py:16-20) parallel to a ReLU MLP; concat -> logit.
  * DeepCrossing — ``algorithm/DeepCrossing/deepcrossing.py:106-163``:
    same x0 -> N residual units -> logit.
  * xDeepFM / FiBiNet — README-only (README.md:26,30), implemented from
    Lian et al. 2018 / Huang et al. 2019 with the shared conventions
    (uniform embedding dim for the field-interaction branches).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .. import ops
from ..embedding.collection import EmbeddingCollection
from .base import AFM_FIELDS, Batch, RankModel, single_task_output


class DCN(RankModel):
    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        coll = self.embedding_collection()
        field_embs = self.tower_field_embeddings(coll, batch)
        x0 = jnp.concatenate([self.dense_input(batch)] + field_embs, axis=-1)
        cross = ops.CrossNetwork(
            cfg.num_cross_layers, dense_init=cfg.dense_init,
            frozen_random=cfg.cross_frozen_random, name="cross",
        )(x0)
        deep = ops.MLPTower(
            cfg.hidden_units, activation="relu", batch_norm=False,
            dropout_rate=0.0, dense_init=cfg.dense_init, name="dnn",
        )(x0, train=train)
        cat = jnp.concatenate([cross, deep], axis=-1)
        logit = self.dense(1, cat.shape[-1], name="output")(cat)
        return single_task_output(logit)


class DeepCrossing(RankModel):
    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        coll = self.embedding_collection()
        field_embs = self.tower_field_embeddings(coll, batch)
        x0 = jnp.concatenate([self.dense_input(batch)] + field_embs, axis=-1)
        h = ops.ResidualStack(
            cfg.residual_internal_dim, cfg.num_residual_units,
            dense_init=cfg.dense_init, name="residual",
        )(x0)
        return single_task_output(self.dense(1, h.shape[-1], name="output")(h))


class XDeepFM(RankModel):
    """CIN + DNN + linear, summed into one logit (Lian et al. 2018)."""

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        tables = self.uniform_tables(AFM_FIELDS, cfg.embedding_dim, "emb")
        linear = self.uniform_tables(AFM_FIELDS, 1, "linear")
        embs = jnp.stack([tables[f](batch[f]) for f in AFM_FIELDS], axis=1)

        lin = sum(linear[f](batch[f]) for f in AFM_FIELDS)
        nd = self.dense_input(batch)
        lin = lin + self.dense(1, nd.shape[-1], name="linear_dense")(nd)

        cin_out = ops.CIN(cfg.cin_layer_sizes, name="cin")(embs)
        cin_logit = self.dense(1, cin_out.shape[-1], name="cin_output")(cin_out)

        deep_in = jnp.concatenate(
            [self.dense_input(batch), embs.reshape(embs.shape[0], -1)], axis=-1
        )
        deep = ops.MLPTower(
            cfg.hidden_units, activation="relu", batch_norm=cfg.batch_norm,
            dropout_rate=cfg.dropout_rate, dense_init=cfg.dense_init,
            name="dnn",
        )(deep_in, train=train)
        deep_logit = self.dense(1, deep.shape[-1], name="deep_output")(deep)
        return single_task_output(lin + cin_logit + deep_logit)


class FiBiNet(RankModel):
    """SENET reweighting + bilinear interactions on both the raw and the
    SENET-reweighted embeddings, concatenated with dense into the tower."""

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        tables = self.uniform_tables(AFM_FIELDS, cfg.embedding_dim, "emb")
        embs = jnp.stack([tables[f](batch[f]) for f in AFM_FIELDS], axis=1)

        senet_embs = ops.SENETLayer(cfg.senet_reduction, name="senet")(embs)
        p1 = ops.BilinearInteraction(cfg.bilinear_type, name="bilinear_raw")(embs)
        p2 = ops.BilinearInteraction(cfg.bilinear_type, name="bilinear_se")(senet_embs)

        x = jnp.concatenate(
            [
                self.dense_input(batch),
                p1.reshape(p1.shape[0], -1),
                p2.reshape(p2.shape[0], -1),
            ],
            axis=-1,
        )
        h = ops.MLPTower(
            cfg.hidden_units, activation="relu", batch_norm=cfg.batch_norm,
            dropout_rate=cfg.dropout_rate, dense_init=cfg.dense_init,
            name="dnn",
        )(x, train=train)
        return single_task_output(self.dense(1, h.shape[-1], name="output")(h))


class AutoInt(RankModel):
    """Self-attentive field-interaction model (Song et al., CIKM 2019).

    On the reference's to-do list (``README.md:61``), no reference code.
    Fields = the 7 categorical AFM fields + the 16 numeric features, each
    numeric embedded as value * learned vector (paper section 3.2); N
    interacting layers; logit = Dense(flatten(final)).
    """

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        from ..embedding.collection import INITIALIZERS

        cfg = self.cfg
        tables = self.uniform_tables(AFM_FIELDS, cfg.embedding_dim, "emb")
        cat_e = jnp.stack([tables[f](batch[f]) for f in AFM_FIELDS], axis=1)

        dense = self.dense_input(batch)  # (B, Nd)
        # per-feature standardization before the value * vector embedding
        # (paper section 3.2 assumes normalized numerics): the WeChat
        # log1p aggregates reach ~12 (play/stay are in ms), and unscaled
        # values saturate the interacting layers' softmax — measured as
        # an AUC-0.5 collapse at the full 3.3M-row calibrated scale
        # (RESULTS_fullscale_r05.json round-5 note).
        dense = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, name="dense_bn"
        )(dense)
        w_dense = self.param(
            "dense_emb",
            INITIALIZERS[cfg.embedding_init],
            (dense.shape[-1], cfg.embedding_dim),
        )
        dense_e = dense[:, :, None] * w_dense[None]  # (B, Nd, D)

        e = jnp.concatenate([cat_e, dense_e], axis=1)  # (B, F, D)
        for i in range(cfg.autoint_layers):
            e = ops.AutoIntLayer(
                num_heads=cfg.autoint_heads,
                att_dim=cfg.autoint_att_dim,
                compute_dtype=cfg.transformer_dtype,
                score_dtype=cfg.transformer_score_dtype,
                name=f"interact_{i}",
            )(e)
        flat = e.reshape(e.shape[0], -1)
        logit = self.dense(1, flat.shape[-1], name="output")(flat)
        return single_task_output(logit)
