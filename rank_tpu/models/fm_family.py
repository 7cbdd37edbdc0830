"""FM-family models: DeepFM, FwFM, FFM, AFM, PNN, Wide&Deep.

Parity targets:
  * DeepFM — ``algorithm/DeepFM/deepfm.py:73-151``: 6 categorical fields
    only (no dense features — the reason for its low 0.853 AUC,
    deepfm.py:42-44), dual embedding sets (dim-1 first order + dim-E
    second order), FM1 + FM2 + deep logits fused by a learned Linear(3,1)
    (deepfm.py:112,148-150 — nonstandard; reproduced).
  * FwFM — ``algorithm/FwFM/fwfm.py:87-139``: 6 fields, linear terms +
    per-pair weight r_p * <v_i, v_j> + global bias.
  * AFM — ``algorithm/AFM/afm.py:64-119``: dense linear + attention-pooled
    pairwise hadamard interactions over 7 fields, projection p.
  * FFM, PNN, Wide&Deep — README-only models (README.md:19,21,22),
    implemented from the cited papers with the shared feature conventions.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .. import ops
from .base import AFM_FIELDS, FM_FIELDS, Batch, RankModel, single_task_output
from ..embedding.collection import INITIALIZERS, EmbeddingCollection


class DeepFM(RankModel):
    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        first = self.uniform_tables(FM_FIELDS, 1, "first_order")
        second = self.uniform_tables(FM_FIELDS, cfg.embedding_dim, "second_order")

        fo = jnp.stack([first[f](batch[f])[..., 0] for f in FM_FIELDS], axis=-1)
        fm1 = ops.fm_first_order(fo)  # (B, 1)

        embs = jnp.stack([second[f](batch[f]) for f in FM_FIELDS], axis=1)  # (B,F,E)
        fm2 = ops.fm_second_order(embs)  # (B, 1)

        deep_in = embs.reshape(embs.shape[0], -1)
        deep = ops.MLPTower(
            cfg.hidden_units,
            activation="relu",
            batch_norm=cfg.batch_norm,
            dropout_rate=cfg.dropout_rate,
            order="bn_act",
            dense_init=cfg.dense_init,
        )(deep_in, train=train)
        deep_logit = self.dense(1, deep.shape[-1], name="deep_output")(deep)

        fused = jnp.concatenate([fm1, fm2, deep_logit], axis=-1)
        logit = self.dense(1, 3, name="final_layer")(fused)
        return single_task_output(logit)


class FwFM(RankModel):
    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        linear = self.uniform_tables(FM_FIELDS, 1, "linear")
        tables = self.uniform_tables(FM_FIELDS, cfg.embedding_dim, "emb")

        lin = sum(linear[f](batch[f]) for f in FM_FIELDS)  # (B, 1)
        embs = jnp.stack([tables[f](batch[f]) for f in FM_FIELDS], axis=1)
        num_pairs = len(FM_FIELDS) * (len(FM_FIELDS) - 1) // 2
        r = self.param("field_weight", nn.initializers.normal(1.0), (num_pairs,))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        quad = ops.fwfm_interaction(embs, r)
        return single_task_output(lin + quad + bias)


class FFM(RankModel):
    """Field-aware FM (Juan et al. 2016): each field holds F embeddings,
    one specialised per partner field."""

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        f_count = len(FM_FIELDS)
        init = INITIALIZERS[cfg.embedding_init]
        linear = self.uniform_tables(FM_FIELDS, 1, "linear")
        lin = sum(linear[f](batch[f]) for f in FM_FIELDS)
        # field-aware tables: vocab x (F * E), viewed as (B, F_partner, E)
        fa = []
        for name in FM_FIELDS:
            spec = self.schema.categorical_feature(name)
            table = nn.Embed(
                spec.vocab_size,
                f_count * cfg.embedding_dim,
                embedding_init=nn.with_partitioning(init, ("table", None)),
                name=f"ffm_{name}",
            )
            fa.append(table(batch[name]).reshape(-1, f_count, cfg.embedding_dim))
        field_aware = jnp.stack(fa, axis=1)  # (B, F, F_partner, E)
        bias = self.param("bias", nn.initializers.zeros, (1,))
        quad = ops.ffm_interaction(field_aware)
        return single_task_output(lin + quad + bias)


class AFM(RankModel):
    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        tables = self.uniform_tables(AFM_FIELDS, cfg.embedding_dim, "emb")
        nd = self.dense_input(batch)
        dense_logit = self.dense(1, nd.shape[-1], name="dense_layer")(nd)
        embs = jnp.stack([tables[f](batch[f]) for f in AFM_FIELDS], axis=1)
        pairs = ops.pairwise_hadamard(embs)  # (B, P, E)
        h = nn.relu(
            self.dense(cfg.attention_factor, pairs.shape[-1], name="att_1")(pairs)
        )
        scores = self.dense(1, h.shape[-1], name="att_2")(h)  # (B, P, 1)
        weights = nn.softmax(scores, axis=1)
        pooled = jnp.sum(pairs * weights, axis=1)  # (B, E)
        afm_logit = self.dense(1, pooled.shape[-1], name="p")(pooled)
        return single_task_output(dense_logit + afm_logit)


class PNN(RankModel):
    """Product-based NN (Qu et al. 2016): [flat embeddings; product signal]
    -> MLP tower -> logit."""

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        tables = self.uniform_tables(AFM_FIELDS, cfg.embedding_dim, "emb")
        embs = jnp.stack([tables[f](batch[f]) for f in AFM_FIELDS], axis=1)
        z = embs.reshape(embs.shape[0], -1)
        feats = [z]
        if cfg.pnn_mode in ("inner", "both"):
            feats.append(ops.InnerProductLayer()(embs))
        if cfg.pnn_mode in ("outer", "both"):
            feats.append(ops.OuterProductLayer(cfg.outer_outputs)(embs))
        x = jnp.concatenate(feats, axis=-1)
        h = ops.MLPTower(
            cfg.hidden_units,
            activation="relu",
            batch_norm=cfg.batch_norm,
            dropout_rate=cfg.dropout_rate,
            dense_init=cfg.dense_init,
        )(x, train=train)
        return single_task_output(self.dense(1, h.shape[-1])(h))


class WideDeep(RankModel):
    """Wide & Deep (Cheng et al. 2016). Wide: dense + per-field linear
    weights; Deep: dense + per-field-dim embeddings -> tower."""

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        coll = self.embedding_collection()
        linear = self.uniform_tables(AFM_FIELDS, 1, "wide")
        wide = sum(linear[f](batch[f]) for f in AFM_FIELDS)
        nd = self.dense_input(batch)
        wide = wide + self.dense(1, nd.shape[-1], name="wide_dense")(nd)
        field_embs = self.tower_field_embeddings(coll, batch)
        deep_in = jnp.concatenate([self.dense_input(batch)] + field_embs, axis=-1)
        h = ops.MLPTower(
            cfg.hidden_units,
            activation="relu",
            batch_norm=cfg.batch_norm,
            dropout_rate=cfg.dropout_rate,
            dense_init=cfg.dense_init,
        )(deep_in, train=train)
        deep = self.dense(1, h.shape[-1], name="deep_output")(h)
        return single_task_output(wide + deep)


class FLEN(RankModel):
    """FLEN (Feng et al. 2020, arXiv:1911.04690) — the second model on the
    reference's to-do list (README.md:61, no reference code).

    Fields are partitioned into field GROUPS (user / item / tag context for
    the WeChat schema, cfg.flen_groups). Three components:
      * S (first order): per-field dim-1 weights + dense-feature linear;
      * FwBI: h_MF (r-weighted elementwise products of group-sum
        embeddings over group pairs) + h_FM (r-weighted intra-group
        bi-interaction pooling), see ops/fm.py:flen_field_wise_bi_interaction;
      * MLP: flat field embeddings + dense features -> tower.
    logit = Dense([h_S ; h_MF+h_FM ; h_MLP]). Dense features (absent in the
    paper's Avazu setting) enter S and MLP, matching this zoo's other
    full-feature models.
    """

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        fields = tuple(f for group in cfg.flen_groups for f in group)
        slices, start = [], 0
        for group in cfg.flen_groups:
            slices.append((start, start + len(group)))
            start += len(group)
        tables = self.uniform_tables(fields, cfg.embedding_dim, "emb")
        linear = self.uniform_tables(fields, 1, "linear")
        emb = jnp.stack([tables[f](batch[f]) for f in fields], axis=1)

        h_s = sum(linear[f](batch[f]) for f in fields)
        nd = self.dense_input(batch)
        h_s = h_s + self.dense(1, nd.shape[-1], name="dense_linear")(nd)

        m = len(cfg.flen_groups)
        r_intra = self.param("r_intra", nn.initializers.ones, (m,))
        r_inter = self.param(
            "r_inter", nn.initializers.ones, (m * (m - 1) // 2,)
        )
        h_fwbi = ops.flen_field_wise_bi_interaction(
            emb, tuple(slices), r_intra, r_inter
        )

        mlp_in = jnp.concatenate(
            [self.dense_input(batch), emb.reshape(emb.shape[0], -1)], axis=-1
        )
        h_mlp = ops.MLPTower(
            cfg.hidden_units,
            activation="relu",
            batch_norm=cfg.batch_norm,
            dropout_rate=cfg.dropout_rate,
            dense_init=cfg.dense_init,
        )(mlp_in, train=train)

        out = jnp.concatenate([h_s, h_fwbi, h_mlp], axis=-1)
        return single_task_output(self.dense(1, out.shape[-1], name="final")(out))
