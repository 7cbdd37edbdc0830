"""Behaviour-sequence models: DIN, BST, DIEN.

Parity targets:
  * DIN — ``algorithm/DIN/din.py:225-323``: concat(dense, 6 cat embs,
    target feedid emb, DIN-attention-pooled history) -> tower with
    Dice/PReLU (+BN+dropout, din.py:272-284 ordering); optional
    mini-batch-aware L2 on the embedding activations (din.py:317-322)
    returned as aux_loss.
  * BST — ``algorithm/BST/bst.py:162-247``: transformer over the behaviour
    sequence, sum/mean pooling, concat with dense + cat embs -> LeakyReLU
    tower. The reference's "sequence" is actually the scalar target feedid
    (a bug, bst.py:142-150); here the sequence is the true history with the
    target item appended as the final position, which is the BST paper's
    construction and matches the reference's max_len+1 positional table
    (bst.py:192).
  * DIEN — ``algorithm/DIEN/dien.py:166-353`` (TF1): GRU over history ->
    bilinear attention vs target (dien.py:205-218) -> AUGRU -> final state
    into the tower; optional auxiliary next-item loss (dien.py:256-300 —
    non-functional in the reference for lack of negative sampling; here
    implemented with in-batch rolled negatives behind ``use_aux_loss``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .. import ops
from ..embedding.collection import EmbeddingCollection
from .base import Batch, RankModel, single_task_output


class DIN(RankModel):
    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        coll = self.embedding_collection()
        field_embs = self.tower_field_embeddings(coll, batch)

        target_emb = coll.lookup("feedid", batch["feedid"])  # (B, 16)
        seq = batch[cfg.seq_feature]
        lengths = batch[cfg.seq_feature + "_length"]
        seq_emb = coll.lookup(cfg.seq_feature, seq)  # (B, T, 16)

        att_out = ops.DINAttention(
            use_softmax=cfg.use_softmax,
            backend=cfg.kernel_backend,
            dense_init=cfg.dense_init,
            name="attention",
        )(target_emb, seq_emb, lengths)
        x = jnp.concatenate(
            [self.dense_input(batch)] + field_embs + [target_emb, att_out], axis=-1
        )
        h = ops.MLPTower(
            cfg.hidden_units,
            activation=cfg.activation,
            batch_norm=cfg.batch_norm,
            dropout_rate=cfg.dropout_rate,
            order="act_bn",  # DIN ordering: Linear -> Dice -> BN -> Dropout
            dense_init=cfg.dense_init,
            name="fcn",
        )(x, train=train)
        logit = self.dense(1, h.shape[-1], name="output")(h)

        aux = 0.0
        if cfg.mini_batch_aware_regularization and cfg.l2_lambda > 0:
            emb_vars = jnp.concatenate(field_embs + [target_emb, att_out], axis=-1)
            aux = cfg.l2_lambda * jnp.mean(
                jnp.linalg.norm(emb_vars, axis=-1)
            )  # din.py:321-322
        return single_task_output(logit, aux)


class BST(RankModel):
    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        coll = self.embedding_collection()
        field_embs = self.tower_field_embeddings(coll, batch)

        seq = batch[cfg.seq_feature]  # (B, T)
        lengths = batch[cfg.seq_feature + "_length"]
        # target item appended as the last sequence position (paper form)
        full_seq = jnp.concatenate([seq, batch["feedid"][:, None]], axis=1)
        t = full_seq.shape[1]
        seq_emb = coll.lookup(cfg.seq_feature, full_seq)  # (B, T+1, 16)
        pos = jnp.arange(t)[None, :]
        valid = (pos < lengths[:, None]) | (pos == t - 1)  # history + target

        h = seq_emb
        for i in range(cfg.num_transformer_blocks):
            h = ops.BSTTransformerBlock(
                d_model=seq_emb.shape[-1],
                num_heads=cfg.num_heads,
                max_len=t,
                dropout_rate=cfg.dropout_rate,
                compute_dtype=cfg.transformer_dtype,
                score_dtype=cfg.transformer_score_dtype,
                dense_init=cfg.dense_init,
                attn_impl=cfg.attn_impl,
                name=f"transformer_{i}",
            )(h, valid, train=train)

        h = h.astype(jnp.float32) * valid[..., None].astype(jnp.float32)
        if cfg.pooling_method == "sum":
            pooled = jnp.sum(h, axis=1)
        else:  # mean over valid positions
            denom = jnp.sum(valid.astype(h.dtype), axis=1, keepdims=True)
            pooled = jnp.sum(h, axis=1) / jnp.maximum(denom, 1.0)

        x = jnp.concatenate(
            [self.dense_input(batch)] + field_embs + [pooled], axis=-1
        )
        out = ops.MLPTower(
            cfg.hidden_units,
            activation="leakyrelu",
            batch_norm=cfg.batch_norm,
            dropout_rate=cfg.dropout_rate,
            order="bn_act",  # BST ordering: Linear -> BN -> LeakyReLU -> Dropout
            final_logit=True,
            dense_init=cfg.dense_init,
            name="dnn",
        )(x, train=train)
        return single_task_output(out)


class DIEN(RankModel):
    @nn.compact
    def __call__(self, batch: Batch, train: bool = False):
        cfg = self.cfg
        coll = self.embedding_collection()
        field_embs = self.tower_field_embeddings(coll, batch)

        target_emb = coll.lookup("feedid", batch["feedid"])
        seq = batch[cfg.seq_feature]
        lengths = batch[cfg.seq_feature + "_length"]
        seq_emb = coll.lookup(cfg.seq_feature, seq)  # (B, T, D)

        # interest extraction: plain GRU over the history
        gru_outs, _ = ops.AttentionalGRU(
            cfg.gru_hidden_dim, mode="gru", unroll=cfg.gru_unroll,
            name="interest_extractor",
        )(seq_emb, lengths)

        # interest evolution: attention scores vs target feed the AUGRU
        att_weights = ops.BilinearAttention(name="attention")(
            target_emb, gru_outs, lengths
        )  # (B, T)
        _, final_state = ops.AttentionalGRU(
            cfg.gru_hidden_dim, mode="augru", unroll=cfg.gru_unroll,
            name="interest_evolution",
        )(gru_outs, lengths, att_weights)

        x = jnp.concatenate(
            [self.dense_input(batch)] + field_embs + [target_emb, final_state],
            axis=-1,
        )
        h = ops.MLPTower(
            cfg.hidden_units,
            activation=cfg.activation if cfg.activation != "relu" else "prelu",
            batch_norm=cfg.batch_norm,
            dropout_rate=cfg.dropout_rate,
            order="act_bn",
            dense_init=cfg.dense_init,
            name="fcn",
        )(x, train=train)
        logit = self.dense(1, h.shape[-1], name="output")(h)

        aux = 0.0
        if cfg.use_aux_loss:
            # next-item auxiliary loss (dien.py:256-300): h_t should score
            # e_{t+1} (positive) above an in-batch negative (rolled rows).
            h_t = gru_outs[:, :-1, :]              # (B, T-1, H)
            pos = seq_emb[:, 1:, :]                # (B, T-1, D)
            neg = jnp.roll(seq_emb[:, 1:, :], 1, axis=0)
            t = seq.shape[1]
            valid = (jnp.arange(1, t)[None, :] < lengths[:, None]).astype(
                jnp.float32
            )
            if h_t.shape[-1] != pos.shape[-1]:
                proj = nn.Dense(h_t.shape[-1], name="aux_proj")
                pos, neg = proj(pos), proj(neg)
            pos_logit = jnp.sum(h_t * pos, axis=-1)
            neg_logit = jnp.sum(h_t * neg, axis=-1)
            eps = 1e-7
            ll = -jnp.log(nn.sigmoid(pos_logit) + eps) - jnp.log(
                1.0 - nn.sigmoid(neg_logit) + eps
            )
            aux = cfg.aux_loss_weight * jnp.sum(ll * valid) / jnp.maximum(
                jnp.sum(valid), 1.0
            )
        return single_task_output(logit, aux)
