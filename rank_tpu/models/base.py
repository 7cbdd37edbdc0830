"""Shared model plumbing: config dataclass + common feature assembly.

One config-driven ``build_model`` (see registry.py) replaces the
reference's 8+ per-model argparse mains (``deepfm.py:295-313``,
``din.py:487-508``, ...). Hyperparameter names follow the reference CLIs
where they exist.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..features import FeatureSchema
from ..embedding.collection import INITIALIZERS, EmbeddingCollection

Batch = Dict[str, jnp.ndarray]

# Field sets used by the reference models:
# DeepFM/FwFM: 6 cat incl. feedid, no tags (deepfm.py:42-44, fwfm.py:30)
FM_FIELDS = ("userid", "feedid", "device", "authorid", "bgm_song_id", "bgm_singer_id")
# AFM: 7 cat incl. feedid and manual_tag_list (afm.py:132-134)
AFM_FIELDS = FM_FIELDS + ("manual_tag_list",)
# DCN/DeepCrossing/DIN/BST: 6 cat with tags, no feedid (dcn.py:80-82)
TOWER_FIELDS = ("userid", "device", "authorid", "bgm_song_id", "bgm_singer_id", "manual_tag_list")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Union of every model's hyperparameters; unused fields are ignored.

    Defaults are each reference model's best-AUC settings per
    ``algorithm/<M>/result.md`` (see BASELINE.md).
    """

    name: str = "deepfm"
    # tower (shared)
    hidden_units: Tuple[int, ...] = (512, 256, 128)
    dropout_rate: float = 0.1
    batch_norm: bool = True
    # uniform-dim embedding models (DeepFM/FwFM/AFM/FFM/PNN/xDeepFM/FiBiNet)
    embedding_dim: int = 16
    # N(0,1) is the torch nn.Embedding default the reference trains with;
    # measured on synthetic data it beats small-scale inits by ~0.03 AUC
    # (CTR embeddings need initial magnitude at Adam lr 5e-3).
    embedding_init: str = "normal"
    # dense-layer init family: 'lecun' (flax default: lecun_normal kernel,
    # zero bias) or 'torch' (torch nn.Linear defaults: uniform
    # +-1/sqrt(fan_in) kernel AND bias; DCN cross weights N(0,0.02)).
    # 'torch' makes calibrated-regime head-to-heads vs the bench.py torch
    # mirrors compare learning dynamics rather than init families, and
    # fixes the 3-epoch DCN seed collapse (PARITY_CALIB_r04.md).
    dense_init: str = "lecun"
    # DIN
    activation: str = "dice"
    use_softmax: bool = True
    l2_lambda: float = 0.2
    mini_batch_aware_regularization: bool = False
    # DCN
    num_cross_layers: int = 3
    # emulate the reference's untrained-random-cross mechanism
    # (cross_layer.py fresh-params bug; ops/cross.py CrossNetwork)
    cross_frozen_random: bool = False
    # DeepCrossing
    residual_internal_dim: int = 256
    num_residual_units: int = 2
    # AFM
    attention_factor: int = 64
    # BST
    num_heads: int = 2
    num_transformer_blocks: int = 2
    pooling_method: str = "mean"  # sum | mean
    # block-internal activation dtype; bfloat16 halves the lane-padding-
    # bound HBM traffic at d=16 (see ops/transformer.py), LN/softmax stay
    # f32. Set "float32" for bit-exact reference-style numerics.
    transformer_dtype: str = "bfloat16"
    # dtype of the (B,T,T) attention score/weight storage in the BST
    # block (softmax reductions stay f32; ops/transformer.py score_dtype).
    # bfloat16 measured +2.7% model throughput in an interleaved A/B
    # (scripts/bench_bst_scoredtype.py, 311.8k -> 320.1k ex/s) with
    # op-level parity tests; set "float32" for bit-exact score storage.
    # NOTE AutoInt's interacting-layer softmax storage consumes the same
    # field (cross_family.py AutoInt; measured only on BST — AutoInt
    # inherits the flip, its bf16 path is parity-tested in test_models).
    transformer_score_dtype: str = "bfloat16"
    # BST/AutoInt attention formulation: 'vpu' (per-head broadcast-
    # multiply loop — the measured winner, ATTNIMPL_r05.json), 'vpu2'
    # (head-vectorized; removes the per-head layout copies but measured
    # 0.85x — see ops/transformer.py), 'einsum' (classic batched
    # matmuls; best for d_head >= 128).
    attn_impl: str = "vpu"
    # xDeepFM
    cin_layer_sizes: Tuple[int, ...] = (128, 128)
    # FiBiNet
    bilinear_type: str = "interaction"
    senet_reduction: int = 3
    # AutoInt (reference to-do, README.md:61; Song et al. 2019 defaults)
    autoint_layers: int = 3
    autoint_heads: int = 2
    autoint_att_dim: int = 32
    # PNN
    pnn_mode: str = "inner"  # inner | outer | both
    # FLEN (reference to-do README.md:61): field groups for the FwBI module
    # — user / item / tag-context partition of the WeChat fields
    flen_groups: Tuple[Tuple[str, ...], ...] = (
        ("userid", "device"),
        ("feedid", "authorid", "bgm_song_id", "bgm_singer_id"),
        ("manual_tag_list",),
    )
    outer_outputs: int = 64
    # DIEN
    gru_hidden_dim: int = 16
    use_aux_loss: bool = False
    aux_loss_weight: float = 1.0
    gru_unroll: int = 5  # scan unroll for the two GRU passes (T=50)
    # multi-task (ESMM/MMOE/PLE)
    tasks: Tuple[str, ...] = ("read_comment", "like", "click_avatar")
    # 'sum' (reference-style equal weights), 'uncertainty' (Kendall et al.
    # 2018 learned per-task log-variances), 'gradnorm' (Chen et al. 2018)
    # or 'pcgrad' (Yu et al. 2020) — the reference's MTL-trick to-do list
    # (README.md:59). gradnorm/pcgrad need logit-head models (mmoe/ple);
    # see train/mtl.py.
    task_weighting: str = "sum"
    gradnorm_alpha: float = 1.5  # paper's asymmetry default
    gradnorm_lr: float = 0.025  # weight-update step size
    num_experts: int = 4
    expert_units: Tuple[int, ...] = (256, 128)
    tower_units: Tuple[int, ...] = (64,)
    # PLE
    num_levels: int = 2
    specific_experts_per_task: int = 2
    shared_experts: int = 2
    # multi-hot tags: mean-pool the tag sequence instead of the reference's
    # scalar manual_tag_list lookup (which almost always hits OOV row 0
    # because it looks up the comma-joined string; afm.py:133 note).
    multihot_tags: bool = True
    # sequence feature used by DIN/BST/DIEN
    seq_feature: str = "his_read_comment_7d_seq"
    # embedding lookup schedule on a table-sharded mesh: 'gspmd' (XLA
    # inserts collectives from the sharding annotations) or the explicit
    # shard_map schedules 'psum' / 'alltoall' (embedding/sharded.py).
    # Applies to the EmbeddingCollection path (tower/sequence/multitask
    # models); FM-family uniform tables always use the gspmd path.
    embedding_mode: str = "gspmd"
    # Pallas kernel dispatch: 'auto' currently resolves to 'jnp' (XLA's
    # fused path wins at the WeChat dims, see ops/pallas/din_attention.py);
    # pass 'pallas' explicitly for large-D configs.
    kernel_backend: str = "auto"

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


class RankModel(nn.Module):
    """Base: every model takes the full batch and returns an output dict
    {"logits": (B,) | {task: (B,)}, "aux_loss": scalar}.

    ``mesh``/``sharded_tables`` are supplied by the Trainer when the
    explicit embedding schedules (cfg.embedding_mode != 'gspmd') are in
    play: the mesh for shard_map, and the names of tables it actually
    row-shards (the rest keep the plain gather)."""

    schema: FeatureSchema
    cfg: ModelConfig
    mesh: object = None  # Optional[jax.sharding.Mesh]; static/hashable
    sharded_tables: Tuple[str, ...] = ()

    def embedding_collection(self, name: str = "tables") -> EmbeddingCollection:
        return EmbeddingCollection(
            self.schema,
            self.cfg.embedding_init,
            mode=self.cfg.embedding_mode,
            mesh=self.mesh,
            sharded=self.sharded_tables,
            name=name,
        )

    def dense_input(self, batch: Batch) -> jnp.ndarray:
        return batch["dense"]

    def dense(self, features: int, fan_in: int, name: str = None, **kw):
        """nn.Dense honouring ``cfg.dense_init`` (ops/mlp.py)."""
        from ..ops.mlp import dense_init_kwargs

        return nn.Dense(
            features, name=name,
            **dense_init_kwargs(self.cfg.dense_init, fan_in), **kw,
        )

    def uniform_tables(self, fields: Sequence[str], dim: int, prefix: str = "emb"):
        """Create per-field tables with one shared dim (FM-family models)."""
        init = INITIALIZERS[self.cfg.embedding_init]
        return {
            name: nn.Embed(
                self.schema.categorical_feature(name).vocab_size,
                dim,
                embedding_init=nn.with_partitioning(init, ("table", None)),
                name=f"{prefix}_{name}",
            )
            for name in fields
        }

    def tower_field_embeddings(
        self, collection: EmbeddingCollection, batch: Batch
    ) -> List[jnp.ndarray]:
        """Per-field-dim embeddings for the 6 tower fields, with optional
        multi-hot tag pooling (mean over valid tags)."""
        outs = []
        for name in TOWER_FIELDS:
            if name == "manual_tag_list" and self.cfg.multihot_tags:
                seq = batch["manual_tag_seq"]  # (B, T)
                lengths = batch["manual_tag_seq_length"]
                emb = collection.lookup("manual_tag_seq", seq)  # (B, T, D)
                mask = (seq > 0)[..., None].astype(emb.dtype)
                # mean over non-OOV tags: denominator counts the same tags
                # the numerator keeps (an OOV tag id 0 contributes nothing)
                denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
                outs.append(jnp.sum(emb * mask, axis=1) / denom)
            else:
                outs.append(collection.lookup(name, batch[name]))
        return outs


def single_task_output(logits: jnp.ndarray, aux_loss=0.0) -> Dict:
    return {"logits": logits.reshape(-1), "aux_loss": jnp.asarray(aux_loss, jnp.float32)}
