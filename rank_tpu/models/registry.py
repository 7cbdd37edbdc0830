"""Model registry: one ``build_model(schema, config)`` for the whole zoo
(the reference's 16 models plus AutoInt from its to-do list), replacing
the reference's 8 separate entry scripts (README.md:11-12) and covering
the 8 README-only models.

Per-model default configs encode each reference model's best-AUC
hyperparameters (BASELINE.md / algorithm/<M>/result.md).
"""

from __future__ import annotations

from typing import Dict, Type

from ..features import FeatureSchema
from .base import ModelConfig, RankModel
from .cross_family import DCN, AutoInt, DeepCrossing, FiBiNet, XDeepFM
from .fm_family import AFM, FFM, FLEN, PNN, DeepFM, FwFM, WideDeep
from .multitask import ESMM, MMOE, PLE
from .sequence import BST, DIEN, DIN

MODEL_CLASSES: Dict[str, Type[RankModel]] = {
    "ffm": FFM,
    "deepcrossing": DeepCrossing,
    "pnn": PNN,
    "widedeep": WideDeep,
    "deepfm": DeepFM,
    "dcn": DCN,
    "afm": AFM,
    "xdeepfm": XDeepFM,
    "fwfm": FwFM,
    "din": DIN,
    "dien": DIEN,
    "fibinet": FiBiNet,
    "autoint": AutoInt,
    "flen": FLEN,
    "bst": BST,
    "esmm": ESMM,
    "mmoe": MMOE,
    "ple": PLE,
}

MULTI_TASK_MODELS = {"esmm", "mmoe", "ple"}

# Best-AUC hyperparameters from each model's result.md sweep (BASELINE.md).
DEFAULT_CONFIGS: Dict[str, ModelConfig] = {
    "deepfm": ModelConfig(name="deepfm", embedding_dim=16),
    "fwfm": ModelConfig(name="fwfm", embedding_dim=16),
    "ffm": ModelConfig(name="ffm", embedding_dim=8),
    "afm": ModelConfig(name="afm", embedding_dim=32, attention_factor=64),
    "pnn": ModelConfig(name="pnn", embedding_dim=16, pnn_mode="inner"),
    "widedeep": ModelConfig(name="widedeep"),
    "dcn": ModelConfig(name="dcn", num_cross_layers=3, hidden_units=(512, 256, 128)),
    "deepcrossing": ModelConfig(
        name="deepcrossing", residual_internal_dim=256, num_residual_units=2
    ),
    "xdeepfm": ModelConfig(name="xdeepfm", embedding_dim=16, cin_layer_sizes=(128, 128)),
    "fibinet": ModelConfig(name="fibinet", embedding_dim=16),
    "autoint": ModelConfig(name="autoint", embedding_dim=16),
    "flen": ModelConfig(name="flen", embedding_dim=16),
    "din": ModelConfig(
        name="din", activation="dice", use_softmax=True,
        mini_batch_aware_regularization=False,
    ),
    "bst": ModelConfig(
        name="bst", num_transformer_blocks=2, num_heads=2, pooling_method="mean"
    ),
    "dien": ModelConfig(name="dien", gru_hidden_dim=16, activation="prelu"),
    "esmm": ModelConfig(name="esmm", tasks=("read_comment", "like")),
    "mmoe": ModelConfig(name="mmoe"),
    "ple": ModelConfig(name="ple"),
}


def default_config(name: str, **overrides) -> ModelConfig:
    cfg = DEFAULT_CONFIGS[name]
    return cfg.replace(**overrides) if overrides else cfg


def build_model(
    schema: FeatureSchema,
    cfg: ModelConfig,
    mesh=None,
    sharded_tables=(),
) -> RankModel:
    """mesh/sharded_tables only matter for the explicit embedding
    schedules (cfg.embedding_mode != 'gspmd'); the Trainer supplies them."""
    try:
        cls = MODEL_CLASSES[cfg.name]
    except KeyError:
        raise ValueError(
            f"unknown model {cfg.name!r}; available: {sorted(MODEL_CLASSES)}"
        ) from None
    return cls(
        schema=schema, cfg=cfg, mesh=mesh,
        sharded_tables=tuple(sharded_tables),
    )
