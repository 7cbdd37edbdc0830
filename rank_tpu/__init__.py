"""rank_tpu — TPU-native CTR ranking framework.

The reference model zoo (reallinshengxiang/Implementation-of-Rank-
Algorithm-for-Mainstream-Recommender-Systems) rebuilt TPU-first:
see README.md and PARITY.md for the component map.
"""

from .features import WECHAT_SCHEMA, FeatureSchema, tiny_schema
from .models import ModelConfig, build_model, default_config
from .serve import Predictor, export_serving_artifact, load_serving_artifact

__version__ = "0.1.0"

__all__ = [
    "WECHAT_SCHEMA",
    "FeatureSchema",
    "tiny_schema",
    "ModelConfig",
    "build_model",
    "default_config",
    "Predictor",
    "export_serving_artifact",
    "load_serving_artifact",
    "__version__",
]
