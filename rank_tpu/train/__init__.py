from .checkpoint import CheckpointManager, export_predictions
from .loop import TrainConfig, Trainer
from . import metrics

__all__ = ["CheckpointManager", "export_predictions", "TrainConfig", "Trainer", "metrics"]
