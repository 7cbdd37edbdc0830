"""Orbax checkpointing with the reference's selection semantics.

Reference behaviour reproduced (``deepfm.py:259-274``):
  * ``best`` checkpoint saved whenever eval AUC improves, reloaded before
    prediction export;
  * periodic full checkpoints (params + optimizer state + metrics) every
    ``save_checkpoints_steps`` epochs;
  * plus resume support, which the reference's checkpoints allowed for but
    never implemented (SURVEY.md section 5).

Multi-host: Orbax saves are collective across processes.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(model_dir: str, name: str) -> str:
    return os.path.join(os.path.abspath(model_dir), name)


class CheckpointManager:
    def __init__(self, model_dir: str):
        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    # -- best model (params only, like best_model.pth) --------------------

    def save_best(self, state: Dict[str, Any]) -> None:
        payload = {"params": state["params"], "extra": state["extra"]}
        self._ckptr.save(
            _path(self.model_dir, "best_model"), payload, force=True
        )

    def restore_best(self, state: Dict[str, Any]) -> Dict[str, Any]:
        target = {"params": state["params"], "extra": state["extra"]}
        restored = self._ckptr.restore(
            _path(self.model_dir, "best_model"),
            args=ocp.args.PyTreeRestore(item=target),
        )
        new_state = dict(state)
        new_state["params"] = restored["params"]
        new_state["extra"] = restored["extra"]
        return new_state

    def has_best(self) -> bool:
        return os.path.exists(_path(self.model_dir, "best_model"))

    # -- full checkpoints (resume) ---------------------------------------

    def save_epoch(self, state, epoch: int, metrics: Dict[str, float]) -> None:
        payload = {"state": state, "epoch": np.asarray(epoch)}
        self._ckptr.save(
            _path(self.model_dir, f"checkpoint_epoch_{epoch}"), payload, force=True
        )
        # metrics as a JSON sidecar (keeps the orbax tree structure fixed)
        import json

        if jax.process_index() == 0:
            with open(
                _path(self.model_dir, f"checkpoint_epoch_{epoch}_metrics.json"), "w"
            ) as f:
                json.dump({k: float(v) for k, v in metrics.items()}, f)

    def epoch_metrics(self, epoch: int) -> Dict[str, float]:
        import json

        path = _path(self.model_dir, f"checkpoint_epoch_{epoch}_metrics.json")
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)

    def latest_epoch(self) -> Optional[int]:
        epochs = []
        for d in os.listdir(self.model_dir):
            if d.startswith("checkpoint_epoch_"):
                try:
                    epochs.append(int(d.rsplit("_", 1)[1]))
                except ValueError:
                    pass
        return max(epochs) if epochs else None

    def restore_epoch(self, state, epoch: int):
        target = {"state": state, "epoch": np.asarray(epoch)}
        restored = self._ckptr.restore(
            _path(self.model_dir, f"checkpoint_epoch_{epoch}"),
            args=ocp.args.PyTreeRestore(item=target),
        )
        return restored["state"], int(restored["epoch"])


def export_predictions(
    output_dir: str,
    labels: np.ndarray,
    probabilities: np.ndarray,
    label_name: str = "read_comment",
    extra_columns: Optional[Dict[str, np.ndarray]] = None,
) -> str:
    """predictions.csv with label + probability columns (deepfm.py:288-292);
    extra_columns supports the FwFM variant that adds ids (fwfm.py:266-273)."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "predictions.csv")
    cols = {label_name: labels, "probability": probabilities}
    if extra_columns:
        cols = {**extra_columns, **cols}
    names = list(cols)
    with open(path, "w") as f:
        f.write(",".join(names) + "\n")
        arrays = [np.asarray(cols[n]) for n in names]
        for row in zip(*arrays):
            f.write(",".join(str(x) for x in row) + "\n")
    return path
