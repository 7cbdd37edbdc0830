"""Inference/serving path.

The reference has no serving layer (SURVEY.md section 1: "nothing sits
above L1" — its closest artifact is DIEN's SavedModel BestExporter,
``dien.py:398-405``). This module is the production-inference equivalent:
load the best checkpoint, compile a fixed-shape eval-mode apply function
per batch bucket, and serve padded request batches.

Static shapes: requests are padded up to the nearest power-of-two bucket
(>= min_bucket) so XLA compiles a handful of programs instead of one per
request size.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .features import FeatureSchema
from .models import MULTI_TASK_MODELS, ModelConfig, build_model
from .train.checkpoint import CheckpointManager


def _bucket(n: int, min_bucket: int) -> int:
    b = min_bucket
    while b < n:
        b *= 2
    return b


class Predictor:
    def __init__(
        self,
        schema: FeatureSchema,
        model_cfg: ModelConfig,
        model_dir: Optional[str] = None,
        variables: Optional[Dict] = None,
        min_bucket: int = 256,
        weights_dtype: Optional[str] = None,
    ):
        """``weights_dtype='bfloat16'`` casts the float32 PARAMS (not the
        BatchNorm running statistics) after restore: halves the weight
        HBM footprint and the embedding-gather read traffic — the
        serving-side analog of the training path's bf16 internals. Dense
        compute promotes back to f32 at the first matmul, so outputs
        track the f32 predictor to bf16 resolution (tested)."""
        self.schema = schema
        self.model_cfg = model_cfg
        self.model = build_model(schema, model_cfg)
        self.min_bucket = min_bucket
        if variables is None:
            if model_dir is None:
                raise ValueError("need model_dir or variables")
            # restore using an abstract template from a dummy init
            from .data.synthetic import make_synthetic_dataset

            sample = make_synthetic_dataset(schema, num_rows=1, seed=0)
            batch = {k: jnp.asarray(v) for k, v in sample.items()}
            import flax.linen as nn

            init_vars = nn.meta.unbox(
                self.model.init(
                    {
                        "params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1),
                    },
                    batch,
                    train=False,
                )
            )
            state = {
                "params": init_vars["params"],
                "extra": {k: v for k, v in init_vars.items() if k != "params"},
            }
            mgr = CheckpointManager(model_dir)
            state = mgr.restore_best(state)
            variables = {"params": state["params"], **state["extra"]}
        if weights_dtype is not None:
            wd = jnp.dtype(weights_dtype)
            variables = dict(variables)
            variables["params"] = jax.tree_util.tree_map(
                lambda x: x.astype(wd)
                if jnp.asarray(x).dtype == jnp.float32 else x,
                variables["params"],
            )
        self.variables = variables

        def apply_fn(variables, batch):
            out = self.model.apply(variables, batch, train=False)
            if "probs" in out:
                return out["probs"]
            logits = out["logits"]
            if isinstance(logits, dict):
                return {k: jax.nn.sigmoid(v) for k, v in logits.items()}
            task = "score"
            return {task: jax.nn.sigmoid(logits)}

        self._apply_fn = apply_fn  # raw (unjitted) — used by export
        self._apply = jax.jit(apply_fn)

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """batch: loader-layout feature dict (no labels required).
        Returns {head: (N,) probabilities}."""
        n = next(iter(batch.values())).shape[0]
        b = _bucket(n, self.min_bucket)
        padded = {}
        for k, v in batch.items():
            if k in ("labels", "_valid"):
                continue
            if b != n:
                pad = np.repeat(np.asarray(v[:1]), b - n, axis=0)
                v = np.concatenate([np.asarray(v), pad], axis=0)
            padded[k] = jnp.asarray(v)
        # models index batch["labels"] nowhere in eval apply; provide zeros
        padded["labels"] = jnp.zeros((b, len(self.schema.labels)), jnp.float32)
        out = self._apply(self.variables, padded)
        return {k: np.asarray(v)[:n] for k, v in out.items()}


# -- portable serving artifacts (jax.export / StableHLO) -------------------


def export_serving_artifact(
    predictor: Predictor, path: str, batch_size: int = 256
) -> None:
    """Serialize the predictor to a self-contained StableHLO artifact.

    The TPU-native analog of DIEN's ``BestExporter`` SavedModel export
    (``dien.py:398-405``, the reference's only serving artifact): the best
    checkpoint's weights are baked into the program as constants, the
    batch shape is fixed at ``batch_size``, and the result round-trips
    through ``jax.export`` serialization — loadable by any JAX runtime of
    the same platform family without the model code or checkpoint.
    """
    from jax import export as jexport

    from .data.synthetic import make_synthetic_dataset

    variables = predictor.variables

    def serve_fn(batch):
        return predictor._apply_fn(variables, batch)

    sample = make_synthetic_dataset(predictor.schema, num_rows=1, seed=0)
    spec = {}
    for k, v in sample.items():
        if k in ("labels", "_valid"):
            continue
        spec[k] = jax.ShapeDtypeStruct((batch_size,) + v.shape[1:], v.dtype)
    spec["labels"] = jax.ShapeDtypeStruct(
        (batch_size, len(predictor.schema.labels)), jnp.float32
    )
    exported = jexport.export(jax.jit(serve_fn))(spec)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_serving_artifact(path: str):
    """Load a ``export_serving_artifact`` file; returns ``fn(batch)->probs``
    (fixed batch size; caller pads like ``Predictor.__call__``)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def fn(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        out = exported.call({k: jnp.asarray(v) for k, v in batch.items()})
        return {k: np.asarray(v) for k, v in out.items()}

    return fn
