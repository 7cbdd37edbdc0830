"""Every model in the zoo: init, forward, gradient smoke tests on a tiny
WeChat-shaped schema (all 16 models from README.md:15-45)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rank_tpu.data.synthetic import make_synthetic_dataset
from rank_tpu.features import tiny_schema
from rank_tpu.models import (
    MODEL_CLASSES,
    MULTI_TASK_MODELS,
    build_model,
    default_config,
)

SCHEMA = tiny_schema(vocab=32, hist_len=6)
DATA = make_synthetic_dataset(SCHEMA, num_rows=16, seed=0)
BATCH = {k: jnp.asarray(v[:8]) for k, v in DATA.items()}

ALL_MODELS = sorted(MODEL_CLASSES)


def _small_config(name):
    cfg = default_config(name)
    return cfg.replace(
        hidden_units=(16, 8),
        expert_units=(8,),
        tower_units=(4,),
        embedding_dim=8,
        cin_layer_sizes=(4, 4),
        num_cross_layers=2,
        residual_internal_dim=8,
        attention_factor=8,
        outer_outputs=4,
        gru_hidden_dim=8,
        num_experts=2,
        num_levels=2,
        specific_experts_per_task=1,
        shared_experts=1,
        autoint_layers=2,
        autoint_heads=2,
        autoint_att_dim=4,
    )


@pytest.mark.parametrize("name", ALL_MODELS)
def test_forward_and_grad(name):
    cfg = _small_config(name)
    model = build_model(SCHEMA, cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        BATCH,
        train=True,
    )
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    # eval-mode forward
    out = model.apply({"params": params, **extra}, BATCH, train=False)
    if name in MULTI_TASK_MODELS:
        key = "probs" if "probs" in out else "logits"
        for task, v in out[key].items():
            assert v.shape == (8,), (task, v.shape)
            assert np.all(np.isfinite(np.asarray(v)))
    else:
        assert out["logits"].shape == (8,)
        assert np.all(np.isfinite(np.asarray(out["logits"])))

    # train-mode grad
    def loss_fn(p):
        o, _ = model.apply(
            {"params": p, **extra},
            BATCH,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        if name in MULTI_TASK_MODELS:
            key = "probs" if "probs" in o else "logits"
            return sum(jnp.sum(v**2) for v in o[key].values()) + o["aux_loss"]
        return jnp.sum(o["logits"] ** 2) + o["aux_loss"]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert np.isfinite(total) and total > 0


def test_din_mba_aux_loss_nonzero():
    cfg = _small_config("din").replace(
        mini_batch_aware_regularization=True, l2_lambda=0.1
    )
    model = build_model(SCHEMA, cfg)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        BATCH, train=True,
    )
    out = model.apply(v, BATCH, train=False)
    assert float(out["aux_loss"]) > 0


def test_dien_aux_loss_nonzero():
    cfg = _small_config("dien").replace(use_aux_loss=True)
    model = build_model(SCHEMA, cfg)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        BATCH, train=True,
    )
    out = model.apply(v, BATCH, train=False)
    assert float(out["aux_loss"]) != 0.0


def test_esmm_ctcvr_bounded_by_ctr():
    cfg = _small_config("esmm")
    model = build_model(SCHEMA, cfg)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        BATCH, train=True,
    )
    out = model.apply(v, BATCH, train=False)
    p = out["probs"]
    assert np.all(np.asarray(p["ctcvr"]) <= np.asarray(p["ctr"]) + 1e-6)


@pytest.mark.parametrize("name", ALL_MODELS)
def test_torch_dense_init_builds_and_runs(name):
    """dense_init='torch' (round-5 parity option): every model inits with
    the same param tree as the lecun default and produces finite logits."""
    cfg = _small_config(name).replace(dense_init="torch")
    model = build_model(SCHEMA, cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        BATCH,
        train=True,
    )
    ref = build_model(SCHEMA, _small_config(name)).init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        BATCH,
        train=True,
    )
    # identical tree structure + shapes — the option only changes values
    a = jax.tree_util.tree_structure(variables["params"])
    b = jax.tree_util.tree_structure(ref["params"])
    assert a == b
    out = model.apply(variables, BATCH, train=False)
    flat = out.get("logits", out.get("probs"))
    if isinstance(flat, dict):
        flat = list(flat.values())[0]
    assert np.all(np.isfinite(np.asarray(flat)))


def test_torch_dense_init_matches_torch_bounds():
    """The 'torch' family must match torch nn.Linear defaults: kernel AND
    bias ~ U(+-1/sqrt(fan_in)), and DCN cross weights ~ N(0, 0.02)."""
    from flax.core import unfreeze

    cfg = default_config("dcn").replace(dense_init="torch")
    model = build_model(SCHEMA, cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        BATCH,
        train=True,
    )
    params = unfreeze(variables["params"])
    # first tower layer: fan_in = x0 dim
    dnn0 = params["dnn"]["Dense_0"]
    fan_in = dnn0["kernel"].shape[0]
    bound = fan_in ** -0.5
    for leaf in (dnn0["kernel"], dnn0["bias"]):
        arr = np.asarray(leaf)
        assert arr.min() >= -bound - 1e-6 and arr.max() <= bound + 1e-6
    # bias must NOT be all zeros (torch draws it uniform)
    assert np.abs(np.asarray(dnn0["bias"])).max() > 0
    # cross weights at the mirror's N(0, 0.02) scale
    w0 = np.asarray(params["cross"]["w_0"])
    assert np.abs(w0).std() < 0.05, w0.std()
