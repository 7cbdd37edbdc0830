"""Forward-numerics parity against the reference's TRAINED weights.

The strongest real-data numerical grounding available without the
competition CSVs: load ``algorithm/DCN/model_dir/best_model.pth`` (the
weights behind the reference's published 0.9183 AUC,
``/root/reference/algorithm/DCN/dcn.py:114-180``) into BOTH the
warm-started flax model (via rank_tpu.interop) and the torch mirror
(bench.py), equalise the layers the reference never trained/saved (its
cross/residual weights were created fresh inside ``forward`` —
``cross_layer.py:16-20``, ``deepcrossing.py:37-39`` — so they are absent
from the checkpoint; we copy the flax fresh inits into the mirror), feed
identical encoded batches, and assert the logits agree elementwise.

This pins the embedding-lookup + concat order + cross/residual math +
MLP tower + output-layer forward path to the reference's trained
numerics. Same check for DeepCrossing
(``algorithm/DeepCrossing/deepcrossing.py:106-163``).
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DCN_PTH = "/root/reference/algorithm/DCN/model_dir/best_model.pth"
DC_PTH = "/root/reference/algorithm/DeepCrossing/model_dir/best_model.pth"

needs_ref = pytest.mark.skipif(
    not (os.path.exists(DCN_PTH) and os.path.exists(DC_PTH)),
    reason="reference checkpoints not present",
)

EMB_FIELDS = (
    "userid", "device", "authorid", "bgm_song_id", "bgm_singer_id",
    "manual_tag_list",
)


def _encoded_batch(rows=64, seed=3):
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA

    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=rows, seed=seed)
    return {k: np.asarray(v) for k, v in data.items()}


def _flax_warm_started(model_name, pth):
    import jax

    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.interop import import_reference_checkpoint
    from rank_tpu.models import build_model, default_config

    # multihot_tags=False: the reference DCN/DeepCrossing look up
    # manual_tag_list as a single id (dcn.py:100-103), not a pooled seq
    cfg = default_config(model_name, multihot_tags=False)
    model = build_model(WECHAT_SCHEMA, cfg)
    batch = {k: np.asarray(v) for k, v in _encoded_batch(8).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    from flax.core import meta

    # unbox nn.with_partitioning metadata: interop and apply want raw leaves
    params = jax.device_get(meta.unbox(variables["params"]))
    params, report = import_reference_checkpoint(pth, model_name, params)
    extra = {k: v for k, v in variables.items() if k != "params"}
    return model, params, extra, report


def _load_common_torch(mirror, sd):
    import torch

    with torch.no_grad():
        for f in EMB_FIELDS:
            mirror.emb[f].weight.copy_(sd[f"embeddings.{f}.weight"])


def _torch_logits(mirror, batch):
    import torch

    dense = torch.tensor(np.asarray(batch["dense"], np.float32))
    cats = {f: torch.tensor(np.asarray(batch[f], np.int64)) for f in EMB_FIELDS}
    mirror.eval()
    with torch.no_grad():
        return mirror(dense, cats).numpy()


@needs_ref
def test_dcn_logits_match_reference_trained_weights():
    torch = pytest.importorskip("torch")
    import bench

    model, params, extra, report = _flax_warm_started("dcn", DCN_PTH)
    sd = torch.load(DCN_PTH, map_location="cpu", weights_only=True)
    assert set(report) == set(sd)

    mirror = bench._torch_models()["dcn"]()
    _load_common_torch(mirror, sd)
    with torch.no_grad():
        for i, li in enumerate((0, 2, 4)):
            mirror.dnn[li].weight.copy_(sd[f"dnn.{li}.weight"])
            mirror.dnn[li].bias.copy_(sd[f"dnn.{li}.bias"])
        mirror.out.weight.copy_(sd["output_layer.weight"])
        mirror.out.bias.copy_(sd["output_layer.bias"])
        # cross weights are NOT in the checkpoint (reference fresh-param
        # bug): equalise by copying the flax fresh init into the mirror
        for l in range(3):
            mirror.cross_w[l].copy_(
                torch.tensor(np.asarray(params["cross"][f"w_{l}"]))
            )
            mirror.cross_b[l].copy_(
                torch.tensor(np.asarray(params["cross"][f"b_{l}"]))
            )

    batch = _encoded_batch(64)
    out = model.apply({"params": params, **extra}, batch, train=False)
    jax_logits = np.asarray(out["logits"])
    torch_logits = _torch_logits(mirror, batch)

    assert jax_logits.shape == torch_logits.shape == (64,)
    np.testing.assert_allclose(jax_logits, torch_logits, atol=1e-4, rtol=1e-4)
    # the trained weights produce non-degenerate scores
    assert np.std(jax_logits) > 1e-3


@needs_ref
def test_deepcrossing_logits_match_reference_trained_weights():
    torch = pytest.importorskip("torch")
    import bench

    model, params, extra, report = _flax_warm_started("deepcrossing", DC_PTH)
    sd = torch.load(DC_PTH, map_location="cpu", weights_only=True)
    assert set(report) == set(sd)

    mirror = bench._torch_models()["deepcrossing"]()
    _load_common_torch(mirror, sd)
    with torch.no_grad():
        mirror.out.weight.copy_(sd["output_layer.weight"])
        mirror.out.bias.copy_(sd["output_layer.bias"])
        # residual units are NOT in the checkpoint (fresh-param bug,
        # deepcrossing.py:37-39): equalise from the flax fresh init.
        # torch Linear weight is (out, in) = flax kernel.T
        res = params["residual"]
        for u in range(2):
            unit = res[f"ResidualUnit_{u}"]
            mirror.units[u]["w1"].weight.copy_(
                torch.tensor(np.asarray(unit["Dense_0"]["kernel"]).T)
            )
            mirror.units[u]["w1"].bias.copy_(
                torch.tensor(np.asarray(unit["Dense_0"]["bias"]))
            )
            mirror.units[u]["w2"].weight.copy_(
                torch.tensor(np.asarray(unit["Dense_1"]["kernel"]).T)
            )
            mirror.units[u]["w2"].bias.copy_(
                torch.tensor(np.asarray(unit["Dense_1"]["bias"]))
            )

    batch = _encoded_batch(64)
    out = model.apply({"params": params, **extra}, batch, train=False)
    jax_logits = np.asarray(out["logits"])
    torch_logits = _torch_logits(mirror, batch)

    assert jax_logits.shape == torch_logits.shape == (64,)
    np.testing.assert_allclose(jax_logits, torch_logits, atol=1e-4, rtol=1e-4)
    assert np.std(jax_logits) > 1e-3
