"""Ground parity in the reference's CHECKED-IN real artifacts (VERDICT r1
#2): the only real-data grounding available in this environment.

Two artifact families exist under /root/reference:
  * the real competition vocabularies
    (dataset/wechat_algo_data1/vocabulary/*.txt — 19,626 userid tokens,
    106,444 feedid tokens, ...), which every reference model reads at
    startup (deepfm.py:80-86, din.py:140-143);
  * two trained checkpoints (algorithm/DCN/model_dir/best_model.pth,
    algorithm/DeepCrossing/model_dir/best_model.pth) whose state_dicts
    pin the real table/field/tower layout the published AUCs were
    achieved with (dcn.py:130-137, deepcrossing.py:122-129).

These tests run rank_tpu's schema/encoders over the real vocab files and
map the .pth state_dicts onto the flax param trees, asserting
shape-complete coverage.
"""

import os

import numpy as np
import pytest

VOCAB_DIR = "/root/reference/dataset/wechat_algo_data1/vocabulary"
DCN_PTH = "/root/reference/algorithm/DCN/model_dir/best_model.pth"
DEEPCROSSING_PTH = "/root/reference/algorithm/DeepCrossing/model_dir/best_model.pth"

needs_vocab = pytest.mark.skipif(
    not os.path.isdir(VOCAB_DIR), reason="reference vocab dir not present"
)

# wc -l over the checked-in files; +1 OOV row each (deepfm.py:80-86)
REAL_SIZES = {
    "userid": 19_626 + 1,
    "feedid": 106_444 + 1,
    "device": 2 + 1,
    "authorid": 18_789 + 1,
    "bgm_song_id": 25_159 + 1,
    "bgm_singer_id": 17_500 + 1,
    "manual_tag_list": 350 + 1,
}


@needs_vocab
def test_schema_from_real_vocab_dir_exact_sizes():
    from rank_tpu.features import WECHAT_SCHEMA, schema_from_vocab_dir

    schema = schema_from_vocab_dir(WECHAT_SCHEMA, VOCAB_DIR)
    for f in schema.categorical:
        assert f.vocab_size == REAL_SIZES[f.name], f.name
    # sequence features resolve through their shared vocab files
    assert schema.sequence_feature(
        "his_read_comment_7d_seq"
    ).vocab_size == REAL_SIZES["feedid"]
    assert schema.sequence_feature("manual_tag_seq").vocab_size == REAL_SIZES[
        "manual_tag_list"
    ]
    # the checked-in WECHAT_SCHEMA constants must agree with the real files
    assert schema == WECHAT_SCHEMA


@needs_vocab
def test_real_vocab_encoding_order_and_oov():
    """Token at file line i -> row i+1, OOV -> dedicated row 0 (the
    documented fix of the reference's OOV/first-token collision,
    data/encode.py docstring), verified against the REAL userid file."""
    from rank_tpu.features import load_vocabulary, vocab_index

    tokens = load_vocabulary(os.path.join(VOCAB_DIR, "userid.txt"))
    assert len(tokens) == 19_626
    assert tokens[0] == "userid_8"  # first line of the checked-in file
    idx = vocab_index(tokens)
    assert idx["userid_8"] == 1
    assert idx[tokens[100]] == 101
    assert "not_a_user" not in idx  # encoder maps it to 0


@needs_vocab
def test_encoders_over_real_vocab_files():
    """Run BOTH the numpy and (when built) the C++ encoder over real
    tokens from every vocabulary file; assert exact agreement and the
    i -> i+1 / OOV -> 0 mapping."""
    from rank_tpu import native
    from rank_tpu.data.encode import _encode_tokens, _native_vocab
    from rank_tpu.features import (
        WECHAT_SCHEMA,
        load_vocabulary,
        vocab_index,
    )

    for f in WECHAT_SCHEMA.categorical:
        tokens = load_vocabulary(os.path.join(VOCAB_DIR, f.vocab_file))
        assert len(tokens) + 1 == REAL_SIZES[f.name], f.name
        idx = vocab_index(tokens)
        # sample head/tail/middle + two OOV probes
        probes = [tokens[0], tokens[-1], tokens[len(tokens) // 2],
                  "___oov___", tokens[0] + "_x"]
        expect = np.asarray(
            [1, len(tokens), len(tokens) // 2 + 1, 0, idx.get(probes[4], 0)],
            np.int32,
        )
        got_np = _encode_tokens(probes, idx, None)
        np.testing.assert_array_equal(got_np, expect)
        if native.available():
            nv = _native_vocab(idx)
            got_cc = _encode_tokens(probes, idx, nv)
            np.testing.assert_array_equal(got_cc, expect)


@needs_vocab
def test_real_sequence_encoding_through_feedid_vocab():
    from rank_tpu.data.encode import _encode_seq
    from rank_tpu.features import load_vocabulary, vocab_index

    tokens = load_vocabulary(os.path.join(VOCAB_DIR, "feedid.txt"))
    idx = vocab_index(tokens)
    rows = [
        ",".join([tokens[0], tokens[5], "bogus", tokens[-1]]),
        "",
        ",".join(tokens[:60]),  # longer than max_len=50: keep the tail
    ]
    ids, lengths = _encode_seq(rows, idx, 50, None)
    np.testing.assert_array_equal(ids[0, :4], [1, 6, 0, len(tokens)])
    assert lengths[0] == 4 and lengths[1] == 0 and lengths[2] == 50
    # tail-50 semantics (DataGenerator.py:274): first kept token is #10
    assert ids[2, 0] == 11


# ---------------------------------------------------------------------------
# Trained-checkpoint structural parity
# ---------------------------------------------------------------------------

def _flax_param_shapes(model_name):
    import jax
    import jax.numpy as jnp
    from flax.linen import meta as nn_meta

    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import build_model, default_config

    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_dataset(WECHAT_SCHEMA, 4, seed=0).items()
    }
    model = build_model(WECHAT_SCHEMA, default_config(model_name))
    va = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch,
            train=False,
        )
    )
    va = nn_meta.unbox(va)
    return {
        jax.tree_util.keystr(path): leaf.shape
        for path, leaf in jax.tree_util.tree_leaves_with_path(va["params"])
    }


@pytest.mark.skipif(
    not os.path.exists(DCN_PTH), reason="reference DCN checkpoint not present"
)
def test_dcn_checkpoint_maps_onto_flax_params():
    """Every tensor in the reference's trained DCN best_model.pth lands on
    a flax param with the matching shape (torch Linear kernels are
    transposed). The state_dict also PROVES the fresh-param bug
    (cross_layer.py:16-20): it contains NO cross weights — ours does."""
    torch = pytest.importorskip("torch")

    sd = torch.load(DCN_PTH, map_location="cpu", weights_only=True)
    ours = _flax_param_shapes("dcn")

    mapping = {}  # ref key -> (our key, transpose?)
    for f in ("userid", "device", "authorid", "bgm_song_id",
              "bgm_singer_id", "manual_tag_list"):
        mapping[f"embeddings.{f}.weight"] = (
            f"['tables']['table_{f}']['embedding']", False
        )
    for i, li in enumerate((0, 2, 4)):  # torch Sequential Linear indices
        mapping[f"dnn.{li}.weight"] = (f"['dnn']['Dense_{i}']['kernel']", True)
        mapping[f"dnn.{li}.bias"] = (f"['dnn']['Dense_{i}']['bias']", False)
    mapping["output_layer.weight"] = ("['output']['kernel']", True)
    mapping["output_layer.bias"] = ("['output']['bias']", False)

    unmapped = set(sd) - set(mapping)
    assert not unmapped, f"reference tensors with no home: {unmapped}"
    for ref_key, (our_key, transpose) in mapping.items():
        ref_shape = tuple(sd[ref_key].shape)
        if transpose:
            ref_shape = ref_shape[::-1]
        assert ours[our_key] == ref_shape, (ref_key, ref_shape, ours[our_key])

    # the reference trained with UNREGISTERED cross weights: none saved
    assert not [k for k in sd if "cross" in k]
    # ours are registered and trained (the documented fix)
    assert "['cross']['w_0']" in ours and ours["['cross']['w_0']"] == (50, 1)
    # x0 dim 50 = 16 dense + 34 embedding (dcn.py:130-137 convention)
    assert ours["['dnn']['Dense_0']['kernel']"] == (50, 512)
    assert tuple(sd["dnn.0.weight"].shape) == (512, 50)


@pytest.mark.skipif(
    not os.path.exists(DEEPCROSSING_PTH),
    reason="reference DeepCrossing checkpoint not present",
)
def test_deepcrossing_checkpoint_maps_onto_flax_params():
    """Same for DeepCrossing (deepcrossing.py:106-163): the .pth has ONLY
    embeddings + output_layer — the residual units were recreated per
    forward (deepcrossing.py:37-39) and never trained/saved."""
    torch = pytest.importorskip("torch")

    sd = torch.load(DEEPCROSSING_PTH, map_location="cpu", weights_only=True)
    ours = _flax_param_shapes("deepcrossing")

    mapping = {}
    for f in ("userid", "device", "authorid", "bgm_song_id",
              "bgm_singer_id", "manual_tag_list"):
        mapping[f"embeddings.{f}.weight"] = (
            f"['tables']['table_{f}']['embedding']", False
        )
    mapping["output_layer.weight"] = ("['output']['kernel']", True)
    mapping["output_layer.bias"] = ("['output']['bias']", False)

    unmapped = set(sd) - set(mapping)
    assert not unmapped, f"reference tensors with no home: {unmapped}"
    for ref_key, (our_key, transpose) in mapping.items():
        ref_shape = tuple(sd[ref_key].shape)
        if transpose:
            ref_shape = ref_shape[::-1]
        assert ours[our_key] == ref_shape, (ref_key, ref_shape, ours[our_key])

    assert not [k for k in sd if "residual" in k.lower() or "unit" in k.lower()]
    assert ours["['residual']['ResidualUnit_0']['Dense_0']['kernel']"] == (50, 256)
    assert ours["['residual']['ResidualUnit_1']['Dense_1']['kernel']"] == (256, 50)
