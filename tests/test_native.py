"""Parity tests: C++ host data plane vs the pure-numpy reference paths.

The native library (rank_tpu/native/src/rank_native.cpp) must reproduce
data/encode.py's numpy semantics bit-for-bit: OOV/missing -> 0, token i ->
row i+1, keep-tail max_len sequences, empty tokens between commas -> 0.
"""

import numpy as np
import pytest

from rank_tpu import native
from rank_tpu.data import encode as E
from rank_tpu.features import vocab_index

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture(scope="module")
def vocab():
    tokens = [f"feedid_{i}" for i in range(500)] + ["uni_日本語", "space token", ""]
    tokens = [t for t in tokens if t]  # vocab files never contain empty lines
    return tokens, vocab_index(tokens)


def _rand_rows(rng, tokens, n, p_oov=0.2, p_missing=0.1):
    rows = []
    for _ in range(n):
        u = rng.random()
        if u < p_missing:
            rows.append(rng.choice([None, float("nan"), 3.5]))
        elif u < p_missing + p_oov:
            rows.append("oov_" + str(rng.integers(1 << 20)))
        else:
            rows.append(tokens[rng.integers(len(tokens))])
    return rows


def test_vocab_size_and_ids(vocab):
    tokens, index = vocab
    nv = native.Vocab(tokens)
    assert nv.size == len(tokens)
    got = nv.encode_tokens(tokens)
    np.testing.assert_array_equal(got, np.arange(1, len(tokens) + 1))


def test_encode_tokens_parity(vocab):
    tokens, index = vocab
    rng = np.random.default_rng(0)
    rows = _rand_rows(rng, tokens, 4000)
    nv = native.Vocab(tokens)
    np.testing.assert_array_equal(
        nv.encode_tokens(rows), E._encode_tokens(rows, index)
    )


def test_encode_tokens_newline_desync_raises(vocab):
    tokens, _ = vocab
    nv = native.Vocab(tokens)
    with pytest.raises(ValueError):
        nv.encode_tokens(["a\nb", "c"])


@pytest.mark.parametrize("max_len", [1, 5, 50])
def test_encode_seq_parity(vocab, max_len):
    tokens, index = vocab
    rng = np.random.default_rng(max_len)
    rows = []
    for _ in range(2000):
        u = rng.random()
        if u < 0.1:
            rows.append(rng.choice([None, float("nan"), ""]))
            continue
        n_tok = int(rng.integers(0, 2 * max_len + 3))
        toks = [
            tokens[rng.integers(len(tokens))]
            if rng.random() > 0.15
            else ("oov" if rng.random() > 0.5 else "")
            for _ in range(n_tok)
        ]
        rows.append(",".join(toks))
    nv = native.Vocab(tokens)
    got_ids, got_len = nv.encode_seq(rows, max_len)
    want_ids, want_len = E._encode_seq(rows, index, max_len)
    np.testing.assert_array_equal(got_len, want_len)
    np.testing.assert_array_equal(got_ids, want_ids)


def test_encode_seq_list_rows_dispatch(vocab):
    """list-typed rows (pre-split ETL intermediates) go through the
    _encode_seq dispatcher identically with and without the native vocab."""
    tokens, index = vocab
    rows = [
        [tokens[0], tokens[1], tokens[2]],
        [],
        [tokens[3]] * 60,  # longer than max_len -> keep tail
        [""],              # unrepresentable as comma-join -> fallback path
        None,
        ",".join([tokens[5], tokens[6]]),
    ]
    nv = E._native_vocab(index)
    assert nv is not None
    got_ids, got_len = E._encode_seq(rows, index, 50, nv)
    want_ids, want_len = E._encode_seq(rows, index, 50, None)
    np.testing.assert_array_equal(got_len, want_len)
    np.testing.assert_array_equal(got_ids, want_ids)


def test_trailing_comma_and_empty_tokens(vocab):
    tokens, index = vocab
    rows = [f"{tokens[0]},", f",{tokens[1]}", ",,", tokens[2]]
    nv = native.Vocab(tokens)
    got_ids, got_len = nv.encode_seq(rows, 10)
    want_ids, want_len = E._encode_seq(rows, index, 10)
    np.testing.assert_array_equal(got_len, want_len)
    np.testing.assert_array_equal(got_ids, want_ids)


@pytest.mark.parametrize(
    "shape,dtype",
    [((1000,), np.float32), ((1000, 16), np.float32), ((1000, 50), np.int32),
     ((1000, 7), np.float64), ((5, 3, 4), np.int8)],
)
def test_take_rows_parity(shape, dtype):
    rng = np.random.default_rng(1)
    arr = (rng.random(shape) * 100).astype(dtype)
    idx = rng.integers(0, shape[0], size=257)  # with repeats
    np.testing.assert_array_equal(native.take_rows(arr, idx), arr[idx])


def test_take_rows_noncontiguous_falls_back():
    arr = np.arange(100, dtype=np.float32).reshape(10, 10).T  # F-order view
    idx = np.array([3, 1, 2])
    np.testing.assert_array_equal(native.take_rows(arr, idx), arr[idx])


def test_take_rows_negative_indices():
    arr = np.arange(20, dtype=np.int64).reshape(10, 2)
    idx = np.array([-1, 0, -10])
    np.testing.assert_array_equal(native.take_rows(arr, idx), arr[idx])


def test_encode_dataframe_native_matches_numpy(tmp_path, monkeypatch):
    """End-to-end: encode_dataframe with the native plane on vs forced off."""
    import pandas as pd

    from rank_tpu.features import WECHAT_SCHEMA, schema_from_vocab_dir

    rng = np.random.default_rng(7)
    vocab_dir = tmp_path / "vocabulary"
    vocab_dir.mkdir()
    sizes = {"userid": 50, "feedid": 200, "device": 2, "authorid": 30,
             "bgm_song_id": 40, "bgm_singer_id": 35, "manual_tag_id": 20}
    vocabs = {}
    for name, n in sizes.items():
        vocabs[name] = [f"{name}_{i}" for i in range(n)]
        (vocab_dir / f"{name}.txt").write_text("\n".join(vocabs[name]) + "\n")
    schema = schema_from_vocab_dir(WECHAT_SCHEMA, str(vocab_dir))

    n = 500
    df = pd.DataFrame()
    for f in schema.dense:
        df[f.name] = rng.random(n).astype(np.float32)
    for f in schema.categorical:
        if f.name == "manual_tag_list":
            continue
        pool = vocabs[f.vocab_file.split(".")[0]]
        df[f.name] = [
            pool[rng.integers(len(pool))] if rng.random() > 0.1 else None
            for _ in range(n)
        ]
    df["manual_tag_list"] = [
        ",".join(vocabs["manual_tag_id"][rng.integers(20)] for _ in range(rng.integers(0, 5)))
        for _ in range(n)
    ]
    df["his_read_comment_7d_seq"] = [
        ",".join(vocabs["feedid"][rng.integers(200)] for _ in range(rng.integers(0, 60)))
        for _ in range(n)
    ]
    for name in schema.labels:
        df[name] = rng.integers(0, 2, n).astype(np.float32)

    native_out = E.encode_dataframe(df, schema, str(vocab_dir))

    # Force the numpy path by making native.available() report False.
    monkeypatch.setattr(native, "available", lambda: False)
    numpy_out = E.encode_dataframe(df, schema, str(vocab_dir))

    assert set(native_out) == set(numpy_out)
    for k in native_out:
        np.testing.assert_array_equal(native_out[k], numpy_out[k], err_msg=k)
