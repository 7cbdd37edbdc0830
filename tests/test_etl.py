"""ETL semantics on a miniature hand-checkable dataset (oracle values
computed by hand against DataGenerator.py's rules)."""

import os

import numpy as np
import pandas as pd
import pytest

from rank_tpu.data.encode import encode_dataframe, load_npz
from rank_tpu.data.etl import WeChatETL
from rank_tpu.features import WECHAT_SCHEMA, schema_from_vocab_dir


@pytest.fixture(scope="module")
def etl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wechat")
    rng = np.random.default_rng(0)
    # user_action: users 1-3, feeds 10-13, days 1..14
    rows = []
    for day in range(1, 15):
        for u in (1, 2, 3):
            for f in (10, 11, 12, 13):
                if rng.random() < 0.6:
                    rows.append(
                        dict(
                            userid=u, feedid=f, date_=day, device=rng.integers(1, 3),
                            read_comment=int(rng.random() < 0.5),
                            like=int(rng.random() < 0.3),
                            click_avatar=int(rng.random() < 0.2),
                            forward=0, comment=0, follow=0,
                            favorite=int(rng.random() < 0.1),
                            play=1000, stay=2000,
                        )
                    )
    # deterministic row for oracle checks: user 1 reads feed 10 on days 2,5,9
    for day in (2, 5, 9):
        rows.append(
            dict(userid=1, feedid=10, date_=day, device=1, read_comment=1,
                 like=0, click_avatar=0, forward=0, comment=0, follow=0,
                 favorite=0, play=1, stay=1)
        )
    pd.DataFrame(rows).to_csv(d / "user_action.csv", index=False)
    pd.DataFrame(
        dict(
            feedid=[10, 11, 12, 13],
            authorid=[100, 100, 101, 102],
            videoplayseconds=[30, 60, 15, 45],
            bgm_song_id=[7, None, 8, None],
            bgm_singer_id=[70, None, 80, None],
            manual_tag_list=["1;2", "2", None, "3;1"],
        )
    ).to_csv(d / "feed_info.csv", index=False)
    etl = WeChatETL(str(d), str(d))
    etl.run()
    return d


def test_vocab_files(etl_dir):
    feedids = open(etl_dir / "vocabulary" / "feedid.txt").read().split()
    assert feedids == ["feedid_10", "feedid_11", "feedid_12", "feedid_13"]
    tags = open(etl_dir / "vocabulary" / "manual_tag_id.txt").read().split()
    assert tags == ["manual_tag_id_1", "manual_tag_id_2", "manual_tag_id_3"]
    songs = open(etl_dir / "vocabulary" / "bgm_song_id.txt").read().split()
    assert songs == ["bgm_song_id_7", "bgm_song_id_8"]  # NaN dropped


def test_window_aggregate_oracle(etl_dir):
    """u_read_comment_7d_sum for user 1 on date_=9 must equal user 1's
    read_comment count over days 2..8 (window [start, start+7))."""
    train = pd.read_parquet(etl_dir / "dataframe" / "train.parquet")
    ua = pd.read_csv(etl_dir / "user_action.csv")
    want_raw = ua[
        (ua.userid == 1) & (ua.date_ >= 2) & (ua.date_ < 9)
    ].read_comment.sum()
    rows = train[(train.userid == "userid_1") & (train.date_ == 9)]
    assert len(rows) > 0
    got = rows.iloc[0]["u_read_comment_7d_sum"]
    np.testing.assert_allclose(got, np.log1p(want_raw), rtol=1e-6)


def test_sequence_feature(etl_dir):
    """his_read_comment_7d_seq for user 1 on date_=9 contains feedids the
    user read-commented during days 2..8, in event order."""
    train = pd.read_parquet(etl_dir / "dataframe" / "train.parquet")
    rows = train[(train.userid == "userid_1") & (train.date_ == 9)]
    seq = rows.iloc[0]["his_read_comment_7d_seq"]
    assert isinstance(seq, str) and "feedid_10" in seq


def test_split_and_labels(etl_dir):
    train = pd.read_parquet(etl_dir / "dataframe" / "train.parquet")
    test = pd.read_parquet(etl_dir / "dataframe" / "test.parquet")
    assert train.date_.between(8, 13).all()
    assert (test.date_ == 14).all()
    assert set(WECHAT_SCHEMA.labels) <= set(train.columns)


def test_arrays_roundtrip(etl_dir):
    arrays = load_npz(str(etl_dir / "arrays" / "train.npz"))
    schema = schema_from_vocab_dir(WECHAT_SCHEMA, str(etl_dir / "vocabulary"))
    n = arrays["labels"].shape[0]
    assert arrays["dense"].shape == (n, 16)
    assert arrays["labels"].shape == (n, 7)
    assert arrays["his_read_comment_7d_seq"].shape == (n, 50)
    # ids are within vocab bounds (0 = OOV allowed)
    for f in schema.categorical:
        assert arrays[f.name].min() >= 0
        assert arrays[f.name].max() < f.vocab_size
    # encoding matches a direct re-encode of the parquet
    df = pd.read_parquet(etl_dir / "dataframe" / "train.parquet")
    again = encode_dataframe(df, schema, str(etl_dir / "vocabulary"))
    np.testing.assert_array_equal(arrays["userid"], again["userid"])


def test_idempotent_rerun(etl_dir):
    """Sentinels make a second run a no-op (DataGenerator.py:174,233)."""
    before = os.path.getmtime(etl_dir / "dataframe" / "train.parquet")
    WeChatETL(str(etl_dir), str(etl_dir)).run()
    after = os.path.getmtime(etl_dir / "dataframe" / "train.parquet")
    assert before == after


def test_oov_encoding_dedicated_row(etl_dir):
    """Unknown tokens map to row 0; known token i maps to i+1 (the +1 slot
    the reference allocated but never used, deepfm.py:80-86 vs :40)."""
    schema = schema_from_vocab_dir(WECHAT_SCHEMA, str(etl_dir / "vocabulary"))
    df = pd.DataFrame(
        {
            "feedid": ["feedid_10", "feedid_999"],
            "userid": ["userid_1", "nope"],
        }
    )
    arrays = encode_dataframe(df, schema, str(etl_dir / "vocabulary"))
    assert arrays["feedid"][0] == 1  # first vocab line -> row 1
    assert arrays["feedid"][1] == 0  # OOV -> dedicated row 0
    assert arrays["userid"][1] == 0


class TestDouban:
    @pytest.fixture(scope="class")
    def douban_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("douban")
        rng = np.random.default_rng(0)
        rows = []
        users = [f"u{i}" for i in range(6)]
        for u in users:
            t = pd.Timestamp("2018-06-01")
            for k in range(40):
                t = t + pd.Timedelta(days=int(rng.integers(3, 20)))
                rows.append(
                    dict(USER_MD5=u, MOVIE_ID=int(rng.integers(1, 15)),
                         RATING=float(rng.integers(1, 6)), RATING_TIME=t)
                )
        pd.DataFrame(rows).to_csv(d / "ratings.csv", index=False)
        pd.DataFrame(
            dict(
                MOVIE_ID=list(range(1, 15)),
                GENRES=["动作/喜剧"] * 14,
                ACTOR_IDS=["a1|a2"] * 14,
                DIRECTOR_IDS=["d1|d2"] * 14,
                LANGUAGES=["汉语 / 英语"] * 14,
                REGIONS=["中国 / 美国"] * 14,
                YEAR=[2000 + i % 3 for i in range(14)],
            )
        ).to_csv(d / "movies.csv", index=False)
        from rank_tpu.data.douban import DoubanETL

        DoubanETL(str(d), str(d)).run()
        return d

    def test_vocab_files_all_columns(self, douban_dir):
        from rank_tpu.data.douban import CATEGORY_COLUMNS

        for col in CATEGORY_COLUMNS:
            assert os.path.exists(douban_dir / f"{col}.txt"), col
        genres = open(douban_dir / "GENRES.txt").read().split()
        assert set(genres) <= {"动作", "喜剧"}

    def test_split_and_label(self, douban_dir):
        train = pd.read_parquet(douban_dir / "train.parquet")
        assert (train["RATING_MONTH"].astype(str) <= "2019-08").all()
        assert set(train["label"].unique()) <= {0.0, 1.0}
        assert ((train["RATING"] >= 4) == (train["label"] == 1.0)).all()

    def test_history_window(self, douban_dir):
        train = pd.read_parquet(douban_dir / "train.parquet")
        row = train.sort_values("RATING_TIME").iloc[-1]
        hist = row["HISTORY_MOVIES"].split("/") if row["HISTORY_MOVIES"] else []
        assert len(hist) <= 20


def test_eda_report(etl_dir):
    """scripts/eda.py parity report runs on real-schema CSVs (EDA.ipynb
    equivalent, SURVEY.md §2.1)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "eda", pathlib.Path(__file__).parent.parent / "scripts" / "eda.py"
    )
    eda = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eda)
    ua = pd.read_csv(etl_dir / "user_action.csv")
    fi = pd.read_csv(etl_dir / "feed_info.csv")
    rep = eda.run(ua, fi)
    assert rep["overview"]["unique_users"] == 3
    assert set(rep["per_date"]) == {str(d) for d in range(1, 15)}
    assert "read_comment_rate" in rep["per_date"]["8"]
    assert rep["feed"]["works_per_author"]["p100"] >= 1
    # label counts over the window must sum to the window row count
    window = ua[ua["date_"].between(8, 14)]
    assert sum(rep["train_window_read_comment"].values()) == len(window)
