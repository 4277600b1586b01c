"""FeatureEncoder golden tests on tiny synthetic CSVs
(SURVEY.md §4 strategy: golden-file tests)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from rat_tpu.features import FeatureEncoder, FeatureMap


@pytest.fixture()
def csv_dir(tmp_path):
    df = pd.DataFrame({
        "user": ["u1", "u2", "u1", "u3"],
        "item": ["i1", "i1", "i2", "i1"],
        "genres": ["a b", "b", "a c", ""],
        "label": [1.0, 0.0, 1.0, 0.0],
    })
    path = tmp_path / "train.csv"
    df.to_csv(path, index=False)
    return tmp_path, str(path)


FEATURE_COLS = [
    {"active": True, "dtype": "str", "name": ["user", "item"], "type": "categorical"},
    {"active": True, "dtype": "str", "name": "genres", "type": "sequence",
     "encoder": "MaskedSumPooling", "max_len": 2},
]
LABEL_COL = {"dtype": "float", "name": "label"}


def _build_encoder(tmp_path):
    return FeatureEncoder(feature_cols=FEATURE_COLS, label_col=LABEL_COL,
                          dataset_id="tiny", data_root=str(tmp_path))


def test_fit_transform_golden(csv_dir):
    tmp_path, csv_path = csv_dir
    enc = _build_encoder(tmp_path)
    ddf = enc.read_csv(csv_path)
    ddf = enc.preprocess(ddf)
    arr = enc.fit_transform(ddf, min_categr_count=1)
    fm = enc.feature_map
    # columns: user, item, genres[2], label
    assert arr.shape == (4, 5)
    assert fm.num_fields == 3
    assert fm.input_length == 4
    # user: u1 (count2) -> 1, u2 -> 2, u3 -> 3
    np.testing.assert_array_equal(arr[:, 0], [1, 2, 1, 3])
    # item: i1 (count3) -> 1, i2 -> 2
    np.testing.assert_array_equal(arr[:, 1], [1, 1, 2, 1])
    # genres vocab: a(2) b(2) c(1) -> a=1, b=2, c=3, PAD=4, vocab_size=5
    g = fm.feature_specs["genres"]
    assert g["vocab_size"] == 5 and g["padding_idx"] == 4
    np.testing.assert_array_equal(arr[:, 2:4], [[1, 2], [2, 4], [1, 3], [4, 4]])
    # label is last
    np.testing.assert_array_equal(arr[:, -1], [1, 0, 1, 0])


def test_feature_map_json_roundtrip(csv_dir):
    tmp_path, csv_path = csv_dir
    enc = _build_encoder(tmp_path)
    ddf = enc.preprocess(enc.read_csv(csv_path))
    enc.fit(ddf, min_categr_count=1)
    json_file = enc.json_file
    assert os.path.exists(json_file)
    fm2 = FeatureMap("tiny", str(tmp_path))
    fm2.load(json_file)
    assert fm2.num_fields == enc.feature_map.num_fields
    assert list(fm2.feature_specs) == list(enc.feature_map.feature_specs)
    assert fm2.feature_specs["user"]["vocab_size"] == \
        enc.feature_map.feature_specs["user"]["vocab_size"]


def test_feature_map_dataset_mismatch_raises(csv_dir):
    tmp_path, csv_path = csv_dir
    enc = _build_encoder(tmp_path)
    ddf = enc.preprocess(enc.read_csv(csv_path))
    enc.fit(ddf, min_categr_count=1)
    fm_bad = FeatureMap("other", str(tmp_path))
    with pytest.raises(RuntimeError):
        fm_bad.load(enc.json_file)


def test_encoder_pickle_cache(csv_dir):
    tmp_path, csv_path = csv_dir
    enc = _build_encoder(tmp_path)
    ddf = enc.preprocess(enc.read_csv(csv_path))
    enc.fit(ddf, min_categr_count=1)
    enc2 = _build_encoder(tmp_path).load_pickle()
    arr = enc2.transform(enc2.preprocess(enc2.read_csv(csv_path)))
    assert arr.shape == (4, 5)


def test_kkbox_hooks():
    """Age decades + ISRC country (contract: fuxictr/datasets/kkbox.py)."""
    from rat_tpu.features.datasets.kkbox import FeatureEncoder as KK
    enc = KK.__new__(KK)
    df = pd.DataFrame({"age": ["5", "10", "11", "20", "21", "35", "60",
                               "61", "95", "96", "0", None],
                       "isrc": ["USABC123", None, "GBXYZ"] + [""] * 9})
    assert list(enc.bucketize_age(df, "age")) == \
        ["1", "1", "2", "2", "3", "4", "6", "7", "7", "", "", ""]
    assert list(enc.extract_country_code(df, "isrc"))[:3] == ["US", "", "GB"]


def test_tmall_hooks():
    """time_stamp MDD/MMDD in 2014 -> weekday %w and weekend flag
    (contract: fuxictr/datasets/tmall.py)."""
    from rat_tpu.features.datasets.tmall import FeatureEncoder as TM
    enc = TM.__new__(TM)
    df = pd.DataFrame({"time_stamp": ["1101", "511", "1231"]})
    assert list(enc.convert_weekday(df, "weekday")) == ["6", "0", "3"]
    assert list(enc.convert_weekend(df, "weekend")) == ["1", "1", "0"]


def test_fill_na_str_default(csv_dir):
    tmp_path, _ = csv_dir
    df = pd.DataFrame({"user": ["u1", None], "item": ["i1", "i2"],
                       "genres": ["a", None], "label": [1.0, 0.0]})
    p = tmp_path / "na.csv"
    df.to_csv(p, index=False)
    enc = _build_encoder(tmp_path)
    ddf = enc.preprocess(enc.read_csv(str(p)))
    assert (ddf["user"] == "").sum() == 1
