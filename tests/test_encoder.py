"""Encoderizer + preprocessing + voter tests (mirrors reference
test_encoder.py / test_preprocessing.py / test_postprocessing.py)."""

import numpy as np
import pandas as pd
import pytest

from skdist_spark.ml import LogisticRegression
from skdist_spark.operators.encoder import Encoderizer, EncoderizerExtractor
from skdist_spark.postprocessing import SimpleVoter
from skdist_spark.preprocessing import (
    FeatureCast,
    HashingVectorizerChunked,
    ImputeNull,
    LabelEncoderPipe,
    MultihotEncoder,
    OneHotEncoder,
    Pipeline,
    SelectField,
    SimpleImputer,
    StandardScaler,
)


@pytest.fixture
def mixed_df():
    return pd.DataFrame(
        {
            "num": [1.0, 2.0, np.nan, 4.0, 5.0, 6.0] * 5,
            "cat": ["a", "b", "a", "b", "a", "b"] * 5,
            "txt": [
                "spark window join", "hash agg scan", "sort merge join",
                "broadcast hash join", "shuffle write read", "stream batch sink",
            ] * 5,
            "tags": [["x"], ["x", "y"], ["y"], [], ["z"], ["x", "z"]] * 5,
            "props": [{"k": 1}, {"k": 2}, {"k": 3, "m": "u"}, {"m": "v"}, {}, {"k": 9}] * 5,
        }
    )


def test_encoderizer_infers_and_transforms(spark, mixed_df):
    enc = Encoderizer(size="small", sc=spark)
    T = enc.fit_transform(mixed_df)
    assert T.shape[0] == len(mixed_df)
    assert T.shape[1] == sum(enc.transformer_lengths)
    # each column family contributed features
    names = " ".join(enc.step_names)
    for frag in ["num_scaler", "cat_onehot", "txt_word_vec", "tags_multihot", "props_dict"]:
        assert frag in names, names
    # deterministic re-fit (local, no spark)
    enc2 = Encoderizer(size="small", sc=None)
    T2 = enc2.fit_transform(mixed_df)
    np.testing.assert_allclose(T, T2)


def test_encoderizer_config_and_extract(spark, mixed_df):
    enc = Encoderizer(
        size="small", sc=None, config={"txt": "string_vectorizer", "cat": "onehotencoder"}
    )
    T = enc.fit_transform(mixed_df)
    assert T.shape[0] == len(mixed_df)
    sub = enc.extract([f"{'cat'}_onehot"])
    T_cat = sub.transform(mixed_df)
    assert T_cat.shape == (len(mixed_df), 2)
    ext = EncoderizerExtractor(enc, ["cat_onehot"])
    np.testing.assert_allclose(ext.transform(mixed_df), T_cat)
    assert enc.feature_origin(T.shape[1] - 1) in enc.step_names


def test_encoderizer_feeds_classifier(mixed_df):
    y = (np.arange(len(mixed_df)) % 2).astype(int)
    enc = Encoderizer(size="small")
    X = enc.fit_transform(mixed_df)
    m = LogisticRegression(max_iter=100).fit(X, y)
    assert m.predict(X).shape == y.shape


def test_pipeline_and_transformers(mixed_df):
    pipe = Pipeline([
        ("sel", SelectField(cols=["num"])),
        ("imp", SimpleImputer(strategy="median")),
        ("sc", StandardScaler()),
    ])
    out = pipe.fit_transform(mixed_df)
    assert out.shape == (len(mixed_df), 1)
    assert not np.isnan(out).any()
    assert abs(out.mean()) < 1e-9

    le = LabelEncoderPipe().fit(mixed_df["cat"].values)
    assert set(le.transform(mixed_df["cat"].values).ravel()) == {0.0, 1.0}

    imp = ImputeNull("?")
    assert imp.transform(np.array(["a", None], dtype=object))[1] == "?"

    fc = FeatureCast(cast_type=str)
    assert fc.transform(np.array([1, 2]))[0] == "1"

    mh = MultihotEncoder().fit([["a"], ["b", "c"]])
    np.testing.assert_array_equal(mh.transform([["a", "c"]]), [[1.0, 0.0, 1.0]])

    oh = OneHotEncoder().fit(["x", "y"])
    np.testing.assert_array_equal(oh.transform(["y"]), [[0.0, 1.0]])


def test_hashing_vectorizer_deterministic():
    texts = ["the quick brown fox", "jumps over the lazy dog"]
    v = HashingVectorizerChunked(n_features=64, ngram_range=(1, 2))
    a, b = v.transform(texts), v.transform(texts)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 64)
    assert np.abs(a).sum() > 0


def test_simple_voter():
    X = np.random.RandomState(0).randn(100, 4)
    y = (X[:, 0] > 0).astype(int)
    m1 = LogisticRegression().fit(X, y)
    m2 = LogisticRegression(C=0.1).fit(X, y)
    voter = SimpleVoter([("a", m1), ("b", m2)], classes=[0, 1], voting="soft")
    assert voter.predict(X).shape == y.shape
    assert voter.predict_proba(X).shape == (100, 2)
    hard = SimpleVoter([("a", m1), ("b", m2)], classes=[0, 1], voting="hard")
    assert np.mean(hard.predict(X) == y) > 0.9
    with pytest.raises(AttributeError):
        hard.predict_proba(X)
    assert set(hard.named_estimators) == {"a", "b"}
