"""Feature preprocessing transformers + minimal Pipeline/FeatureUnion.

Reference parity: skdist/preprocessing.py (SelectField, FeatureCast,
ImputeNull, DenseTransformer, SparseTransformer, LabelEncoderPipe,
SelectorMem, HashingVectorizerChunked, MultihotEncoder) rebuilt on
numpy/pandas without sklearn/scipy. Matrices are dense numpy (no
scipy.sparse in this environment); hashing sizes default accordingly.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from .ml.base import BaseEstimator, TransformerMixin, clone

__all__ = [
    "Pipeline",
    "FeatureUnion",
    "SelectField",
    "FeatureCast",
    "ImputeNull",
    "DenseTransformer",
    "SparseTransformer",
    "LabelEncoderPipe",
    "SelectorMem",
    "HashingVectorizerChunked",
    "MultihotEncoder",
    "OneHotEncoder",
    "DictVectorizer",
    "SimpleImputer",
    "StandardScaler",
    "VarianceThreshold",
]


class Pipeline(BaseEstimator, TransformerMixin):
    """Sequential transformer chain; last step may be an estimator."""

    def __init__(self, steps):
        self.steps = steps

    def fit(self, X, y=None, **fit_params):
        Xt = X
        for _, step in self.steps[:-1]:
            Xt = step.fit_transform(Xt, y)
        self.steps[-1][1].fit(Xt, y, **fit_params)
        return self

    def _pre(self, X):
        Xt = X
        for _, step in self.steps[:-1]:
            Xt = step.transform(Xt)
        return Xt

    def transform(self, X):
        return self.steps[-1][1].transform(self._pre(X))

    def fit_transform(self, X, y=None, **fit_params):
        Xt = X
        for _, step in self.steps[:-1]:
            Xt = step.fit_transform(Xt, y)
        last = self.steps[-1][1]
        if hasattr(last, "fit_transform"):
            return last.fit_transform(Xt, y, **fit_params)
        return last.fit(Xt, y, **fit_params).transform(Xt)

    def predict(self, X):
        return self.steps[-1][1].predict(self._pre(X))

    def predict_proba(self, X):
        return self.steps[-1][1].predict_proba(self._pre(X))

    def score(self, X, y):
        return self.steps[-1][1].score(self._pre(X), y)

    @property
    def classes_(self):
        return self.steps[-1][1].classes_


class FeatureUnion(BaseEstimator, TransformerMixin):
    """Horizontal concat of transformer outputs (dense numpy)."""

    def __init__(self, transformer_list, transformer_weights=None):
        self.transformer_list = transformer_list
        self.transformer_weights = transformer_weights

    def fit(self, X, y=None):
        self.transformer_list = [
            (name, trans.fit(X, y)) for name, trans in self.transformer_list
        ]
        return self

    def transform(self, X):
        blocks = []
        for name, trans in self.transformer_list:
            block = np.asarray(trans.transform(X), dtype=np.float64)
            if block.ndim == 1:
                block = block.reshape(-1, 1)
            w = (self.transformer_weights or {}).get(name)
            if w is not None:
                block = block * w
            blocks.append(block)
        return np.hstack(blocks)

    def fit_transform(self, X, y=None, **fit_params):
        return self.fit(X, y).transform(X)


class _FunctionTransformer(BaseEstimator, TransformerMixin):
    def fit(self, X, y=None):
        return self


class SelectField(_FunctionTransformer):
    """Select columns from a pandas DataFrame
    (reference: skdist/preprocessing.py:77)."""

    def __init__(self, cols=None, single_dimension=False):
        self.cols = cols
        self.single_dimension = single_dimension

    def transform(self, X, y=None):
        df = X if isinstance(X, pd.DataFrame) else pd.DataFrame(X)
        cols = self.cols if self.cols is not None else list(df.columns)
        if self.single_dimension:
            return df[cols[0]].values
        return df[cols].values


class FeatureCast(_FunctionTransformer):
    def __init__(self, cast_type=None):
        self.cast_type = cast_type

    def transform(self, X, y=None):
        if self.cast_type is None:
            return X
        if isinstance(X, np.ndarray) and X.dtype != object:
            return X.astype(self.cast_type)
        return np.array([self.cast_type(v) for v in X], dtype=object)


class ImputeNull(_FunctionTransformer):
    def __init__(self, impute_val=None):
        self.impute_val = impute_val

    def transform(self, X, y=None):
        arr = np.asarray(X, dtype=object)
        mask = pd.isnull(arr)
        if mask.any():
            arr = arr.copy()
            arr[mask] = [self.impute_val] * int(mask.sum())
        return arr


class DenseTransformer(_FunctionTransformer):
    def transform(self, X, y=None):
        return np.asarray(X, dtype=np.float64)


class SparseTransformer(_FunctionTransformer):
    """No scipy here: kept for API parity, returns dense float array."""

    def transform(self, X, y=None):
        return np.asarray(X, dtype=np.float64)


class LabelEncoderPipe(BaseEstimator, TransformerMixin):
    """LabelEncoder usable inside a pipeline (2-D single column out)."""

    def fit(self, X, y=None):
        self.classes_ = np.unique(np.asarray(X, dtype=object))
        self._index = {v: i for i, v in enumerate(self.classes_)}
        return self

    def transform(self, X, y=None):
        return np.array([[self._index.get(v, -1)] for v in np.asarray(X, dtype=object)], dtype=np.float64)


class SimpleImputer(BaseEstimator, TransformerMixin):
    def __init__(self, strategy="median", fill_value=0.0):
        self.strategy = strategy
        self.fill_value = fill_value

    def fit(self, X, y=None):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X.reshape(-1, 1)
        if self.strategy == "median":
            self.statistics_ = np.nanmedian(X, axis=0)
        elif self.strategy == "mean":
            self.statistics_ = np.nanmean(X, axis=0)
        else:
            self.statistics_ = np.full(X.shape[1], self.fill_value)
        self.statistics_ = np.nan_to_num(self.statistics_, nan=self.fill_value)
        return self

    def transform(self, X, y=None):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X.reshape(-1, 1)
        out = X.copy()
        for j in range(out.shape[1]):
            col = out[:, j]
            col[np.isnan(col)] = self.statistics_[j]
        return out


class StandardScaler(BaseEstimator, TransformerMixin):
    def __init__(self, with_mean=True, with_std=True, copy=True):
        self.with_mean = with_mean
        self.with_std = with_std
        self.copy = copy

    def fit(self, X, y=None):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X.reshape(-1, 1)
        self.mean_ = X.mean(axis=0) if self.with_mean else np.zeros(X.shape[1])
        scale = X.std(axis=0) if self.with_std else np.ones(X.shape[1])
        self.scale_ = np.where(scale == 0, 1.0, scale)
        return self

    def transform(self, X, y=None):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X.reshape(-1, 1)
        return (X - self.mean_) / self.scale_


class VarianceThreshold(BaseEstimator, TransformerMixin):
    def __init__(self, threshold=0.0):
        self.threshold = threshold

    def fit(self, X, y=None):
        X = np.asarray(X, dtype=np.float64)
        self.variances_ = X.var(axis=0)
        keep = self.variances_ > self.threshold
        if not keep.any():
            keep = np.ones(X.shape[1], dtype=bool)
        self.keep_ = keep
        return self

    def transform(self, X, y=None):
        return np.asarray(X, dtype=np.float64)[:, self.keep_]


class SelectorMem(BaseEstimator, TransformerMixin):
    """Variance-percentile feature cap for memory-bounded pipelines
    (reference SelectorMem caps feature count via percentile selection)."""

    def __init__(self, selector=None, max_features=10000):
        self.selector = selector
        self.max_features = max_features

    def fit(self, X, y=None):
        X = np.asarray(X, dtype=np.float64)
        if X.shape[1] <= self.max_features:
            self.keep_ = np.arange(X.shape[1])
        else:
            var = X.var(axis=0)
            self.keep_ = np.sort(np.argsort(-var)[: self.max_features])
        return self

    def transform(self, X, y=None):
        return np.asarray(X, dtype=np.float64)[:, self.keep_]


def _hash_token(token: str, n_features: int, seed: int = 0) -> tuple[int, int]:
    """Deterministic (bucket, sign) for a token via crc32."""
    h = zlib.crc32(token.encode("utf-8", "ignore"), seed)
    return h % n_features, 1 if (h >> 31) & 1 == 0 else -1


def _ngrams_word(text: str, lo: int, hi: int) -> list[str]:
    words = text.lower().split()
    out = []
    for n in range(lo, hi + 1):
        out.extend(" ".join(words[i : i + n]) for i in range(len(words) - n + 1))
    return out


def _ngrams_char(text: str, lo: int, hi: int) -> list[str]:
    s = text.lower()
    out = []
    for n in range(lo, hi + 1):
        out.extend(s[i : i + n] for i in range(len(s) - n + 1))
    return out


class HashingVectorizerChunked(BaseEstimator, TransformerMixin):
    """Stateless hashing text vectorizer, chunked transform
    (reference: skdist/preprocessing.py:264). Dense output; default
    n_features sized for dense matrices (no scipy.sparse here).
    """

    def __init__(
        self,
        n_features=1024,
        ngram_range=(1, 1),
        analyzer="word",
        chunksize=100000,
        alternate_sign=True,
        lowercase=True,
    ):
        self.n_features = n_features
        self.ngram_range = ngram_range
        self.analyzer = analyzer
        self.chunksize = chunksize
        self.alternate_sign = alternate_sign
        self.lowercase = lowercase

    def fit(self, X, y=None):
        return self

    def _vectorize(self, texts) -> np.ndarray:
        lo, hi = self.ngram_range
        grams_fn = _ngrams_word if self.analyzer == "word" else _ngrams_char
        out = np.zeros((len(texts), self.n_features))
        for i, t in enumerate(texts):
            t = "" if t is None else str(t)
            for g in grams_fn(t, lo, hi):
                b, s = _hash_token(g, self.n_features)
                out[i, b] += s if self.alternate_sign else 1
        return out

    def transform(self, X, y=None):
        texts = list(X)
        blocks = [
            self._vectorize(texts[i : i + self.chunksize])
            for i in range(0, len(texts), self.chunksize)
        ]
        return np.vstack(blocks) if blocks else np.zeros((0, self.n_features))


class MultihotEncoder(BaseEstimator, TransformerMixin):
    """Multi-label binarizer for list-of-strings columns
    (reference: skdist/preprocessing.py:313)."""

    def __init__(self, sparse_output=False):
        self.sparse_output = sparse_output

    def fit(self, X, y=None):
        vocab = set()
        for row in X:
            if row is None:
                continue
            vocab.update(row)
        self.classes_ = np.array(sorted(vocab), dtype=object)
        self._index = {v: i for i, v in enumerate(self.classes_)}
        return self

    def transform(self, X, y=None):
        out = np.zeros((len(X), len(self.classes_)))
        for i, row in enumerate(X):
            if row is None:
                continue
            for v in row:
                j = self._index.get(v)
                if j is not None:
                    out[i, j] = 1.0
        return out


class OneHotEncoder(BaseEstimator, TransformerMixin):
    """One-hot over scalar values (fit-time vocabulary)."""

    def fit(self, X, y=None):
        self.classes_ = np.unique(np.asarray(["" if v is None else str(v) for v in X], dtype=object))
        self._index = {v: i for i, v in enumerate(self.classes_)}
        return self

    def transform(self, X, y=None):
        out = np.zeros((len(X), len(self.classes_)))
        for i, v in enumerate(X):
            j = self._index.get("" if v is None else str(v))
            if j is not None:
                out[i, j] = 1.0
        return out


class DictVectorizer(BaseEstimator, TransformerMixin):
    """Vectorize dict columns: numeric values pass through, string
    values one-hot as key=value features."""

    def fit(self, X, y=None):
        feats = set()
        for d in X:
            if not isinstance(d, dict):
                continue
            for k, v in d.items():
                feats.add(f"{k}={v}" if isinstance(v, str) else str(k))
        self.feature_names_ = sorted(feats)
        self._index = {f: i for i, f in enumerate(self.feature_names_)}
        return self

    def transform(self, X, y=None):
        out = np.zeros((len(X), len(self.feature_names_)))
        for i, d in enumerate(X):
            if not isinstance(d, dict):
                continue
            for k, v in d.items():
                if isinstance(v, str):
                    j = self._index.get(f"{k}={v}")
                    if j is not None:
                        out[i, j] = 1.0
                else:
                    j = self._index.get(str(k))
                    if j is not None:
                        out[i, j] = float(v)
        return out
