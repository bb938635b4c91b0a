"""Gradient-boosted decision trees (numpy, sklearn-protocol).

Friedman's gradient boosting over the library's exact-split regression
trees: squared-error boosting for regression, binomial-deviance
(log-odds) boosting for binary classification.  Deterministic — no
subsampling, no feature randomness unless the base trees ask for it —
so distributed meta-estimators (Dist*SearchCV, get_oof) can fan these
out with reproducible results.

Reference anchor: sk-dist distributes sklearn estimators including
GradientBoosting* (reference skdist/distribute/search.py accepts any
sklearn-protocol estimator); this module supplies the protocol-
compatible implementation in the no-sklearn container.
"""

from __future__ import annotations

import numpy as np

from .base import BaseEstimator, ClassifierMixin, RegressorMixin
from .tree import DecisionTreeRegressor


class GradientBoostingRegressor(BaseEstimator, RegressorMixin):
    """Least-squares gradient boosting: F_0 = mean(y); each round fits
    a shallow regression tree to the residuals and adds it with
    ``learning_rate``."""

    def __init__(self, n_estimators=50, learning_rate=0.1, max_depth=2):
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.max_depth = max_depth

    def fit(self, X, y, sample_weight=None):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self.init_ = float(np.mean(y))
        self.estimators_ = []
        pred = np.full(len(y), self.init_)
        for _ in range(self.n_estimators):
            tree = DecisionTreeRegressor(max_depth=self.max_depth)
            tree.fit(X, y - pred, sample_weight=sample_weight)
            self.estimators_.append(tree)
            pred = pred + self.learning_rate * tree.predict(X)
        self.n_features_in_ = X.shape[1]
        return self

    def predict(self, X):
        X = np.asarray(X, dtype=np.float64)
        pred = np.full(len(X), self.init_)
        for tree in self.estimators_:
            pred = pred + self.learning_rate * tree.predict(X)
        return pred


class GradientBoostingClassifier(BaseEstimator, ClassifierMixin):
    """Binary binomial-deviance boosting in log-odds space: F_0 =
    log(p/(1-p)); each round fits a tree to the gradient (y - p) and
    Newton-rescales each leaf by sum(r) / sum(p(1-p)) — the standard
    single-step leaf update."""

    def __init__(self, n_estimators=50, learning_rate=0.1, max_depth=2):
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.max_depth = max_depth

    def fit(self, X, y, sample_weight=None):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y)
        self.classes_ = np.unique(y)
        if len(self.classes_) != 2:
            raise ValueError("binary classification only")
        yb = (y == self.classes_[1]).astype(np.float64)
        p0 = np.clip(np.mean(yb), 1e-9, 1 - 1e-9)
        self.init_ = float(np.log(p0 / (1 - p0)))
        self.estimators_ = []
        self._leaf_scales_ = []
        raw = np.full(len(yb), self.init_)
        for _ in range(self.n_estimators):
            p = 1.0 / (1.0 + np.exp(-raw))
            resid = yb - p
            tree = DecisionTreeRegressor(max_depth=self.max_depth)
            tree.fit(X, resid, sample_weight=sample_weight)
            # Newton leaf rescale: gamma_leaf = sum(r) / sum(p(1-p))
            leaves = tree.apply(X)
            scale = {}
            hess = p * (1 - p)
            for leaf in np.unique(leaves):
                m = leaves == leaf
                denom = float(np.sum(hess[m]))
                num = float(np.sum(resid[m]))
                scale[int(leaf)] = num / denom if denom > 1e-12 else 0.0
            self.estimators_.append(tree)
            self._leaf_scales_.append(scale)
            raw = raw + self.learning_rate * np.array(
                [scale[int(l)] for l in leaves]
            )
        self.n_features_in_ = X.shape[1]
        return self

    def _raw(self, X):
        X = np.asarray(X, dtype=np.float64)
        raw = np.full(len(X), self.init_)
        for tree, scale in zip(self.estimators_, self._leaf_scales_):
            leaves = tree.apply(X)
            raw = raw + self.learning_rate * np.array(
                [scale.get(int(l), 0.0) for l in leaves]
            )
        return raw

    def predict_proba(self, X):
        p1 = 1.0 / (1.0 + np.exp(-self._raw(X)))
        return np.column_stack([1 - p1, p1])

    def predict(self, X):
        return self.classes_[(self._raw(X) > 0).astype(int)]
