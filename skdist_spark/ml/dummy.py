"""Majority-class baseline classifier."""

from __future__ import annotations

import numpy as np

from .base import BaseEstimator, ClassifierMixin, check_is_fitted


class DummyClassifier(BaseEstimator, ClassifierMixin):
    def __init__(self, strategy="prior"):
        self.strategy = strategy

    def fit(self, X, y, sample_weight=None):
        y = np.asarray(y)
        self.classes_, counts = np.unique(y, return_counts=True)
        self.class_prior_ = counts / counts.sum()
        return self

    def predict_proba(self, X):
        check_is_fitted(self, "classes_")
        n = len(np.asarray(X))
        return np.tile(self.class_prior_, (n, 1))

    def predict(self, X):
        check_is_fitted(self, "classes_")
        n = len(np.asarray(X))
        return np.full(n, self.classes_[np.argmax(self.class_prior_)])
