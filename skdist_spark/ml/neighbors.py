"""K-nearest-neighbors classifier (numpy brute force)."""

from __future__ import annotations

import numpy as np

from .base import BaseEstimator, ClassifierMixin, check_is_fitted


class KNeighborsClassifier(BaseEstimator, ClassifierMixin):
    def __init__(self, n_neighbors=5):
        self.n_neighbors = n_neighbors

    def fit(self, X, y, sample_weight=None):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X.reshape(-1, 1)
        self._X = X
        y = np.asarray(y)
        self.classes_, self._y_idx = np.unique(y, return_inverse=True)
        return self

    def predict_proba(self, X):
        check_is_fitted(self, "_X")
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X.reshape(-1, 1)
        k = min(self.n_neighbors, len(self._X))
        d2 = ((X[:, None, :] - self._X[None, :, :]) ** 2).sum(-1)
        nn = np.argpartition(d2, k - 1, axis=1)[:, :k]
        probs = np.zeros((len(X), len(self.classes_)))
        for i, row in enumerate(nn):
            counts = np.bincount(self._y_idx[row], minlength=len(self.classes_))
            probs[i] = counts / counts.sum()
        return probs

    def predict(self, X):
        return self.classes_[np.argmax(self.predict_proba(X), axis=1)]
