"""Gaussian naive Bayes (numpy)."""

from __future__ import annotations

import numpy as np

from .base import BaseEstimator, ClassifierMixin, check_is_fitted


class GaussianNB(BaseEstimator, ClassifierMixin):
    def __init__(self, var_smoothing=1e-9):
        self.var_smoothing = var_smoothing

    def fit(self, X, y, sample_weight=None):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X.reshape(-1, 1)
        y = np.asarray(y)
        self.classes_, y_idx = np.unique(y, return_inverse=True)
        k, d = len(self.classes_), X.shape[1]
        sw = np.ones(len(y)) if sample_weight is None else np.asarray(sample_weight)
        self.theta_ = np.zeros((k, d))
        self.var_ = np.zeros((k, d))
        self.class_prior_ = np.zeros(k)
        for c in range(k):
            m = y_idx == c
            w = sw[m]
            self.class_prior_[c] = w.sum() / sw.sum()
            self.theta_[c] = np.average(X[m], axis=0, weights=w)
            self.var_[c] = np.average((X[m] - self.theta_[c]) ** 2, axis=0, weights=w)
        self.var_ += self.var_smoothing * self.var_.max() if self.var_.max() > 0 else self.var_smoothing
        return self

    def _joint_log_likelihood(self, X):
        check_is_fitted(self, "theta_")
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X.reshape(-1, 1)
        jll = []
        for c in range(len(self.classes_)):
            prior = np.log(self.class_prior_[c] + 1e-15)
            ll = -0.5 * np.sum(
                np.log(2.0 * np.pi * self.var_[c]) + (X - self.theta_[c]) ** 2 / self.var_[c],
                axis=1,
            )
            jll.append(prior + ll)
        return np.array(jll).T

    def predict_proba(self, X):
        jll = self._joint_log_likelihood(X)
        jll = jll - jll.max(axis=1, keepdims=True)
        p = np.exp(jll)
        return p / p.sum(axis=1, keepdims=True)

    def predict(self, X):
        return self.classes_[np.argmax(self._joint_log_likelihood(X), axis=1)]
