"""Post-training ensembling utilities.

Reference parity: SimpleVoter (skdist/postprocessing.py:17) — a voting
classifier over ALREADY-FITTED estimators (no refit), e.g. the
binary models produced by independent distributed training runs.
"""

from __future__ import annotations

import numpy as np

from .ml.base import BaseEstimator, ClassifierMixin

__all__ = ["SimpleVoter"]


class SimpleVoter(BaseEstimator, ClassifierMixin):
    def __init__(self, estimators, classes, voting="hard", weights=None):
        self.estimators = estimators
        self.classes = classes
        self.voting = voting
        self.weights = weights

    @property
    def named_estimators(self):
        return dict(self.estimators)

    @property
    def classes_(self):
        return np.asarray(self.classes)

    @property
    def _weights(self):
        if self.weights is None:
            return np.ones(len(self.estimators))
        return np.asarray(self.weights, dtype=np.float64)

    def fit(self, X, y=None):
        """No-op: estimators arrive fitted (reference behavior)."""
        return self

    def predict_proba(self, X):
        if self.voting == "hard":
            raise AttributeError("predict_proba is not available when voting='hard'")
        return self._predict_proba(X)

    def _predict_proba(self, X):
        probas = np.array([est.predict_proba(X) for _, est in self.estimators])
        return np.average(probas, axis=0, weights=self._weights)

    def predict(self, X):
        if self.voting == "soft":
            return self.classes_[np.argmax(self._predict_proba(X), axis=1)]
        # hard: weighted majority vote over per-estimator labels
        preds = np.array([np.asarray(est.predict(X)) for _, est in self.estimators])
        class_idx = {c: i for i, c in enumerate(self.classes_)}
        n = preds.shape[1]
        votes = np.zeros((n, len(self.classes_)))
        for ei in range(preds.shape[0]):
            w = self._weights[ei]
            for ri in range(n):
                votes[ri, class_idx[preds[ei, ri]]] += w
        return self.classes_[np.argmax(votes, axis=1)]

    def transform(self, X):
        if self.voting == "soft":
            return np.array([est.predict_proba(X) for _, est in self.estimators])
        return np.array([np.asarray(est.predict(X)) for _, est in self.estimators]).T
