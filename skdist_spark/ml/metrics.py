"""Scoring metrics + named scorer registry (sklearn-compatible names).

A scorer is ``scorer(estimator, X, y) -> float`` where greater is
better (negated losses), matching how the reference passes ``scoring``
strings through to sklearn (reference: skdist/distribute/utils.py:45).
"""

from __future__ import annotations

import numpy as np


def accuracy_score(y_true, y_pred) -> float:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    return float(np.mean(y_true == y_pred))


def f1_score(y_true, y_pred, average="binary", pos_label=1) -> float:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    labels = np.unique(np.concatenate([y_true, y_pred]))
    if average == "binary":
        labels = [pos_label]
    scores = []
    for lab in labels:
        tp = np.sum((y_pred == lab) & (y_true == lab))
        fp = np.sum((y_pred == lab) & (y_true != lab))
        fn = np.sum((y_pred != lab) & (y_true == lab))
        denom = 2 * tp + fp + fn
        scores.append(2 * tp / denom if denom else 0.0)
    return float(np.mean(scores))


def log_loss(y_true, y_proba, labels=None) -> float:
    y_true = np.asarray(y_true)
    y_proba = np.asarray(y_proba, dtype=np.float64)
    if labels is None:
        labels = np.unique(y_true)
    idx = {c: i for i, c in enumerate(labels)}
    if y_proba.ndim == 1:
        y_proba = np.column_stack([1 - y_proba, y_proba])
    y_proba = np.clip(y_proba, 1e-15, 1 - 1e-15)
    y_proba = y_proba / y_proba.sum(axis=1, keepdims=True)
    rows = np.array([idx[v] for v in y_true])
    return float(-np.mean(np.log(y_proba[np.arange(len(y_true)), rows])))


def roc_auc_score(y_true, y_score) -> float:
    """Binary AUC via the rank (Mann-Whitney) formulation with tie handling."""
    y_true = np.asarray(y_true)
    y_score = np.asarray(y_score, dtype=np.float64)
    if y_score.ndim == 2:
        y_score = y_score[:, 1]
    classes = np.unique(y_true)
    if len(classes) != 2:
        raise ValueError("roc_auc_score here supports binary targets only")
    pos = y_true == classes[1]
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return 0.5
    order = np.argsort(y_score, kind="mergesort")
    ranks = np.empty(len(y_score), dtype=np.float64)
    sorted_scores = y_score[order]
    # average ranks over ties
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1
        i = j + 1
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def mean_squared_error(y_true, y_pred) -> float:
    y_true, y_pred = np.asarray(y_true, dtype=np.float64), np.asarray(y_pred, dtype=np.float64)
    return float(np.mean((y_true - y_pred) ** 2))


def r2_score(y_true, y_pred) -> float:
    y_true, y_pred = np.asarray(y_true, dtype=np.float64), np.asarray(y_pred, dtype=np.float64)
    ss_res = np.sum((y_true - y_pred) ** 2)
    ss_tot = np.sum((y_true - y_true.mean()) ** 2)
    return float(1 - ss_res / ss_tot) if ss_tot > 0 else 0.0


def _scorer_accuracy(est, X, y):
    return accuracy_score(y, est.predict(X))


def _scorer_f1_macro(est, X, y):
    return f1_score(y, est.predict(X), average="macro")


def _scorer_f1(est, X, y):
    return f1_score(y, est.predict(X), average="binary", pos_label=np.unique(y)[-1])


def _scorer_neg_log_loss(est, X, y):
    return -log_loss(y, est.predict_proba(X), labels=est.classes_)


def _scorer_roc_auc(est, X, y):
    proba = est.predict_proba(X) if hasattr(est, "predict_proba") else est.decision_function(X)
    return roc_auc_score(y, proba)


def _scorer_r2(est, X, y):
    return r2_score(y, est.predict(X))


def _scorer_neg_mse(est, X, y):
    return -mean_squared_error(y, est.predict(X))


_SCORERS = {
    "accuracy": _scorer_accuracy,
    "f1": _scorer_f1,
    "f1_macro": _scorer_f1_macro,
    "neg_log_loss": _scorer_neg_log_loss,
    "roc_auc": _scorer_roc_auc,
    "r2": _scorer_r2,
    "neg_mean_squared_error": _scorer_neg_mse,
}


def _default_scorer(est, X, y):
    return est.score(X, y)


def get_scorer(scoring):
    """Resolve a scoring spec (None | name | callable) to a scorer."""
    if scoring is None:
        return _default_scorer
    if callable(scoring):
        return scoring
    if scoring in _SCORERS:
        return _SCORERS[scoring]
    raise ValueError(f"Unknown scoring {scoring!r}; known: {sorted(_SCORERS)}")


def check_multimetric_scoring(estimator, scoring=None):
    """Resolve a scoring spec to ``(scorers_dict, is_multimetric)``.

    Reference parity: skdist/distribute/utils.py:75-143
    (_check_multimetric_scoring). Single specs (None | name | callable)
    resolve to ``{"score": scorer}, False``; a list/tuple/set of names
    or a dict of name -> spec resolves to a per-name scorer dict and
    True, with the reference's validation errors (duplicates, empties,
    non-string keys, callables inside lists).
    """
    if scoring is None or isinstance(scoring, str) or callable(scoring):
        return {"score": get_scorer(scoring)}, False
    if isinstance(scoring, (list, tuple, set)):
        keys = set(scoring)
        if len(keys) != len(list(scoring)):
            raise ValueError(f"Duplicate scorers in {scoring!r}")
        if not keys:
            raise ValueError("Empty scoring list")
        if not all(isinstance(k, str) for k in keys):
            raise ValueError(
                "List elements must be strings naming predefined scorers; "
                "use a dict of name -> callable for custom scorers. "
                f"Got {scoring!r}"
            )
        return {name: get_scorer(name) for name in scoring}, True
    if isinstance(scoring, dict):
        if not scoring:
            raise ValueError("Empty scoring dict")
        if not all(isinstance(k, str) for k in scoring):
            raise ValueError(f"Non-string keys in scoring dict {scoring!r}")
        return {name: get_scorer(spec) for name, spec in scoring.items()}, True
    raise ValueError(
        "scoring must be a string, callable, list/tuple of strings, or "
        f"dict of name -> scorer; got {scoring!r} of type {type(scoring)}"
    )
