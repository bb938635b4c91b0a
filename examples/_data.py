"""Shared synthetic data for the examples: deterministic Gaussian
blobs (the container has no sklearn datasets)."""

import numpy as np


def blobs(n=300, d=8, n_classes=3, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 4.0, size=(n_classes, d))
    y = np.arange(n) % n_classes
    X = centers[y] + rng.normal(0.0, 1.0, size=(n, d))
    return X, y.astype(np.int64)


def regression(n=300, d=6, seed=11):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    w = rng.normal(size=d)
    y = X @ w + rng.normal(0.0, 0.1, size=n)
    return X, y
