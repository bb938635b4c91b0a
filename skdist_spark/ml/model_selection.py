"""Cross-validation splitters and parameter iterators
(sklearn-compatible semantics, numpy implementation).

These produce the (train, test) index pairs and candidate parameter
dicts that the Dist* meta-estimators fan out as Spark tasks
(reference behavior: skdist/distribute/search.py:363-386 builds
``product(candidate_params, cv.split(...))``).
"""

from __future__ import annotations

import itertools

import numpy as np

from .base import is_classifier


class KFold:
    def __init__(self, n_splits=5, shuffle=False, random_state=None):
        self.n_splits = n_splits
        self.shuffle = shuffle
        self.random_state = random_state

    def split(self, X, y=None, groups=None):
        n = len(X)
        idx = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.random_state).shuffle(idx)
        fold_sizes = np.full(self.n_splits, n // self.n_splits, dtype=int)
        fold_sizes[: n % self.n_splits] += 1
        start = 0
        for size in fold_sizes:
            test = idx[start : start + size]
            train = np.concatenate([idx[:start], idx[start + size :]])
            yield np.sort(train), np.sort(test)
            start += size

    def get_n_splits(self, X=None, y=None, groups=None):
        return self.n_splits


class StratifiedKFold:
    """Per-class round-robin fold assignment (deterministic)."""

    def __init__(self, n_splits=5, shuffle=False, random_state=None):
        self.n_splits = n_splits
        self.shuffle = shuffle
        self.random_state = random_state

    def split(self, X, y, groups=None):
        y = np.asarray(y)
        n = len(y)
        rng = np.random.RandomState(self.random_state)
        fold_of = np.empty(n, dtype=int)
        for cls in np.unique(y):
            cls_idx = np.where(y == cls)[0]
            if self.shuffle:
                rng.shuffle(cls_idx)
            fold_of[cls_idx] = np.arange(len(cls_idx)) % self.n_splits
        for f in range(self.n_splits):
            test = np.where(fold_of == f)[0]
            train = np.where(fold_of != f)[0]
            yield train, test

    def get_n_splits(self, X=None, y=None, groups=None):
        return self.n_splits


class GroupKFold:
    """K-fold with non-overlapping groups: all samples of a group land
    in the same test fold exactly once — the CV companion of the
    engine's unit-disjoint data split (operators.sampling.
    user_disjoint_split): per-user/per-session feature rows leak
    across folds under plain KFold.

    Deterministic greedy balancing (sklearn's algorithm): groups
    sorted by descending sample count, each assigned to the currently
    lightest fold; ties broken by fold index, so the assignment is a
    pure function of the group sizes.
    """

    def __init__(self, n_splits=5):
        self.n_splits = n_splits

    def split(self, X, y=None, groups=None):
        if groups is None:
            raise ValueError("GroupKFold requires a groups array")
        groups = np.asarray(groups)
        uniq, counts = np.unique(groups, return_counts=True)
        if len(uniq) < self.n_splits:
            raise ValueError(
                f"Cannot have n_splits={self.n_splits} > n_groups={len(uniq)}"
            )
        order = np.argsort(-counts, kind="stable")
        fold_sizes = np.zeros(self.n_splits, dtype=int)
        fold_of_group = {}
        for gi in order:
            f = int(np.argmin(fold_sizes))
            fold_of_group[uniq[gi]] = f
            fold_sizes[f] += counts[gi]
        fold_of = np.array([fold_of_group[g] for g in groups])
        for f in range(self.n_splits):
            test = np.where(fold_of == f)[0]
            train = np.where(fold_of != f)[0]
            yield train, test

    def get_n_splits(self, X=None, y=None, groups=None):
        return self.n_splits



def check_cv(cv=5, y=None, classifier=False):
    if cv is None:
        cv = 5
    if isinstance(cv, int):
        if classifier and y is not None:
            _, counts = np.unique(y, return_counts=True)
            if counts.min() >= cv:
                return StratifiedKFold(cv)
        return KFold(cv)
    if hasattr(cv, "split"):
        return cv
    # iterable of (train, test) pairs
    pairs = list(cv)

    class _Fixed:
        def split(self, X=None, y=None, groups=None):
            return iter(pairs)

        def get_n_splits(self, X=None, y=None, groups=None):
            return len(pairs)

    return _Fixed()


def train_test_split(*arrays, test_size=0.25, random_state=None, stratify=None, shuffle=True):
    n = len(arrays[0])
    n_test = int(np.ceil(n * test_size)) if isinstance(test_size, float) else int(test_size)
    rng = np.random.RandomState(random_state)
    if stratify is not None:
        strat = np.asarray(stratify)
        test_idx = []
        for cls in np.unique(strat):
            cls_idx = np.where(strat == cls)[0]
            if shuffle:
                rng.shuffle(cls_idx)
            k = int(round(len(cls_idx) * n_test / n))
            test_idx.extend(cls_idx[:k])
        test_mask = np.zeros(n, dtype=bool)
        test_mask[test_idx] = True
    else:
        idx = np.arange(n)
        if shuffle:
            rng.shuffle(idx)
        test_mask = np.zeros(n, dtype=bool)
        test_mask[idx[:n_test]] = True
    out = []
    for arr in arrays:
        arr = np.asarray(arr)
        out.extend([arr[~test_mask], arr[test_mask]])
    return out


class ParameterGrid:
    def __init__(self, param_grid):
        if isinstance(param_grid, dict):
            param_grid = [param_grid]
        self.param_grid = param_grid

    def __iter__(self):
        for grid in self.param_grid:
            keys = sorted(grid)
            for combo in itertools.product(*(grid[k] for k in keys)):
                yield dict(zip(keys, combo))

    def __len__(self):
        total = 0
        for grid in self.param_grid:
            size = 1
            for v in grid.values():
                size *= len(v)
            total += size
        return total


class ParameterSampler:
    """Random sampler over lists (uniform) or objects with ``rvs``."""

    def __init__(self, param_distributions, n_iter, random_state=None):
        self.param_distributions = param_distributions
        self.n_iter = n_iter
        self.random_state = random_state

    def _all_lists(self):
        return all(
            not hasattr(v, "rvs") for v in self.param_distributions.values()
        )

    def __iter__(self):
        rng = np.random.RandomState(self.random_state)
        if self._all_lists():
            grid = list(ParameterGrid(self.param_distributions))
            n = min(self.n_iter, len(grid))
            for i in rng.choice(len(grid), size=n, replace=False):
                yield grid[i]
        else:
            keys = sorted(self.param_distributions)
            for _ in range(self.n_iter):
                out = {}
                for k in keys:
                    v = self.param_distributions[k]
                    if hasattr(v, "rvs"):
                        out[k] = v.rvs(random_state=rng)
                    else:
                        out[k] = v[rng.randint(len(v))]
                yield out

    def __len__(self):
        if self._all_lists():
            return min(self.n_iter, len(ParameterGrid(self.param_distributions)))
        return self.n_iter


class TimeSeriesSplit:
    """Rolling-origin cross-validation: fold i trains on everything
    before its test window and tests on the next contiguous block —
    train indices always precede test indices, so no future leakage.
    Matches sklearn's TimeSeriesSplit semantics (test_size defaults to
    n // (n_splits + 1); optional max_train_size and gap)."""

    def __init__(self, n_splits=5, max_train_size=None, test_size=None, gap=0):
        self.n_splits = n_splits
        self.max_train_size = max_train_size
        self.test_size = test_size
        self.gap = gap

    def split(self, X, y=None, groups=None):
        n = len(X)
        test_size = self.test_size or n // (self.n_splits + 1)
        if test_size < 1:
            raise ValueError(f"test_size={test_size} < 1 for n={n}")
        first_test = n - self.n_splits * test_size
        if first_test - self.gap < 1:
            raise ValueError(
                f"too many splits ({self.n_splits}) for n={n} with "
                f"test_size={test_size}, gap={self.gap}"
            )
        idx = np.arange(n)
        for i in range(self.n_splits):
            test_start = first_test + i * test_size
            train_end = test_start - self.gap
            train_start = (
                max(0, train_end - self.max_train_size)
                if self.max_train_size
                else 0
            )
            yield idx[train_start:train_end], idx[test_start : test_start + test_size]

    def get_n_splits(self, X=None, y=None, groups=None):
        return self.n_splits
