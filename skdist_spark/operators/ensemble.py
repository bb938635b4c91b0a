"""Distributed tree ensembles — one Spark task per tree.

Reference parity: DistRandomForestClassifier/Regressor,
DistExtraTreesClassifier/Regressor, DistRandomTreesEmbedding
(skdist/distribute/ensemble.py:365-716). Each tree trains on broadcast
data in its own Spark task (bootstrap resample for forests, full
sample + random splits for extra-trees), then ships back pickled; the
ensemble aggregates probabilities/means on the driver at predict time.
"""

from __future__ import annotations

import numpy as np

from ..ml.base import BaseEstimator, ClassifierMixin, RegressorMixin, clone
from ..ml.tree import DecisionTreeClassifier, DecisionTreeRegressor
from ._engine import run_tasks, safe_indexing, strip_spark


def get_single_oof(clf, X, y, train_index, test_index):
    """Fit ``clf`` on the train rows and ``predict_proba`` the test rows.

    Reference parity: skdist/distribute/ensemble.py:112-127 — same
    in-place fit, same (test_index, proba) return; the building block
    of out-of-fold stacking features.
    """
    y = np.asarray(y)
    clf.fit(safe_indexing(X, train_index), y[train_index])
    return test_index, clf.predict_proba(safe_indexing(X, test_index))


def _oof_task(task: dict, shared: dict):
    clf = clone(shared["clf"])
    if task["kind"] == "full":
        clf.fit(shared["X"], shared["y"])
        return ("full", clf)
    test_index, proba = get_single_oof(
        clf, shared["X"], shared["y"], task["train"], task["test"]
    )
    return ("fold", (test_index, proba))


def get_oof(clf, X, y, n_splits=5, sc=None, partitions="auto"):
    """Out-of-fold probabilities + full-data fit -> ``(model, oof)``.

    Reference parity: skdist/distribute/ensemble.py:130-151 (serial
    KFold loop). This version runs the n_splits fold fits AND the full
    fit as n_splits+1 independent Spark tasks on the task engine when
    ``sc`` is given (data broadcast once), serially otherwise — the
    returned numbers are identical either way, since every task fits a
    clone deterministically. ``oof[i]`` holds the class probabilities
    for row i predicted by the one fold that held row i out, so the
    matrix is a leak-free stacking feature; the returned model is a
    clone of ``clf`` fitted on ALL rows (the reference refits the
    passed-in object; a clone keeps the input untouched under
    distribution).
    """
    from ..ml.model_selection import KFold

    X = X if hasattr(X, "iloc") else np.asarray(X)
    y = np.asarray(y)
    oof = np.zeros((y.shape[0], len(np.unique(y))))
    folds = list(KFold(n_splits=n_splits).split(X))
    tasks = [
        {"kind": "fold", "train": tr, "test": te} for tr, te in folds
    ] + [{"kind": "full"}]
    results = run_tasks(sc, tasks, _oof_task, {"clf": clf, "X": X, "y": y}, partitions)
    model = None
    for kind, payload in results:
        if kind == "full":
            model = payload
        else:
            test_index, proba = payload
            oof[test_index] = proba
    strip_spark(model)
    return model, oof


def _fit_tree_task(task: dict, shared: dict) -> bytes:
    from pyspark import cloudpickle as pickle

    X = np.asarray(shared["X"], dtype=np.float64)
    y = np.asarray(shared["y"])
    seed = task["seed"]
    rng = np.random.RandomState(seed)
    est = clone(shared["base_tree"])
    est.set_params(random_state=seed)
    n = len(X)
    if shared["bootstrap"]:
        idx = rng.randint(0, n, n)
        sw = np.bincount(idx, minlength=n).astype(np.float64)
        est.fit(X, y, sample_weight=sw)
    else:
        est.fit(X, y)
    return pickle.dumps(est)


class _DistBaseForest(BaseEstimator):
    def __init__(
        self,
        n_estimators=100,
        sc=None,
        partitions="auto",
        max_depth=None,
        min_samples_split=2,
        min_samples_leaf=1,
        max_features="sqrt",
        bootstrap=True,
        random_state=None,
        verbose=0,
    ):
        self.n_estimators = n_estimators
        self.sc = sc
        self.partitions = partitions
        self.max_depth = max_depth
        self.min_samples_split = min_samples_split
        self.min_samples_leaf = min_samples_leaf
        self.max_features = max_features
        self.bootstrap = bootstrap
        self.random_state = random_state
        self.verbose = verbose

    _tree_cls = DecisionTreeClassifier

    def _base_tree(self):
        return self._tree_cls(
            max_depth=self.max_depth,
            min_samples_split=self.min_samples_split,
            min_samples_leaf=self.min_samples_leaf,
            max_features=self.max_features,
        )

    def _fit_forest(self, X, y):
        import pickle

        ss = np.random.SeedSequence(self.random_state)
        seeds = [int(s) % (2**31 - 1) for s in ss.generate_state(self.n_estimators)]
        tasks = [{"seed": s} for s in seeds]
        shared = {
            "X": np.asarray(X, dtype=np.float64),
            "y": np.asarray(y),
            "base_tree": self._base_tree(),
            "bootstrap": self.bootstrap,
        }
        payloads = run_tasks(self.sc, tasks, _fit_tree_task, shared, self.partitions)
        self.estimators_ = [pickle.loads(p) for p in payloads]
        strip_spark(self)
        return self


class DistRandomForestClassifier(_DistBaseForest, ClassifierMixin):
    _tree_cls = DecisionTreeClassifier

    def fit(self, X, y, sample_weight=None):
        self.classes_ = np.unique(np.asarray(y))
        return self._fit_forest(X, y)

    def predict_proba(self, X):
        # trees were fit on the full class set (classes_ from full y),
        # so per-tree probability matrices align by construction
        probs = None
        for est in self.estimators_:
            p = est.predict_proba(X)
            probs = p if probs is None else probs + p
        return probs / len(self.estimators_)

    def predict_log_proba(self, X):
        return np.log(self.predict_proba(X) + 1e-15)

    def predict(self, X):
        return self.classes_[np.argmax(self.predict_proba(X), axis=1)]


class DistRandomForestRegressor(_DistBaseForest, RegressorMixin):
    _tree_cls = DecisionTreeRegressor

    def fit(self, X, y, sample_weight=None):
        return self._fit_forest(X, y)

    def predict(self, X):
        preds = np.zeros(len(np.asarray(X)))
        for est in self.estimators_:
            preds += est.predict(X)
        return preds / len(self.estimators_)


class DistExtraTreesClassifier(DistRandomForestClassifier):
    """Extra-trees: no bootstrap by default (reference semantics)."""

    def __init__(self, n_estimators=100, sc=None, partitions="auto", max_depth=None,
                 min_samples_split=2, min_samples_leaf=1, max_features="sqrt",
                 bootstrap=False, random_state=None, verbose=0):
        super().__init__(
            n_estimators=n_estimators, sc=sc, partitions=partitions,
            max_depth=max_depth, min_samples_split=min_samples_split,
            min_samples_leaf=min_samples_leaf, max_features=max_features,
            bootstrap=bootstrap, random_state=random_state, verbose=verbose,
        )


class DistExtraTreesRegressor(DistRandomForestRegressor):
    def __init__(self, n_estimators=100, sc=None, partitions="auto", max_depth=None,
                 min_samples_split=2, min_samples_leaf=1, max_features="sqrt",
                 bootstrap=False, random_state=None, verbose=0):
        super().__init__(
            n_estimators=n_estimators, sc=sc, partitions=partitions,
            max_depth=max_depth, min_samples_split=min_samples_split,
            min_samples_leaf=min_samples_leaf, max_features=max_features,
            bootstrap=bootstrap, random_state=random_state, verbose=verbose,
        )


def _fit_embed_tree_task(task: dict, shared: dict) -> bytes:
    from pyspark import cloudpickle as pickle

    X = np.asarray(shared["X"], dtype=np.float64)
    seed = task["seed"]
    rng = np.random.RandomState(seed)
    # unsupervised trick: regress on uniform random targets so splits
    # become data-density partitions (sklearn RandomTreesEmbedding idea)
    y_rand = rng.uniform(size=len(X))
    est = DecisionTreeRegressor(
        max_depth=shared["max_depth"], max_features=1, random_state=seed,
        min_samples_leaf=shared["min_samples_leaf"],
    )
    est.fit(X, y_rand)
    return pickle.dumps(est)


class DistRandomTreesEmbedding(BaseEstimator):
    """Unsupervised leaf-index embedding (one tree per Spark task)."""

    def __init__(self, n_estimators=100, sc=None, partitions="auto",
                 max_depth=5, min_samples_leaf=1, random_state=None):
        self.n_estimators = n_estimators
        self.sc = sc
        self.partitions = partitions
        self.max_depth = max_depth
        self.min_samples_leaf = min_samples_leaf
        self.random_state = random_state

    def fit(self, X, y=None, sample_weight=None):
        import pickle

        ss = np.random.SeedSequence(self.random_state)
        seeds = [int(s) % (2**31 - 1) for s in ss.generate_state(self.n_estimators)]
        tasks = [{"seed": s} for s in seeds]
        shared = {
            "X": np.asarray(X, dtype=np.float64),
            "max_depth": self.max_depth,
            "min_samples_leaf": self.min_samples_leaf,
        }
        payloads = run_tasks(self.sc, tasks, _fit_embed_tree_task, shared, self.partitions)
        self.estimators_ = [pickle.loads(p) for p in payloads]
        # map each tree's leaf node-ids to embedding columns
        self._leaf_maps = []
        offset = 0
        for est in self.estimators_:
            leaves = sorted(
                i for i, f in enumerate(est.tree_.feature) if f == -1
            )
            mapping = {leaf: offset + j for j, leaf in enumerate(leaves)}
            self._leaf_maps.append(mapping)
            offset += len(leaves)
        self.n_output_features_ = offset
        strip_spark(self)
        return self

    def transform(self, X):
        n = len(np.asarray(X))
        out = np.zeros((n, self.n_output_features_))
        for est, mapping in zip(self.estimators_, self._leaf_maps):
            nodes = est.apply(X)
            for i, node in enumerate(nodes):
                out[i, mapping[int(node)]] = 1.0
        return out

    def fit_transform(self, X, y=None, sample_weight=None):
        return self.fit(X, y, sample_weight).transform(X)


class DistStackingClassifier(BaseEstimator, ClassifierMixin):
    """Stacked generalization with distributed, leak-free level-0
    features: each base estimator's out-of-fold probabilities (via
    ``get_oof`` — fold fits fan out as Spark tasks) become the meta
    learner's training matrix, so the meta model never sees a
    probability produced by a model that trained on that row.

    The workflow get_oof exists for (reference ensemble.py:112-151
    builds OOF features for exactly this), packaged as an estimator:

    - fit: n_bases x (n_splits + 1) independent fold/full fits, all
      distributed through the task engine; then one local meta fit on
      the (n, n_bases * n_classes) OOF matrix.
    - predict: base predict_proba (vectorizable via
      get_prediction_udf like any other fitted model) -> meta predict.
    """

    def __init__(self, estimators=None, final_estimator=None, n_splits=5, sc=None):
        self.estimators = estimators
        self.final_estimator = final_estimator
        self.n_splits = n_splits
        self.sc = sc

    def fit(self, X, y):
        from ..ml.linear import LogisticRegression

        if not self.estimators:
            raise ValueError("estimators must be a non-empty list of (name, est)")
        y = np.asarray(y)
        self.classes_ = np.unique(y)
        self.named_estimators_ = {}
        blocks = []
        for name, est in self.estimators:
            model, oof = get_oof(est, X, y, n_splits=self.n_splits, sc=self.sc)
            self.named_estimators_[name] = model
            blocks.append(oof)
        meta_X = np.hstack(blocks)
        self.final_estimator_ = clone(
            self.final_estimator
            if self.final_estimator is not None
            else LogisticRegression()
        )
        self.final_estimator_.fit(meta_X, y)
        strip_spark(self.final_estimator_)
        self.sc = None  # picklable after fit, like the other Dist* estimators
        return self

    def _meta_features(self, X):
        return np.hstack(
            [
                np.asarray(self.named_estimators_[name].predict_proba(X))
                for name, _ in self.estimators
            ]
        )

    def predict_proba(self, X):
        return self.final_estimator_.predict_proba(self._meta_features(X))

    def predict(self, X):
        return self.final_estimator_.predict(self._meta_features(X))
