"""Local estimator library tests (no Spark needed)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from skdist_spark.ml import (
    DecisionTreeClassifier,
    DecisionTreeRegressor,
    DummyClassifier,
    GaussianNB,
    KFold,
    KNeighborsClassifier,
    LinearRegression,
    LogisticRegression,
    ParameterGrid,
    ParameterSampler,
    Ridge,
    StratifiedKFold,
    accuracy_score,
    clone,
    get_scorer,
    is_classifier,
    log_loss,
    roc_auc_score,
    train_test_split,
)


def _blobs(n=300, d=8, k=3, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 4
    y = rng.randint(0, k, n)
    X = centers[y] + rng.randn(n, d)
    return X, y


@pytest.mark.parametrize(
    "est",
    [
        LogisticRegression(max_iter=300),
        DecisionTreeClassifier(max_depth=8),
        GaussianNB(),
        KNeighborsClassifier(),
    ],
)
def test_classifiers_learn_blobs(est):
    X, y = _blobs()
    est.fit(X, y)
    assert accuracy_score(y, est.predict(X)) > 0.9
    proba = est.predict_proba(X)
    assert proba.shape == (len(y), 3)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-6)


def test_classifiers_deterministic():
    X, y = _blobs()
    a = LogisticRegression().fit(X, y).predict_proba(X)
    b = LogisticRegression().fit(X, y).predict_proba(X)
    np.testing.assert_array_equal(a, b)


def test_regressors():
    rng = np.random.RandomState(0)
    X = rng.randn(200, 5)
    y = X @ np.array([1.0, -2.0, 0.5, 0, 3.0]) + 0.7
    for est in [LinearRegression(), Ridge(alpha=1e-6), DecisionTreeRegressor(max_depth=12)]:
        est.fit(X, y)
        assert est.score(X, y) > 0.95, type(est).__name__


def test_clone_and_params():
    est = LogisticRegression(C=2.5, max_iter=50)
    c = clone(est)
    assert c is not est and c.get_params()["C"] == 2.5
    est.set_params(C=9.0)
    assert c.C == 2.5
    assert is_classifier(est) and not is_classifier(LinearRegression())


def test_string_labels():
    X, y_int = _blobs(k=2)
    y = np.where(y_int == 0, "cat", "dog")
    m = LogisticRegression().fit(X, y)
    assert set(m.predict(X)) <= {"cat", "dog"}
    auc = roc_auc_score(y, m.predict_proba(X)[:, 1])
    assert auc > 0.9


@given(st.integers(min_value=2, max_value=8), st.integers(min_value=20, max_value=100))
@settings(max_examples=20, deadline=None)
def test_kfold_partitions(k, n):
    X = np.zeros(n)
    folds = list(KFold(n_splits=k).split(X))
    assert len(folds) == k
    all_test = np.concatenate([t for _, t in folds])
    assert sorted(all_test) == list(range(n))
    for train, test in folds:
        assert set(train) | set(test) == set(range(n))
        assert not set(train) & set(test)


def test_stratified_kfold_balance():
    y = np.array([0] * 50 + [1] * 10)
    for train, test in StratifiedKFold(5).split(np.zeros(60), y):
        assert (y[test] == 1).sum() == 2


def test_parameter_grid_and_sampler():
    grid = ParameterGrid({"a": [1, 2, 3], "b": ["x", "y"]})
    combos = list(grid)
    assert len(grid) == len(combos) == 6
    samp = list(ParameterSampler({"a": [1, 2, 3], "b": ["x", "y"]}, n_iter=4, random_state=0))
    assert len(samp) == 4 and all(s["a"] in (1, 2, 3) for s in samp)
    # deterministic under fixed seed
    samp2 = list(ParameterSampler({"a": [1, 2, 3], "b": ["x", "y"]}, n_iter=4, random_state=0))
    assert samp == samp2


def test_train_test_split_stratified():
    X, y = _blobs(n=100, k=2)
    X_tr, X_te, y_tr, y_te = train_test_split(X, y, test_size=0.2, random_state=0, stratify=y)
    assert len(X_te) + len(X_tr) == 100
    assert abs(np.mean(y_te) - np.mean(y)) < 0.15


def test_scorers():
    X, y = _blobs(k=2)
    m = LogisticRegression().fit(X, y)
    for name in ["accuracy", "f1", "f1_macro", "neg_log_loss", "roc_auc"]:
        s = get_scorer(name)(m, X, y)
        assert np.isfinite(s)
    assert get_scorer("neg_log_loss")(m, X, y) == -log_loss(y, m.predict_proba(X), labels=m.classes_)


def test_dummy():
    X, y = _blobs(k=2)
    d = DummyClassifier().fit(X, y)
    assert len(d.predict(X)) == len(y)


def test_time_series_split_no_future_leakage():
    import numpy as np

    from skdist_spark.ml.model_selection import TimeSeriesSplit

    X = np.arange(37)
    tss = TimeSeriesSplit(n_splits=4)
    folds = list(tss.split(X))
    assert len(folds) == 4
    prev_test_end = None
    for train, test in folds:
        assert train.max() < test.min()          # strictly before
        assert len(test) == 37 // 5
        assert np.array_equal(train, np.arange(len(train)))  # grows from 0
        if prev_test_end is not None:
            assert test.min() == prev_test_end   # contiguous windows
        prev_test_end = test.max() + 1


def test_time_series_split_gap_and_max_train():
    import numpy as np

    from skdist_spark.ml.model_selection import TimeSeriesSplit

    X = np.arange(40)
    tss = TimeSeriesSplit(n_splits=3, test_size=5, gap=2, max_train_size=10)
    for train, test in tss.split(X):
        assert test.min() - train.max() == 3  # gap of 2 rows skipped
        assert len(train) <= 10
        assert len(test) == 5


def test_gradient_boosting_regressor_beats_single_tree():
    import numpy as np

    from skdist_spark.ml.boosting import GradientBoostingRegressor
    from skdist_spark.ml.tree import DecisionTreeRegressor

    rng = np.random.RandomState(7)
    X = rng.uniform(-3, 3, size=(400, 2))
    y = np.sin(X[:, 0]) + 0.5 * X[:, 1] ** 2  # smooth nonlinear target
    Xt = rng.uniform(-3, 3, size=(200, 2))
    yt = np.sin(Xt[:, 0]) + 0.5 * Xt[:, 1] ** 2

    gb = GradientBoostingRegressor(n_estimators=80, learning_rate=0.2, max_depth=2)
    gb.fit(X, y)
    stump = DecisionTreeRegressor(max_depth=2).fit(X, y)
    mse_gb = float(np.mean((gb.predict(Xt) - yt) ** 2))
    mse_tree = float(np.mean((stump.predict(Xt) - yt) ** 2))
    assert mse_gb < 0.5 * mse_tree
    assert mse_gb < 0.1

    # determinism: refit gives identical predictions
    gb2 = GradientBoostingRegressor(n_estimators=80, learning_rate=0.2, max_depth=2)
    gb2.fit(X, y)
    assert np.array_equal(gb.predict(Xt), gb2.predict(Xt))


def test_gradient_boosting_classifier_accuracy_and_proba():
    import numpy as np

    from skdist_spark.ml.boosting import GradientBoostingClassifier

    rng = np.random.RandomState(11)
    X = rng.uniform(-2, 2, size=(500, 2))
    y = ((X[:, 0] ** 2 + X[:, 1] ** 2) < 2.0).astype(int)  # circular boundary
    gb = GradientBoostingClassifier(n_estimators=60, learning_rate=0.3, max_depth=2)
    gb.fit(X, y)
    acc = float(np.mean(gb.predict(X) == y))
    assert acc > 0.93
    proba = gb.predict_proba(X)
    assert proba.shape == (500, 2)
    assert np.allclose(proba.sum(axis=1), 1.0)
    assert np.all((proba >= 0) & (proba <= 1))


def test_gradient_boosting_in_dist_grid_search(spark):
    """The boosted estimator must speak enough protocol for the
    distributed meta-estimators to fan it out."""
    import numpy as np

    from skdist_spark.ml.boosting import GradientBoostingClassifier
    from skdist_spark.operators.search import DistGridSearchCV

    rng = np.random.RandomState(3)
    X = rng.uniform(-2, 2, size=(200, 2))
    y = ((X[:, 0] + X[:, 1]) > 0).astype(int)
    gs = DistGridSearchCV(
        GradientBoostingClassifier(n_estimators=10),
        {"learning_rate": [0.1, 0.5], "max_depth": [1, 2]},
        sc=spark,
        cv=3,
    )
    gs.fit(X, y)
    assert gs.best_params_["learning_rate"] in (0.1, 0.5)
    assert gs.best_score_ > 0.8
    assert len(gs.cv_results_["mean_test_score"]) == 4


def test_group_kfold_groups_never_straddle():
    import numpy as np

    from skdist_spark.ml import GroupKFold

    rng = np.random.RandomState(7)
    groups = rng.randint(0, 17, 120)
    X = np.arange(120).reshape(-1, 1)
    gkf = GroupKFold(n_splits=4)
    seen_test = []
    for train, test in gkf.split(X, groups=groups):
        # disjoint, complete
        assert set(train) | set(test) == set(range(120))
        assert not set(train) & set(test)
        # no group straddles the boundary
        assert not set(groups[train]) & set(groups[test])
        seen_test.extend(test)
    # every sample is in a test fold exactly once
    assert sorted(seen_test) == list(range(120))
    # deterministic: same input -> same folds
    a = [tuple(t) for _, t in GroupKFold(4).split(X, groups=groups)]
    b = [tuple(t) for _, t in GroupKFold(4).split(X, groups=groups)]
    assert a == b
    with pytest.raises(ValueError):
        list(GroupKFold(4).split(X))  # groups required
    with pytest.raises(ValueError):
        list(GroupKFold(40).split(X, groups=groups))  # more splits than groups


def test_grid_search_with_group_kfold(spark):
    import numpy as np

    from skdist_spark.ml import GroupKFold, LogisticRegression
    from skdist_spark.operators import DistGridSearchCV

    X, y = _blobs_ml(200, 5, 2)
    groups = np.arange(200) % 23
    grid = {"C": [0.1, 1.0]}
    local = DistGridSearchCV(
        LogisticRegression(), grid, sc=None, cv=GroupKFold(4)
    ).fit(X, y, groups=groups)
    dist = DistGridSearchCV(
        LogisticRegression(), grid, sc=spark, cv=GroupKFold(4)
    ).fit(X, y, groups=groups)
    assert dist.best_params_ == local.best_params_
    np.testing.assert_allclose(
        dist.cv_results_["mean_test_score"], local.cv_results_["mean_test_score"]
    )


def _blobs_ml(n, d, k, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 3
    y = rng.randint(0, k, n)
    return centers[y] + rng.randn(n, d), y


def test_permutation_importance_readout(spark):
    """The length-driven label: permuting f_len must cost real accuracy,
    the orthogonal ratios must not, and permuting is deterministic."""
    from skdist_spark.plans.ml_queries import ml_permutation_importance

    rows = {r.feature: r for r in
            ml_permutation_importance(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"f_len", "f_wlen", "f_distinct", "f_stop"}
    base = {r.baseline_acc_ppm for r in rows.values()}
    assert len(base) == 1 and base.pop() > 800_000
    assert rows["f_len"].importance_ppm > 100_000
    assert rows["f_len"].importance_ppm == max(
        r.importance_ppm for r in rows.values()
    )
    assert rows["f_wlen"].importance_ppm <= 20_000
    rows2 = {r.feature: r.importance_ppm for r in
             ml_permutation_importance(spark, "/root/testdata/sf0.001").collect()}
    assert rows2 == {k: v.importance_ppm for k, v in rows.items()}


def test_learning_curve_rises(spark):
    """More data must not hurt on the learnable target, the curve is
    deterministic, and sizes collapse to the corpus bound."""
    from skdist_spark.plans.ml_queries import ml_learning_curve

    rows = ml_learning_curve(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 1
    sizes = [r.train_size for r in rows]
    assert sizes == sorted(set(sizes))
    accs = [r.full_acc_ppm for r in rows]
    # curves wobble at tiny sizes; require no collapse and real signal
    assert accs[-1] >= accs[0] - 25_000
    assert max(accs) > 600_000  # learnable target: better than chance
    again = ml_learning_curve(spark, "/root/testdata/sf0.001").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]
