"""Self-contained numpy estimator library implementing the
scikit-learn estimator protocol (fit / predict / predict_proba /
score / get_params / set_params), so the ``Dist*`` meta-estimators can
run in environments without scikit-learn. When sklearn IS installed,
its estimators work interchangeably — the meta-estimators only speak
the protocol.
"""

from .base import BaseEstimator, ClassifierMixin, RegressorMixin, clone, is_classifier
from .dummy import DummyClassifier
from .linear import LinearRegression, LogisticRegression, Ridge
from .metrics import (
    accuracy_score,
    f1_score,
    get_scorer,
    log_loss,
    mean_squared_error,
    r2_score,
    roc_auc_score,
)
from .model_selection import (
    GroupKFold,
    KFold,
    ParameterGrid,
    ParameterSampler,
    StratifiedKFold,
    check_cv,
    train_test_split,
)
from .naive_bayes import GaussianNB
from .neighbors import KNeighborsClassifier
from .boosting import GradientBoostingClassifier, GradientBoostingRegressor
from .tree import DecisionTreeClassifier, DecisionTreeRegressor

__all__ = [
    "BaseEstimator", "ClassifierMixin", "RegressorMixin", "clone", "is_classifier",
    "LogisticRegression", "LinearRegression", "Ridge",
    "DecisionTreeClassifier", "DecisionTreeRegressor",
    "GradientBoostingClassifier",
    "GradientBoostingRegressor",
    "GaussianNB", "KNeighborsClassifier", "DummyClassifier",
    "GroupKFold", "KFold", "StratifiedKFold", "train_test_split", "ParameterGrid",
    "ParameterSampler", "check_cv",
    "accuracy_score", "f1_score", "log_loss", "roc_auc_score", "r2_score",
    "mean_squared_error", "get_scorer",
]
