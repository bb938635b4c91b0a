from .eliminate import DistFeatureEliminator
from .encoder import Encoderizer, EncoderizerExtractor
from .dedup import (
    embedding_dedup,
    exact_dedup,
    minhash_dedup,
    ngram_jaccard_dedup,
    simhash_dedup,
)
from .joins import asof_join, interval_join
from .similarity import cosine_topk
from .text import fingerprint, language_id, quality_score
from .ensemble import (
    DistExtraTreesClassifier,
    DistExtraTreesRegressor,
    DistRandomForestClassifier,
    DistRandomForestRegressor,
    DistRandomTreesEmbedding,
)
from .multiclass import DistOneVsOneClassifier, DistOneVsRestClassifier
from .predict import get_prediction_udf
from .search import DistGridSearchCV, DistMultiModelSearch, DistRandomizedSearchCV

__all__ = [
    "DistGridSearchCV",
    "DistRandomizedSearchCV",
    "DistMultiModelSearch",
    "DistOneVsRestClassifier",
    "DistOneVsOneClassifier",
    "DistRandomForestClassifier",
    "DistRandomForestRegressor",
    "DistExtraTreesClassifier",
    "DistExtraTreesRegressor",
    "DistRandomTreesEmbedding",
    "DistFeatureEliminator",
    "Encoderizer",
    "EncoderizerExtractor",
    "asof_join",
    "interval_join",
    "exact_dedup",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "embedding_dedup",
    "language_id",
    "quality_score",
    "fingerprint",
    "cosine_topk",
    "get_prediction_udf",
]
