from .eliminate import DistFeatureEliminator
from .encoder import Encoderizer, EncoderizerExtractor
from .dedup import (
    containment_pairs,
    dup_span_stats,
    embedding_dedup,
    exact_dedup,
    incremental_dedup,
    minhash_dedup,
    ngram_jaccard_dedup,
    semantic_dedup,
    simhash_dedup,
)
from .decomp import fit_pca, pca_project
from .lm import bpe_encode, bpe_train, doc_logprob, unigram_counts
from .quality import (
    completeness_check,
    dq_audit,
    fk_check,
    range_check,
    uniqueness_check,
)
from .aggregates import salted_agg
from .retrieval import bm25_rank, build_inverted_index, phrase_search
from .sampling import negative_sample_pairs
from .setsim import setsim_join
from .stats import group_trend, key_skew, pmi_table, psi_drift
from .graph import connected_components, connected_components_star, pagerank
from .joins import asof_join, interval_join, salted_join
from .sampling import sample_k_per_group, train_test_split_df, weighted_sample_k
from .similarity import cosine_topk, ivf_join, pq_encode, quantize_int8, train_pq_codebooks
from .text import (
    dedup_lines,
    fingerprint,
    language_id,
    quality_score,
    rebalance_sample,
    repetition_stats,
    scrub_pii,
    temperature_sample,
    tfidf_rank,
)
from .ensemble import (
    DistExtraTreesClassifier,
    DistStackingClassifier,
    DistExtraTreesRegressor,
    DistRandomForestClassifier,
    DistRandomForestRegressor,
    DistRandomTreesEmbedding,
    get_oof,
    get_single_oof,
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
    "DistStackingClassifier",
    "Encoderizer",
    "EncoderizerExtractor",
    "asof_join",
    "interval_join",
    "exact_dedup",
    "incremental_dedup",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "embedding_dedup",
    "semantic_dedup",
    "dup_span_stats",
    "fit_pca",
    "pca_project",
    "setsim_join",
    "dedup_lines",
    "build_inverted_index",
    "phrase_search",
    "bm25_rank",
    "negative_sample_pairs",
    "group_trend",
    "psi_drift",
    "pmi_table",
    "key_skew",
    "doc_logprob",
    "unigram_counts",
    "bpe_train",
    "bpe_encode",
    "completeness_check",
    "uniqueness_check",
    "fk_check",
    "range_check",
    "dq_audit",
    "language_id",
    "quality_score",
    "rebalance_sample",
    "repetition_stats",
    "scrub_pii",
    "temperature_sample",
    "tfidf_rank",
    "fingerprint",
    "cosine_topk",
    "ivf_join",
    "quantize_int8",
    "containment_pairs",
    "train_pq_codebooks",
    "pq_encode",
    "connected_components",
    "connected_components_star",
    "pagerank",
    "salted_join",
    "salted_agg",
    "sample_k_per_group",
    "train_test_split_df",
    "weighted_sample_k",
    "get_prediction_udf",
    "get_oof",
    "get_single_oof",
]
