"""Deterministic distributed sampling / splitting.

Complements ``operators.text.sample_stratified`` (stratified permille
sampling): here the train/test split every distributed training
pipeline needs. Both use the same Knuth multiplicative hash on the id
column — pure BIGINT arithmetic, so splits are reproducible across
retries, speculative tasks, cluster sizes, AND engines (unlike
``DataFrame.randomSplit``, whose assignment depends on partitioning),
and a row's membership never changes as the dataset grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _KNUTH, _MOD32

__all__ = ["train_test_split_df", "sample_k_per_group", "weighted_sample_k"]


def train_test_split_df(
    df: DataFrame, id_col: str, test_fraction: float = 0.2
) -> tuple[DataFrame, DataFrame]:
    """Split into (train, test) by deterministic id-hash buckets.

    Map-side filter only — no shuffle, no sampling state; the split is
    a property of the row, not of the run.
    """
    if not 0.0 < test_fraction < 1.0:
        raise ValueError("test_fraction must be in (0, 1)")
    permille = int(round(test_fraction * 1000))
    bucket = F.pmod((F.col(id_col).cast("bigint") * _KNUTH) % _MOD32, F.lit(1000))
    return df.where(bucket >= permille), df.where(bucket < permille)


def sample_k_per_group(
    df: DataFrame, group_col: str, id_col: str, k: int
) -> DataFrame:
    """Deterministic uniform-ish sample of exactly min(k, |group|) rows
    per group: rank rows inside each group by the Knuth hash of their
    id (id as final tiebreaker) and keep the first k.

    The distributed replacement for per-group reservoir sampling:
    one shuffle on the group key, membership is a pure function of
    (id, k) — stable across retries, partitionings, and engines, and
    a row keeps/loses its slot only if ids around it change, not when
    unrelated partitions do.
    """
    from pyspark.sql import Window

    h = F.pmod((F.col(id_col).cast("bigint") * _KNUTH) % _MOD32, F.lit(_MOD32))
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_sample_k(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per group
    (Efraimidis-Spirakis A-ES): rank by key = -ln(u) / w and keep the k
    smallest keys, which draws each row with probability proportional
    to its weight — the quality-weighted corpus-subsampling primitive.

    The uniform u is derived from the Knuth hash of the id (pure BIGINT
    arithmetic + one ln), NOT rand(): membership is a property of the
    row, reproducible across retries, partitionings, and engines.  One
    shuffle on the group key; the per-group top-k is a ranked window.
    Rows with non-positive weight are excluded (they have zero mass).
    """
    u = (
        F.pmod(F.col(id_col).cast("bigint") * _KNUTH, F.lit(_MOD32)).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_MOD32))
    key = -F.log(u) / F.col(weight_col).cast("double")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )
