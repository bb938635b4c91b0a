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

__all__ = [
    "train_test_split_df",
    "sample_k_per_group",
    "weighted_sample_k",
    "negative_sample_pairs",
]


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


# ---- Contrastive negative sampling -----------------------------------

NEG_K = 3           # negatives per anchor
NEG_BUCKETS = 32    # hash-bucket ring
NEG_CANDS = 8       # bounded candidates kept per bucket
_M31 = 2147483648   # 2^31: keeps (x % _M31) * _KNUTH inside BIGINT


def negative_sample_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = NEG_K,
    n_buckets: int = NEG_BUCKETS,
    n_cands: int = NEG_CANDS,
) -> DataFrame:
    """Deterministic negatives for contrastive training: k pseudo-random
    partner rows per anchor, with NO rand() and NO cross join.

    Scale shape: rows hash into ``n_buckets`` ring buckets (Knuth
    arithmetic — membership is a property of the row); each bucket
    keeps only ``n_cands`` ranked candidate rows, so the anchor-to-
    candidate equi-join on the ring offset fans out a BOUNDED
    k * n_cands per anchor — never |anchors| x |corpus|.  The winning
    candidate per (anchor, offset) minimizes an integer pair hash, so
    different anchors sharing a bucket still draw different partners.
    Anchors never pair with themselves; an empty target bucket yields
    no row for that offset (deterministic in both engines).

    Returns (anchor_id, neg_rank 1..k, neg_id) ordered.
    """
    from pyspark.sql import Window

    ids = df.select(F.col(id_col).cast("bigint").alias("rid")).withColumn(
        "bucket", F.pmod((F.col("rid") * _KNUTH) % _MOD32, F.lit(n_buckets))
    )
    # bounded candidate list per bucket, ranked by a second Knuth pass
    wb = Window.partitionBy("bucket").orderBy(
        F.pmod(F.col("rid") * _KNUTH + 12345, F.lit(_M31)).asc(), F.col("rid").asc()
    )
    cands = (
        ids.withColumn("crank", F.row_number().over(wb))
        .where(F.col("crank") <= n_cands)
        .select(F.col("rid").alias("neg_id"), F.col("bucket").alias("cbucket"))
    )
    anchors = df.select(F.col(id_col).cast("bigint").alias("anchor_id")).withColumn(
        "abucket", F.pmod((F.col("anchor_id") * _KNUTH) % _MOD32, F.lit(n_buckets))
    )
    offsets = anchors.select(
        "anchor_id",
        "abucket",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_rank"),
    ).withColumn("cbucket", F.pmod(F.col("abucket") + F.col("neg_rank"), F.lit(n_buckets)))
    # integer pair hash, all intermediates < 2^63
    pair_s = (
        f"pmod(pmod(pmod(anchor_id * {_KNUTH}, {_M31}) + neg_id, {_M31})"
        f" * {_KNUTH}, {_M31})"
    )
    w_pick = Window.partitionBy("anchor_id", "neg_rank").orderBy(
        F.expr(pair_s).asc(), F.col("neg_id").asc()
    )
    return (
        offsets.join(cands, "cbucket")
        .where(F.col("neg_id") != F.col("anchor_id"))
        .withColumn("pick", F.row_number().over(w_pick))
        .where(F.col("pick") == 1)
        .select("anchor_id", "neg_rank", "neg_id")
        .orderBy("anchor_id", "neg_rank")
    )


def contrastive_negatives(spark, sf_dir: str):
    """Driver query: 3 deterministic negatives per document."""
    from ..sources.catalog import load_table

    return negative_sample_pairs(load_table(spark, "documents", sf_dir))


def _negatives_oracle_sql() -> str:
    pair_s = (
        f"((((anchor_id * {_KNUTH}) % {_M31}) + neg_id) % {_M31} * {_KNUTH}) % {_M31}"
    )
    return f"""
        WITH ids AS (
            SELECT CAST(doc_id AS BIGINT) AS rid,
                   (doc_id * {_KNUTH}) % {_MOD32} % {NEG_BUCKETS} AS bucket
            FROM documents
        ), cands AS (
            SELECT rid AS neg_id, bucket AS cbucket FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket
                    ORDER BY (rid * {_KNUTH} + 12345) % {_M31} ASC, rid ASC) AS crank
                FROM ids
            ) WHERE crank <= {NEG_CANDS}
        ), offsets AS (
            SELECT rid AS anchor_id,
                   unnest(range(1, {NEG_K} + 1)) AS neg_rank,
                   bucket AS abucket
            FROM ids
        ), matched AS (
            SELECT o.anchor_id, CAST(o.neg_rank AS INTEGER) AS neg_rank, c.neg_id,
                   ROW_NUMBER() OVER (PARTITION BY o.anchor_id, o.neg_rank
                       ORDER BY {pair_s} ASC, neg_id ASC) AS pick
            FROM offsets o JOIN cands c
              ON (o.abucket + o.neg_rank) % {NEG_BUCKETS} = c.cbucket
             AND c.neg_id != o.anchor_id
        )
        SELECT anchor_id, neg_rank, neg_id FROM matched
        WHERE pick = 1
        ORDER BY anchor_id, neg_rank
    """


QUERIES = {
    "contrastive_negatives": contrastive_negatives,
}

ORACLE_SQL: dict[str, str] = {
    "contrastive_negatives": _negatives_oracle_sql(),
}


SPLIT_PERMILLE = (800, 100, 100)  # train / val / test user-bucket widths


def user_disjoint_split(
    df: DataFrame,
    unit_col: str,
    permille: tuple[int, int, int] = SPLIT_PERMILLE,
) -> DataFrame:
    """Assign every row to train/val/test by hashing its UNIT (user,
    session, document family...) — the leakage-safe split: all rows of
    a unit land in the same fold, so per-unit history never straddles
    train and eval.  Row-level splits (``train_test_split_df``) leak
    exactly the correlated structure a model memorizes first.

    Same Knuth-hash permille contract as the row split: assignment is
    a pure function of the unit id — reproducible across retries,
    partitionings, cluster sizes, and engines; adding data never moves
    an existing unit between folds.  Map-side expression only, no
    shuffle.  Returns the input plus a ``split`` column.
    """
    if sum(permille) != 1000 or any(p <= 0 for p in permille):
        raise ValueError("permille must be three positive ints summing to 1000")
    bucket = F.pmod((F.col(unit_col).cast("bigint") * _KNUTH) % _MOD32, F.lit(1000))
    return df.withColumn(
        "split",
        F.when(bucket < permille[0], F.lit("train"))
        .when(bucket < permille[0] + permille[1], F.lit("val"))
        .otherwise(F.lit("test")),
    )


def user_split_summary(spark, sf_dir: str) -> DataFrame:
    """Driver query: three-way user-disjoint split of the events table
    with per-fold size/volume balance — the check run before any
    training job ships (a fold imbalanced in users-vs-events signals
    unit skew the split hash cannot fix)."""
    from ..sources.catalog import load_table

    ev = load_table(spark, "events", sf_dir)
    return (
        user_disjoint_split(ev, "user_id")
        .groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("split")
    )


_SPLIT_SQL = f"""
    WITH tagged AS (
        SELECT *,
               CASE WHEN b < {SPLIT_PERMILLE[0]} THEN 'train'
                    WHEN b < {SPLIT_PERMILLE[0] + SPLIT_PERMILLE[1]} THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT *, (user_id * {_KNUTH}) % {_MOD32} % 1000 AS b FROM events)
    )
    SELECT split, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM tagged GROUP BY split ORDER BY split
"""

QUERIES["user_split_summary"] = user_split_summary
ORACLE_SQL["user_split_summary"] = _SPLIT_SQL
__all__.append("user_disjoint_split")


CONTEXT_LEN = 3  # training-pair context window (events)


def sequence_training_pairs(
    df: DataFrame,
    unit_col: str,
    order_cols: list[str],
    item_col: str,
    context_len: int = CONTEXT_LEN,
) -> DataFrame:
    """Build next-item-prediction training pairs from per-unit event
    sequences: for every event, the ``context_len`` items immediately
    before it (in-order) and the event's item as the target — the
    dataset constructor behind sequential recommenders and
    next-token-style behavioral models.

    One window per unit (single shuffle on the unit key); the context
    is ``collect_list`` over a bounded ROWS frame, so state per row is
    ``context_len`` items regardless of sequence length.
    ``order_cols`` must be a deterministic total order within the unit
    (pass a tiebreaker id — timestamps alone collide).  Rows with an
    empty context (each unit's first event) are dropped: they have
    nothing to condition on.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(unit_col)
        .orderBy(*order_cols)
        .rowsBetween(-context_len, -1)
    )
    return (
        df.withColumn("context", F.collect_list(item_col).over(w))
        .withColumn("n_context", F.size("context").cast("int"))
        .where(F.col("n_context") >= 1)
        .withColumn("target", F.col(item_col))
    )


def event_training_pairs(spark, sf_dir: str) -> DataFrame:
    """Driver query: (context -> target) event-type pairs per user,
    context = the 3 preceding events ordered by (ts, event_id)."""
    from ..sources.catalog import load_table

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_id", "ts", "event_type"
    )
    out = sequence_training_pairs(
        ev, "user_id", ["ts", "event_id"], "event_type"
    )
    return out.select(
        "user_id",
        "event_id",
        "n_context",
        F.concat_ws(" ", "context").alias("context_seq"),
        "target",
    ).orderBy("user_id", "event_id")


_TRAINING_PAIRS_SQL = f"""
    WITH seq AS (
        SELECT user_id, event_id, event_type,
               list(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {CONTEXT_LEN} PRECEDING AND 1 PRECEDING
               ) AS context
        FROM events
    )
    SELECT user_id, event_id,
           CAST(len(context) AS INTEGER) AS n_context,
           array_to_string(context, ' ') AS context_seq,
           event_type AS target
    FROM seq
    WHERE len(context) >= 1
    ORDER BY user_id, event_id
"""

QUERIES["event_training_pairs"] = event_training_pairs
ORACLE_SQL["event_training_pairs"] = _TRAINING_PAIRS_SQL
__all__.append("sequence_training_pairs")


# ---- stratified sampling design (Neyman allocation) --------------------


def neyman_allocation(
    df: DataFrame, stratum_col: str, value_col: str
) -> DataFrame:
    """Sampling-design table: the Neyman-optimal share of a fixed
    sample budget per stratum, share_h = N_h*S_h / sum(N_h*S_h) — the
    variance-minimizing allocation for estimating the population mean,
    vs the naive proportional share N_h/N.  The planning readout run
    BEFORE ``sample_stratified``: variable strata earn more budget.

    Exactness: per-stratum moments are exact (BIGINT count, DECIMAL
    sums of the integer value and its square), the stratum std is one
    double sqrt quantized to integer micro BEFORE the cross-stratum
    sum, so the denominator is an exact BIGINT and every share is one
    double division rounded to 6 — no cross-stratum float summation
    order anywhere.  One aggregation pass plus a one-row broadcast.
    """
    g = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(38,0)")).alias("s"),
        F.sum(
            (F.col(value_col).cast("decimal(19,0)") * F.col(value_col)).cast(
                "decimal(38,0)"
            )
        ).alias("ss"),
    )
    mean = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
    var = f"((CAST(ss AS DOUBLE) - {mean} * CAST(s AS DOUBLE)) / CAST(n - 1 AS DOUBLE))"
    strata = g.where(F.col("n") > 1).withColumn(
        "s_micro", F.expr(f"CAST(floor(sqrt({var}) * 1000000) AS BIGINT)")
    )
    denom = strata.agg(
        F.sum(F.col("n") * F.col("s_micro")).alias("den"),
        F.sum("n").alias("n_total"),
    )
    return (
        strata.crossJoin(F.broadcast(denom))
        .select(
            stratum_col,
            F.col("n").alias("n_rows"),
            F.expr(f"ROUND({mean}, 6)").alias("mean_value"),
            F.round(F.col("s_micro").cast("double") / 1000000.0, 6).alias(
                "std_value"
            ),
            F.round(
                (F.col("n") * F.col("s_micro")).cast("double")
                / F.col("den").cast("double"),
                6,
            ).alias("neyman_share"),
            F.round(
                F.col("n").cast("double") / F.col("n_total").cast("double"), 6
            ).alias("proportional_share"),
        )
        .orderBy(stratum_col)
    )


def source_neyman_allocation(spark, sf_dir: str) -> DataFrame:
    """Driver query: Neyman vs proportional sampling budget per source
    for estimating mean document length."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return neyman_allocation(docs, "source", "n_chars")


_NEYMAN_SQL = """
    WITH g AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(n_chars AS DECIMAL(38,0))) AS s,
               SUM(CAST(CAST(n_chars AS DECIMAL(19,0)) * n_chars AS DECIMAL(38,0))) AS ss
        FROM documents GROUP BY 1
    ), strata AS (
        SELECT source, n, s,
               CAST(floor(sqrt(
                   (CAST(ss AS DOUBLE)
                    - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s AS DOUBLE))
                   / CAST(n - 1 AS DOUBLE)) * 1000000) AS BIGINT) AS s_micro
        FROM g WHERE n > 1
    ), denom AS (
        SELECT CAST(SUM(n * s_micro) AS BIGINT) AS den,
               CAST(SUM(n) AS BIGINT) AS n_total
        FROM strata
    )
    SELECT source, n AS n_rows,
           ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_value,
           ROUND(CAST(s_micro AS DOUBLE) / 1000000.0, 6) AS std_value,
           ROUND(CAST(n * s_micro AS DOUBLE) / CAST(den AS DOUBLE), 6) AS neyman_share,
           ROUND(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS proportional_share
    FROM strata CROSS JOIN denom
    ORDER BY source
"""

QUERIES["source_neyman_allocation"] = source_neyman_allocation
ORACLE_SQL["source_neyman_allocation"] = _NEYMAN_SQL


# ---- rendezvous (HRW) sharding ---------------------------------------------

HRW_SHARDS = 16
_HRW_K = 2654435761
_HRW_MOD = 4294967296
_HRW_M31 = 2147483648


def rendezvous_shard(id_expr: str, n_shards: int = HRW_SHARDS) -> str:
    """SQL expression assigning an id to its highest-random-weight
    shard: score(id, s) = knuth_hash(masked_id * (s + 1)), shard =
    argmax_s score — the consistent-hashing scheme where REMOVING a
    shard only moves that shard's keys (minimal reshuffle), unlike
    mod-N which moves almost everything.

    Pure BIGINT arithmetic (id masked below 2^31 / n_shards before the
    multiply, so no wrap anywhere); identical text runs on DuckDB.
    Ties are impossible for distinct multipliers modulo 2^32 except on
    hash collisions, which the deterministic argmax (first max in
    shard order) settles identically on both engines.
    """
    masked = f"((({id_expr} % {_HRW_M31 // 64}) + {_HRW_M31 // 64}) % {_HRW_M31 // 64})"
    scores = (
        f"transform(sequence(0, {n_shards - 1}),"
        f" s -> ({masked} * (s + 1) * {_HRW_K}) % {_HRW_MOD})"
    )
    return (
        f"CAST(array_position({scores}, array_max({scores})) - 1 AS INT)"
    )


def _rendezvous_shard_duck(id_expr: str, n_shards: int = HRW_SHARDS) -> str:
    masked = f"((({id_expr} % {_HRW_M31 // 64}) + {_HRW_M31 // 64}) % {_HRW_M31 // 64})"
    scores = (
        f"list_transform(range(0, {n_shards}),"
        f" s -> ({masked} * (s + 1) * {_HRW_K}) % {_HRW_MOD})"
    )
    return f"CAST(list_position({scores}, list_max({scores})) - 1 AS INTEGER)"


def doc_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: rendezvous-shard the documents table and report
    per-shard counts plus each shard's deviation from the uniform
    share in ppm — the placement-balance audit run before trusting a
    consistent-hashing layout at 100 TB."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    assigned = docs.select(
        F.expr(rendezvous_shard("doc_id")).alias("shard")
    )
    return (
        assigned.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "shard",
            "n_docs",
            F.expr(
                f"CAST((n_docs * {HRW_SHARDS} - SUM(n_docs) OVER ())"
                f" * 1000000 DIV SUM(n_docs) OVER () AS BIGINT)"
            ).alias("imbalance_ppm"),
        )
        .orderBy("shard")
    )


def _shard_balance_sql(n_shards: int = HRW_SHARDS) -> str:
    shard = _rendezvous_shard_duck("doc_id", n_shards)
    return f"""
        WITH assigned AS (
            SELECT {shard} AS shard FROM documents
        )
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST((COUNT(*) * {n_shards} - SUM(COUNT(*)) OVER ())
                    * 1000000 // SUM(COUNT(*)) OVER () AS BIGINT)
                   AS imbalance_ppm
        FROM assigned GROUP BY shard ORDER BY shard
    """


QUERIES["doc_shard_balance"] = doc_shard_balance
ORACLE_SQL["doc_shard_balance"] = _shard_balance_sql()


# ---- subsample stability ladder ---------------------------------------------

STABILITY_PCTS = (25, 50, 75, 100)


def subsample_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate-stability ladder: the same KPIs (purchases per user,
    mean purchase value) on deterministic nested 25/50/75/100% USER
    subsamples — if the numbers have converged by 25%, the next
    analysis doesn't need the full corpus (the subsampling answer to
    'must this query scan 100 TB?').  Nested by construction (a user
    in the 25% slice is in all larger ones), so column drift across
    rows is sampling error alone.

    One scan; each fraction is a conditional aggregate over the same
    wrap-safe Knuth user bucket, not a separate pass."""
    from ..sources.catalog import load_table

    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_type",
        F.expr("CAST(floor(value * 1000000) AS BIGINT)").alias("v"),
        F.expr(
            "pmod(pmod(CAST(user_id AS BIGINT), 2147483648)"
            " * 2654435761, 4294967296) % 100"
        ).alias("bucket"),
    )
    aggs = []
    for p in STABILITY_PCTS:
        cond = F.col("bucket") < p
        aggs += [
            F.count_distinct(F.when(cond, F.col("user_id"))).alias(f"u{p}"),
            F.sum(
                F.when(cond & (F.col("event_type") == "purchase"), 1).otherwise(0)
            ).alias(f"p{p}"),
            F.sum(
                F.when(
                    cond & (F.col("event_type") == "purchase"), F.col("v")
                ).otherwise(0)
            ).alias(f"s{p}"),
        ]
    g = ev.agg(*aggs)
    entries = ", ".join(
        f"{p}, CAST(u{p} AS BIGINT), CAST(p{p} AS BIGINT),"
        f" CAST(p{p} * 1000000 DIV u{p} AS BIGINT),"
        f" ROUND(CAST(s{p} AS DOUBLE) / p{p} / 1000000.0, 6)"
        for p in STABILITY_PCTS
    )
    return (
        g.select(
            F.expr(
                f"stack({len(STABILITY_PCTS)}, {entries})"
                " AS (sample_pct, n_users, n_purchases,"
                " purchases_per_user_ppm, mean_purchase_value)"
            )
        )
        .orderBy("sample_pct")
    )


def _stability_sql() -> str:
    rows = " UNION ALL ".join(
        f"SELECT {p} AS sample_pct, u{p} AS n_users, p{p} AS n_purchases,"
        f" CAST(p{p} * 1000000 // u{p} AS BIGINT) AS purchases_per_user_ppm,"
        f" ROUND(CAST(s{p} AS DOUBLE) / p{p} / 1000000.0, 6)"
        f" AS mean_purchase_value FROM g"
        for p in STABILITY_PCTS
    )
    cols = ", ".join(
        f"CAST(COUNT(DISTINCT CASE WHEN bucket < {p} THEN user_id END) AS BIGINT) AS u{p},"
        f" CAST(SUM(CASE WHEN bucket < {p} AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p{p},"
        f" CAST(SUM(CASE WHEN bucket < {p} AND event_type = 'purchase' THEN v ELSE 0 END) AS BIGINT) AS s{p}"
        for p in STABILITY_PCTS
    )
    return f"""
        WITH ev AS (
            SELECT user_id, event_type,
                   CAST(floor(value * 1000000) AS BIGINT) AS v,
                   ((((user_id % 2147483648) + 2147483648) % 2147483648)
                    * 2654435761) % 4294967296 % 100 AS bucket
            FROM events
        ), g AS (SELECT {cols} FROM ev)
        {rows}
        ORDER BY sample_pct
    """


QUERIES["subsample_stability"] = subsample_stability
ORACLE_SQL["subsample_stability"] = _stability_sql()
