"""Distributed ALS matrix factorization (collaborative filtering).

The recommender face the item-item cosine query (`part_cf_similarity`,
plans/tpch.py) cannot give: latent user/item factors trained by
alternating least squares, fully data-parallel — each half-sweep
re-solves one side's factors from the other side's, one small k x k
normal-equation solve per entity, executed as an Arrow-batched
``applyInPandas`` over the entities' rating groups.

Spark-first shape (NOT a driver loop over users):
- ratings stay distributed; each half-sweep is
  join(ratings, other-side factors on the other-side key)
  -> groupBy(this-side key) -> applyInPandas(solve k x k).
- The other side's factor table is a normal DataFrame: Spark
  broadcasts it when small (AQE decides), shuffles on the join key
  when not — at 100 TB of ratings both sides scale out; nothing is
  ever collected to the driver.
- k*k normal equations accumulate in ITEM-SORTED order inside each
  group, so the float fold is deterministic and the distributed
  result is bit-equal to a serial numpy replay (tests assert this).

Determinism: init factors are a pure hash function of (id, j) —
Knuth multiplicative, the same integers on any engine — and every
solve consumes its ratings in sorted key order.

Reference note: sk-dist has no recommender; this extends the repo's
ML surface the way DistKMeans does (clustering.py), with the same
partial-aggregate discipline.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from ..sources.catalog import load_table

ALS_K = 4          # latent dimensions
ALS_REG = 0.1      # L2 regularization (lambda)
ALS_SWEEPS = 2     # full alternations (item solve + user solve each)
# Broadcast a factor table into the ratings join when the entity count
# is bounded (guide posture: broadcast the side that fits — a factor
# table is k doubles per entity, ~40 B/row, so 1M rows is ~40 MB
# payload).  mapInPandas output has no size statistics, so the planner
# can NEVER pick this join by itself; above the bound the sort-merge
# join is kept (factor sides at true scale are data-sized).
ALS_BROADCAST_MAX_ROWS = 1_000_000
# Scale-adaptive parallelism for the per-entity gather aggregation:
# each half-sweep collects (fid, rating, ff) structs per entity, and
# an ObjectHashAggregate over a core-count-constant partition count
# concentrates the WHOLE ratings relation into ~32 object maps — at
# the third scale decade (sf10, ~60M lineitem rows) that OOMs the
# executor pool.  The solve partition count is instead derived from
# the (already-paid) bounded ratings count so each aggregation task
# holds ~ALS_ROWS_PER_SOLVE_PART rating structs regardless of scale;
# at bench scale (sf0.1) the derived count equals the session default,
# so local plans and timings are unchanged.
ALS_ROWS_PER_SOLVE_PART = 250_000
_KNUTH = 2654435761
_MOD = 2**32


def _init_factors_np(ids: np.ndarray, k: int = ALS_K) -> np.ndarray:
    """Deterministic pseudo-random init in [-0.05, 0.05): a pure
    function of (id, j) so every engine and the serial replay agree."""
    ids = ids.astype(np.uint64).reshape(-1, 1)
    j = np.arange(k, dtype=np.uint64).reshape(1, -1)
    h = (ids * np.uint64(_KNUTH) + j * np.uint64(40503)) % np.uint64(_MOD)
    return (h.astype(np.float64) / _MOD - 0.5) * 0.1


def _solve_side(
    ratings: DataFrame,
    solve_col: str,
    fixed_col: str,
    fixed_factors: DataFrame,
    k: int = ALS_K,
    reg: float = ALS_REG,
    broadcast_fixed: bool = False,
    solve_parts: int | None = None,
) -> DataFrame:
    """One ALS half-sweep: re-solve ``solve_col``'s factors given
    ``fixed_col``'s.  join -> groupBy(solve_col) -> k x k solve.

    ``broadcast_fixed``: hash-join the factor table into the ratings
    scan instead of shuffling both sides (caller asserts the factor
    side is bounded).  With ratings pre-partitioned by ``solve_col``
    the groupBy then reuses that partitioning and the half-sweep runs
    with ZERO new exchanges; join strategy cannot change values — the
    per-entity fold order is canonicalized by the fid-sorted collect.

    Above the broadcast bound (r9): the caller pre-partitions the
    ratings by the FIXED key instead, and the factor join is forced to
    a SHUFFLED-HASH join — the entity-sized factor table shuffles to
    the ratings' existing layout while the ratings relation neither
    moves nor sorts (the r8 shape was a sort-merge join that re-sorted
    the whole ratings relation every half-sweep).  Each half-sweep
    then moves the ratings exactly once (the solve-key gather below) —
    the §2.4 floor for alternating solves.

    ``solve_parts``: on the NON-broadcast path, repartition the joined
    ratings by ``solve_col`` to this count before the gather, so the
    aggregation runs complete-mode over data-sized parallelism (each
    task holds its own entities only) instead of pushing the whole
    relation through a core-count-constant partial ObjectHashAggregate
    — the map-side object maps are what OOM at the third decade."""
    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("factors", ArrayType(DoubleType())),
        ]
    )
    # One JVM-side collect_list per entity (sorted -> deterministic
    # accumulation order), then mapInPandas solves MANY entities per
    # Arrow batch: groups can never split across batches (group == one
    # row) and the per-group pandas/groupBy machinery disappears —
    # measured ~5x over a per-group applyInPandas at sf0.01.
    # Arrow ships FLAT numeric arrays (ratings vector + row-major
    # factor matrix), not structs — a list<struct> column surfaces as
    # per-row Python dicts in pandas and the conversion dwarfs the
    # k x k solves.  The fid-sorted struct collect fixes the fold
    # order; the projection then strips the structs away.
    fixed = fixed_factors.select(
        F.col("id").alias(fixed_col), F.col("factors").alias("ff")
    )
    if broadcast_fixed:
        fixed = F.broadcast(fixed)
    else:
        # entity-sized side shuffles onto the ratings' fixed-key
        # layout; never sort-merge (ratings-sized sort per half-sweep)
        fixed = fixed.hint("shuffle_hash")
    joined = ratings.join(fixed, fixed_col)
    if solve_parts and not broadcast_fixed:
        joined = joined.repartition(solve_parts, solve_col)
    grouped = (
        joined
        .groupBy(F.col(solve_col).alias("sid"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(fixed_col).alias("fid"),
                        F.col("rating"),
                        F.col("ff"),
                    )
                )
            ).alias("grp")
        )
        .select(
            "sid",
            F.expr("transform(grp, g -> g.rating)").alias("rv"),
            F.expr("flatten(transform(grp, g -> g.ff))").alias("qflat"),
        )
    )

    eye = reg * np.eye(k)

    def solve_batch(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            ids = pdf["sid"].values
            facs = []
            for rv_a, q_a in zip(pdf["rv"].values, pdf["qflat"].values):
                # rows arrive fid-sorted; Q rows accumulate in that
                # order on every engine (Q.T @ Q == the replay's fold)
                rv = np.asarray(rv_a, dtype=np.float64)
                Q = np.asarray(q_a, dtype=np.float64).reshape(len(rv), k)
                A = Q.T @ Q + len(rv) * eye
                facs.append(np.linalg.solve(A, Q.T @ rv).tolist())
            yield pd.DataFrame({"id": ids, "factors": facs})

    return grouped.mapInPandas(solve_batch, out_schema)


def als_train(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    k: int = ALS_K,
    reg: float = ALS_REG,
    sweeps: int = ALS_SWEEPS,
) -> tuple[DataFrame, DataFrame]:
    """Train ALS factors; returns (user_factors, item_factors), each
    (id, factors array<double>).  Item factors start at the hash init;
    each sweep solves users-given-items then items-given-users.
    Factor tables are localCheckpointed per half-sweep so the lineage
    (and the recomputation cost) stays flat across sweeps.
    """
    # the ratings relation feeds every half-sweep (and usually an RMSE
    # pass after) — materialize it once so its upstream plan (joins,
    # aggregations, parquet scans) doesn't re-execute per sweep
    r = ratings.select(
        F.col(user_col).cast("long").alias("u"),
        F.col(item_col).cast("long").alias("i"),
        F.col(rating_col).cast("double").alias("rating"),
    ).localCheckpoint(eager=False)

    init_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("factors", ArrayType(DoubleType())),
        ]
    )

    def init_batch(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            ids = pdf["id"].values
            yield pd.DataFrame(
                {
                    "id": ids,
                    "factors": list(_init_factors_np(ids, k)),
                }
            )

    item_factors = (
        r.select(F.col("i").alias("id"))
        .distinct()
        .mapInPandas(init_batch, init_schema)
        .localCheckpoint(eager=False)
    )
    # Entity counts decide the join strategy for every half-sweep (and
    # are bounded driver scalars).  When a factor side fits the
    # broadcast bound, pre-partition the ratings by the SOLVE key once:
    # the broadcast join preserves that partitioning, so the groupBy
    # behind every subsequent solve of that side reuses the exchange —
    # the half-sweep moves no ratings at all (2 upfront shuffles
    # replace 2 per half-sweep).
    n_items = item_factors.count()
    n_users = r.select("u").distinct().count()
    bc_items = n_items <= ALS_BROADCAST_MAX_ROWS
    bc_users = n_users <= ALS_BROADCAST_MAX_ROWS
    # data-derived gather parallelism (bounded scalar; r is already
    # materialized by the counts above) — equals the session default
    # at bench scale, grows with the ratings relation past it
    spark = r.sparkSession
    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_ratings = r.count()
    solve_parts = max(
        base_parts, -(-n_ratings // ALS_ROWS_PER_SOLVE_PART)
    )
    # The user-solve input: under the broadcast bound, partitioned by
    # the SOLVE key (the broadcast join preserves it, so the gather
    # reuses the exchange and the half-sweep moves nothing); above the
    # bound, partitioned by the FIXED key (the shuffled-hash factor
    # join then needs no ratings exchange or sort, and the gather's
    # solve-key repartition is the half-sweep's single ratings move).
    # Both sweeps' solves of a side reuse the same stored layout.
    r_u = (
        r.repartition(solve_parts, "u" if bc_items else "i")
        .localCheckpoint(eager=False)
    )
    r_i = (
        r.select(F.col("i"), F.col("u"), "rating")
        .repartition(solve_parts, "i" if bc_users else "u")
        .localCheckpoint(eager=False)
    )
    user_factors = None
    for _ in range(sweeps):
        user_factors = _solve_side(
            r_u,
            "u",
            "i",
            item_factors,
            k,
            reg,
            broadcast_fixed=bc_items,
            solve_parts=solve_parts,
        ).localCheckpoint(eager=False)
        item_factors = _solve_side(
            r_i,
            "i",
            "u",
            user_factors,
            k,
            reg,
            broadcast_fixed=bc_users,
            solve_parts=solve_parts,
        ).localCheckpoint(eager=False)
    return user_factors, item_factors


def als_rmse(
    ratings: DataFrame,
    user_factors: DataFrame,
    item_factors: DataFrame,
    user_col: str = "u",
    item_col: str = "i",
    broadcast_factors: bool | None = None,
) -> DataFrame:
    """Training RMSE of the factor model — the fit readout.  Dot
    products run JVM-side (zip_with + aggregate); one exact COUNT and
    one DOUBLE sum of squared errors.

    ``broadcast_factors``: hash-join the (bounded) factor tables into
    the ratings scan — None decides from their row counts (cheap: both
    are checkpointed k-double-per-entity frames)."""
    if broadcast_factors is None:
        broadcast_factors = (
            user_factors.count() <= ALS_BROADCAST_MAX_ROWS
            and item_factors.count() <= ALS_BROADCAST_MAX_ROWS
        )
    uf_t = user_factors.select(F.col("id").alias("u"), F.col("factors").alias("uf"))
    if_t = item_factors.select(F.col("id").alias("i"), F.col("factors").alias("if_"))
    if broadcast_factors:
        uf_t, if_t = F.broadcast(uf_t), F.broadcast(if_t)
    else:
        # entity-sized build sides; stream the ratings without sorting
        # them twice (the default was two ratings-sized sort-merge
        # joins above the broadcast bound)
        uf_t, if_t = uf_t.hint("shuffle_hash"), if_t.hint("shuffle_hash")
    r = ratings.select(
        F.col(user_col).cast("long").alias("u"),
        F.col(item_col).cast("long").alias("i"),
        F.col("rating").cast("double").alias("rating"),
    )
    j = (
        r.join(uf_t, "u")
        .join(if_t, "i")
        .select(
            "rating",
            F.expr(
                "aggregate(zip_with(uf, if_, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"
            ).alias("pred"),
        )
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_ratings"),
        F.round(
            F.sqrt(F.avg((F.col("rating") - F.col("pred")) ** 2)), 6
        ).alias("rmse"),
    )


def als_recommend_topk(
    user_factors: DataFrame,
    item_factors: DataFrame,
    seen: DataFrame | None = None,
    top_k: int = 1,
) -> DataFrame:
    """Top-k unseen items per user by factor dot product.  The item
    side is broadcast (item catalogs are small next to interaction
    logs); scoring is map-side; ranking is one user-keyed window."""
    from pyspark.sql import Window

    scored = user_factors.select(
        F.col("id").alias("u"), F.col("factors").alias("uf")
    ).crossJoin(
        F.broadcast(
            item_factors.select(F.col("id").alias("i"), F.col("factors").alias("if_"))
        )
    ).select(
        "u",
        "i",
        F.expr(
            "aggregate(zip_with(uf, if_, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"
        ).alias("score"),
    )
    if seen is not None:
        scored = scored.join(
            seen.select(F.col("u"), F.col("i")).distinct(),
            ["u", "i"],
            "left_anti",
        )
    w = Window.partitionBy("u").orderBy(F.desc("score"), F.asc("i"))
    return (
        scored.select("u", "i", "score", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= top_k)
        .select(
            F.col("u").alias("user"),
            F.col("i").alias("item"),
            F.round("score", 6).alias("score"),
            "rank",
        )
    )


def ml_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: ALS on the customer x part quantity matrix from
    lineitem (rating = total quantity ordered), 4 factors, 2 sweeps;
    emits the model's training RMSE and rating count — a scale-stable
    one-row readout of the distributed training loop."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    ratings = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        # quantities are integral: exact integer sum, THEN one cast, so
        # the rating matrix is identical on every engine / fold order
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("rating")
        )
    )
    ratings = ratings.localCheckpoint(eager=False)  # shared by train + RMSE
    uf, itf = als_train(ratings, "u", "i", "rating")
    return als_rmse(ratings, uf, itf)


QUERIES = {"ml_als_recommend": ml_als_recommend}
ORACLE_SQL: dict[str, str] = {}
