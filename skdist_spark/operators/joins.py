"""Reusable temporal join operators (DataFrame-in / DataFrame-out).

The fixed driver queries in ``plans.windows`` demonstrate these shapes
on the events table; this module is the user-facing API, generalized
to arbitrary inputs. Both operators avoid the nested-loop plans Spark
produces for raw inequality predicates:

- ``asof_join``: union both sides and take a running ``last(...)``
  window per key over the merged timeline — one shuffle on the key,
  linear in rows, skew-safe under AQE. (The classic alternative — an
  inequality join + groupBy max — is quadratic per key.)
- ``interval_join``: explode the left side into fixed-width time
  buckets covering the interval and equi-join on (key, bucket), then
  apply the exact predicate. Shuffle-join friendly; the bucket width
  trades duplication factor against candidate selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent PRIOR right row's
    values (per ``on`` key). ``strict=True`` excludes right rows at
    exactly the same instant (matches ``right_ts < left_ts``).

    Returns all left columns plus ``asof_<col>`` for each value col
    (default: the right timestamp itself).
    """
    if value_cols is None:
        value_cols = [right_ts]
    l_marked = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_marked = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        )
        .withColumn("__is_left", F.lit(0))
    )
    merged = l_marked.unionByName(r_marked, allowMissingColumns=True)
    # at equal timestamps: left rows sort BEFORE right rows when strict
    # (so the same-instant right row is outside the preceding frame)
    order = [F.col("__ts"), F.col("__is_left").desc() if strict else F.col("__is_left")]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = merged
    for c in value_cols:
        out = out.withColumn(
            f"asof_{c}", F.last(f"__v_{c}", ignorenulls=True).over(w)
        )
    return out.where(F.col("__is_left") == 1).drop(
        "__is_left", "__ts", *[f"__v_{c}" for c in value_cols]
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
) -> DataFrame:
    """Inner join of left x right where ``right_ts`` falls within
    ``[left_ts + lower_s, left_ts + upper_s]`` seconds and the ``on``
    keys match. Implemented as a bucketed equi-join (bucket width =
    interval span) plus the exact microsecond predicate — never a
    broadcast nested loop.
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    width_us = max(1, int(round((upper_s - lower_s) * 1_000_000)))
    lo_us = int(round(lower_s * 1_000_000))
    hi_us = int(round(upper_s * 1_000_000))

    l_us = left.withColumn("__l_us", F.unix_micros(F.col(left_ts)))
    # candidate buckets of the shifted window [l+lo, l+hi]: its span is
    # one bucket width, so it overlaps at most 2 consecutive buckets
    l_exploded = l_us.withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    ((F.col("__l_us") + lo_us) / width_us).cast("long"),
                    ((F.col("__l_us") + hi_us) / width_us).cast("long"),
                )
            )
        ),
    )
    r_us = right.select(
        F.col(on).alias("__r_on"),
        F.unix_micros(F.col(right_ts)).alias("__r_us"),
        *[F.col(c) for c in right.columns if c not in (on, right_ts)],
    ).withColumn("__bucket", (F.col("__r_us") / width_us).cast("long"))
    joined = l_exploded.join(
        r_us,
        (F.col(on) == F.col("__r_on")) & (l_exploded["__bucket"] == r_us["__bucket"]),
    ).where(
        (F.col("__r_us") >= F.col("__l_us") + lo_us)
        & (F.col("__r_us") <= F.col("__l_us") + hi_us)
    )
    return joined.withColumn(
        f"right_{right_ts}", F.timestamp_micros(F.col("__r_us"))
    ).drop("__l_us", "__r_us", "__bucket", "__r_on")
