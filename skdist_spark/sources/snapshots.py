"""Versioned parquet tables: snapshot writes, time-travel reads,
snapshot diffs, and vacuum — the lakehouse-format primitives (Delta/
Iceberg-style) expressed over plain parquet directories.

Layout: ``<table>/v=<N>/part-*.parquet`` plus a tiny ``_manifest.json``
recording the committed versions in order.  A snapshot write lands its
files under the NEXT version directory and commits by rewriting the
manifest last — readers resolving through the manifest never see a
half-written snapshot (the parquet files are invisible until the
manifest names them), which is the same commit protocol the real table
formats use, minus compaction/ACID edge cases.

Scale posture: the manifest is O(versions) bytes of driver-side JSON;
data reads/writes are ordinary distributed parquet jobs; a snapshot
diff is one full-outer join on the key — shuffle bounded by the two
snapshots, no driver data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_manifest.json"


def _read_manifest(path: str) -> list[int]:
    mf = os.path.join(path, _MANIFEST)
    if not os.path.exists(mf):
        return []
    with open(mf) as f:
        return list(json.load(f)["versions"])


def _write_manifest(path: str, versions: list[int]) -> None:
    mf = os.path.join(path, _MANIFEST)
    tmp = mf + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"versions": versions}, f)
    os.replace(tmp, mf)  # atomic commit


def write_snapshot(df: DataFrame, path: str) -> int:
    """Write ``df`` as the next snapshot of the table at ``path``;
    returns the new version number.  The manifest commit is the LAST
    step, so concurrent readers either see the old table or the new
    one — never a partial write."""
    versions = _read_manifest(path)
    v = (versions[-1] + 1) if versions else 1
    df.write.mode("errorifexists").parquet(os.path.join(path, f"v={v}"))
    _write_manifest(path, versions + [v])
    return v


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a table snapshot: the latest committed version by default,
    or any retained historical ``version`` (time travel)."""
    versions = _read_manifest(path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots at {path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in manifest {versions}")
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def snapshot_versions(path: str) -> list[int]:
    """Committed versions, oldest first."""
    return _read_manifest(path)


def snapshot_diff(
    spark: SparkSession,
    path: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
) -> DataFrame:
    """Change-data feed between two snapshots: one row per changed key
    with change_type in (insert, delete, update).

    One full-outer join on the key; rows equal on all non-key columns
    drop out (md5 of the canonical struct compares them engine-side,
    no column list needed at call sites).
    """
    old = read_snapshot(spark, path, v_old)
    new = read_snapshot(spark, path, v_new)
    val_cols = [c for c in new.columns if c not in key_cols]
    digest = F.md5(F.to_json(F.struct(*[F.col(c) for c in val_cols])))
    o = old.select(*key_cols, digest.alias("old_digest"))
    n = new.select(*key_cols, digest.alias("new_digest"))
    return (
        o.join(n, key_cols, "full_outer")
        .withColumn(
            "change_type",
            F.when(F.col("old_digest").isNull(), F.lit("insert"))
            .when(F.col("new_digest").isNull(), F.lit("delete"))
            .when(F.col("old_digest") != F.col("new_digest"), F.lit("update")),
        )
        .where(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
        .orderBy(*key_cols)
    )


def vacuum_snapshots(path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the last ``keep_last`` snapshots: manifest commit
    FIRST (readers immediately stop resolving the old versions), then
    the orphaned directories are deleted.  Returns removed versions."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = _read_manifest(path)
    keep = versions[-keep_last:]
    drop = [v for v in versions if v not in keep]
    _write_manifest(path, keep)
    for v in drop:
        shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)
    return drop


def schema_drift_report(
    spark: SparkSession, path: str, v_old: int, v_new: int
) -> DataFrame:
    """Data-contract drift between two snapshots: per column, whether
    it was added / removed / type-changed, plus exact null-rate ppm on
    each side — the check a pipeline runs before promoting a snapshot
    ("did upstream silently break the contract?").

    Schema comparison is footer metadata (driver-side, free); null
    rates are ONE aggregation pass per snapshot (conditional integer
    sums, map-side combined).  Returns a tiny frame ordered by column.
    """
    old = read_snapshot(spark, path, v_old)
    new = read_snapshot(spark, path, v_new)
    old_types = dict(old.dtypes)
    new_types = dict(new.dtypes)

    def _null_ppm(df: DataFrame, cols: list[str]) -> dict[str, int]:
        if not cols:
            return {}
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.sum(F.expr(f"CASE WHEN `{c}` IS NULL THEN 1 ELSE 0 END")).alias(c)
            for c in cols
        ]
        row = df.agg(*aggs).collect()[0]
        n = max(row["_n"], 1)
        return {c: int(row[c] * 1_000_000 // n) for c in cols}

    old_ppm = _null_ppm(old, list(old_types))
    new_ppm = _null_ppm(new, list(new_types))
    rows = []
    for c in sorted(set(old_types) | set(new_types)):
        if c not in old_types:
            status = "added"
        elif c not in new_types:
            status = "removed"
        elif old_types[c] != new_types[c]:
            status = "type_changed"
        else:
            status = "ok"
        rows.append(
            (
                c,
                status,
                old_types.get(c),
                new_types.get(c),
                old_ppm.get(c),
                new_ppm.get(c),
            )
        )
    return spark.createDataFrame(
        rows,
        "column string, status string, old_type string, new_type string, "
        "old_null_ppm long, new_null_ppm long",
    )
