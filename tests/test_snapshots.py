"""Versioned parquet tables: commit protocol, time travel, CDC diff,
vacuum."""

import os

import pytest
from pyspark.sql import functions as F

from skdist_spark.sources.snapshots import (
    read_snapshot,
    snapshot_diff,
    snapshot_versions,
    vacuum_snapshots,
    write_snapshot,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "id bigint, v string")


def test_snapshot_write_read_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = write_snapshot(_frame(spark, [(1, "a"), (2, "b")]), path)
    v2 = write_snapshot(_frame(spark, [(1, "a2"), (3, "c")]), path)
    assert (v1, v2) == (1, 2)
    assert snapshot_versions(path) == [1, 2]
    latest = {r["id"]: r["v"] for r in read_snapshot(spark, path).collect()}
    assert latest == {1: "a2", 3: "c"}
    old = {r["id"]: r["v"] for r in read_snapshot(spark, path, 1).collect()}
    assert old == {1: "a", 2: "b"}
    with pytest.raises(ValueError):
        read_snapshot(spark, path, 99)


def test_snapshot_uncommitted_invisible(spark, tmp_path):
    """Files landed without a manifest commit must not be readable
    through the snapshot API."""
    path = str(tmp_path / "tbl")
    write_snapshot(_frame(spark, [(1, "a")]), path)
    # simulate a crashed writer: v=2 files exist, manifest not updated
    _frame(spark, [(9, "x")]).write.parquet(os.path.join(path, "v=2"))
    assert snapshot_versions(path) == [1]
    assert {r["id"] for r in read_snapshot(spark, path).collect()} == {1}


def test_snapshot_diff_cdc(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_snapshot(_frame(spark, [(1, "a"), (2, "b"), (3, "c")]), path)
    write_snapshot(_frame(spark, [(1, "a"), (2, "B"), (4, "d")]), path)
    diff = {
        r["id"]: r["change_type"]
        for r in snapshot_diff(spark, path, 1, 2, ["id"]).collect()
    }
    assert diff == {2: "update", 3: "delete", 4: "insert"}


def test_vacuum_drops_old_versions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for i in range(4):
        write_snapshot(_frame(spark, [(i, "x")]), path)
    removed = vacuum_snapshots(path, keep_last=2)
    assert removed == [1, 2]
    assert snapshot_versions(path) == [3, 4]
    assert not os.path.exists(os.path.join(path, "v=1"))
    assert {r["id"] for r in read_snapshot(spark, path, 3).collect()} == {2}
    with pytest.raises(ValueError):
        read_snapshot(spark, path, 1)


def test_schema_drift_report(spark, tmp_path):
    path = str(tmp_path / "tbl")
    old = spark.createDataFrame(
        [(1, "a", None), (2, None, None)], "id bigint, v string, gone string"
    )
    new = spark.createDataFrame(
        [(1, 1.5, "x"), (2, 2.5, None)], "id bigint, v double, fresh string"
    )
    write_snapshot(old, path)
    write_snapshot(new, path)
    from skdist_spark.sources.snapshots import schema_drift_report

    rep = {r["column"]: r.asDict() for r in schema_drift_report(spark, path, 1, 2).collect()}
    assert rep["id"]["status"] == "ok"
    assert rep["v"]["status"] == "type_changed"
    assert (rep["v"]["old_type"], rep["v"]["new_type"]) == ("string", "double")
    assert rep["gone"]["status"] == "removed" and rep["gone"]["new_null_ppm"] is None
    assert rep["fresh"]["status"] == "added" and rep["fresh"]["new_null_ppm"] == 500000
    assert rep["v"]["old_null_ppm"] == 500000 and rep["gone"]["old_null_ppm"] == 1000000
