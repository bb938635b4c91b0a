"""Local replica of the driver's oracle comparison: run a Spark query
and its DuckDB oracle SQL on the same parquet tables and compare
row-count + column names + order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb

from skdist_spark.sources.catalog import TABLES


# DuckDB result types Spark SQL can also produce.  Anything else (HUGEINT
# from SUM-over-INTEGER being the proven offender, CORRECTNESS_r02) breaks
# the driver's representation-strict value-hash even when values match —
# pandas normalization below erases the difference, so it is asserted on
# the DuckDB schema directly.
_DUCK_OK_TYPES = {
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "FLOAT",
    "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE",
    "TIMESTAMP_NS", "BLOB", "DECIMAL",
}


def _connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def assert_spark_expressible_types(sql: str, sf_dir: str, name: str = "?"):
    con = _connect(sf_dir)
    for col, sql_type, *_ in con.execute(
        f"DESCRIBE SELECT * FROM ({sql})"
    ).fetchall():
        base = sql_type.split("(")[0].strip().upper()
        assert base in _DUCK_OK_TYPES, (
            f"{name}.{col}: oracle returns {sql_type} — not Spark-expressible;"
            " the driver's representation-strict hash will mismatch"
            " (CAST the output column, e.g. AS BIGINT)"
        )


def run_oracle(sql: str, sf_dir: str):
    return _connect(sf_dir).execute(sql).fetchdf()


def _norm_cell(v):
    import datetime

    if v is None:
        return None
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        # Spark DateType -> pandas object-of-date; DuckDB DATE ->
        # datetime64 Timestamp: canonicalize both to midnight datetime
        return datetime.datetime.combine(v, datetime.time())
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # match on ~12 significant digits: decimal-exact contract should
        # make both sides bit-identical; this guards ulp noise only
        return float(f"{v:.12g}")
    return v


def _norm_rows(df):
    # sort columns by name (driver behavior), normalize floats/timestamps
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        norm = []
        for v in row:
            if isinstance(v, pd.Timestamp):
                v = v.to_pydatetime()
            if hasattr(v, "tolist"):  # numpy scalars/arrays
                v = v.tolist()
            if isinstance(v, list):
                v = tuple(_norm_cell(x) for x in v)
            else:
                v = _norm_cell(v)
            norm.append(v)
        rows.append(tuple(norm))
    return cols, sorted(rows, key=repr)


def compare_query(spark, query_fn, sql: str, sf_dir: str, name: str = "?"):
    assert_spark_expressible_types(sql, sf_dir, name)
    sdf = query_fn(spark, sf_dir).toPandas()
    ddf = run_oracle(sql, sf_dir)
    s_cols, s_rows = _norm_rows(sdf)
    d_cols, d_rows = _norm_rows(ddf)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} != {len(d_rows)}"
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"{name}: row {i} differs:\n  spark={a}\n  duck ={b}"
