"""Audit every oracle_sql() entry for DuckDB result types that Spark
cannot emit (HUGEINT from SUM over integers being the known offender):
the driver's value-hash is representation-strict, so a HUGEINT column
hash-mismatches Spark's BIGINT even when values are identical.

Usage: python tools/oracle_type_audit.py [sf_dir]
Prints one line per hazardous column; exit 0 if clean.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Types Spark SQL can produce. Anything else in an oracle result is a hazard.
OK_TYPES = {
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "FLOAT",
    "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE",
    "BLOB", "TIMESTAMP_NS",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    bad = 0
    oracles = entry_mod.oracle_sql()
    for name, sql in oracles.items():
        try:
            rel = con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
            desc = rel.description
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            bad += 1
            continue
        # description gives python DBAPI types; use DESCRIBE for SQL types
        try:
            rows = con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR-DESCRIBE {name}: {exc}")
            bad += 1
            continue
        for col, sql_type, *_ in rows:
            base = sql_type.split("(")[0].strip().upper()
            full = sql_type.strip().upper()
            if base == "DECIMAL":
                continue  # Spark has decimals; precision checked by driver schema
            if full not in OK_TYPES and base not in OK_TYPES:
                print(f"HAZARD {name}.{col}: {sql_type}")
                bad += 1
    print(f"# audited {len(oracles)} oracles, {bad} hazards")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
