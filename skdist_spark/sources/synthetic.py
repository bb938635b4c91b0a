"""Python DataSource (Spark 4 API): deterministic synthetic events.

The modern PySpark extension point for "my data isn't in a file" —
``pyspark.sql.datasource.DataSource`` subclasses plug a pure-Python
batch reader into the normal ``spark.read.format(...)`` path with
genuine partition-parallel reads (one Arrow-batched task per
``InputPartition``).  This source generates the same shape as the
catalog's events table, sized by options, for load tests and CI
fixtures that must not depend on driver-shipped files.

Determinism contract: row ``i`` is a pure function of ``i`` (Knuth
multiplicative hashing — the repo-wide no-rand() idiom), so any
(rows, partitions) split yields byte-identical data: re-reads,
speculative retries, and different parallelism all agree.

Usage:
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 100_000).option("partitions", 16).load())
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_KNUTH = 2654435761
_MOD32 = 4294967296

EVENT_TYPES = ("click", "purchase", "error", "signup", "view")
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_partitions = int(options.get("partitions", 8))
        self.users = int(options.get("users", 100))

    def partitions(self):
        per = -(-self.rows // self.n_partitions)  # ceil
        return [
            _Range(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            h = (i * _KNUTH) % _MOD32
            yield (
                i,
                _EPOCH + timedelta(seconds=i * 60 + h % 60),
                h % self.users,
                EVENT_TYPES[h % len(EVENT_TYPES)],
                round((h % 100_000) / 100.0, 2),
            )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


# ---- Streaming face ---------------------------------------------------
# The same deterministic generator as an unbounded micro-batch SOURCE
# (pyspark.sql.datasource.DataSourceStreamReader): offsets are plain
# row counters, each micro-batch covers [start, end) rows split into
# partition-parallel Arrow reads, and because row i is a pure function
# of i the STREAM produces byte-identical data to the batch face — the
# cross-face determinism the tests assert.

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class SyntheticEventsStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 1000))
        self.n_partitions = int(options.get("partitions", 4))
        self.users = int(options.get("users", 100))
        self._current = 0

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        self._current = min(self._current + self.rows_per_batch, self.max_rows)
        return {"offset": self._current}

    def partitions(self, start, end):
        lo, hi = start["offset"], end["offset"]
        if hi <= lo:
            return [_Range(lo, lo)]
        per = -(-(hi - lo) // self.n_partitions)  # ceil
        return [_Range(a, min(a + per, hi)) for a in range(lo, hi, per)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            h = (i * _KNUTH) % _MOD32
            yield (
                i,
                _EPOCH + timedelta(seconds=i * 60 + h % 60),
                h % self.users,
                EVENT_TYPES[h % len(EVENT_TYPES)],
                round((h % 100_000) / 100.0, 2),
            )

    def commit(self, end):
        pass  # offsets are pure counters; nothing to clean up


# ---- Python DataSource WRITER (Spark 4 API) ----------------------------
# The write-side extension point: ``df.write.format("jsonl_manifest")``
# lands one JSONL shard per task and the driver-side commit() writes a
# MANIFEST.json naming exactly the shards whose tasks succeeded — the
# atomic-visibility pattern (readers that honor the manifest never see
# half-written output; aborted task files are simply never listed).

import json as _json  # noqa: E402
import os as _os  # noqa: E402
import uuid as _uuid  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter, WriterCommitMessage,
)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_manifest requires a path option")
        self.overwrite = overwrite

    def write(self, rows):
        """Executor-side: one shard per task, named uniquely so a
        retried/speculative task never clobbers another attempt."""
        _os.makedirs(self.path, exist_ok=True)
        name = f"part-{_uuid.uuid4().hex}.jsonl"
        n = 0
        with open(_os.path.join(self.path, name), "w") as fh:
            for row in rows:
                fh.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _ShardCommit(name, n)

    def commit(self, messages):
        """Driver-side, after every task succeeded: the manifest names
        exactly the committed shards — the atomicity point."""
        shards = sorted(
            (m for m in messages if m is not None), key=lambda m: m.filename
        )
        manifest = {
            "shards": [
                {"file": m.filename, "n_rows": m.n_rows} for m in shards
            ],
            "n_rows": sum(m.n_rows for m in shards),
        }
        with open(_os.path.join(self.path, "MANIFEST.json"), "w") as fh:
            _json.dump(manifest, fh, indent=1)

    def abort(self, messages):
        """Failed job: leave no manifest; stray shards are invisible
        to manifest-honoring readers and cleaned by the next commit."""
        mpath = _os.path.join(self.path, "MANIFEST.json")
        if _os.path.exists(mpath):  # pragma: no cover - defensive
            _os.remove(mpath)


class JsonlManifestDataSource(DataSource):
    """``df.write.format("jsonl_manifest").option("path", ...)`` —
    see JsonlManifestWriter."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool) -> JsonlManifestWriter:
        return JsonlManifestWriter(self.options, overwrite)


def read_jsonl_manifest(spark, path: str):
    """Manifest-honoring reader: only shards named by MANIFEST.json are
    visible (uncommitted/aborted files are ignored by construction)."""
    with open(_os.path.join(path, "MANIFEST.json")) as fh:
        manifest = _json.load(fh)
    files = [_os.path.join(path, s["file"]) for s in manifest["shards"]]
    return spark.read.json(files) if files else None
