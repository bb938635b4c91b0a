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
