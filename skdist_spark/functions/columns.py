"""Column-expression builders. Each returns a pyspark Column (or SQL
expression string) and encodes one of the engine's determinism or
scale idioms; see the module docstrings that consume them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Knuth multiplicative hash constants (portable BIGINT arithmetic —
# reproducible in any SQL engine, unlike xxhash64/rand)
KNUTH = 2654435761
MOD32 = 4294967296


def knuth_bucket(col: Column | str, buckets: int = 1000) -> Column:
    """Deterministic hash bucket in [0, buckets) from an integer id.
    The basis of stratified sampling and train/test splitting: pure
    BIGINT arithmetic, so membership is a property of the ROW — stable
    across retries, partitionings, dataset growth, and engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod((c.cast("bigint") * KNUTH) % MOD32, F.lit(buckets))


def decimal_money(col: Column | str, scale: int = 2) -> Column:
    """Cast a money column to DECIMAL before aggregation: decimal sums
    are exact and merge-order-independent, so a parallel Spark
    aggregation equals a serial oracle bit-for-bit after the final
    cast to double."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def epoch_micros_diff_seconds(later: Column | str, earlier: Column | str) -> Column:
    """Whole-second difference via integer MICROSECOND arithmetic.
    unix_timestamp() truncates each operand's sub-second part BEFORE
    subtracting (engine-dependent rounding); integer micros divided
    once cannot disagree between engines."""
    a = F.unix_micros(F.col(later) if isinstance(later, str) else later)
    b = F.unix_micros(F.col(earlier) if isinstance(earlier, str) else earlier)
    diff = a - b
    # exact integer division: numerator is a multiple of 1e6 <= 2^53,
    # so the double divide is exact before the bigint cast
    return ((diff - F.pmod(diff, F.lit(1_000_000))) / F.lit(1_000_000)).cast("bigint")


def ppm_of_rank(rank: Column, n: Column) -> Column:
    """percent_rank in parts-per-million via pure integer arithmetic
    ((rank-1)*1e6 div (n-1)); floor(double) drifts a ulp between
    engines when their doubles differ — integer div cannot."""
    num = (rank.cast("bigint") - 1) * 1_000_000
    den = n.cast("bigint") - 1
    return F.when(den > 0, (num - F.pmod(num, den)) / den).otherwise(0).cast("bigint")


def words_array(text_col: str = "text") -> str:
    """SQL expression for the whitespace token array with empties
    removed — materialize it as a column BEFORE shingling/aggregating
    so Catalyst never re-inlines the split per element."""
    return f"filter(split(trim({text_col}), '\\\\s+'), x -> x != '')"


def morton_value(cols: list[str], bits: int = 16) -> Column:
    """Z-order (Morton) interleave of non-negative integer columns —
    one fold expression, JVM codegen; see sources.io.zorder_by."""
    from ..sources.io import z_value

    return z_value(cols, bits)


def hilbert_index(x_col: str, y_col: str, bits: int = 16) -> Column:
    """2-D Hilbert curve index — higher-locality alternative to
    morton_value; one fold expression, JVM codegen; see
    sources.io.hilbert_order_by."""
    from ..sources.io import hilbert_value

    return hilbert_value(x_col, y_col, bits)
