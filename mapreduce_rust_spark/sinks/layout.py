"""Multi-dimensional data layout (Z-order clustering) for parquet.

A 100 TB table answers range queries through row-group min/max
statistics: a scan skips every row group whose [min, max] envelope
misses the predicate. A linear sort gives perfect envelopes on ONE
column and useless ones on every other; interleaving the bits of two
(or more) rank-bucketed columns — a Z-order / Morton curve — gives
every clustered column partially-tight envelopes, so multi-dimension
range predicates prune on all of them at once. Same layout lever as
Delta's OPTIMIZE ZORDER BY, built from plain DataFrame ops:
quantile-bucket each column → interleave bits → repartitionByRange
on the curve key → sortWithinPartitions → write.

Normalization is QUANTILE-based (approxQuantile boundaries), not
equi-width min/max scaling: real columns are skewed, and equi-width
collapses most rows into a few buckets, destroying the curve (this
is measurable on the fixture's ``events.value``). The boundaries are
a tiny driver-side list (2^bits floats per column, from one
sampling pass — the same mechanism repartitionByRange uses); bucket
assignment is a single JVM higher-order-function expression over the
literal boundary array — count of boundaries ≤ value — so rows never
leave codegen. At 100 TB, feed boundaries from table statistics
instead of the sampling pass; the curve math is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 6  # per-column resolution: 64 rank buckets, 12-bit curve key


def interleave_bits(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two already-bucketed non-negative ints
    (each < 2**bits): bit i of x lands at position 2i, bit i of y at
    2i+1. Pure shift/mask expression — no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def rank_bucket(col: Column, boundaries: list[float]) -> Column:
    """Bucket id = number of boundaries ≤ value, via one
    higher-order ``aggregate`` over the literal boundary array —
    JVM-side, O(len(boundaries)) per row, no UDF and no join."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr, F.lit(0),
        lambda acc, b: acc + F.when(col >= b, 1).otherwise(0),
    ).cast("long")


def _as_num(df: DataFrame, c: str) -> Column:
    dt = dict(df.dtypes)[c]
    if dt.startswith("timestamp"):
        return F.col(c).cast("long").cast("double")
    return F.col(c).cast("double")


def write_zordered(df: DataFrame, path: str, col_x: str, col_y: str,
                   n_files: int, bits: int = Z_BITS) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    (col_x, col_y). Numeric/timestamp columns (timestamps cluster on
    epoch seconds). One approxQuantile sampling pass for boundaries,
    one range shuffle on the curve key, sorted row groups per file."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    num = df.select(_as_num(df, col_x).alias("_x"),
                    _as_num(df, col_y).alias("_y"))
    bx, by = num.approxQuantile(["_x", "_y"], probs, 0.001)
    z = interleave_bits(rank_bucket(_as_num(df, col_x), bx),
                        rank_bucket(_as_num(df, col_y), by), bits)
    (df.withColumn("_zkey", z)
       .repartitionByRange(n_files, "_zkey")
       .sortWithinPartitions("_zkey")
       .drop("_zkey")
       .write.mode("overwrite").parquet(path))
