"""Column-level function library (pure ``pyspark.sql.functions``
compositions — JVM-side, whole-stage-codegen'd; no Python UDFs)."""

from __future__ import annotations


def spread(df, *key_cols: str):
    """Round-robin repartition to the session's default parallelism,
    immediately before an EXPENSIVE per-row stage (an Arrow codec
    kernel, a wide HOF fold, in-row pair generation).

    Round-12 measurement: the fixture tables are single-row-group
    parquet — one scan task no matter the split configs — and AQE
    coalesces tiny post-shuffle byte counts to ONE partition, so a
    compute-heavy downstream stage ran serially either way
    (jpeg_color_roundtrip: ~6 s of decode on one core inside a 6.4 s
    query; 1.4 s after spreading). Byte counts are the wrong cost
    proxy for per-row compute — guide §2.5's "unsplittable input"
    remedy is an explicit repartition after the read. It must be
    ROUND-ROBIN, not a hash on the stage's key: hash-repartitioning by
    the key an upstream aggregate already hashed on is recognised as
    redundant, collapsed into that aggregate's exchange, and
    AQE-coalesced right back to one partition (measured — the kernel
    stage kept running as a single 5.6 s task). Round-robin with an
    explicit partition count can be neither absorbed nor coalesced,
    and Spark's sort-before-repartition default keeps the
    row→partition map deterministic under retries.

    ``defaultParallelism`` tracks the cluster, so the same code
    spreads to the executor count at scale. Apply ONLY where per-row
    work dominates — for cheap stages the extra exchange costs more
    than it saves. ``key_cols`` documents the stage key at the call
    site; it is intentionally unused."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)
