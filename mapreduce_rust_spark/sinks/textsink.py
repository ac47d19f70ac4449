"""Reference-framing text sink.

The reference writes one ``mr-{r}.txt`` per reduce partition with
``"{key} {value}\\n"`` lines, key-sorted within the partition
(worker.rs:167-179), then ``run.sh`` merges with ``cat mr-* | sort``.

Spark-first equivalents:

- ``write_kv_text(df, path, R)`` — R hash partitions, key-sorted
  within each, space-separated text (the per-partition files).
- ``write_kv_text(df, path, R, global_sort=True)`` — range-partitioned
  global sort, replacing the single-node ``cat | sort`` with a
  distributed TotalOrderPartitioner-style sort.

The space-separated framing inherits the reference's constraint that
keys/values contain no spaces (its parser asserts 2 fields,
worker.rs:100); the engine itself is format-clean parquet — only this
compat layer enforces reference framing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_kv_text(df: DataFrame, path: str, num_partitions: int = 8,
                  global_sort: bool = False) -> None:
    """Write a key/value DataFrame as reference-framed text files."""
    line = F.concat_ws(" ", F.col("key"), F.col("value")).alias("value")
    if global_sort:
        out = df.orderBy("key").select(line)
    else:
        out = (df.repartition(num_partitions, "key")
                 .sortWithinPartitions("key")
                 .select(line))
    out.write.mode("overwrite").text(path)


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   num_buckets: int = 8) -> None:
    """Persist ``df`` as a bucketed+sorted external table on ``key``:
    later equi-joins/aggs on ``key`` between co-bucketed tables read
    pre-partitioned scans with NO exchange (asserted in
    ``tests/test_skew_bucketing.py``) — the 100 TB co-location lever.
    """
    (df.write.mode("overwrite")
       .bucketBy(num_buckets, key).sortBy(key)
       .option("path", path)
       .saveAsTable(table))
