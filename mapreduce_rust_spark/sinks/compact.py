"""Small-file compaction — the lakehouse maintenance operator.

Streaming ingestion and fine-grained partitioning leave behind
thousands of KB-scale parquet files; at 100 TB the file-listing and
task-scheduling overhead of millions of tiny files dominates query
time long before the data does. ``compact_parquet`` rewrites a
dataset into ~``target_bytes`` files, sized from the ACTUAL on-disk
bytes (not a guessed partition count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

TARGET_BYTES = 128 * 1024 * 1024  # one comfortable HDFS/S3 block per file


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_bytes: int = TARGET_BYTES) -> int:
    """Rewrite ``src`` (parquet dir) into ``dst`` with
    ceil(bytes/target) files; returns the file count. Uses
    ``coalesce`` (narrow — no shuffle) since compaction only merges:
    the common case is many-small → few-large. On a cluster, run per
    partition-directory so each rewrite is independent and
    restartable."""
    n_bytes = _dir_bytes(src)
    n_files = max(1, -(-n_bytes // target_bytes))
    df = spark.read.parquet(src)
    df.coalesce(n_files).write.mode("overwrite").parquet(dst)
    return n_files
