"""Table catalog over the driver-generated parquet fixtures.

The reference reads whole text files with a fixed naming scheme
(``data/gut-{map_task_id}.txt``, worker.rs:65-77); here the source
layer is columnar parquet so Catalyst gets predicate pushdown and
column pruning for free. ``load_table`` is the single scan entry
point every operator goes through.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor —
# TPC-H dims grow sub-linearly or not at all (region=5, nation=25).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table (pushdown/pruning capable).

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects; read it as long nanos (legacy conf, runtime-settable)
    and convert with integer division — ns epochs ≈ 1.7e18 overflow
    double precision, so no float math on the raw value.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (spark.read.parquet(table_path(sf_dir, name))
                .withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)")))
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
