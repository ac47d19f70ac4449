"""Source connectors beyond parquet (SURVEY.md §2b scans/sources).

The reference reads only whole text files with a fixed naming scheme
(worker.rs:65-77). Here every format goes through an explicit-schema
reader — schema inference is an extra full scan at 100 TB, so it's
reserved for interactive exploration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KV_TEXT_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("value", T.StringType()),
])


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-per-row text scan — the O1 equivalent. ``input_file_name``
    recovers the reference's map-split identity."""
    return (spark.read.text(path)
            .withColumn("split_file", F.input_file_name()))


def read_kv_text(spark: SparkSession, path: str) -> DataFrame:
    """Parse reference-framed 'key value' lines (the shuffle/output
    format of worker.rs:121,131) back into a KV DataFrame."""
    df = spark.read.text(path)
    parts = F.split(F.col("value"), " ", 2)
    return df.select(parts.getItem(0).alias("key"),
                     parts.getItem(1).alias("value"))


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = True) -> DataFrame:
    return spark.read.schema(schema).option("header", header).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC connector passthrough (no database in this container —
    exercised only when a driver jar + endpoint exist)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning story as parquet
    (vectorized reader, predicate pushdown, column pruning); the
    interchange format for Hive-ecosystem warehouses."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.orc(path)
