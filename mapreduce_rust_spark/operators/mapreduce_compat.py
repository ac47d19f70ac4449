"""MapReduce-contract queries for the driver registry — the
reference's API (worker.rs:16-25) exercised end-to-end through
``run_job`` on the documents fixture."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_rust_spark.core.apps import wc_map, wc_reduce
from mapreduce_rust_spark.core.runner import run_job_df
from mapreduce_rust_spark.tables import load_table


def mr_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count via the generic contract (stringly-typed output,
    faithful to KeyValue{String,String}, src/lib.rs:9-15)."""
    docs = load_table(spark, sf_dir, "documents")
    return run_job_df(docs, "text", wc_map, wc_reduce, num_partitions=8)


MR_WORD_COUNT_ORACLE = """
SELECT token AS key, CAST(COUNT(*) AS VARCHAR) AS value
FROM (
  SELECT UNNEST(regexp_split_to_array(
           regexp_replace(text, '[^\\w\\s]', '', 'g'), '\\s+')) AS token
  FROM documents
)
WHERE token <> ''
GROUP BY token
"""
