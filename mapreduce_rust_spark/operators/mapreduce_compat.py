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


def mr_sessionize_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the MapReduce contract with SECONDARY SORT:
    the shuffle delivers each user's event epochs in ascending order,
    so the reducer is a single O(1)-state pass (see
    ``run_job_secondary_sort``). The oracle is the same sessionization
    the declarative operator answers — proving the contract path and
    the Catalyst path agree."""
    from pyspark.sql import functions as F

    from mapreduce_rust_spark.core.apps import (
        sess_map, sess_reduce, sess_sort_key)
    from mapreduce_rust_spark.core.runner import run_job_secondary_sort

    ev = load_table(spark, sf_dir, "events")
    lines = (ev.select(F.concat_ws(",",
                                   F.col("user_id").cast("string"),
                                   F.col("ts").cast("long").cast("string"))
                       .alias("line"))
               .rdd.map(lambda r: r[0]))
    return run_job_secondary_sort(spark, lines, sess_map, sess_reduce,
                                  sort_key_fn=sess_sort_key,
                                  num_partitions=8)


MR_SESSIONIZE_ORACLE = """
WITH marked AS (
  SELECT user_id, s,
         CASE WHEN s - LAG(s) OVER (PARTITION BY user_id ORDER BY s) IS NULL
               OR s - LAG(s) OVER (PARTITION BY user_id ORDER BY s) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS s FROM events)
)
SELECT CAST(user_id AS VARCHAR) AS key,
       CAST(CAST(SUM(new_sess) AS BIGINT) AS VARCHAR) || ',' ||
       CAST(COUNT(*) AS VARCHAR) AS value
FROM marked GROUP BY user_id
"""
