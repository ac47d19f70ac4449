"""Word count — the reference's one bundled application, Spark-first.

Reference pipeline (``/root/reference/src/app/wc.rs:6-17`` driven by
``src/mr/worker.rs``): read text file → regex-strip punctuation →
whitespace split → emit ``(word, "1")`` → hash-shuffle every
occurrence → per-partition sort → sort-based group → count.

Spark-first re-expression: pure built-ins, so Catalyst plans a
partial+final hash aggregate — the map-side combine the reference
lacks (it shuffles one record per word occurrence, wc.rs:11). At
100 TB this is the difference between shuffling ~tokens bytes and
shuffling ~distinct-words bytes per partition.

Semantics pinned per SURVEY.md §4: reference tokenizer rules
(case-sensitive, ``\\w`` keeps digits/underscore), but CORRECT
grouping — the reference drops the last key group per reduce
partition (worker.rs:169-184); we do not replicate that bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_rust_spark.functions.text import tokens
from mapreduce_rust_spark.tables import load_table


def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) per token over documents.text (O1-O10 composed)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs
        .select(F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


WORD_COUNT_ORACLE = """
SELECT token, COUNT(*) AS cnt
FROM (
  SELECT UNNEST(regexp_split_to_array(
           regexp_replace(text, '[^\\w\\s]', '', 'g'), '\\s+')) AS token
  FROM documents
)
WHERE token <> ''
GROUP BY token
"""


def word_count_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word_count + global key sort — the reference's ``run.sh``
    post-process (``cat mr-* | sort``) as a range-partitioned Spark
    sort instead of a single-node cat."""
    return word_count(spark, sf_dir).orderBy("token")


WORD_COUNT_SORTED_ORACLE = WORD_COUNT_ORACLE + " ORDER BY token"
