"""Custom batch UDAF via grouped-map Pandas (SURVEY.md §2b UDF/UDAF
row) — the operator shape for aggregates Spark's built-ins can't
express. Arrow-batched: each group arrives as one pandas DataFrame;
state never crosses groups, so it scales with group count.

No SQL oracle: the numpy accumulation order differs from any SQL
engine's at the ulp level, which is exactly why bespoke UDAFs get
reference-implementation tests (``tests/test_udaf.py``) instead of
hash comparison.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from mapreduce_rust_spark.tables import load_table

OUT_SCHEMA = "c_mktsegment string, n long, gini double"


def _gini(pdf: pd.DataFrame) -> pd.DataFrame:
    """Gini coefficient of order totalprice within a market segment:
    G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over ascending-sorted x."""
    x = pdf["o_totalprice"].sort_values().to_numpy()
    n = len(x)
    s = x.sum()
    g = 0.0 if n == 0 or s == 0 else (
        2.0 * ((x * range(1, n + 1)).sum()) / (n * s) - (n + 1) / n)
    return pd.DataFrame({"c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
                         "n": [n], "gini": [g]})


def udaf_gini_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_rust_spark.core.runner import _ensure_self_shipping
    _ensure_self_shipping()
    orders = load_table(spark, sf_dir, "orders") \
        .withColumnRenamed("o_custkey", "c_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(cust, "c_custkey").select("c_mktsegment", "o_totalprice")
    return joined.groupBy("c_mktsegment").applyInPandas(_gini, OUT_SCHEMA)


REGISTRATIONS = [
    ("udaf_gini_segment", udaf_gini_segment, None),  # reference-impl tested
]
