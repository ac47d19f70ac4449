"""Skew-mitigation utilities — the manual levers for when AQE's
skew-join splitting isn't available or isn't enough (e.g. a shuffled
aggregation on a power-law key, or a join where one key holds >>1
partition of rows).

``salted_join``: replicate the small side ``n_salts`` times and give
each big-side row a deterministic salt, so one hot key's rows spread
over ``n_salts`` reducers instead of one. Identical results to the
plain join — proven by an oracle-checked registry query that routes a
real join through it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_rust_spark.operators.relational import dsum
from mapreduce_rust_spark.tables import load_table


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with salting.

    big side: salt = pmod(xxhash64(every big-side column), n_salts).
    Derived ONLY from deterministic row contents — never from
    monotonically_increasing_id()/rand(), whose values change when a
    lost or speculative task recomputes a partition, re-routing rows
    across salt partitions mid-shuffle and losing/duplicating them
    (the SPARK-23207 class of bug). Hashing all columns spreads even
    rows that are full duplicates of each other only when they differ
    somewhere; exact duplicate rows share a salt, which is correct
    (they carry identical join results) and still bounded by the
    duplicate-group size. small side: exploded copy per salt. The join
    key becomes (key, salt); result columns match the plain join
    (salt dropped).

    Only big-side-preserving joins are valid: the small side is
    replicated per salt, so right/full would duplicate unmatched
    small-side rows n_salts times."""
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(f"salted_join supports big-side-preserving joins only, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("__salt", salt)
    small_s = (small.withColumn("__salt",
                                F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))))
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-nation revenue routed through ``salted_join`` — the
    oracle proves salting preserves join semantics exactly."""
    orders = load_table(spark, sf_dir, "orders") \
        .withColumnRenamed("o_custkey", "c_custkey")
    cust = load_table(spark, sf_dir, "customer")
    j = salted_join(orders, cust.select("c_custkey", "c_mktsegment"),
                    "c_custkey", n_salts=8)
    return (j.groupBy("c_mktsegment")
             .agg(F.count("*").alias("n_orders"),
                  dsum(F.col("o_totalprice")).alias("revenue")))


SALTED_JOIN_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


SKEW_TOP_N = 10


def key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew PROBE that decides whether to reach for salted_join /
    AQE skew splitting: per hottest join/aggregation key, its row
    count, share of the table, and hot_factor = count ÷ the
    uniform-key expectation (total / n_keys). A hot_factor ≫ number
    of shuffle partitions means one reducer owns that key's rows and
    the plain shuffle is bound by it — the exact regime salting
    exists for. Probed here: ``events.user_id``, the engine's
    sessionize/stateful grouping key.

    Cost shape is the cheapest the engine has: one map-side-combined
    aggregate to the key-count relation, a second tiny aggregate over
    it for (total, n_keys) broadcast back as one row, and a global
    top-N that plans as TakeOrderedAndProject — never a global sort.
    At 100 TB this is exactly the pre-flight a planner can afford to
    run on every candidate join key; counts stay int64 (<2^63 rows)
    and both ratios are single int÷int IEEE divisions."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    totals = counts.agg(F.sum("cnt").alias("total"),
                        F.count("*").alias("n_keys"))
    top = (counts.crossJoin(F.broadcast(totals))
                 .orderBy(F.desc("cnt"), "user_id")
                 .limit(SKEW_TOP_N))
    return top.select(
        "user_id", "cnt", "total", "n_keys",
        (F.col("cnt").cast("double") / F.col("total").cast("double"))
        .alias("share"),
        (F.col("cnt").cast("double") * F.col("n_keys").cast("double")
         / F.col("total").cast("double")).alias("hot_factor"))


KEY_SKEW_ORACLE = f"""
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
),
totals AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM counts
)
SELECT user_id, cnt, total, n_keys,
       CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share,
       CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
         / CAST(total AS DOUBLE) AS hot_factor
FROM counts, totals
ORDER BY cnt DESC, user_id
LIMIT {SKEW_TOP_N}
"""


REGISTRATIONS = [
    ("salted_join_revenue", salted_join_revenue, SALTED_JOIN_ORACLE),
    ("key_skew_stats", key_skew_stats, KEY_SKEW_ORACLE),
]
