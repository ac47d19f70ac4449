"""operators/ranking.py — the scalable rank/NTILE decomposition must
be bit-equal to the naive global window on adversarial inputs (heavy
ties, skewed parts, singleton parts, n < k). The oracle-parity tests
prove it on the fixture; these prove it on shapes the fixture lacks.
"""

from __future__ import annotations

import random

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mapreduce_rust_spark.operators.ranking import ntile_expr, scalable_rank


def _cases():
    rng = random.Random(42)
    rows = []
    for i in range(2000):
        part = rng.choice(["a", "b", "c", "z"])  # z stays tiny
        if part == "z" and rng.random() < 0.95:
            part = "a"                            # skew: a is huge
        val = rng.choice([0, 1, 1, 1, 5, 7, 7, 100, -3])  # heavy ties
        rows.append((part, val, i))
    rows.append(("solo", 9, 10_001))              # singleton part
    return rows


def test_scalable_rank_equals_window_rank(spark):
    df = spark.createDataFrame(_cases(), "part string, val long, id long")
    got = scalable_rank(df, F.expr("val DIV 3"), ["val", "id"],
                        part_cols=["part"])
    w = W.partitionBy("part").orderBy("val", "id")
    want = df.withColumn("r", F.row_number().over(w))
    g = {(r.part, r.id): r.r for r in got.collect()}
    e = {(r.part, r.id): r.r for r in want.collect()}
    assert g == e and len(g) == 2001


def test_scalable_rank_global_no_partition(spark):
    df = spark.createDataFrame(_cases(), "part string, val long, id long")
    got = scalable_rank(df, F.expr("val DIV 3"), ["val", "id"])
    want = df.withColumn("r", F.row_number().over(W.orderBy("val", "id")))
    assert ({(r.id, r.r) for r in got.collect()}
            == {(r.id, r.r) for r in want.collect()})


def test_ntile_expr_matches_builtin(spark):
    """Closed-form tile == F.ntile for every (n, k) shape including
    n < k, n == k, n % k == 0, and large remainders."""
    for n_rows in (1, 3, 4, 5, 16, 17, 97):
        for k in (1, 2, 4, 7, 16):
            df = spark.range(n_rows).select(
                (F.col("id") + 1).alias("r"), F.lit(n_rows).alias("n"))
            got = {r.r: r.t for r in
                   df.select("r", ntile_expr(k).alias("t")).collect()}
            want = {r.r: r.t for r in
                    spark.range(n_rows)
                    .select((F.col("id") + 1).alias("r"))
                    .withColumn("t", F.ntile(k).over(W.orderBy("r")))
                    .collect()}
            assert got == want, (n_rows, k)
