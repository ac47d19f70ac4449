"""Custom UDAF vs a driver-side reference implementation."""

from __future__ import annotations

from tests.conftest import SF_CORRECT


def _ref_gini(values):
    x = sorted(values)
    n, s = len(x), sum(x)
    if n == 0 or s == 0:
        return 0.0
    return 2.0 * sum(i * v for i, v in enumerate(x, 1)) / (n * s) - (n + 1) / n


def test_gini_matches_reference(spark):
    from mapreduce_rust_spark.operators.udaf import udaf_gini_segment
    got = {r.c_mktsegment: (r.n, r.gini)
           for r in udaf_gini_segment(spark, SF_CORRECT).collect()}
    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    cust = spark.read.parquet(f"{SF_CORRECT}/customer.parquet")
    rows = (orders.withColumnRenamed("o_custkey", "c_custkey")
                  .join(cust, "c_custkey")
                  .select("c_mktsegment", "o_totalprice").collect())
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r.o_totalprice)
    assert set(got) == set(by_seg)
    for seg, vals in by_seg.items():
        n, g = got[seg]
        assert n == len(vals)
        assert abs(g - _ref_gini(vals)) < 1e-9
        assert 0.0 <= g <= 1.0
