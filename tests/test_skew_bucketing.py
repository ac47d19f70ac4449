"""Skew + bucketing machinery: salted join equivalence under an
artificially skewed key, and bucketed tables joining without a
shuffle (the 100 TB co-location story)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


def test_salted_join_equals_plain_join_under_skew(spark):
    """Skew every row onto one key: salted result must still equal the
    plain join exactly."""
    from mapreduce_rust_spark.operators.skew import salted_join
    big = (spark.range(20000)
           .select(F.lit(7).alias("k"),
                   (F.col("id") % 100).alias("v")))          # one hot key
    small = spark.createDataFrame([(7, "hot"), (8, "cold")], ["k", "tag"])
    plain = big.join(small, "k").groupBy("tag").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"))
    salted = salted_join(big, small, "k").groupBy("tag").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # and the salt formula really spreads the hot key
    salt = F.pmod(F.hash(F.col("k"), F.monotonically_increasing_id()), F.lit(8))
    assert big.select(salt.alias("s")).distinct().count() > 1


def test_salted_join_property(spark):
    """Hypothesis-style sweep without fixtures: random multiplicities
    and partial key overlap, inner and left, several salt counts."""
    from mapreduce_rust_spark.operators.skew import salted_join
    import random
    rnd = random.Random(42)
    rows = [(rnd.randint(0, 5), i) for i in range(500)]
    big = spark.createDataFrame(rows, ["k", "v"])
    small = spark.createDataFrame([(k, f"t{k}") for k in range(0, 4)], ["k", "tag"])
    for how in ("inner", "left"):
        plain = sorted(map(tuple,
                           big.join(small, "k", how).select("k", "v", "tag").collect()))
        for n in (1, 3, 16):
            salted = sorted(map(tuple,
                                salted_join(big, small, "k", n_salts=n, how=how)
                                .select("k", "v", "tag").collect()))
            assert salted == plain, f"{how} n_salts={n}"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """bucketBy co-locates both sides: the sort-merge join must read
    bucketed scans with NO Exchange on the join key."""
    from mapreduce_rust_spark.sinks import write_bucketed
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    cust = spark.read.parquet(f"{SF_CORRECT}/customer.parquet")
    write_bucketed(orders, "b_orders", str(tmp_path / "b_orders"), "o_custkey")
    write_bucketed(cust, "b_cust", str(tmp_path / "b_cust"), "c_custkey")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("b_orders")
             .join(spark.table("b_cust"),
                   F.col("o_custkey") == F.col("c_custkey"))
             .groupBy("c_mktsegment").agg(F.count("*").alias("n")))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # no exchange below the join (bucketed scans are pre-partitioned)
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_aqe_skew_join_split_activates(spark):
    """AQE's runtime skew-join split — the automatic lever that
    complements manual salting — must actually fire: with planted
    90%-one-key skew and thresholds lowered to fixture scale, the
    executed plan's sort-merge join is marked skew=true and medium
    partitions split. Proves the engine config (AQE on) delivers the
    runtime re-plan, not just that we enabled a flag."""
    from pyspark.sql import functions as F
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        # splitting the skewed partition breaks downstream
        # co-partitioning assumptions; allow the extra shuffle AQE
        # would otherwise refuse (the cluster-side tradeoff is ours)
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
             .otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"))
        small = spark.range(0, 1000).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("v"))
        j = big.join(small, "k")
        # collect() executes THIS DataFrame's QueryExecution, so the
        # adaptive plan below is final (count() would execute a
        # different, aggregated plan and leave j's unexecuted)
        assert len(j.collect()) == 180_100  # correctness under the split
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_prefilter_never_drops_a_true_key_and_thins(spark):
    """The bloom bitmap may pass false positives but must pass EVERY
    true key (else the exact semi-join after it would silently lose
    rows); at these parameters (2^17 bits, k=3, ~3k keys) it must
    also actually thin the probe side well below the full table."""
    from mapreduce_rust_spark.operators.bloom import (
        BLOOM_M, _WORDS, bloom_prefilter, build_bitmap)
    from mapreduce_rust_spark.tables import load_table
    from tests.conftest import SF_CORRECT

    orders = load_table(spark, SF_CORRECT, "orders")
    urgent = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
                    .select("o_orderkey"))
    bitmap = build_bitmap(urgent, "o_orderkey")
    assert len(bitmap) == _WORDS == BLOOM_M // 64

    li = load_table(spark, SF_CORRECT, "lineitem")
    passed = {r.l_orderkey
              for r in bloom_prefilter(li, "l_orderkey", bitmap)
              .select("l_orderkey").distinct().collect()}
    true_keys = {r.o_orderkey for r in urgent.collect()}
    li_keys = {r.l_orderkey
               for r in li.select("l_orderkey").distinct().collect()}
    # no false negatives: every true key present in lineitem passes
    assert (true_keys & li_keys) <= passed
    # real thinning: false-positive rate stays near the theoretical
    # (1 - e^{-kn/m})^k ≈ 0.03% — allow 100x slack, still ≪ the 80%
    # of rows a bloomless probe would shuffle
    fp = passed - true_keys
    assert len(fp) <= max(50, len(li_keys) // 20), len(fp)


def test_bloom_semijoin_equals_plain_semijoin(spark):
    """End to end, the bloom path must be invisible in the result."""
    from mapreduce_rust_spark.operators.bloom import bloom_semijoin_revenue
    from mapreduce_rust_spark.operators.relational import dsum
    from mapreduce_rust_spark.tables import load_table
    from tests.conftest import SF_CORRECT

    got = {r.l_returnflag: (r.n_lines, r.revenue)
           for r in bloom_semijoin_revenue(spark, SF_CORRECT).collect()}
    orders = load_table(spark, SF_CORRECT, "orders")
    urgent = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
                    .select("o_orderkey"))
    li = load_table(spark, SF_CORRECT, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    want = {r.l_returnflag: (r.n_lines, r.revenue)
            for r in li.join(urgent,
                             li["l_orderkey"] == urgent["o_orderkey"],
                             "left_semi")
                       .groupBy("l_returnflag")
                       .agg(F.count("*").alias("n_lines"),
                            dsum(rev).alias("revenue")).collect()}
    assert got == want


def test_bloom_prefilter_property_random_key_sets(spark):
    """Property over adversarial key ranges (negative, near-int64-max,
    sparse): the bitmap never drops a member key, and non-member pass
    rate stays at bloom false-positive scale."""
    import random
    from mapreduce_rust_spark.operators.bloom import (
        bloom_prefilter, build_bitmap)
    rng = random.Random(13)
    for lo, hi in [(-2**62, 2**62), (-1000, 1000), (0, 2**63 - 2)]:
        members = {rng.randrange(lo, hi) for _ in range(500)}
        others = {rng.randrange(lo, hi) for _ in range(2000)} - members
        keys = spark.createDataFrame([(k,) for k in members], ["k"])
        bitmap = build_bitmap(keys, "k")
        probe = spark.createDataFrame(
            [(k,) for k in sorted(members | others)], ["k"])
        passed = {r.k for r in bloom_prefilter(probe, "k", bitmap).collect()}
        assert members <= passed, "false negative!"
        fp = passed - members
        # 2^17 bits / 500 keys / k=3 -> theoretical fp ~1e-6; allow
        # huge slack, the point is it's a FILTER, not a pass-through
        assert len(fp) <= len(others) // 10, (lo, hi, len(fp))
