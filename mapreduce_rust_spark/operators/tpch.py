"""The remaining TPC-H query shapes (Q2, Q4, Q7–Q9, Q11–Q22),
adapted to the fixture schema — with Q1/Q3/Q5/Q6/Q10 in
``relational.py``/``analytic.py`` this completes all 22 classic
shapes, so a user's full TPC-H-style workload runs on this engine.

Schema adaptations (the fixture has no partsupp, l_shipmode,
l_commitdate/l_receiptdate, c_phone — TESTDATA.md):
- supply cost (Q2) = observed MIN unit price per (part, supplier);
  availqty (Q20) = lifetime quantity per (part, supplier).
- "late" lineitems (Q4/Q12/Q21) = ``l_shipdate > o_orderdate + N
  days`` instead of commit/receipt comparison — same correlated-
  predicate shape, same plan.
- supply cost (Q9) = ``0.05 * p_retailprice`` per unit — keeps the
  join DAG (part ⋈ lineitem ⋈ supplier ⋈ orders ⋈ nation) intact.
- part value (Q11) = lineitem revenue per part instead of
  ps_supplycost * ps_availqty — same HAVING-over-global-scalar shape.
- shipmode (Q12) = l_linestatus; country code (Q22) = the last two
  digits of c_name.

Scale levers, stated per query and shared with the Q1–Q10 family:
dimensions broadcast; facts pre-aggregate before wide joins where the
group key is the join key; every selective predicate pushes to the
parquet scan; top-k is sort+limit (TakeOrderedAndProject); correlated
EXISTS / NOT EXISTS go through the SQL front door so Catalyst
decorrelates them to semi/anti hash joins (never per-row loops).

Oracle discipline: ``dsum`` decimal sums for every shuffled money
aggregate, identical aliases both sides, years as BIGINT, no raw
timestamps in output (date strings), deterministic tiebreaks on
every LIMIT. Reference parity note: the reference engine
(src/mr/worker.rs) has no relational surface at all — these queries
exist to make the engine a complete replacement for an analytics
user, per SURVEY.md §2b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_rust_spark.operators.relational import DEC_MONEY, dsum
from mapreduce_rust_spark.tables import load_table, register_views


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- Q4: order priority checking (EXISTS → semi join) -------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter with at least one late
    lineitem, counted per priority. The EXISTS is a left-semi hash
    join on l_orderkey with the lateness residual riding the join —
    lineitem is never aggregated or deduplicated first, and each
    order appears once no matter how many late lines it has (the
    semantics a plain inner join would get wrong). Both date
    predicates push to the scans."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01")))
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    return (orders.join(li, late, "left_semi")
                  .groupBy("o_orderpriority")
                  .agg(F.count("*").alias("order_count")))


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


# --- Q7: volume shipping between two nations ----------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing between two nations (supplier
    nation ≠ customer nation, both directions), per ship year.

    Scale shape: nation broadcasts twice under different aliases (a
    self-join of a broadcast dim is free); supplier broadcasts; the
    two big shuffles are lineitem⋈orders and ⋈customer on natural
    keys. The pair filter collapses to two tiny IN-lists at the
    broadcast joins, so the fact tables only carry matching rows
    forward."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01")))
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "NATION_3")
             & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7")
               & (F.col("cust_nation") == "NATION_3")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
          .join(cust, orders.o_custkey == cust.c_custkey)
          .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
          .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
          .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
          .filter(pair)
          .groupBy("supp_nation", "cust_nation",
                   F.year("l_shipdate").cast("long").alias("l_year"))
          .agg(dsum(rev).alias("revenue"))
    )


Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)
"""


# --- Q8: national market share ------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_8's share of ECONOMY-part revenue sold
    into ASIA, per order year — conditional aggregation over a 6-way
    join. Both the numerator (CASE-gated) and denominator sum in
    DECIMAL; the share is one double division at the end, identical
    on both engines. part filters to one p_type before the join (the
    most selective predicate leads), region/nation/supplier
    broadcast."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01")))
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    nation_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("c_rkey"))
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC_MONEY)
    national = F.when(F.col("supp_nation") == "NATION_8", rev).otherwise(
        F.lit(0).cast(DEC_MONEY))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .join(orders, li.l_orderkey == orders.o_orderkey)
          .join(cust, orders.o_custkey == cust.c_custkey)
          .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("cn_key"))
          .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
          .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
          .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("sn_key"))
          .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
          .agg((F.sum(national).cast("double")
                / F.sum(rev).cast("double")).alias("mkt_share"),
               F.sum(rev).cast("double").alias("total_revenue"))
    )


Q8_ORACLE = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n1.n_name = 'NATION_8'
                     THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
"""


# --- Q9: product-type profit --------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) for
    one part family. Supply cost adapts to 5% of p_retailprice per
    unit (no partsupp in the fixture) — the join DAG is the real
    thing: part (name-filtered, broadcast) ⋈ lineitem ⋈ supplier
    (broadcast) ⋈ orders ⋈ nation (broadcast). Profit terms are
    ≤6-decimal grid values, so the DECIMAL sum is exact."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.lit(0.05) * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
          .join(orders, li.l_orderkey == orders.o_orderkey)
          .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
          .groupBy(F.col("n_name").alias("nation"),
                   F.year("o_orderdate").cast("long").alias("o_year"))
          .agg(dsum(amount).alias("profit"))
    )


Q9_ORACLE = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.05 * p_retailprice * l_quantity
                     AS DECIMAL(18,6))) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
"""


# --- Q11: important part values (HAVING vs global scalar) ---------------

Q11_FRACTION = 0.0005


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds a fraction of
    TOTAL revenue — a group-agg filtered against a global scalar.
    Part value adapts to lineitem revenue (no partsupp).

    Scale shape: ONE aggregation produces the per-part values; the
    global total re-aggregates those partials (tiny input — one row
    per part, not a second fact scan) and joins back as a broadcast
    1-row cross join. The threshold comparison is a per-row double
    multiply, identical on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (li.groupBy("l_partkey")
                  .agg(F.sum(rev.cast(DEC_MONEY)).alias("val_dec")))
    total = per_part.agg(
        F.sum("val_dec").cast("double").alias("total_val"))
    return (per_part
            .select("l_partkey", F.col("val_dec").cast("double").alias("value"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("value") > Q11_FRACTION * F.col("total_val"))
            .select("l_partkey", "value"))


Q11_ORACLE = f"""
WITH v AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS val_dec
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(val_dec AS DOUBLE) AS value
FROM v
WHERE CAST(val_dec AS DOUBLE) >
      {Q11_FRACTION} * (SELECT CAST(SUM(val_dec) AS DOUBLE) FROM v)
"""


# --- Q12: priority by line status (conditional aggregation) -------------

def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line status (shipmode proxy), how many
    late-shipped 1997 lines belong to high- vs low-priority orders —
    the CASE-counting join. One equi-join on orderkey with the
    lateness residual; the two counts are map-side-combinable
    conditional sums, so the result is 2 rows from one shuffle."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01")))
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
          .filter(F.col("l_shipdate")
                  > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
          .groupBy("l_linestatus")
          .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
               F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
"""


# --- Q13: customer order-count distribution -----------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the histogram of orders-per-customer,
    INCLUDING zero-order customers — a left outer join followed by
    two stacked aggregations. The left join keeps customers with no
    orders (count(o_orderkey) = 0 — counting the key, not *, is what
    makes the null rows count as zero); the second agg is over one
    row per customer, tiny. Priority filter stands in for the
    classic comment NOT LIKE."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED").select(
        "o_orderkey", "o_custkey")
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
                    .groupBy("c_custkey")
                    .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
                    .agg(F.count("*").alias("custdist")))


Q13_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
"""


# --- Q14: promotion effect ----------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the percentage of one month's revenue coming
    from PROMO parts — two CASE-gated decimal sums in one pass, one
    double division. The month predicate pushes to the lineitem
    scan; part broadcasts."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01")))
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC_MONEY)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast(DEC_MONEY))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .agg((F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")).alias("promo_revenue_pct"),
               F.sum(rev).cast("double").alias("total_revenue"))
    )


Q14_ORACLE = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue_pct,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate <  TIMESTAMP '1997-10-01'
"""


# --- Q15: top supplier (agg vs its own max) -----------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the maximum — the classic view-vs-its-own-max pattern. The
    revenue CTE aggregates once; the max re-aggregates the 100-row
    partial and broadcasts back as a 1-row cross join. Equality
    compares two doubles produced by the identical decimal-sum path,
    so it is exact on both engines. Supplier names join in last
    (broadcast), only for the winners."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01")))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = (li.groupBy("l_suppkey")
                  .agg(F.sum(rev.cast(DEC_MONEY)).alias("rev_dec")))
    revenue = per_supp.select(
        "l_suppkey", F.col("rev_dec").cast("double").alias("total_revenue"))
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (revenue.crossJoin(F.broadcast(top))
                   .filter(F.col("total_revenue") == F.col("max_revenue"))
                   .join(F.broadcast(supp),
                         F.col("l_suppkey") == F.col("s_suppkey"))
                   .select("s_suppkey", "s_name", "total_revenue"))


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# --- Q16: supplier diversity per part attribute (NOT IN → anti join) ----

Q16_SIZES = (1, 9, 14, 19, 23, 36, 45)


def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many DISTINCT suppliers ship each
    (brand, type, size) combination, excluding one brand, a size
    IN-list, and a bad-supplier NOT IN (adapted: negative account
    balance). The part-supplier relation adapts to distinct
    (partkey, suppkey) pairs from lineitem (no partsupp table).

    Scale shape: the NOT IN is a broadcast anti join (the excluded
    set is small); part filters before joining; distinct-supplier
    counting is the only real shuffle. COUNT(DISTINCT) expands to
    the two-phase distinct-then-count plan — exact, unlike
    approx_count_distinct, and safe here because group cardinality
    is bounded by suppliers-per-part."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(*Q16_SIZES)).select(
        "p_partkey", "p_brand", "p_type", "p_size")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
          .groupBy("p_brand", "p_type",
                   F.col("p_size").cast("long").alias("p_size"))
          .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = f"""
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, CAST(p_size AS BIGINT)
"""


# --- Q17: small-quantity-order revenue (correlated avg) -----------------

def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is
    below 20% of that part's average quantity — the correlated-AVG
    decorrelated by hand into agg + equi-join (exactly what Catalyst
    does to the subquery form, made explicit). The per-part average
    divides an exact decimal sum by a count (identical double on
    both engines); the 0.2× threshold is one IEEE multiply. Parts
    filter to one brand first, so the fact join is small."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#5").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    li_b = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    avg_qty = (li_b.groupBy(F.col("l_partkey").alias("ap_key"))
                   .agg((F.sum(F.col("l_quantity").cast(DEC_MONEY))
                          .cast("double") / F.count(F.lit(1)))
                        .alias("avg_qty")))
    return (li_b.join(F.broadcast(avg_qty),
                      F.col("l_partkey") == F.col("ap_key"))
                .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
                .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0))
                     .alias("avg_yearly"),
                     F.count("*").alias("n_lines")))


Q17_ORACLE = """
WITH avg_q AS (
  SELECT l_partkey AS ap_key,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
           / COUNT(*) AS avg_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#5'
  GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_q ON l_partkey = ap_key
WHERE p_brand = 'Brand#5'
  AND l_quantity < 0.2 * avg_qty
"""


# --- Q18: large-volume customers (HAVING + join back) -------------------

Q18_MIN_QTY = 250


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the top-100 largest orders by total quantity
    above a HAVING threshold, with their customers. The HAVING
    aggregation runs on lineitem alone (orderkey is the shuffle key
    either way); only qualifying orders — a tiny set — join to
    orders and customer, and the top-100 is sort+limit with an
    orderkey tiebreak. Quantities are 1-decimal grid values: the
    decimal sum and the >threshold comparison are exact."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (li.groupBy("l_orderkey")
             .agg(F.sum(F.col("l_quantity").cast(DEC_MONEY))
                   .cast("double").alias("total_qty"))
             .filter(F.col("total_qty") > Q18_MIN_QTY))
    return (big.join(orders, big.l_orderkey == orders.o_orderkey)
               .join(cust, orders.o_custkey == cust.c_custkey)
               .select("c_custkey", "c_name", "o_orderkey",
                       F.date_format("o_orderdate", "yyyy-MM-dd")
                        .alias("o_orderdate"),
                       "o_totalprice", "total_qty")
               .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
               .limit(100))


Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
         > {Q18_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 100
"""


# --- Q19: disjunctive predicate join ------------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR-ed (brand, size,
    quantity) bands — the disjunctive-pushdown stress test. Catalyst
    extracts the common l_partkey = p_partkey conjunct so this stays
    a hash join (not a nested loop), and pushes the brand/size
    disjunction to the part scan; the per-branch quantity bands ride
    the join as a residual filter."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 15)
         & qty.between(1, 21))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 25)
           & qty.between(10, 30))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 35)
           & qty.between(20, 40)))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
              .filter(branch)
              .agg(dsum(rev).alias("revenue"),
                   F.count("*").alias("n_lines")))


Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 40)
"""


# --- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) -------

def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order — the double-correlated
    EXISTS + NOT EXISTS query, through the SQL front door so
    Catalyst decorrelates both into semi/anti hash joins on
    l_orderkey (no per-row subquery execution; the plan is three
    joins of the same fact table, each shuffled once on the shared
    key). Lateness adapts to l_shipdate > o_orderdate + 75 days.
    Top-10 with name tiebreak."""
    register_views(spark, sf_dir)
    return spark.sql(Q21_SQL)


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 75 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 75 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""

Q21_ORACLE = Q21_SQL


# --- Q22: global sales opportunity (anti join + scalar avg) -------------

Q22_CODES = ("06", "13", "21", "29", "30", "42", "55")


def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: acctbal of order-less customers above the
    positive-balance average, grouped by country code (adapted: the
    last two digits of c_name). Three pieces, all scale-safe: the
    scalar average is a 1-row broadcast; the "never ordered" test is
    a left-anti join on custkey; the final group-by has ≤100 groups.
    acctbal is a 2-decimal grid value — decimal sums exact."""
    cust = _t(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", -2, 2))
    cust = cust.filter(F.col("cntrycode").isin(*Q22_CODES))
    avg_bal = (cust.filter(F.col("c_acctbal") > 0)
                   .agg((F.sum(F.col("c_acctbal").cast(DEC_MONEY))
                          .cast("double") / F.count(F.lit(1)))
                        .alias("avg_bal")))
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (cust.crossJoin(F.broadcast(avg_bal))
                .filter(F.col("c_acctbal") > F.col("avg_bal"))
                .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
                .groupBy("cntrycode")
                .agg(F.count("*").alias("numcust"),
                     dsum(F.col("c_acctbal")).alias("totacctbal")))


Q22_ORACLE = f"""
WITH c AS (
  SELECT c_custkey, c_acctbal, right(c_name, 2) AS cntrycode
  FROM customer
  WHERE right(c_name, 2) IN {Q22_CODES}
)
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM c
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                               AS DOUBLE) / COUNT(*)
                   FROM c WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY cntrycode
"""


# --- Q2: minimum cost supplier (correlated scalar MIN) ------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each ECONOMY size-5 part, the EUROPE-region
    supplier(s) offering the minimum supply cost — the correlated
    scalar-MIN subquery over a 4-dim join. Supply cost adapts to the
    observed minimum unit price ``MIN(l_extendedprice / l_quantity)``
    per (part, supplier) (no partsupp in the fixture; the unit-price
    division and MIN are order-independent scalar ops, identical on
    both engines — no summation, so no decimal discipline needed).

    Through the SQL front door so Catalyst decorrelates the scalar
    subquery into an aggregate + join on p_partkey rather than a
    per-row re-scan; supplier/nation/region broadcast under the AQE
    threshold; top-100 with full deterministic tiebreak."""
    register_views(spark, sf_dir)
    return spark.sql(Q2_SQL)


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type
FROM part, ps, supplier, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = 5 AND p_type = 'ECONOMY'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM ps ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = p_partkey
      AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

Q2_ORACLE = Q2_SQL


# --- Q20: potential part promotion (nested IN + correlated agg) ---------

def q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of 'small …' parts whose lifetime
    supplied quantity exceeds 2x what they shipped in 1996 — the
    nested-IN query with a correlated scalar aggregate inside the
    inner IN. Availqty adapts to the lifetime per-(part, supplier)
    quantity sum (no partsupp). Both compared quantities are DECIMAL
    sums, so the threshold comparison is exact on both engines.

    The plan to want (and what Catalyst builds from this SQL): the
    correlated sum decorrelates to a filtered aggregation joined on
    (partkey, suppkey); both INs become left-semi hash joins; nation
    broadcasts. No per-row subquery execution anywhere."""
    register_views(spark, sf_dir)
    return spark.sql(Q20_SQL)


Q20_SQL = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey = 3
  AND s_suppkey IN (
    SELECT ps_suppkey FROM ps
    WHERE ps_partkey IN (SELECT p_partkey FROM part
                         WHERE p_name LIKE 'small%')
      AND ps_availqty > (
        SELECT 2 * SUM(CAST(l_quantity AS DECIMAL(18,2)))
        FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'))
ORDER BY s_name
"""

Q20_ORACLE = Q20_SQL


REGISTRATIONS = [
    ("q2_min_cost_supplier", q2_min_cost_supplier, Q2_ORACLE),
    ("q20_excess_stock", q20_excess_stock, Q20_ORACLE),
    ("q4_order_priority", q4_order_priority, Q4_ORACLE),
    ("q7_volume_shipping", q7_volume_shipping, Q7_ORACLE),
    ("q8_market_share", q8_market_share, Q8_ORACLE),
    ("q9_product_profit", q9_product_profit, Q9_ORACLE),
    ("q11_important_parts", q11_important_parts, Q11_ORACLE),
    ("q12_priority_lines", q12_priority_lines, Q12_ORACLE),
    ("q13_customer_distribution", q13_customer_distribution, Q13_ORACLE),
    ("q14_promo_revenue", q14_promo_revenue, Q14_ORACLE),
    ("q15_top_supplier", q15_top_supplier, Q15_ORACLE),
    ("q16_supplier_diversity", q16_supplier_diversity, Q16_ORACLE),
    ("q17_small_qty_revenue", q17_small_qty_revenue, Q17_ORACLE),
    ("q18_large_volume", q18_large_volume, Q18_ORACLE),
    ("q19_disjunctive_revenue", q19_disjunctive_revenue, Q19_ORACLE),
    ("q21_waiting_supplier", q21_waiting_supplier, Q21_ORACLE),
    ("q22_global_sales", q22_global_sales, Q22_ORACLE),
]
