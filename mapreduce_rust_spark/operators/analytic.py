"""Compound analytic queries + the remaining relational breadth:
the TPC-H-classic multi-join shapes (Q3/Q5/Q6/Q10 adapted to the
fixture schema), EXISTS / NOT EXISTS correlated subqueries, unpivot
(wide→long melt), null-preserving explode_outer, and the advanced
window surface (time-RANGE frames, ntile/percent_rank/cume_dist,
first/last/nth_value).

The reference has none of this (SURVEY.md §2b — joins, windows,
subqueries all "absent"); each query here is the declarative Catalyst
form with the scale levers stated per operator: dimension broadcast,
fact-side pre-aggregation before wide joins, selective predicates
pushed to the parquet scan, and bounded window partitions (never a
global ORDER BY window over the full input).

Oracle discipline: identical aliases both sides, ``dsum``-style
decimal sums for shuffled aggregates, date strings / epoch longs
instead of raw timestamps, deterministic tiebreaks on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_rust_spark.operators.relational import DEC_MONEY, dsum
from mapreduce_rust_spark.tables import load_table, register_views


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- TPC-H classic compound plans --------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customers
    ⋈ open orders ⋈ unshipped lineitems, top-10 orders by revenue.

    Scale shape: both date predicates push to the parquet scans; the
    customer side reduces to a semi-join-able key set; the final
    top-10 is a sort+limit (TakeOrderedAndProject — per-partition
    heap, no global sort). Revenue summed in DECIMAL (exact,
    order-independent), deterministic o_orderkey tiebreak."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01"))
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
              .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
              .groupBy("l_orderkey",
                       F.date_format("o_orderdate", "yyyy-MM-dd")
                        .alias("o_orderdate"),
                       "o_orderpriority")
              .agg(dsum(rev).alias("revenue"))
              .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
              .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier volume): revenue per nation for
    orders where the customer and the lineitem's supplier sit in the
    SAME nation, one region, one order-date year.

    Scale shape: nation/region broadcast (constant size at any SF);
    supplier broadcast (grows sub-linearly vs the fact table); the
    only big shuffles are lineitem⋈orders and the join to customer —
    both on their natural keys. The c_nationkey = s_nationkey
    residual rides the customer join instead of forcing an extra
    shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01")))
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
          .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
          .join(cust, (orders.o_custkey == cust.c_custkey)
                & (cust.c_nationkey == supp.s_nationkey))
          .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
          .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
          .groupBy("n_name")
          .agg(dsum(rev).alias("revenue"),
               F.count("*").alias("n_items"))
    )


Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): a pure scan-filter-
    aggregate — every predicate pushes to the parquet scan, the
    aggregate is a map-side-combined 1-row result; the whole query is
    one stage + a 1-row exchange. The canonical 'is pushdown working'
    probe: at 100 TB this reads three columns of one year's row
    groups, nothing else."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1997-01-01"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01"))
                  & (F.col("l_discount") >= 0.05)
                  & (F.col("l_discount") <= 0.07)
                  & (F.col("l_quantity") < 24))
          .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"))
               .alias("revenue"),
               F.count("*").alias("n_items"))
    )


Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    lost revenue on returned lineitems in one quarter.

    Scale shape: the returnflag + order-date predicates push down;
    lineitem pre-aggregates to per-order revenue partials BEFORE
    joining orders/customer (same 4:1 shrink as
    join_revenue_by_nation — the decimal partials re-associate
    exactly); nation broadcasts; top-20 is TakeOrderedAndProject with
    a c_custkey tiebreak."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-04-01")))
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    per_order = (li.groupBy("l_orderkey")
                   .agg(F.sum((F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))).cast(DEC_MONEY))
                        .alias("rev_dec")))
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
                 .join(cust, orders.o_custkey == cust.c_custkey)
                 .join(F.broadcast(nation),
                       cust.c_nationkey == nation.n_nationkey)
                 .groupBy("c_custkey", "c_name", "n_name")
                 .agg(F.sum("rev_dec").cast("double").alias("revenue"),
                      F.count("*").alias("n_orders"))
                 .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
                 .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate <  TIMESTAMP '1998-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- correlated subqueries (EXISTS / NOT EXISTS) -----------------------

def exists_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL front door: customers with at
    least one high-value urgent order. Catalyst rewrites the EXISTS
    into a left-semi hash join — no per-row subquery execution (plan
    shows a single SEMI join; this is why the declarative form
    scales and a loop doesn't)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 400000
              AND o.o_orderpriority = '1-URGENT')
    """)


EXISTS_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_totalprice > 400000
      AND o.o_orderpriority = '1-URGENT')
"""


def not_exists_idle_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS → left-anti hash join under Catalyst:
    suppliers who never shipped a max-quantity deep-discount line.
    The anti join shuffles only the distinct supplier keys of the
    filtered fact side."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey
              AND l.l_quantity >= 50 AND l.l_discount >= 0.09)
    """)


NOT_EXISTS_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier s
WHERE NOT EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_suppkey = s.s_suppkey
      AND l.l_quantity >= 50 AND l.l_discount >= 0.09)
"""


# --- unpivot / melt ----------------------------------------------------

def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (the inverse of pivot_status_qty): one row per
    (part, metric). ``DataFrame.unpivot`` plans as a single Expand —
    one scan, rows×metrics output, no shuffle at all. Values unify to
    double (unpivot requires one value type)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")


UNPIVOT_ORACLE = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
FROM part WHERE p_partkey < 200
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
FROM part WHERE p_partkey < 200
"""


# --- null-preserving explode -------------------------------------------

def explode_outer_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer`` semantics: docs keep a row (NULL token) even
    when their rare-token array is empty — the LEFT-JOIN-shaped
    lateral the plain explode (inner-join-shaped) silently drops.
    Filtering long tokens makes empty arrays common, so both branches
    are exercised."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+"),
                    lambda t: F.length(t) > 12)
    return (docs.select("doc_id", toks.alias("rare"))
                .select("doc_id",
                        F.explode_outer("rare").alias("rare_tok")))


EXPLODE_OUTER_ORACLE = """
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     t -> LENGTH(t) > 12) AS rare
  FROM documents
)
SELECT doc_id,
       UNNEST(CASE WHEN len(rare) = 0 THEN [NULL] ELSE rare END) AS rare_tok
FROM arr
"""


# --- advanced window surface -------------------------------------------

def window_range_hour_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, the trailing-1-hour sum of
    ``value`` at every event — RANGE BETWEEN 3599 PRECEDING AND
    CURRENT ROW over epoch seconds (a true range frame: rows enter
    and leave by timestamp distance, not row count — inexpressible
    with a ROWS frame on irregular event times).

    Exactness: the frame sum's addition order is engine-internal, so
    the summand is quantized to a 1e-6 integer grid (HALF_EVEN on
    both engines) and summed as longs — order-independent — then
    divided back. Window partitions are per-user (bounded); no
    global-order window anywhere."""
    ev = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("long")
    vq = F.bround(F.col("value") * 1e6, 0).cast("long")
    w = (W.partitionBy("user_id").orderBy("epoch")
          .rangeBetween(-3599, W.currentRow))
    return (ev.select("event_id", "user_id", epoch.alias("epoch"),
                      vq.alias("vq"))
              .select("event_id", "user_id", "epoch",
                      (F.sum("vq").over(w).cast("double") / 1e6)
                      .alias("hour_sum")))


WINDOW_RANGE_ORACLE = """
SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch,
       CAST(SUM(CAST(round_even(value * 1e6, 0) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
            RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e6
         AS hour_sum
FROM events
"""


def window_ntile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile (ntile), percent_rank,
    cume_dist over order value within each priority class. The
    ordering carries a unique o_orderkey tiebreak so every rank —
    and therefore every output value — is deterministic on both
    engines. percent_rank/cume_dist are single exact divisions
    (correctly rounded identically everywhere)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey", "o_orderpriority", "o_totalprice",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"))


WINDOW_NTILE_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WHERE o_orderkey < 2000
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
"""


def window_first_last_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-navigation window functions: each customer's first,
    latest, and second order value (first_value / last_value /
    nth_value over the full-partition frame — last_value is the
    classic frame trap: the default frame ends at CURRENT ROW, so it
    must be widened to UNBOUNDED FOLLOWING to mean 'latest').
    Order-date ties broken by o_orderkey."""
    orders = _t(spark, sf_dir, "orders")
    full = (W.partitionBy("o_custkey")
             .orderBy("o_orderdate", "o_orderkey")
             .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return (orders.filter(F.col("o_custkey") < 300)
            .select(
                "o_custkey", "o_orderkey",
                F.first_value("o_totalprice").over(full).alias("first_price"),
                F.last_value("o_totalprice").over(full).alias("last_price"),
                F.nth_value("o_totalprice", 2).over(full).alias("second_price")))


WINDOW_FIRST_LAST_ORACLE = """
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER w AS last_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
FROM orders
WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median: per return flag, the line price at which the
    CUMULATIVE QUANTITY first reaches half the flag's total quantity
    — the volume-weighted order statistic ("half the units ship at
    or below this price"), which a plain median misses whenever
    quantity correlates with price. The general recipe for weighted
    percentiles: sort, cumulative-sum the weights, take the first
    crossing.

    All-integer: prices in cents, quantities integral, the crossing
    test 2·cumw ≥ totw in BIGINT. One per-flag window (three flags —
    at scale sub-shard via scalable_rank's bucket decomposition with
    per-bucket weight offsets, same as the rank case), one
    TakeOrdered-style min per flag."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber",
        F.bround(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
        F.col("l_quantity").cast("long").alias("q"))
    w = (W.partitionBy("l_returnflag")
          .orderBy("pc", "l_orderkey", "l_linenumber")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    tot = W.partitionBy("l_returnflag")
    d = (li.withColumn("cumw", F.sum("q").over(w))
           .withColumn("totw", F.sum("q").over(tot))
           .filter(2 * F.col("cumw") >= F.col("totw")))
    return (d.groupBy("l_returnflag")
             .agg(F.min("pc").alias("mpc"),
                  F.first("totw").alias("totw"))
             .select("l_returnflag",
                     (F.col("mpc").cast("double") / 100.0)
                     .alias("weighted_median_price"),
                     F.col("totw").cast("long").alias("total_qty")))


WEIGHTED_MEDIAN_ORACLE = """
WITH li AS (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         CAST(round_even(l_extendedprice * 100, 0) AS BIGINT) AS pc,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem
),
c AS (
  SELECT l_returnflag, pc,
         SUM(q) OVER (PARTITION BY l_returnflag
                      ORDER BY pc, l_orderkey, l_linenumber
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         SUM(q) OVER (PARTITION BY l_returnflag) AS totw
  FROM li
)
SELECT l_returnflag,
       CAST(MIN(pc) AS DOUBLE) / 100.0 AS weighted_median_price,
       CAST(ANY_VALUE(totw) AS BIGINT) AS total_qty
FROM c WHERE 2 * cumw >= totw
GROUP BY l_returnflag
"""


LIFE_BUCKET_DAYS = 30
LIFE_MAX_BUCKET = 24


def life_table_reorders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival analysis of repurchase behavior: a life table over
    time-to-next-order, with proper right-censoring (a customer's
    LAST order has no successor — it is censored at the corpus max
    date, not dropped; dropping censored spells biases hazards up).
    Per 30-day bucket k: d_k reorders, c_k censored exits, the risk
    set n_k = Σ_{j≥k}(d_j + c_j), and the discrete hazard d_k/n_k —
    the Kaplan-Meier ingredients, emitted per-row so no
    order-sensitive float product appears in checked output (the
    survival curve is a trivial running product the consumer folds).

    Scale: one per-customer LEAD window (the sessionize shape), a
    ≤ LIFE_MAX_BUCKET-row aggregate, and a reverse cumulative sum
    over BUCKET ROWS only. Hazard is exact int ÷ int."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate")
    anchor = orders.agg(F.max("o_orderdate").alias("amax"))
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    spells = (orders.withColumn("next_dt", nxt)
              .crossJoin(F.broadcast(anchor))
              .select(
                  F.when(F.col("next_dt").isNotNull(), 1).otherwise(0)
                   .alias("event"),
                  F.datediff(F.coalesce("next_dt", "amax"), "o_orderdate")
                   .alias("gap")))
    b = F.least(F.floor(F.col("gap") / LIFE_BUCKET_DAYS),
                F.lit(LIFE_MAX_BUCKET)).cast("long")
    counts = (spells.groupBy(b.alias("bucket"))
              .agg(F.sum("event").alias("d"),
                   F.sum(1 - F.col("event")).alias("c")))
    wr = (W.orderBy(F.desc("bucket"))
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (counts
            .withColumn("n_risk", F.sum(F.col("d") + F.col("c")).over(wr))
            .select("bucket", F.col("d").cast("long").alias("d"),
                    F.col("c").cast("long").alias("c"),
                    F.col("n_risk").cast("long").alias("n_risk"),
                    (F.col("d").cast("double")
                     / F.col("n_risk").cast("double")).alias("hazard")))


LIFE_TABLE_ORACLE = f"""
WITH a AS (SELECT MAX(o_orderdate) AS amax FROM orders),
s AS (
  SELECT CASE WHEN LEAD(o_orderdate) OVER w IS NOT NULL
              THEN 1 ELSE 0 END AS event,
         date_diff('day', o_orderdate,
                   COALESCE(LEAD(o_orderdate) OVER w, a.amax)) AS gap
  FROM orders, a
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
c AS (
  SELECT LEAST(gap // {LIFE_BUCKET_DAYS}, {LIFE_MAX_BUCKET}) AS bucket,
         SUM(event) AS d, SUM(1 - event) AS c
  FROM s GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(d AS BIGINT) AS d, CAST(c AS BIGINT) AS c,
       CAST(SUM(d + c) OVER (ORDER BY bucket DESC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_risk,
       CAST(d AS DOUBLE)
         / CAST(SUM(d + c) OVER (ORDER BY bucket DESC
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         AS hazard
FROM c
"""


ROLLING_MEDIAN_N = 5


def rolling_median_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median — each customer's median order value over
    their trailing ``ROLLING_MEDIAN_N`` orders. Spark has no
    median-as-window-function, so this demonstrates the general
    recipe for ANY exact order statistic over a bounded frame:
    collect_list over a ROWS frame (bounded — at most N values per
    row, so state never grows with partition size), sort_array
    in-row, then pick the middle element(s) with element_at. The
    robust alternative to ``window_running_total``'s mean for
    dashboard smoothing.

    Exactness: values are cents longs; the even-count median is
    (lo+hi) — an int64 sum — divided by 2.0 exactly once, the same
    single-IEEE-op rule both engines follow. Scale: one shuffle on
    o_custkey, frame bounded at N, everything after the window is
    in-row codegen. Probe-set filter keeps checked output small
    (window family convention)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    vc = F.bround(F.col("o_totalprice") * 100).cast("long")
    w = (W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(-(ROLLING_MEDIAN_N - 1), W.currentRow))
    d = orders.select(
        "o_custkey", "o_orderkey", "o_orderdate", vc.alias("vc")).withColumn(
        "arr", F.sort_array(F.collect_list("vc").over(w)))
    n = F.size("arr")
    # floor-div, NOT cast-of-float-division: DuckDB CAST(1.5 AS INT)
    # rounds half-to-even while Spark truncates — `//`/floor agree
    lo = F.element_at("arr", F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at("arr", F.floor(n / 2).cast("int") + 1)
    return d.select(
        "o_custkey", "o_orderkey",
        n.cast("long").alias("n_window"),
        ((lo + hi).cast("double") / 2.0 / 100.0).alias("rolling_median"))


ROLLING_MEDIAN_ORACLE = f"""
WITH d AS (
  SELECT o_custkey, o_orderkey,
         list_sort(list(CAST(round_even(o_totalprice * 100, 0) AS BIGINT))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN {ROLLING_MEDIAN_N - 1} PRECEDING
                                  AND CURRENT ROW)) AS arr
  FROM orders WHERE o_custkey < 300
)
SELECT o_custkey, o_orderkey,
       CAST(len(arr) AS BIGINT) AS n_window,
       CAST(arr[CAST((len(arr) + 1) // 2 AS INT)]
            + arr[CAST(len(arr) // 2 AS INT) + 1] AS DOUBLE)
         / 2.0 / 100.0 AS rolling_median
FROM d
"""


# --- fuzzy string matching ---------------------------------------------

FUZZY_MAX_DIST = 4


def fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy-match join: near-identical part names within a
    (brand, type) block at Levenshtein distance ≤ 4 — the
    entity-resolution primitive. The equi-join on the block key is
    what makes this scale: edit distance runs only on within-block
    pairs (bounded by the largest block², tunable by block
    granularity), NEVER corpus × corpus — the same
    block-then-verify discipline as the LSH dedup family."""
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_name")
    a, b = part.alias("a"), part.alias("b")
    return (a.join(b, (F.col("a.p_brand") == F.col("b.p_brand"))
                   & (F.col("a.p_type") == F.col("b.p_type"))
                   & (F.col("a.p_partkey") < F.col("b.p_partkey")))
             .withColumn("dist", F.levenshtein(F.col("a.p_name"),
                                               F.col("b.p_name")))
             .filter(F.col("dist") <= FUZZY_MAX_DIST)
             .select(F.col("a.p_partkey").alias("part_a"),
                     F.col("b.p_partkey").alias("part_b"),
                     F.col("a.p_brand").alias("p_brand"),
                     F.col("dist").cast("long").alias("dist")))


FUZZY_MATCH_ORACLE = f"""
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       a.p_brand AS p_brand,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
"""


# --- statistical aggregates --------------------------------------------

def stats_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates — variance, stddev, covariance,
    correlation of (quantity, discount) per returnflag — computed
    from EXACT decimal power sums (n, Σx, Σy, Σxy, Σx², Σy²), then a
    fixed double formula.

    Spark's native var_samp/corr stream doubles in partition order,
    so their low bits vary run-to-run with partitioning — useless
    under a value-hash oracle and irreproducible at 100 TB. The
    power-sum form is the map-side-combinable, order-independent
    decomposition (one partial agg per partition, exact merge), and
    both engines then evaluate the identical IEEE expression on
    identical inputs. Same pattern as ``dsum``, one moment higher.

    Variable choice is load-bearing: quantity (1 decimal) and
    discount (2 decimals) make every product a ≤4-decimal grid value,
    so the DECIMAL(18,6) casts are exact on both engines AND the
    summed units stay far below 2^53, keeping the final
    DECIMAL→DOUBLE cast single-rounded everywhere. price² sums
    (~1e14) blow past 2^53·10⁻⁶ and double-round differently per
    engine — measured, not theoretical; at 100 TB pick the moment
    scale per column the same way."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_discount")
    agg = (li.groupBy("l_returnflag")
             .agg(F.count("*").alias("n"),
                  dsum(x).alias("sx"),
                  dsum(y).alias("sy"),
                  dsum(x * y).alias("sxy"),
                  dsum(x * x).alias("sx2"),
                  dsum(y * y).alias("sy2")))
    n = F.col("n").cast("double")
    var_qty = (F.col("sx2") - F.col("sx") * F.col("sx") / n) / (n - 1)
    var_disc = (F.col("sy2") - F.col("sy") * F.col("sy") / n) / (n - 1)
    covar = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    # corr from the covar/var forms above — NOT the textbook
    # (n·Σxy − ΣxΣy)/√(...)√(...): that a·b − c·d shape invites FMA
    # contraction (one fused rounding) on engines compiled with it;
    # this form reuses the already-portable subexpressions.
    corr = covar / (F.sqrt(var_qty) * F.sqrt(var_disc))
    return agg.select(
        "l_returnflag", "n",
        var_qty.alias("var_qty"),
        F.sqrt(var_qty).alias("stddev_qty"),
        covar.alias("covar_qty_disc"),
        corr.alias("corr_qty_disc"))


STATS_AGG_ORACLE = """
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx2,
         CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sy2
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (sx2 - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS var_qty,
       sqrt((sx2 - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS stddev_qty,
       (sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS covar_qty_disc,
       ((sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
         / (sqrt((sx2 - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
            * sqrt((sy2 - sy * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)))
         AS corr_qty_disc
FROM s
"""


def argmax_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin as single aggregates: the order carrying the
    max/min total price per priority class, via struct-valued MAX —
    lexicographic (price, orderkey) comparison makes the winner
    unique even under price ties, so the result is deterministic on
    both engines (bare max_by/arg_max breaks ties arbitrarily — the
    trap this form avoids). One map-side-combinable aggregate; the
    window-argmax twin (window_topk_orders) costs a full sort per
    partition instead."""
    orders = _t(spark, sf_dir, "orders")
    pk = F.struct(F.col("o_totalprice").alias("p"),
                  F.col("o_orderkey").alias("k"))
    return (orders.groupBy("o_orderpriority")
                  .agg(F.max(pk)["k"].alias("top_key"),
                       F.min(pk)["k"].alias("bottom_key"),
                       F.max("o_totalprice").alias("top_price")))


ARGMAX_ORACLE = """
SELECT o_orderpriority,
       (MAX({'p': o_totalprice, 'k': o_orderkey})).k AS top_key,
       (MIN({'p': o_totalprice, 'k': o_orderkey})).k AS bottom_key,
       MAX(o_totalprice) AS top_price
FROM orders GROUP BY o_orderpriority
"""


RECORD_BUCKET_DAYS = 64   # carry-in window is over span/64 bucket rows


def record_high_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global record-breaking orders: every order whose totalprice
    STRICTLY exceeds all prior orders' in (order date, order key)
    sequence — running all-time-high detection (price records, SLA
    records, high-water-mark accounting). The prefix-MAX companion of
    the prefix-sum/rank two-phase decompositions (scalable_rank,
    cusum): per-bucket maxima, a carry-in window over BUCKET rows only
    (span/``RECORD_BUCKET_DAYS`` rows — never data), and an in-bucket
    prefix max in (bucket) partitions. The naive single-window oracle
    makes the hash match the decomposition proof.

    Two properties make this CHEAPER than the rank decomposition at
    100 TB: (1) candidate pruning — a row ≤ its bucket's carry-in can
    neither be a record nor raise any later row's prev_best above the
    carry, so it is filtered BEFORE the in-bucket window (on
    exchangeable data the expected survivor count per bucket is
    O(log bucket_size), so the window input is a sliver of the scan);
    (2) max is idempotent and associative, so the bucket grain can be
    refined hierarchically ((day, key-range) sub-buckets) without
    changing the algebra if one date range outgrows a partition.

    Exactness: cents longs (bround ≡ round_even), strict > on
    integers, first row's empty prefix is an honest NULL prev_best.
    Output: ``(o_orderkey, odate, cents, prev_best)`` — record rows
    only.
    """
    orders = _t(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    o = (orders.select(
            "o_orderkey",
            F.to_date("o_orderdate").cast("string").alias("odate"),
            day.cast("long").alias("_day"),
            F.bround(F.col("o_totalprice") * 100).cast("long")
             .alias("cents"))
         .withColumn("_b", F.expr(f"_day DIV {RECORD_BUCKET_DAYS}")))
    bm = o.groupBy("_b").agg(F.max("cents").alias("_bm"))
    wb = (W.partitionBy().orderBy("_b")
          .rowsBetween(W.unboundedPreceding, -1))
    carry = bm.select("_b", F.max("_bm").over(wb).alias("_carry"))
    cand = (o.join(F.broadcast(carry), "_b")
             .where(F.col("_carry").isNull()
                    | (F.col("cents") > F.col("_carry"))))
    wl = (W.partitionBy("_b").orderBy("_day", "o_orderkey")
          .rowsBetween(W.unboundedPreceding, -1))
    # greatest() skips NULLs: bucket-first survivor keeps the carry,
    # first bucket's survivors keep the in-bucket max, the global
    # first row gets NULL — exactly the naive window's empty-prefix
    # semantics (dropped rows are ≤ carry, so they never change it)
    prev = F.greatest(F.max("cents").over(wl), F.col("_carry"))
    return (cand.withColumn("prev_best", prev)
            .where(F.col("prev_best").isNull()
                   | (F.col("cents") > F.col("prev_best")))
            .select("o_orderkey", "odate", "cents", "prev_best"))


RECORD_HIGH_ORACLE = """
WITH o AS (
  SELECT o_orderkey,
         CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS d,
         CAST(round_even(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
w AS (
  SELECT o_orderkey, odate, cents,
         MAX(cents) OVER (ORDER BY d, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_best
  FROM o
)
SELECT o_orderkey, odate, cents, prev_best
FROM w WHERE prev_best IS NULL OR cents > prev_best
"""


def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches: per-(returnflag, month)
    register tables built in one pass, then max-merged up to
    per-returnflag totals — the pre-aggregated rollup pattern that
    makes 100 TB distinct counts incremental (store tiny register
    partials per partition/day; any rollup is a union of maxima,
    never a rescan — the same continuous-aggregate story as
    rollup_merge_events, for a non-additive measure).

    ORACLED since round 12 (previously rows-only on the engine's
    DataSketches HLL whose serialized sketch internals have no SQL
    mirror): the sketch is the engine's own deterministic register
    algebra (``relational.sketch_distinct_parts``), and because
    register max is associative the DuckDB oracle may skip the
    monthly staging entirely and derive per-flag registers DIRECTLY
    — the oracle match IS the merge-correctness proof, stronger than
    the old accuracy bound. ``n_sketches`` (months merged per flag)
    is checked too.

    Output: ``(l_returnflag, n_sketches, n_rows, m, seen_buckets,
    zero_regs, sum_scaled, reg_sum, est_raw)``.
    """
    from mapreduce_rust_spark.operators.relational import (
        hll_readout, hll_rho_select)
    li = _t(spark, sf_dir, "lineitem")
    monthly = (hll_rho_select(
                   li.withColumn("mon", F.date_format("l_shipdate",
                                                      "yyyy-MM")),
                   ["l_returnflag", "mon"], "l_partkey")
               .groupBy("l_returnflag", "mon", "bucket")
               .agg(F.max("rho").alias("reg"),
                    F.count("*").alias("cnt")))
    merged = (monthly.groupBy("l_returnflag", "bucket")
              .agg(F.max("reg").alias("reg"),
                   F.sum("cnt").alias("cnt")))
    n_sk = (monthly.select("l_returnflag", "mon").distinct()
            .groupBy("l_returnflag")
            .agg(F.count("*").cast("long").alias("n_sketches")))
    return (hll_readout(merged, ["l_returnflag"])
            .join(F.broadcast(n_sk), "l_returnflag")
            .select("l_returnflag", "n_sketches", "n_rows", "m",
                    "seen_buckets", "zero_regs", "sum_scaled",
                    "reg_sum", "est_raw"))


def _hll_mergeable_oracle() -> str:
    from mapreduce_rust_spark.operators.relational import hll_oracle_sql
    inner = hll_oracle_sql("lineitem", "l_returnflag", "l_partkey",
                           "l_returnflag")
    return f"""
WITH direct AS ({inner}),
n_sk AS (
  SELECT l_returnflag,
         CAST(COUNT(DISTINCT strftime(l_shipdate, '%Y-%m')) AS BIGINT)
           AS n_sketches
  FROM lineitem GROUP BY 1
)
SELECT d.l_returnflag, n.n_sketches, d.n_rows, d.m, d.seen_buckets,
       d.zero_regs, d.sum_scaled, d.reg_sum, d.est_raw
FROM direct d JOIN n_sk n ON d.l_returnflag = n.l_returnflag
"""


SKETCH_HLL_MERGEABLE_ORACLE = _hll_mergeable_oracle()


GRIDQ_WIDTH = 256   # cents per grid bucket ($2.56) — error ≤ $1.28


def grid_median_cells(ev: DataFrame) -> DataFrame:
    """(event_type, bucket, count) grid-histogram cells over event
    values — the mergeable sketch partial shared by the batch op and
    its streaming twin. Cells are order-independent (counts sum), so
    any partitioning/micro-batching yields the same table."""
    return (ev.select("event_type",
                      F.bround(F.col("value") * 100).cast("long")
                       .alias("c"))
              .groupBy("event_type",
                       F.expr(f"c DIV {GRIDQ_WIDTH}").alias("b"))
              .agg(F.count("*").alias("m")))


def grid_median_readout(cells: DataFrame) -> DataFrame:
    """Median readout from a grid-cell table: the bucket holding the
    lower-median rank ``(n+1) DIV 2`` per event_type, windows only
    over the ≤ ~200-cell dims-sized grid."""
    wk = (W.partitionBy("event_type").orderBy("b")
          .rowsBetween(W.unboundedPreceding, 0))
    wall = (W.partitionBy("event_type")
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return (cells.withColumn("cum", F.sum("m").over(wk))
            .withColumn("n_rows", F.sum("m").over(wall).cast("long"))
            .withColumn("med_rank", F.expr(
                "CAST((n_rows + 1) DIV 2 AS BIGINT)"))
            .where((F.col("cum") >= F.col("med_rank"))
                   & (F.col("cum") - F.col("m") < F.col("med_rank")))
            .select("event_type", "n_rows", "med_rank",
                    F.col("b").cast("long").alias("bucket"),
                    ((F.col("b") * GRIDQ_WIDTH + GRIDQ_WIDTH // 2)
                     .cast("double") / 100).alias("approx_med")))


def grid_median_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type median value via the fixed-boundary grid
    histogram (the ``sketch_quantile_by_partkey`` design pointed at
    the monitoring surface): cells are bounded mergeable partials
    (≤ ~200 per type at these value ranges), the readout picks the
    bucket bracketing the lower-median rank, and
    |approx − exact median| ≤ GRIDQ_WIDTH/2 cents by construction.

    The point of this registration is its STREAMING twin
    (``stream_grid_median``): the cell table is exactly the bounded
    complete-mode state a 100 TB/day value-distribution monitor
    keeps per key — a median tracker whose state never grows with
    cardinality, unlike a reservoir or a full value log. Both pass
    the SAME integer-arithmetic oracle (fifty-first kappa pair).

    Output: ``(event_type, n_rows, med_rank, bucket, approx_med)``.
    """
    ev = load_table(spark, sf_dir, "events")
    return grid_median_readout(grid_median_cells(ev))


GRID_MEDIAN_ORACLE = f"""
WITH c AS (
  SELECT event_type,
         CAST(round_even(value * 100, 0) AS BIGINT) AS c
  FROM events
),
sk AS (
  SELECT event_type, c // {GRIDQ_WIDTH} AS b,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM c GROUP BY 1, 2
),
r AS (
  SELECT event_type, b, m,
         SUM(m) OVER (PARTITION BY event_type ORDER BY b) AS cum,
         SUM(m) OVER (PARTITION BY event_type) AS n_rows
  FROM sk
)
SELECT event_type, CAST(n_rows AS BIGINT) AS n_rows,
       CAST((n_rows + 1) // 2 AS BIGINT) AS med_rank,
       CAST(b AS BIGINT) AS bucket,
       CAST(b * {GRIDQ_WIDTH} + {GRIDQ_WIDTH // 2} AS DOUBLE) / 100
         AS approx_med
FROM r
WHERE cum >= (n_rows + 1) // 2 AND cum - m < (n_rows + 1) // 2
"""


REGISTRATIONS = [
    ("q3_shipping_priority", q3_shipping_priority, Q3_ORACLE),
    ("q5_local_supplier", q5_local_supplier, Q5_ORACLE),
    ("q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE),
    ("q10_returned_items", q10_returned_items, Q10_ORACLE),
    ("exists_big_order_customers", exists_big_order_customers, EXISTS_ORACLE),
    ("not_exists_idle_suppliers", not_exists_idle_suppliers,
     NOT_EXISTS_ORACLE),
    ("unpivot_part_metrics", unpivot_part_metrics, UNPIVOT_ORACLE),
    ("explode_outer_rare_tokens", explode_outer_rare_tokens,
     EXPLODE_OUTER_ORACLE),
    ("window_range_hour_events", window_range_hour_events,
     WINDOW_RANGE_ORACLE),
    ("window_ntile_orders", window_ntile_orders, WINDOW_NTILE_ORACLE),
    ("window_first_last_orders", window_first_last_orders,
     WINDOW_FIRST_LAST_ORACLE),
    ("rolling_median_orders", rolling_median_orders, ROLLING_MEDIAN_ORACLE),
    ("weighted_median_price", weighted_median_price,
     WEIGHTED_MEDIAN_ORACLE),
    ("life_table_reorders", life_table_reorders, LIFE_TABLE_ORACLE),
    ("fuzzy_match_parts", fuzzy_match_parts, FUZZY_MATCH_ORACLE),
    ("stats_agg_lineitem", stats_agg_lineitem, STATS_AGG_ORACLE),
    ("argmax_orders_by_priority", argmax_orders_by_priority, ARGMAX_ORACLE),
    ("record_high_orders", record_high_orders, RECORD_HIGH_ORACLE),
    ("sketch_hll_mergeable", sketch_hll_mergeable,
     SKETCH_HLL_MERGEABLE_ORACLE),
    ("grid_median_event_value", grid_median_event_value,
     GRID_MEDIAN_ORACLE),
]
