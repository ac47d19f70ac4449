"""Relational operator library (SURVEY.md §2b) — every standard
operator category the reference lacks, expressed Catalyst-first.

The reference has no joins, windows, rollups, set ops, or scalar
function library (SURVEY.md §2b: all rows "absent"); its only
dataflow is scan→flatMap→shuffle→sort-agg (worker.rs:142-193). Here
each capability is a declarative DataFrame/SQL plan so Catalyst
supplies pushdown, pruning, partial aggregation, join selection and
AQE. Scale notes are on each operator.

Oracle discipline (the driver hash-compares Spark vs DuckDB):
- identical column aliases on both sides
- NO floating-point rounding: per-row double expressions pass through
  bit-identical; shuffled aggregates go through ``dsum``/``davg``
  (sum in DECIMAL — exact, order-independent — then cast back to
  double), because ROUND() on doubles hits .005 ties where the two
  engines' rounding modes disagree
- ints derived from functions cast to long (DuckDB returns BIGINT)
- no raw timestamps in output — date strings or epoch bigints
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_rust_spark.tables import load_table, register_views

# Money-ish fixture columns have ≤6 decimal digits, so DECIMAL(18,6)
# captures each row exactly; the decimal SUM is then order-independent
# integer arithmetic and casts back to the same double on any engine.
DEC_MONEY = "decimal(18,6)"
# For irrational per-row values (sqrt/ln) a deeper scale keeps the
# cast far from any tie; sums stay exact.
DEC_FINE = "decimal(27,12)"


def dsum(col: Column, dec: str = DEC_MONEY) -> Column:
    """Order-independent, engine-portable double sum (see module doc).
    SQL mirror: CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)."""
    return F.sum(col.cast(dec)).cast("double")


def davg(col: Column, dec: str = DEC_MONEY) -> Column:
    """Engine-portable mean: exact decimal sum, double division.
    SQL mirror: CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*)."""
    return dsum(col, dec) / F.count(F.lit(1))


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- scans / projection / filter ---------------------------------------

def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection — both reach the parquet scan
    (PushedFilters / ReadSchema; at 100 TB this is the difference
    between reading 2 columns and reading 11)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") >= 48) & (F.col("l_discount") >= 0.05))
          .select(
              "l_orderkey", "l_linenumber", "l_quantity",
              (F.col("l_extendedprice") * (1 - F.col("l_discount")))
              .alias("disc_price"))
    )


FILTER_PROJECT_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice * (1 - l_discount) AS disc_price
FROM lineitem
WHERE l_quantity >= 48 AND l_discount >= 0.05
"""


# --- aggregation --------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical partial+final hash aggregate.
    Catalyst plans map-side combine automatically — the optimization
    the reference structurally cannot do (it shuffles one record per
    row, wc.rs:11)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
              F.sum("l_quantity").alias("sum_qty"),
              dsum(F.col("l_extendedprice")).alias("sum_base_price"),
              dsum(disc_price).alias("sum_disc_price"),
              dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
              F.avg("l_quantity").alias("avg_qty"),
              davg(F.col("l_extendedprice")).alias("avg_price"),
              davg(F.col("l_discount")).alias("avg_disc"),
              F.count("*").alias("count_order"),
          )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       AVG(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def agg_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand+two-phase under Catalyst; the
    100 TB alternative is approx_count_distinct, see the sketch ops)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
          .agg(F.countDistinct("l_suppkey").alias("n_supp"),
               F.countDistinct("l_partkey").alias("n_part"),
               F.count("*").alias("n_rows"))
    )


AGG_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def rollup_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
          .agg(F.sum("l_quantity").alias("sum_qty"),
               F.count("*").alias("n"))
    )


ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
          .agg(F.sum("l_quantity").alias("sum_qty"),
               F.count("*").alias("n"))
    )


CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL API (same Catalyst plan as the
    DataFrame route — demonstrates the SQL front door)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (avoids the extra
    distinct-values job — mandatory at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
          .pivot("l_linestatus", ["O", "F"])
          .agg(F.sum("l_quantity"))
          .select(F.col("l_returnflag"),
                  F.col("O").alias("qty_o"), F.col("F").alias("qty_f"))
    )


PIVOT_ORACLE = """
SELECT l_returnflag,
       SUM(l_quantity) FILTER (WHERE l_linestatus = 'O') AS qty_o,
       SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_f
FROM lineitem GROUP BY l_returnflag
"""


# --- joins --------------------------------------------------------------

def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact⋈orders⋈customer⋈nation⋈region. nation/region
    are broadcast (they never grow with SF). The fact side is
    PRE-AGGREGATED to per-order partials before joining — lineitem:
    orders is ~4:1, so the join input shrinks 4x (measured 17% faster
    even locally; at 100 TB it's the difference between shuffling the
    fact table and shuffling order-grain partials). Decimal partials
    re-associate exactly, so results are bit-identical."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    per_order = (li.groupBy("l_orderkey")
                   .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                              .cast(DEC_MONEY)).alias("rev_dec"),
                        F.count("*").alias("items")))
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
          .join(cust, orders.o_custkey == cust.c_custkey)
          .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
          .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
          .groupBy("r_name", "n_name")
          .agg(F.sum("rev_dec").cast("double").alias("revenue"),
               F.sum("items").alias("n_items"))
    )


JOIN_REVENUE_ORACLE = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
            .groupBy("c_custkey", "c_mktsegment")
            .agg(F.count("o_orderkey").alias("n_orders"),
                 F.coalesce(dsum(F.col("o_totalprice")), F.lit(0.0))
                  .alias("total_spent"))
    )


JOIN_LEFT_ORACLE = """
SELECT c_custkey, c_mktsegment,
       COUNT(o_orderkey) AS n_orders,
       COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 0.0)
         AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


def join_semi_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS) — no fact columns materialized, no row
    multiplication; the scalable form of 'has at least one'."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
                .select("c_custkey", "c_name", "c_mktsegment"))


JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
                .select("c_custkey", "c_name", "c_mktsegment"))


JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def join_theta_qty_gt_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join + theta residual (quantity > size). The equi key
    carries the shuffle; the theta predicate evaluates post-match —
    never plan a pure theta join as a cross product at scale."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part),
                (li.l_partkey == part.p_partkey) & (li.l_quantity > part.p_size))
          .groupBy("p_brand")
          .agg(F.count("*").alias("n"),
               F.sum("l_quantity").alias("sum_qty"))
    )


JOIN_THETA_ORACLE = """
SELECT p_brand, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
GROUP BY p_brand
"""


# --- windows ------------------------------------------------------------

def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the scalable top-k (no global
    sort; each group ranks within its shuffle partition). Deterministic
    tiebreak on o_orderkey."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(),
                                           F.col("o_orderkey"))
    return (orders.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= 3)
                  .select("o_custkey", "o_orderkey", "o_totalprice",
                          F.col("rn").cast("long").alias("rn")))


WINDOW_TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum; summed in DECIMAL because windowed double sums are
    association-order-sensitive across engines (DuckDB segment trees)."""
    orders = _t(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC_MONEY)).over(w)
         .cast("double").alias("running_total"))


WINDOW_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w))
        .alias("delta_prev"))


WINDOW_LAG_ORACLE = """
SELECT o_custkey, o_orderkey,
       o_totalprice - LAG(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta_prev
FROM orders
"""


def window_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return part.select(
        "p_partkey", "p_brand",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"))


WINDOW_RANK_ORACLE = """
SELECT p_partkey, p_brand,
       RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
       DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank
FROM part
"""


# --- set ops / distinct / sort-limit -------------------------------------

def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


SET_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics — Spark ``subtract``): customers who
    placed urgent orders but never high-priority ones."""
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    return urgent.subtract(high)


SET_EXCEPT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
"""


def set_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL then re-aggregate (union is metadata-only in Spark —
    no shuffle until the groupBy)."""
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    high = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "2-HIGH")
    return (urgent.unionByName(high)
                  .groupBy("o_orderpriority")
                  .agg(F.count("*").alias("n")))


SET_UNION_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n FROM (
  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT * FROM orders WHERE o_orderpriority = '2-HIGH'
) GROUP BY o_orderpriority
"""


def set_intersect_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (multiplicities preserved)."""
    a = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "A") \
        .select(F.col("l_suppkey").alias("k"))
    b = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R") \
        .select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(b).groupBy("k").agg(F.count("*").alias("n"))


SET_INTERSECT_ALL_ORACLE = """
SELECT k, COUNT(*) AS n FROM (
  SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
  INTERSECT ALL
  SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
) GROUP BY k
"""


def set_except_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL."""
    a = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "A") \
        .select(F.col("l_suppkey").alias("k"))
    b = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R") \
        .select(F.col("l_suppkey").alias("k"))
    return a.exceptAll(b).groupBy("k").agg(F.count("*").alias("n"))


SET_EXCEPT_ALL_ORACLE = """
SELECT k, COUNT(*) AS n FROM (
  SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
  EXCEPT ALL
  SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
) GROUP BY k
"""


def join_full_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: customer vs supplier per-nation counts, both
    null sides preserved."""
    c = (_t(spark, sf_dir, "customer").groupBy("c_nationkey")
         .agg(F.count("*").alias("n_cust")))
    s = (_t(spark, sf_dir, "supplier")
         .filter(F.col("s_acctbal") > 5000)
         .groupBy("s_nationkey").agg(F.count("*").alias("n_supp")))
    return (c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
             .select(F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
                     F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
                     F.coalesce("n_supp", F.lit(0)).alias("n_supp")))


JOIN_FULL_OUTER_ORACLE = """
WITH c AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
s AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
      WHERE s_acctbal > 5000 GROUP BY 1)
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
"""


def join_cross_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (dim × dim only — a fact-side cross join is
    never acceptable at scale)."""
    r = _t(spark, sf_dir, "region").select(F.col("r_name").alias("a"))
    r2 = _t(spark, sf_dir, "region").select(F.col("r_name").alias("b"))
    return r.crossJoin(r2).filter(F.col("a") < F.col("b"))


JOIN_CROSS_ORACLE = """
SELECT a.r_name AS a, b.r_name AS b FROM region a, region b
WHERE a.r_name < b.r_name
"""


def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (UDTF shape) — token with its 1-based
    position, small doc subset."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = F.split(F.col("text"), r"\s+")
    return (docs.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
                .select("doc_id", (F.col("pos") + 1).cast("long").alias("pos"), "tok")
                .filter(F.col("tok") != ""))


POSEXPLODE_ORACLE = """
SELECT doc_id, u.pos, u.tok
FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS l
      FROM documents WHERE doc_id < 20),
LATERAL (SELECT l[i] AS tok, i AS pos
         FROM UNNEST(generate_series(1, len(l))) AS g(i)) u
WHERE u.tok <> ''
"""


def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


DISTINCT_ORACLE = "SELECT DISTINCT c_mktsegment FROM customer"


def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit plans as TakeOrderedAndProject —
    per-partition heaps + driver merge of k rows, NOT a global sort."""
    orders = _t(spark, sf_dir, "orders")
    return (orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
                  .limit(10)
                  .select("o_orderkey", "o_custkey", "o_totalprice"))


TOPK_GLOBAL_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# --- scalar function library --------------------------------------------

def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").like("%a%"))
            .select(
                "p_partkey",
                F.upper("p_type").alias("type_u"),
                F.length("p_name").cast("long").alias("name_len"),
                F.substring("p_name", 1, 5).alias("name_pre5"),
                F.regexp_replace("p_brand", "Brand", "B").alias("brand_s"),
                F.concat_ws("/", "p_brand", "p_type").alias("brand_type"))
    )


STRING_FUNCS_ORACLE = """
SELECT p_partkey, UPPER(p_type) AS type_u, LENGTH(p_name) AS name_len,
       SUBSTRING(p_name, 1, 5) AS name_pre5,
       REGEXP_REPLACE(p_brand, 'Brand', 'B') AS brand_s,
       CONCAT(p_brand, '/', p_type) AS brand_type
FROM part WHERE p_name LIKE '%a%'
"""


def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").cast("long").alias("o_year"),
                       F.month("o_orderdate").cast("long").alias("o_month"))
              .agg(F.count("*").alias("n_orders"),
                   dsum(F.col("o_totalprice")).alias("sum_total"),
                   F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_day"))
    )


DATE_FUNCS_ORACLE = """
SELECT YEAR(o_orderdate) AS o_year, MONTH(o_orderdate) AS o_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total,
       MIN(STRFTIME(o_orderdate, '%Y-%m-%d')) AS first_day
FROM orders GROUP BY 1, 2
"""


def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function sweep. Only IEEE-exact / correctly-rounded ops
    (sqrt, abs, *, /) are oracle-checked — transcendentals (ln, pow,
    exp) are NOT correctly rounded and differ across libm
    implementations by ulps, which no portable rounding fixes."""
    li = _t(spark, sf_dir, "lineitem")
    # Scales chosen so sum × 10^scale < 2^53: keeps the DECIMAL→DOUBLE
    # cast single-rounded on both engines (DuckDB's int128 path
    # double-rounds above that).
    return (
        li.groupBy("l_returnflag")
          .agg(dsum(F.sqrt("l_quantity"), "decimal(27,8)").alias("sum_sqrt_qty"),
               davg(F.col("l_discount") * F.col("l_discount"), DEC_FINE)
                 .alias("avg_disc_sq"),
               dsum(F.abs(F.col("l_tax") - 0.04), DEC_FINE).alias("sum_abs_tax_dev"),
               dsum(F.col("l_extendedprice") / (1 + F.col("l_tax")), "decimal(27,4)")
                 .alias("sum_price_pretax"))
    )


MATH_FUNCS_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(SQRT(l_quantity) AS DECIMAL(27,8))) AS DOUBLE) AS sum_sqrt_qty,
       CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS avg_disc_sq,
       CAST(SUM(CAST(ABS(l_tax - 0.04) AS DECIMAL(27,12))) AS DOUBLE) AS sum_abs_tax_dev,
       CAST(SUM(CAST(l_extendedprice / (1 + l_tax) AS DECIMAL(27,4))) AS DOUBLE) AS sum_price_pretax
FROM lineitem GROUP BY l_returnflag
"""


def array_funcs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_max(toks).alias("max_token"))


ARRAY_FUNCS_ORACLE = """
SELECT doc_id,
       LEN(toks) AS n_tokens,
       LEN(list_distinct(toks)) AS n_distinct,
       toks[1] AS first_token,
       list_max(toks) AS max_token
FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents)
"""


def json_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the props column."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
          .groupBy("event_type")
          .agg(F.count("*").alias("n"),
               F.avg("k").alias("avg_k"),
               F.max("k").alias("max_k"))
    )


JSON_FUNCS_ORACLE = """
SELECT event_type, COUNT(*) AS n, AVG(k) AS avg_k, MAX(k) AS max_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""


def agg_collect_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregate with deterministic output: sorted distinct
    set rendered as a joined string (portable across engines, unlike
    raw array ordering)."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.groupBy("lang")
                .agg(F.array_join(F.array_sort(F.collect_set("source")), ",")
                      .alias("sources"),
                     F.count("*").alias("n_docs")))


AGG_COLLECT_ORACLE = """
SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang
"""


def percentile_exact_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (sort-based; the exact
    counterpart of the sketch path — fine at one-group scope, use
    percentile_approx when grouped by a high-cardinality key)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"))


PERCENTILE_EXACT_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90
FROM lineitem GROUP BY l_returnflag
"""


# --- approximate sketches --------------------------------------------------

# --- deterministic HLL (round-12 rows-only → ORACLED conversion) ---------
# Explicit register algebra instead of the engine's built-in
# approx_count_distinct: a murmur3-finalized 32-bit hash (wide-decimal
# multiplies so the mod-2^32 wrap is identical on engines that
# raise vs wrap on int64 overflow), top-9-bit bucketing (m = 512),
# leading-zero rank via a pure-comparison CASE ladder, and the
# harmonic sum kept as the EXACT integer Σ2^(32−reg) — so every
# column is order-independent integer algebra except the final
# estimate, which is ONE correctly-rounded double division. The
# sketch stays one-pass and mergeable (register max commutes), and
# the DuckDB oracle re-derives the identical registers.
HLL_P = 9
HLL_M = 1 << HLL_P               # 512 registers
HLL_W = 32 - HLL_P               # 23-bit rho field
HLL_C1 = 0x85EBCA6B              # murmur3 fmix32 constants
HLL_C2 = 0xC2B2AE35
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_EST_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << 32)


def _hll_rho_sql(w: str) -> str:
    """rho = 1 + leading zeros of the 23-bit field ``w`` — a pure
    integer-comparison ladder (identical text both engines; no
    log2/bit_length libm)."""
    cases = [f"WHEN {w} >= {1 << (HLL_W - 1 - i)} THEN {i + 1}"
             for i in range(HLL_W)]
    return (f"CASE WHEN {w} = 0 THEN {HLL_W + 1} "
            + " ".join(cases) + " END")


def _hll_mix_sql(key: str, xor: str, idiv: str) -> list[str]:
    """The murmur3 fmix32 pipeline as engine-templated statements:
    ``xor``/``idiv`` are format strings for bitwise-xor and integer
    division ('({0} ^ {1})' / '({0} DIV {1})' on Spark,
    'xor({0}, {1})' / '({0} // {1})' on DuckDB). Multiplies route
    through DECIMAL(38,0)/HUGEINT so the mod-2^32 wrap never
    overflows int64 on either engine."""
    m32 = 4294967296
    h0 = f"({key} % {m32})"
    h1 = xor.format(h0, idiv.format(h0, 65536))
    h2 = (f"CAST(CAST({h1} AS DECIMAL(38,0)) * {HLL_C1} % {m32}"
          f" AS BIGINT)")
    h3 = xor.format(h2, idiv.format(h2, 8192))
    h4 = (f"CAST(CAST({h3} AS DECIMAL(38,0)) * {HLL_C2} % {m32}"
          f" AS BIGINT)")
    return [xor.format(h4, idiv.format(h4, 65536))]


def sketch_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct counting — the 100 TB substitute for
    exact COUNT(DISTINCT) (no expand, one pass, mergeable register
    maxima). ORACLED since round 12 (previously rows-only on the
    engine's implementation-defined approx_count_distinct): the
    sketch is now explicit deterministic register algebra (module
    comment above), so DuckDB re-derives it bit-for-bit. Output
    carries the exact integer sufficient statistics — clients in the
    small-range regime (n ≲ 2.5·m) apply the linear-counting
    correction m·ln(m/zero_regs) themselves (ln is libm, excluded
    from oracle-checked output by engine rule) — plus ``est_raw``,
    the standard-regime estimate as one fixed IEEE division.
    Accuracy vs exact distinct is asserted in tests (−3.3% on the
    sf0.01 fixture at m = 512).

    Scale: hash + bucket + rho are per-row projections; the only
    shuffle is the (flag, bucket) register aggregate — ≤ flags·512
    cells with map-side max combine. Register maxima merge
    associatively, so partials roll up from any partitioning (the
    mergeable-cells story of rollup_merge_events for a non-additive
    measure).

    Output: ``(l_returnflag, n_rows, m, seen_buckets, zero_regs,
    sum_scaled, reg_sum, est_raw)``.
    """
    li = _t(spark, sf_dir, "lineitem")
    [h] = _hll_mix_sql("l_partkey", "({0} ^ {1})", "({0} DIV {1})")
    per = (li.select("l_returnflag", F.expr(h).alias("h"))
           .select("l_returnflag",
                   F.expr(f"h DIV {1 << HLL_W}").alias("bucket"),
                   F.expr(_hll_rho_sql(f"(h % {1 << HLL_W})"))
                    .alias("rho"))
           .groupBy("l_returnflag", "bucket")
           .agg(F.max("rho").alias("reg"),
                F.count("*").alias("cnt")))
    return (per.groupBy("l_returnflag")
            .agg(F.sum("cnt").cast("long").alias("n_rows"),
                 F.count("*").cast("long").alias("seen_buckets"),
                 F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 32 - reg)"))
                  .cast("long").alias("sum_seen"),
                 F.sum("reg").cast("long").alias("reg_sum"))
            .select("l_returnflag", "n_rows",
                    F.lit(HLL_M).cast("long").alias("m"),
                    "seen_buckets",
                    (F.lit(HLL_M) - F.col("seen_buckets")).cast("long")
                     .alias("zero_regs"),
                    (F.col("sum_seen")
                     + (F.lit(HLL_M) - F.col("seen_buckets"))
                     * F.lit(4294967296)).cast("long").alias("sum_scaled"),
                    "reg_sum")
            .withColumn("est_raw",
                        F.expr(f"CAST({HLL_EST_NUM!r} AS DOUBLE)"
                               " / CAST(sum_scaled AS DOUBLE)")))


def _hll_oracle() -> str:
    [h] = _hll_mix_sql("l_partkey", "xor({0}, {1})", "({0} // {1})")
    return f"""
WITH hashed AS (
  SELECT l_returnflag, {h} AS h
  FROM lineitem
),
per AS (
  SELECT l_returnflag, h // {1 << HLL_W} AS bucket,
         MAX({_hll_rho_sql(f"(h % {1 << HLL_W})")}) AS reg,
         COUNT(*) AS cnt
  FROM hashed GROUP BY 1, 2
)
SELECT l_returnflag,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST({HLL_M} AS BIGINT) AS m,
       CAST(COUNT(*) AS BIGINT) AS seen_buckets,
       CAST({HLL_M} - COUNT(*) AS BIGINT) AS zero_regs,
       CAST(SUM(CAST(1 AS BIGINT) << (32 - reg))
            + ({HLL_M} - COUNT(*)) * 4294967296 AS BIGINT)
         AS sum_scaled,
       CAST(SUM(reg) AS BIGINT) AS reg_sum,
       CAST({HLL_EST_NUM!r} AS DOUBLE)
         / CAST(CAST(SUM(CAST(1 AS BIGINT) << (32 - reg))
                     + ({HLL_M} - COUNT(*)) * 4294967296 AS BIGINT)
                AS DOUBLE) AS est_raw
FROM per GROUP BY l_returnflag
"""


SKETCH_DISTINCT_ORACLE = _hll_oracle()


# Generic forms of the deterministic-HLL pieces, shared by the
# mergeable rollup (analytic.sketch_hll_mergeable) and the streaming
# twin (streaming.windows.stream_approx_distinct_users):

def hll_rho_select(df: DataFrame, key_cols: list[str],
                   id_col: str) -> DataFrame:
    """(key..., bucket, rho) projection — the per-row sketch input."""
    [h] = _hll_mix_sql(id_col, "({0} ^ {1})", "({0} DIV {1})")
    return (df.select(*key_cols, F.expr(h).alias("h"))
            .select(*key_cols,
                    F.expr(f"h DIV {1 << HLL_W}").alias("bucket"),
                    F.expr(_hll_rho_sql(f"(h % {1 << HLL_W})"))
                     .alias("rho")))


def hll_readout(per: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-key sufficient statistics + raw estimate from a register
    table ``(key..., bucket, reg, cnt)`` — the sketch_distinct_parts
    readout keyed generically."""
    return (per.groupBy(*key_cols)
            .agg(F.sum("cnt").cast("long").alias("n_rows"),
                 F.count("*").cast("long").alias("seen_buckets"),
                 F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 32 - reg)"))
                  .cast("long").alias("sum_seen"),
                 F.sum("reg").cast("long").alias("reg_sum"))
            .select(*key_cols, "n_rows",
                    F.lit(HLL_M).cast("long").alias("m"),
                    "seen_buckets",
                    (F.lit(HLL_M) - F.col("seen_buckets")).cast("long")
                     .alias("zero_regs"),
                    (F.col("sum_seen")
                     + (F.lit(HLL_M) - F.col("seen_buckets"))
                     * F.lit(4294967296)).cast("long").alias("sum_scaled"),
                    "reg_sum")
            .withColumn("est_raw",
                        F.expr(f"CAST({HLL_EST_NUM!r} AS DOUBLE)"
                               " / CAST(sum_scaled AS DOUBLE)")))


def hll_oracle_sql(source_sql: str, key_sql: str, id_sql: str,
                   key_out: str) -> str:
    """The full hashed→registers→readout pipeline as one DuckDB CTE
    chain over ``source_sql`` (a FROM-able relation), keyed by
    ``key_sql`` (one expression, aliased ``k``) and hashed on
    ``id_sql``; ``key_out`` names the key in the output."""
    [h] = _hll_mix_sql(id_sql, "xor({0}, {1})", "({0} // {1})")
    return f"""
WITH hashed AS (
  SELECT {key_sql} AS k, {h} AS h
  FROM {source_sql}
),
per AS (
  SELECT k, h // {1 << HLL_W} AS bucket,
         MAX({_hll_rho_sql(f"(h % {1 << HLL_W})")}) AS reg,
         COUNT(*) AS cnt
  FROM hashed GROUP BY 1, 2
)
SELECT k AS {key_out},
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST({HLL_M} AS BIGINT) AS m,
       CAST(COUNT(*) AS BIGINT) AS seen_buckets,
       CAST({HLL_M} - COUNT(*) AS BIGINT) AS zero_regs,
       CAST(SUM(CAST(1 AS BIGINT) << (32 - reg))
            + ({HLL_M} - COUNT(*)) * 4294967296 AS BIGINT)
         AS sum_scaled,
       CAST(SUM(reg) AS BIGINT) AS reg_sum,
       CAST({HLL_EST_NUM!r} AS DOUBLE)
         / CAST(CAST(SUM(CAST(1 AS BIGINT) << (32 - reg))
                     + ({HLL_M} - COUNT(*)) * 4294967296 AS BIGINT)
                AS DOUBLE) AS est_raw
FROM per GROUP BY k
"""


QSK_WIDTH = 8192       # coarse histogram bucket width in cents ($81.92)
QSK_PCTS = (50, 90, 99)


def sketch_quantile_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed quantiles (p50/p90/p99 of extendedprice)
    via the two-phase histogram algorithm — the scale shape that
    replaces a global sort: phase 1 builds a fixed-width cents
    histogram (≤ ~1.4k buckets — a mergeable, order-independent
    map-side partial, the same sketch-partial story as the
    deterministic HLL), locates each target rank's bucket by a
    dims-sized cumulative walk; phase 2 re-scans ONLY the selected
    buckets (3 of them) and resolves the exact order statistic from
    the per-cents counts inside — no row sort anywhere, windows only
    over dims-sized tables.

    ORACLED since round 12 (previously rows-only on
    ``percentile_approx``'s GK sketch, whose compaction is
    partition-order-dependent with no cross-engine mirror): the
    two-phase result is the EXACT rank-``ceil(p·n/100)`` order
    statistic, which DuckDB re-derives directly by row_number — the
    hash match proves the histogram refinement exact, stronger than
    the old 5%-accuracy bound. GK remains available through
    ``percentile_approx`` when a one-pass streaming sketch is wanted.

    Output: ``(pct, n_rows, rank, cents, price)``, one row per
    target percentile. At 100 TB both phases are full scans but each
    shuffles only (bucket,count) / (cents,count) pairs; phase 2's
    per-bucket distinct-cents is ≤ QSK_WIDTH by construction.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        F.bround(F.col("l_extendedprice") * 100).cast("long").alias("c"))
    hist = (li.groupBy(F.expr(f"c DIV {QSK_WIDTH}").alias("b"))
              .agg(F.count("*").alias("bn")))
    wb = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("bn").over(wb))
    tot = cum.agg(F.max("cum").cast("long").alias("n_rows"))
    qs = (tot.select(F.explode(F.array(
              *[F.lit(p) for p in QSK_PCTS])).alias("pct"), "n_rows")
             .withColumn("rank", F.expr(
                 "CAST((pct * n_rows + 99) DIV 100 AS BIGINT)")))
    sel = (F.broadcast(qs)
           .join(cum, (F.col("cum") >= F.col("rank"))
                 & (F.col("cum") - F.col("bn") < F.col("rank")))
           .select("pct", "n_rows", "rank", "b",
                   (F.col("rank") - (F.col("cum") - F.col("bn")))
                   .alias("wr")))
    fine = (li.join(F.broadcast(sel),
                    F.expr(f"c DIV {QSK_WIDTH}") == F.col("b"))
              .groupBy("pct", "n_rows", "rank", "wr", "c")
              .agg(F.count("*").alias("m")))
    wc = (W.partitionBy("pct").orderBy("c")
          .rowsBetween(W.unboundedPreceding, 0))
    return (fine.withColumn("cum2", F.sum("m").over(wc))
            .where((F.col("cum2") >= F.col("wr"))
                   & (F.col("cum2") - F.col("m") < F.col("wr")))
            .select("pct", "n_rows", "rank", F.col("c").alias("cents"),
                    (F.col("c").cast("double") / 100).alias("price")))


SKETCH_QUANTILE_ORACLE = """
WITH c AS (
  SELECT CAST(round_even(l_extendedprice * 100, 0) AS BIGINT) AS c
  FROM lineitem
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM c),
q AS (
  SELECT pct, n_rows,
         CAST((pct * n_rows + 99) // 100 AS BIGINT) AS rank
  FROM n, UNNEST([50, 90, 99]) t(pct)
),
o AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM c)
SELECT q.pct, q.n_rows, q.rank, o.c AS cents,
       CAST(o.c AS DOUBLE) / 100 AS price
FROM q JOIN o ON o.rn = q.rank
"""


def sketch_quantile_by_partkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped approximate median at a HIGH-CARDINALITY key (one
    sketch per l_partkey, ~2k groups at sf0.01 / 20M at TPC-H sf100)
    — the shape ``percentile_exact_price``'s docstring tells you to
    use at scale: the per-group sketch is a FIXED-WIDTH cents
    histogram (≤ ~1.4k cells of (bucket, count), usually far fewer),
    whose cells are mergeable map-side partials, so the shuffle
    carries one bounded sketch per (partition, key) instead of every
    row sorting inside its group.

    ORACLED since round 12 (previously rows-only on
    ``percentile_approx``'s GK sketch — partition-order-dependent
    compaction, no cross-engine mirror): the fixed-boundary grid is
    deterministic and order-independent, so DuckDB re-derives the
    identical readout — the bucket holding the lower-median rank
    ``(n+1) DIV 2`` — with pure integer arithmetic. The estimate
    ``approx_p50`` is the bucket midpoint: |approx − exact median| ≤
    QSK_WIDTH/2 cents by construction (pinned in tests). GK remains
    available through ``percentile_approx``.

    Output: ``(l_partkey, n_rows, med_rank, bucket, approx_p50)``.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.bround(F.col("l_extendedprice") * 100).cast("long").alias("c"))
    sk = (li.groupBy("l_partkey", F.expr(f"c DIV {QSK_WIDTH}").alias("b"))
            .agg(F.count("*").alias("m")))
    wk = (W.partitionBy("l_partkey").orderBy("b")
          .rowsBetween(W.unboundedPreceding, 0))
    wall = (W.partitionBy("l_partkey")
            .rowsBetween(W.unboundedPreceding,
                         W.unboundedFollowing))
    return (sk.withColumn("cum", F.sum("m").over(wk))
              .withColumn("n_rows", F.sum("m").over(wall).cast("long"))
              .withColumn("med_rank", F.expr(
                  "CAST((n_rows + 1) DIV 2 AS BIGINT)"))
              .where((F.col("cum") >= F.col("med_rank"))
                     & (F.col("cum") - F.col("m") < F.col("med_rank")))
              .select("l_partkey", "n_rows", "med_rank",
                      F.col("b").cast("long").alias("bucket"),
                      ((F.col("b") * QSK_WIDTH + QSK_WIDTH // 2)
                       .cast("double") / 100).alias("approx_p50")))


SKETCH_QUANTILE_BY_PARTKEY_ORACLE = f"""
WITH c AS (
  SELECT l_partkey,
         CAST(round_even(l_extendedprice * 100, 0) AS BIGINT) AS c
  FROM lineitem
),
sk AS (
  SELECT l_partkey, c // {QSK_WIDTH} AS b,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM c GROUP BY 1, 2
),
r AS (
  SELECT l_partkey, b, m,
         SUM(m) OVER (PARTITION BY l_partkey ORDER BY b) AS cum,
         SUM(m) OVER (PARTITION BY l_partkey) AS n_rows
  FROM sk
)
SELECT l_partkey, CAST(n_rows AS BIGINT) AS n_rows,
       CAST((n_rows + 1) // 2 AS BIGINT) AS med_rank,
       CAST(b AS BIGINT) AS bucket,
       CAST(b * {QSK_WIDTH} + {QSK_WIDTH // 2} AS DOUBLE) / 100
         AS approx_p50
FROM r
WHERE cum >= (n_rows + 1) // 2 AND cum - m < (n_rows + 1) // 2
"""


def rollup_merge_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate (hypertable-rollup) pattern: history is
    served from a PRE-AGGREGATED hourly rollup, only the tail (last
    day) is aggregated from raw events, and the two merge to the same
    answer as aggregating everything raw — which is exactly what the
    oracle checks. At 100 TB the rollup is a materialized table
    refreshed incrementally; the query-time cost drops from
    O(all events) to O(rollup rows + tail events)."""
    ev = _t(spark, sf_dir, "events")
    cutoff = "2024-01-25 00:00:00"
    hist = ev.filter(F.col("ts") < cutoff)
    tail = ev.filter(F.col("ts") >= cutoff)

    def hourly(df):
        # partials stay DECIMAL — a double round-trip here would only
        # be tie-safe when the cutoff aligns with the window grid; in
        # decimal the merge is exact for ANY cutoff
        return (df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                  .agg(F.count("*").alias("n"),
                       F.sum(F.col("value").cast(DEC_FINE)).alias("sum_dec")))

    # the "materialized" rollup (in production: read from a table)
    rollup = hourly(hist)
    merged = rollup.unionByName(hourly(tail))
    # merge partials: counts add, decimal sums add exactly; the single
    # double cast happens once, after the final re-sum
    return (merged
            .select(F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
                    "event_type", "n", "sum_dec")
            .groupBy("bucket_start", "event_type")
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_dec").cast("double").alias("sum_value")))


ROLLUP_MERGE_ORACLE = """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,12))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# --- subqueries (SQL front door) -----------------------------------------

def scalar_subquery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS n_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        GROUP BY o_orderpriority
    """)


SCALAR_SUBQUERY_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_above_avg
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
GROUP BY o_orderpriority
"""


def in_subquery_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag
    """)


IN_SUBQUERY_ORACLE = """
SELECT l_returnflag, COUNT(*) AS n
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


# --- event-time (batch) ---------------------------------------------------

def tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows over event time (batch form of the
    streaming slice; epoch-aligned both engines)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
          .agg(F.count("*").alias("n"),
               dsum(F.col("value"), DEC_FINE).alias("sum_value"))
          .select(F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
                  "event_type", "n", "sum_value")
    )


TUMBLING_ORACLE = """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,12))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


SESSION_GAP_S = 1800


def _sessionize(ev: DataFrame) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + session-
    start counter — one shuffle on user_id, linear per group. The
    whole user sorts in ONE task: fine until a single giant user."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    sess = ev.withColumn("new_sess", new_sess)
    return (sess.groupBy("user_id")
                .agg(F.sum("new_sess").alias("n_sessions"),
                     F.count("*").alias("n_events")))


def _sessionize_scalable(ev: DataFrame) -> DataFrame:
    """Giant-key-proof sessionization, bit-identical to
    ``_sessionize`` (same oracle). Two phases:

    1. sessionize within (user_id, day) — the event-level sort is
       partitioned by day, so one user with 10⁹ events no longer
       lands in a single task;
    2. merge at bucket boundaries — per (user, day) emit (local
       session count, event count, first/last ts); a second window
       over the user's BUCKETS (≤ days, not events) subtracts one
       session wherever the next bucket's first event is within the
       gap of the previous bucket's last event.

    Exact because a session can only cross a boundary between
    time-adjacent buckets, and day >> gap means an empty bucket in
    between always breaks the session. For a user hot enough to
    dominate a single day, re-bucket by hour — same algebra."""
    b = ev.withColumn("day", F.to_date("ts"))
    w = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    per_bucket = (b.withColumn("new_sess", new_sess)
                   .groupBy("user_id", "day")
                   .agg(F.sum("new_sess").alias("n_sess_local"),
                        F.count("*").alias("n_events"),
                        F.min(F.col("ts").cast("long")).alias("first_ts"),
                        F.max(F.col("ts").cast("long")).alias("last_ts")))
    wb = W.partitionBy("user_id").orderBy("day")
    bgap = F.col("first_ts") - F.lag("last_ts").over(wb)
    merged = per_bucket.withColumn(
        "boundary_merge",
        F.when(bgap.isNotNull() & (bgap <= SESSION_GAP_S), 1).otherwise(0))
    return (merged.groupBy("user_id")
                  .agg((F.sum("n_sess_local") - F.sum("boundary_merge"))
                       .alias("n_sessions"),
                       F.sum("n_events").alias("n_events")))


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sessionize(_t(spark, sf_dir, "events"))


def sessionize_events_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-proof sessionization path, driver-checked against the
    SAME oracle as ``sessionize_events`` — proving the two-phase
    decomposition is semantics-preserving, not an approximation."""
    return _sessionize_scalable(_t(spark, sf_dir, "events"))


SESSIONIZE_ORACLE = """
WITH marked AS (
  SELECT user_id,
         CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT) - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER w IS NULL
               OR CAST(FLOOR(epoch(ts)) AS BIGINT) - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM marked GROUP BY user_id
"""


REGISTRATIONS: list[tuple[str, object, str | None]] = [
    ("filter_project", filter_project, FILTER_PROJECT_ORACLE),
    ("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE),
    ("agg_distinct_suppliers", agg_distinct_suppliers, AGG_DISTINCT_ORACLE),
    ("rollup_qty", rollup_qty, ROLLUP_ORACLE),
    ("cube_qty", cube_qty, CUBE_ORACLE),
    ("grouping_sets_revenue", grouping_sets_revenue, GROUPING_SETS_ORACLE),
    ("pivot_status_qty", pivot_status_qty, PIVOT_ORACLE),
    ("join_revenue_by_nation", join_revenue_by_nation, JOIN_REVENUE_ORACLE),
    ("join_left_order_counts", join_left_order_counts, JOIN_LEFT_ORACLE),
    ("join_semi_customers", join_semi_customers, JOIN_SEMI_ORACLE),
    ("join_anti_customers", join_anti_customers, JOIN_ANTI_ORACLE),
    ("join_theta_qty_gt_size", join_theta_qty_gt_size, JOIN_THETA_ORACLE),
    ("window_topk_orders", window_topk_orders, WINDOW_TOPK_ORACLE),
    ("window_running_total", window_running_total, WINDOW_RUNNING_ORACLE),
    ("window_lag_delta", window_lag_delta, WINDOW_LAG_ORACLE),
    ("window_rank_parts", window_rank_parts, WINDOW_RANK_ORACLE),
    ("set_intersect_nations", set_intersect_nations, SET_INTERSECT_ORACLE),
    ("set_except_customers", set_except_customers, SET_EXCEPT_ORACLE),
    ("set_union_counts", set_union_counts, SET_UNION_ORACLE),
    ("set_intersect_all_keys", set_intersect_all_keys, SET_INTERSECT_ALL_ORACLE),
    ("set_except_all_keys", set_except_all_keys, SET_EXCEPT_ALL_ORACLE),
    ("join_full_outer_nations", join_full_outer_nations, JOIN_FULL_OUTER_ORACLE),
    ("join_cross_regions", join_cross_regions, JOIN_CROSS_ORACLE),
    ("posexplode_tokens", posexplode_tokens, POSEXPLODE_ORACLE),
    ("distinct_segments", distinct_segments, DISTINCT_ORACLE),
    ("topk_orders_global", topk_orders_global, TOPK_GLOBAL_ORACLE),
    ("string_funcs_part", string_funcs_part, STRING_FUNCS_ORACLE),
    ("date_funcs_orders", date_funcs_orders, DATE_FUNCS_ORACLE),
    ("math_funcs_lineitem", math_funcs_lineitem, MATH_FUNCS_ORACLE),
    ("array_funcs_docs", array_funcs_docs, ARRAY_FUNCS_ORACLE),
    ("json_funcs_events", json_funcs_events, JSON_FUNCS_ORACLE),
    ("agg_collect_sources", agg_collect_sources, AGG_COLLECT_ORACLE),
    ("percentile_exact_price", percentile_exact_price, PERCENTILE_EXACT_ORACLE),
    ("sketch_distinct_parts", sketch_distinct_parts,
     SKETCH_DISTINCT_ORACLE),
    ("sketch_quantile_price", sketch_quantile_price,
     SKETCH_QUANTILE_ORACLE),
    ("sketch_quantile_by_partkey", sketch_quantile_by_partkey,
     SKETCH_QUANTILE_BY_PARTKEY_ORACLE),
    ("scalar_subquery_orders", scalar_subquery_orders, SCALAR_SUBQUERY_ORACLE),
    ("in_subquery_lineitem", in_subquery_lineitem, IN_SUBQUERY_ORACLE),
    ("tumbling_event_counts", tumbling_event_counts, TUMBLING_ORACLE),
    ("rollup_merge_events", rollup_merge_events, ROLLUP_MERGE_ORACLE),
    ("sessionize_events", sessionize_events, SESSIONIZE_ORACLE),
    ("sessionize_events_scalable", sessionize_events_scalable,
     SESSIONIZE_ORACLE),
]


# --- GROUPING / GROUPING_ID flags (round 11) --------------------------------


def grouping_id_rollup_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``rollup_qty`` aggregate with the ANSI GROUPING machinery
    exposed: ``grouping(col)`` per rollup column and the composite
    ``grouping_id()`` bitmask — what a BI layer keys on to tell a
    real NULL group from a rollup subtotal row (the one thing the
    plain rollup output cannot disambiguate). Spark ``F.grouping`` /
    ``F.grouping_id`` ≡ DuckDB ``GROUPING(col)`` / ``GROUPING(a, b)``
    (same bit order: leading column = high bit). Pure integer flags
    over the same partial-aggregable rollup."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
          .agg(F.sum("l_quantity").alias("sum_qty"),
               F.count("*").alias("n"),
               F.grouping("l_returnflag").cast("long").alias("g_rf"),
               F.grouping("l_linestatus").cast("long").alias("g_ls"),
               F.grouping_id().cast("long").alias("gid")))


GROUPING_ID_ORACLE = """
SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
       COUNT(*) AS n,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


REGISTRATIONS.append(("grouping_id_rollup_qty", grouping_id_rollup_qty,
                      GROUPING_ID_ORACLE))
