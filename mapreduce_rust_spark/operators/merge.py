"""MERGE / upsert and SCD2 change-history operators — the lakehouse
write-path patterns (MERGE INTO, slowly-changing dimensions) expressed
as pure DataFrame plans over a (target, source) pair.

The reference engine has no mutation surface at all (its sink is
write-once text, src/mr/worker.rs:117-140); a real analytics user
needs upsert and dimension-history maintenance, so these close that
gap Spark-first:

- ``merge_upsert``: one full-outer shuffle join on the key; matched
  rows take source values, unmatched-by-source keep target, inserts
  flow through. At 100 TB the join is the whole cost — co-locate by
  bucketing target and source on the key (sinks.write_bucketed) and
  the exchange disappears; with a partitioned target, AQE +
  dynamic partition overwrite rewrite only touched partitions.
- ``scd2_close_and_insert``: the type-2 dimension update — changed
  keys close their current row (valid_to set) and append a new
  current row; unchanged rows pass through untouched. Same single
  full-outer join shape, plus a cheap per-key union; no windows, no
  per-row loops.

Both are registered as oracle-checked queries using a deterministic
fixture-derived changeset (updates = every 10th customer with a
bumped balance, inserts = 5 synthesized keys), so the driver
hash-verifies the merge semantics end-to-end against DuckDB running
the equivalent FULL OUTER JOIN SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_rust_spark.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Generic MERGE: full-outer join on ``key``; source wins on
    match (UPDATE), source-only rows insert, target-only rows
    survive. Columns are taken as COALESCE(source.c, target.c) —
    exactly MERGE ... WHEN MATCHED THEN UPDATE SET * WHEN NOT
    MATCHED THEN INSERT *. One shuffle on the key (or zero with
    bucketed inputs)."""
    t = target.alias("t")
    s = source.alias("s")
    cond = F.col(f"t.{key}") == F.col(f"s.{key}")
    cols = [F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
            for c in target.columns]
    return t.join(s, cond, "full_outer").select(*cols)


def _changeset(spark: SparkSession, sf_dir: str):
    """Deterministic fixture-derived changeset: every 10th customer
    gets +100.00 balance and a MACHINERY segment (updates), and 5
    brand-new custkeys append (inserts)."""
    cust = _t(spark, sf_dir, "customer")
    updates = (cust.filter(F.col("c_custkey") % 10 == 3)
                   .withColumn("c_acctbal",
                               # exact 2-decimal grid arithmetic
                               (F.col("c_acctbal").cast("decimal(18,2)")
                                + F.lit(100).cast("decimal(18,2)"))
                               .cast("double"))
                   .withColumn("c_mktsegment", F.lit("MACHINERY")))
    inserts = (_t(spark, sf_dir, "nation")
               .filter(F.col("n_nationkey") < 5)
               .select((F.col("n_nationkey").cast("long")
                        + F.lit(9_000_000)).alias("c_custkey"),
                       F.concat(F.lit("NewCustomer#"),
                                F.col("n_nationkey").cast("string"))
                        .alias("c_name"),
                       F.col("n_nationkey").alias("c_nationkey"),
                       F.lit(0.0).alias("c_acctbal"),
                       F.lit("BUILDING").alias("c_mktsegment")))
    return cust, updates.unionByName(inserts)


def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE the deterministic changeset into customer: ~10% updates
    + 5 inserts. Output is the merged snapshot (same schema as
    customer), fully hash-checked against DuckDB's FULL OUTER JOIN
    form."""
    cust, src = _changeset(spark, sf_dir)
    return merge_upsert(cust, src, "c_custkey")


MERGE_UPSERT_ORACLE = """
WITH src AS (
  SELECT c_custkey, c_name, c_nationkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2))
              + CAST(100 AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal,
         'MACHINERY' AS c_mktsegment
  FROM customer WHERE c_custkey % 10 = 3
  UNION ALL
  SELECT CAST(n_nationkey AS BIGINT) + 9000000,
         'NewCustomer#' || CAST(n_nationkey AS VARCHAR),
         n_nationkey, 0.0, 'BUILDING'
  FROM nation WHERE n_nationkey < 5
)
SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
       COALESCE(s.c_name, t.c_name) AS c_name,
       COALESCE(s.c_nationkey, t.c_nationkey) AS c_nationkey,
       COALESCE(s.c_acctbal, t.c_acctbal) AS c_acctbal,
       COALESCE(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment
FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
"""


SCD2_AS_OF = "2024-06-01"


def scd2_close_and_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 step: apply the changeset to a dimension history
    where every customer currently has one open row (valid_from =
    '2024-01-01', valid_to = NULL).

    Changed keys emit TWO rows — the closed-out prior version
    (valid_to = as-of date) and the new current version; inserts emit
    one open row; unchanged customers pass through open. Change
    detection compares the tracked attributes, not just key presence
    (an update that changes nothing closes nothing — here the +100
    balance always differs, but the predicate is the general one).

    Scale shape: ONE full-outer join on the key + a union of two
    narrow projections of that join — no windows, no second scan of
    the dimension. The history table never rewrites untouched rows
    when the sink is partitioned/bucketed by key range."""
    cust, src = _changeset(spark, sf_dir)
    t = cust.alias("t")
    s = src.alias("s")
    j = t.join(s, F.col("t.c_custkey") == F.col("s.c_custkey"), "full_outer")
    changed = (F.col("s.c_custkey").isNotNull()
               & F.col("t.c_custkey").isNotNull()
               & ((F.col("s.c_acctbal") != F.col("t.c_acctbal"))
                  | (F.col("s.c_mktsegment") != F.col("t.c_mktsegment"))
                  | (F.col("s.c_name") != F.col("t.c_name"))
                  | (F.col("s.c_nationkey") != F.col("t.c_nationkey"))))
    # prior versions: survive for every target key; closed iff changed
    prior = (j.filter(F.col("t.c_custkey").isNotNull())
              .select(F.col("t.c_custkey").alias("c_custkey"),
                      F.col("t.c_name").alias("c_name"),
                      F.col("t.c_acctbal").alias("c_acctbal"),
                      F.col("t.c_mktsegment").alias("c_mktsegment"),
                      F.lit("2024-01-01").alias("valid_from"),
                      F.when(changed, F.lit(SCD2_AS_OF))
                       .otherwise(F.lit(None).cast("string"))
                       .alias("valid_to")))
    # new versions: one open row per changed key or insert
    new = (j.filter(changed | F.col("t.c_custkey").isNull())
            .select(F.col("s.c_custkey").alias("c_custkey"),
                    F.col("s.c_name").alias("c_name"),
                    F.col("s.c_acctbal").alias("c_acctbal"),
                    F.col("s.c_mktsegment").alias("c_mktsegment"),
                    F.lit(SCD2_AS_OF).alias("valid_from"),
                    F.lit(None).cast("string").alias("valid_to")))
    return prior.unionByName(new)


SCD2_ORACLE = f"""
WITH src AS (
  SELECT c_custkey, c_name, c_nationkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2))
              + CAST(100 AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal,
         'MACHINERY' AS c_mktsegment
  FROM customer WHERE c_custkey % 10 = 3
  UNION ALL
  SELECT CAST(n_nationkey AS BIGINT) + 9000000,
         'NewCustomer#' || CAST(n_nationkey AS VARCHAR),
         n_nationkey, 0.0, 'BUILDING'
  FROM nation WHERE n_nationkey < 5
),
j AS (
  SELECT t.c_custkey AS t_key, t.c_name AS t_name,
         t.c_acctbal AS t_bal, t.c_mktsegment AS t_seg,
         t.c_nationkey AS t_nk,
         s.c_custkey AS s_key, s.c_name AS s_name,
         s.c_acctbal AS s_bal, s.c_mktsegment AS s_seg,
         s.c_nationkey AS s_nk
  FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
),
flagged AS (
  SELECT *, (s_key IS NOT NULL AND t_key IS NOT NULL
             AND (s_bal <> t_bal OR s_seg <> t_seg
                  OR s_name <> t_name OR s_nk <> t_nk)) AS changed
  FROM j
)
SELECT t_key AS c_custkey, t_name AS c_name, t_bal AS c_acctbal,
       t_seg AS c_mktsegment, '2024-01-01' AS valid_from,
       CASE WHEN changed THEN '{SCD2_AS_OF}' END AS valid_to
FROM flagged WHERE t_key IS NOT NULL
UNION ALL
SELECT s_key, s_name, s_bal, s_seg, '{SCD2_AS_OF}', NULL
FROM flagged WHERE changed OR t_key IS NULL
"""


def snapshot_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """CDC table diff: classify every key across two snapshots of the
    same table as inserted / deleted / updated / unchanged, comparing
    full row content by a canonical hash (sha2 over the concatenated
    non-key columns — order fixed by sorted column name, NULLs made
    distinguishable). One full-outer shuffle join on the key; with
    both snapshots bucketed on the key (the lakehouse layout
    ``sinks.write_bucketed`` produces) the exchange disappears — the
    diff of two 100 TB snapshots then reads and compares co-located
    buckets with no shuffle at all."""
    cols = sorted(c for c in old.columns if c != key)
    if cols != sorted(c for c in new.columns if c != key):
        raise ValueError("snapshot schemas differ")

    def rowhash(df: DataFrame) -> DataFrame:
        parts = []
        for c in cols:
            # explicit null flag: a sentinel STRING would collide with a
            # real value equal to the sentinel, misclassifying a
            # NULL<->sentinel change as 'unchanged'
            parts.append(F.when(F.col(c).isNull(), "1").otherwise("0"))
            parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
            parts.append(F.lit("\x1f"))  # unit sep: no concat ambiguity
        return df.select(F.col(key), F.sha2(F.concat(*parts), 256).alias("h"))

    o = rowhash(old).withColumnRenamed("h", "h_old") \
                    .withColumnRenamed(key, "k_old")
    n = rowhash(new).withColumnRenamed("h", "h_new") \
                    .withColumnRenamed(key, "k_new")
    j = o.join(n, o.k_old == n.k_new, "full_outer")
    return j.select(
        F.coalesce(F.col("k_old"), F.col("k_new")).alias(key),
        F.when(F.col("k_old").isNull(), "insert")
         .when(F.col("k_new").isNull(), "delete")
         .when(F.col("h_old") != F.col("h_new"), "update")
         .otherwise("unchanged").alias("change"))


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff the orders snapshot against a deterministically mutated
    successor (every 10th key deleted, every 7th surviving key's
    priority rewritten, 5 synthetic inserts) and report per-change
    counts plus an exact key checksum — the compact, fully
    hash-checkable digest of the whole diff."""
    orders = _t(spark, sf_dir, "orders")
    survived = orders.filter(F.col("o_orderkey") % 10 != 0)
    mutated = survived.withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("9-REPRIORITIZED"))
         .otherwise(F.col("o_orderpriority")))
    inserts = (orders.select(F.max("o_orderkey").alias("m"))
               .crossJoin(spark.range(1, 6))
               .select((F.col("m") + F.col("id")).alias("o_orderkey"),
                       F.lit(0).cast("long").alias("o_custkey"),
                       F.lit("O").alias("o_orderstatus"),
                       F.lit(1.0).alias("o_totalprice"),
                       F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
                        .alias("o_orderdate"),
                       F.lit("1-URGENT").alias("o_orderpriority")))
    new = mutated.unionByName(inserts)
    d = snapshot_diff(orders, new, "o_orderkey")
    return (d.groupBy("change")
             .agg(F.count("*").alias("n"),
                  F.sum("o_orderkey").cast("long").alias("key_sum")))


SNAPSHOT_DIFF_ORACLE = """
WITH survived AS (
  SELECT * FROM orders WHERE o_orderkey % 10 <> 0
), mutated AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         CASE WHEN o_orderkey % 7 = 0 THEN '9-REPRIORITIZED'
              ELSE o_orderpriority END AS o_orderpriority
  FROM survived
), inserts AS (
  SELECT m + i AS o_orderkey FROM (SELECT MAX(o_orderkey) AS m FROM orders),
       UNNEST(range(1, 6)) AS t(i)
), changes AS (
  SELECT o.o_orderkey AS k_old, n.o_orderkey AS k_new,
         CASE WHEN o.o_orderkey IS NULL THEN 'insert'
              WHEN n.o_orderkey IS NULL THEN 'delete'
              WHEN o.o_orderpriority <> n.o_orderpriority THEN 'update'
              ELSE 'unchanged' END AS change
  FROM orders o
  FULL OUTER JOIN (SELECT * FROM mutated
                   UNION ALL
                   SELECT o_orderkey, 0, 'O', 1.0,
                          TIMESTAMP '2024-01-01', '1-URGENT'
                   FROM inserts) n
    ON o.o_orderkey = n.o_orderkey
)
SELECT change, COUNT(*) AS n,
       CAST(SUM(COALESCE(k_old, k_new)) AS BIGINT) AS key_sum
FROM changes GROUP BY change
"""


MV_CUTOFF = "1997-06-01"
MV_DELETE_MOD = 97   # base orders with key % 97 == 0 are retracted


def incremental_mv_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: refresh a stored
    (priority, year) → (n_orders, revenue) aggregate with a change
    batch — inserts (orders on/after ``MV_CUTOFF``) and deletes
    (every ``MV_DELETE_MOD``-th base order retracted) — WITHOUT
    recomputing from the fact table. Aggregates here are mergeable
    partials: each input (the stored MV, the insert batch, the
    delete batch at weight −1) reduces to per-key partials and one
    final sum merges them; groups emptied by deletes drop out
    (n_orders = 0).

    Scale shape: the fact table contributes only through the
    already-stored MV (here rebuilt from the pre-cutoff slice as the
    fixture's stand-in for the stored table — a real deployment reads
    it back); the work that scales with the refresh is ONLY the
    delta batch's aggregation — ≤ |changes| rows shuffle, against a
    key space of (priorities × years). The revenue partials sum in
    DECIMAL, so incremental and full recompute are bit-identical —
    which is exactly what the oracle checks: DuckDB recomputes the
    view FROM SCRATCH over (base ∖ deletes) ∪ inserts, and the
    driver hash-compares the two."""
    orders = _t(spark, sf_dir, "orders")
    key = [F.col("o_orderpriority").alias("priority"),
           F.year("o_orderdate").cast("long").alias("year")]
    dec = F.col("o_totalprice").cast("decimal(18,6)")

    def partial(df: DataFrame, w: int) -> DataFrame:
        return (df.groupBy(*key)
                  .agg((F.count("*") * w).alias("n"),
                       (F.sum(dec) * w).alias("rev")))

    base = orders.filter(F.col("o_orderdate") < F.lit(MV_CUTOFF))
    mv = partial(base, 1)          # stand-in for the stored MV table
    inserts = orders.filter(F.col("o_orderdate") >= F.lit(MV_CUTOFF))
    deletes = base.filter(F.col("o_orderkey") % MV_DELETE_MOD == 0)
    merged = (mv.unionByName(partial(inserts, 1))
                .unionByName(partial(deletes, -1))
                .groupBy("priority", "year")
                .agg(F.sum("n").cast("long").alias("n_orders"),
                     F.sum("rev").cast("double").alias("revenue")))
    return merged.filter(F.col("n_orders") > 0)


INCREMENTAL_MV_ORACLE = f"""
WITH live AS (
  SELECT * FROM orders
  WHERE (o_orderdate < TIMESTAMP '{MV_CUTOFF}'
         AND o_orderkey % {MV_DELETE_MOD} <> 0)
     OR o_orderdate >= TIMESTAMP '{MV_CUTOFF}'
)
SELECT o_orderpriority AS priority,
       CAST(year(o_orderdate) AS BIGINT) AS year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM live GROUP BY priority, year
"""


CDC_UPD_MOD = 7     # orderkeys getting an UPDATE (seq 1, price +10.00)
CDC_DEL_MOD = 13    # orderkeys getting a DELETE (seq 2)
CDC_N_INS = 5       # synthesized INSERT keys (negative — never collide)


def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog application WITH deletes — the missing member of
    the write-path family (``merge_upsert`` has no DELETE arm;
    ``incremental_mv_orders`` deletes but maintains an aggregate, not
    the row set): apply an (op, seq, key, payload) insert/update/
    delete log to a target with LATEST-WINS semantics per key, the
    Debezium/lakehouse CDC-merge contract.

    The fixture-derived changelog is deterministic: every
    ``CDC_UPD_MOD``-th order gets U (seq 1, +10.00), every
    ``CDC_DEL_MOD``-th a D (seq 2), and ``CDC_N_INS`` negative-key
    inserts (seq 1) — so keys divisible by both mods carry U-then-D
    and must come out DELETED, pinning the ordering semantics in the
    driver artifact.

    Scale shape: the log first collapses per key (one
    max_by/arg-max aggregate — log length never joins the target),
    the delete set leaves via LEFT ANTI, and the upsert set applies
    through the same single full-outer merge as ``merge_upsert`` —
    two key-hashed shuffles total, both co-locatable by bucketing.

    Output: the post-CDC orders rowset
    ``(o_orderkey, o_custkey, status, price_cents)``.
    """
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.bround(F.col("o_totalprice") * 100).cast("long")
         .alias("price_cents"))
    upd = (base.filter(F.col("o_orderkey") % CDC_UPD_MOD == 0)
           .select("o_orderkey", F.lit("U").alias("op"),
                   F.lit(1).alias("seq"), "o_custkey",
                   F.lit("P").alias("status"),
                   (F.col("price_cents") + 1000).alias("price_cents")))
    dele = (base.filter(F.col("o_orderkey") % CDC_DEL_MOD == 0)
            .select("o_orderkey", F.lit("D").alias("op"),
                    F.lit(2).alias("seq"),
                    F.lit(None).cast("long").alias("o_custkey"),
                    F.lit(None).cast("string").alias("status"),
                    F.lit(None).cast("long").alias("price_cents")))
    ins = spark.range(1, CDC_N_INS + 1).select(
        (-F.col("id")).cast("long").alias("o_orderkey"),
        F.lit("I").alias("op"), F.lit(1).alias("seq"),
        F.lit(0).cast("long").alias("o_custkey"),
        F.lit("N").alias("status"),
        (F.col("id") * 100).cast("long").alias("price_cents"))
    log = upd.unionByName(dele).unionByName(ins)
    latest = (log.groupBy("o_orderkey")
              .agg(F.max_by(F.struct("op", "o_custkey", "status",
                                     "price_cents"), "seq").alias("x"))
              .select("o_orderkey", "x.op", "x.o_custkey", "x.status",
                      "x.price_cents"))
    del_keys = latest.filter(F.col("op") == "D").select("o_orderkey")
    ups = latest.filter(F.col("op") != "D").drop("op")
    survivors = base.join(del_keys, "o_orderkey", "left_anti")
    return merge_upsert(survivors, ups, "o_orderkey")


CDC_APPLY_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus AS status,
         CAST(round_even(o_totalprice * 100, 0) AS BIGINT) AS price_cents
  FROM orders
),
log AS (
  SELECT o_orderkey, 'U' AS op, 1 AS seq, o_custkey, 'P' AS status,
         price_cents + 1000 AS price_cents
  FROM base WHERE o_orderkey % {CDC_UPD_MOD} = 0
  UNION ALL
  SELECT o_orderkey, 'D', 2, NULL, NULL, NULL
  FROM base WHERE o_orderkey % {CDC_DEL_MOD} = 0
  UNION ALL
  SELECT -i, 'I', 1, 0, 'N', i * 100
  FROM UNNEST(range(1, {CDC_N_INS} + 1)) AS t(i)
),
latest AS (
  SELECT o_orderkey, op, o_custkey, status, price_cents
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                     ORDER BY seq DESC) AS rn FROM log)
  WHERE rn = 1
),
survivors AS (
  SELECT * FROM base
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest WHERE op = 'D')
),
ups AS (SELECT o_orderkey, o_custkey, status, price_cents
        FROM latest WHERE op <> 'D')
SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
       CAST(COALESCE(s.o_custkey, t.o_custkey) AS BIGINT) AS o_custkey,
       COALESCE(s.status, t.status) AS status,
       CAST(COALESCE(s.price_cents, t.price_cents) AS BIGINT)
         AS price_cents
FROM survivors t FULL OUTER JOIN ups s ON s.o_orderkey = t.o_orderkey
"""


REGISTRATIONS = [
    ("merge_upsert_customers", merge_upsert_customers, MERGE_UPSERT_ORACLE),
    ("scd2_close_and_insert", scd2_close_and_insert, SCD2_ORACLE),
    ("snapshot_diff_orders", snapshot_diff_orders, SNAPSHOT_DIFF_ORACLE),
    ("incremental_mv_orders", incremental_mv_orders, INCREMENTAL_MV_ORACLE),
    ("cdc_apply_orders", cdc_apply_orders, CDC_APPLY_ORACLE),
]
