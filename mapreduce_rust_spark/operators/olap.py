"""Product-analytics / OLAP composites over ``events`` and
``orders`` — funnel conversion, cohort retention, time-series gap
filling with LOCF, histogram bucketing, and table profiling. Each is
a composition of already-proven primitives (conditional aggregation,
per-key windows, sequence+explode, exact quantized sums) arranged as
one declarative plan; scale notes on each operator.

Numeric discipline matches the engine rules: event timestamps are
compared as exact integer microseconds (``unix_micros`` ≡ DuckDB
``epoch_us``), sums are quantized-long or decimal, and no raw
timestamps reach checked output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_rust_spark.operators import graph
from mapreduce_rust_spark.tables import load_table


def _funnel_user_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user chained stage timestamps (t1=first view, t2=first
    later click, t3=first later purchase) — the shared core of the
    funnel family: chained conditional MINs over per-user windows
    (one shuffle on user_id, three window passes over the same
    partition — NOT three self-joins)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"))
    w = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view",
                           F.col("us"))).over(w))
    s2 = s1.withColumn(
        "t2", F.min(F.when((F.col("event_type") == "click")
                           & (F.col("us") > F.col("t1")),
                           F.col("us"))).over(w))
    s3 = s2.withColumn(
        "t3", F.min(F.when((F.col("event_type") == "purchase")
                           & (F.col("us") > F.col("t2")),
                           F.col("us"))).over(w))
    return s3.select("user_id", "t1", "t2", "t3").distinct()


def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view → later click → later purchase, per user,
    reduced to stage-reach counts. Stage timestamps are chained
    conditional MINs over per-user windows (one shuffle on user_id,
    three window passes over the same partition — NOT three
    self-joins). Timestamps compared in exact integer micros."""
    per_user = _funnel_user_stages(spark, sf_dir)
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_view_click_purchase"))


FUNNEL_ORACLE = """
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
s1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
                   OVER (PARTITION BY user_id) AS t1 FROM ev),
s2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
                   OVER (PARTITION BY user_id) AS t2 FROM s1),
s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
                   OVER (PARTITION BY user_id) AS t3 FROM s2),
per_user AS (SELECT DISTINCT user_id, t1, t2, t3 FROM s3)
SELECT COUNT(*) AS n_users,
       COUNT(t1) AS n_viewed,
       COUNT(t2) AS n_view_click,
       COUNT(t3) AS n_view_click_purchase
FROM per_user
"""


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median time-to-convert per funnel step pair — the latency
    readout that turns ``funnel_conversion_events``' reach counts
    into "how long does the step take": for users who completed
    view→click (and click→purchase), the lower-median whole-second
    delay. Shares ``_funnel_user_stages``; the median is the
    ⌈n/2⌉-th order statistic computed with ``ranking.scalable_rank``
    (delays sub-shard on an hour bucket — no per-step-pair global
    window ever sees user rows). Delays are exact integer seconds
    (``DIV``, both engines); the oracle derives the same median
    non-procedurally (min delay whose ≤-count reaches k).

    Output: ``(step_pair, n_converted, median_seconds)``.
    """
    from mapreduce_rust_spark.operators.ranking import scalable_rank
    pu = _funnel_user_stages(spark, sf_dir).localCheckpoint(eager=False)
    d12 = (pu.where(F.col("t2").isNotNull())
           .select(F.lit("view_click").alias("step_pair"), "user_id",
                   F.expr("(t2 - t1) DIV 1000000").alias("secs")))
    d23 = (pu.where(F.col("t3").isNotNull())
           .select(F.lit("click_purchase").alias("step_pair"), "user_id",
                   F.expr("(t3 - t2) DIV 1000000").alias("secs")))
    # no second checkpoint: both consumers (nk, ranked) re-derive the
    # union with two narrow projections over the ALREADY-materialized
    # pu blocks — cheaper than eagerly materializing the union itself
    # (the double checkpoint was the round-6 1.9× regression)
    d = d12.unionAll(d23)
    nk = (d.groupBy("step_pair").agg(F.count("*").alias("n_converted"))
          .withColumn("k", F.expr("(n_converted + 1) DIV 2")))
    ranked = scalable_rank(d, F.expr("secs DIV 3600"),
                           ["secs", "user_id"], ["step_pair"])
    return (ranked.join(F.broadcast(nk), "step_pair")
            .where(F.col("r") == F.col("k"))
            .select("step_pair",
                    F.col("n_converted").cast("long").alias("n_converted"),
                    F.col("secs").cast("long").alias("median_seconds")))


FUNNEL_TTC_ORACLE = """
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
s1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
                   OVER (PARTITION BY user_id) AS t1 FROM ev),
s2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
                   OVER (PARTITION BY user_id) AS t2 FROM s1),
s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
                   OVER (PARTITION BY user_id) AS t3 FROM s2),
pu AS (SELECT DISTINCT user_id, t1, t2, t3 FROM s3),
d AS (
  SELECT 'view_click' AS step_pair, user_id, (t2 - t1) // 1000000 AS secs
  FROM pu WHERE t2 IS NOT NULL
  UNION ALL
  SELECT 'click_purchase', user_id, (t3 - t2) // 1000000
  FROM pu WHERE t3 IS NOT NULL
),
nk AS (SELECT step_pair, COUNT(*) AS n_converted,
              (COUNT(*) + 1) // 2 AS k
       FROM d GROUP BY 1),
med AS (
  SELECT x.step_pair, MIN(x.secs) AS median_seconds
  FROM (SELECT a.step_pair, a.secs,
               (SELECT COUNT(*) FROM d b
                WHERE b.step_pair = a.step_pair AND b.secs <= a.secs) AS cle
        FROM d a) x
  JOIN nk USING (step_pair)
  WHERE x.cle >= nk.k
  GROUP BY 1
)
SELECT nk.step_pair, CAST(nk.n_converted AS BIGINT) AS n_converted,
       CAST(med.median_seconds AS BIGINT) AS median_seconds
FROM nk JOIN med USING (step_pair)
"""


FUNNEL_CLICK_DEADLINE_US = 3_600 * 1_000_000       # view → click: 1 h
FUNNEL_BUY_DEADLINE_US = 6 * 3_600 * 1_000_000     # click → buy: 6 h


def funnel_timebound_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline funnel: view → click within 1 h of the FIRST view →
    purchase within 6 h of that first qualifying click. The unbounded
    funnel (``funnel_conversion_events``) asks "did it ever happen";
    this asks "did it happen in time" — the form marketing
    attribution actually uses. Same plan shape: chained conditional
    MINs over one per-user window partition (one shuffle, three
    window passes, NOT three self-joins); deadlines are exact integer
    micro offsets so the oracle hash-matches."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"))
    w = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view",
                           F.col("us"))).over(w))
    s2 = s1.withColumn(
        "t2", F.min(F.when((F.col("event_type") == "click")
                           & (F.col("us") > F.col("t1"))
                           & (F.col("us") <= F.col("t1")
                              + F.lit(FUNNEL_CLICK_DEADLINE_US)),
                           F.col("us"))).over(w))
    s3 = s2.withColumn(
        "t3", F.min(F.when((F.col("event_type") == "purchase")
                           & (F.col("us") > F.col("t2"))
                           & (F.col("us") <= F.col("t2")
                              + F.lit(FUNNEL_BUY_DEADLINE_US)),
                           F.col("us"))).over(w))
    per_user = s3.select("user_id", "t1", "t2", "t3").distinct()
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_click_in_time"),
        F.count("t3").alias("n_converted_in_time"))


FUNNEL_TIMEBOUND_ORACLE = f"""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
s1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
                   OVER (PARTITION BY user_id) AS t1 FROM ev),
s2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND us > t1
                           AND us <= t1 + {FUNNEL_CLICK_DEADLINE_US}
                          THEN us END)
                   OVER (PARTITION BY user_id) AS t2 FROM s1),
s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > t2
                           AND us <= t2 + {FUNNEL_BUY_DEADLINE_US}
                          THEN us END)
                   OVER (PARTITION BY user_id) AS t3 FROM s2),
per_user AS (SELECT DISTINCT user_id, t1, t2, t3 FROM s3)
SELECT COUNT(*) AS n_users,
       COUNT(t1) AS n_viewed,
       COUNT(t2) AS n_click_in_time,
       COUNT(t3) AS n_converted_in_time
FROM per_user
"""


def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day, distinct
    active users per (cohort day, day offset). Two aggregations and
    one join on user_id — the classic retention triangle, fully
    shuffle-keyed on user/cohort (no window over the whole table)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    return (active.join(first, "user_id")
            .groupBy(F.date_format("cohort_day", "yyyy-MM-dd")
                      .alias("cohort_day"),
                     F.datediff("day", "cohort_day").cast("long")
                      .alias("day_offset"))
            .agg(F.countDistinct("user_id").alias("n_active")))


COHORT_ORACLE = """
WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(day - cohort_day AS BIGINT) AS day_offset,
       COUNT(DISTINCT user_id) AS n_active
FROM ev JOIN first USING (user_id)
GROUP BY 1, 2
"""


GAPFILL_USERS = 5     # dashboard-style dense series for a probe set
GAPFILL_START = "2024-01-01 00:00:00"
GAPFILL_HOURS = 24 * 30


def gapfill_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense hourly grid per user
    (sequence+explode — no driver loop), left-joined with hourly
    sums, empty buckets filled by last-observation-carried-forward
    (``last(ignorenulls)`` over a per-user ordered window). The
    hypertable/dashboard resample operator. Grid size is
    users×hours — explicit and bounded; the LOCF window partitions
    per user. Sums are quantized longs (order-independent)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < GAPFILL_USERS)
    hourly = (ev.groupBy("user_id",
                         (F.floor(F.unix_seconds(F.col("ts")) / 3600)
                          * 3600).alias("hour_epoch"))
                .agg(F.sum(F.bround(F.col("value") * 1e6, 0).cast("long"))
                      .alias("vq")))
    start = F.to_timestamp(F.lit(GAPFILL_START))
    grid_hours = F.sequence(
        F.lit(0), F.lit(GAPFILL_HOURS - 1))
    users = (ev.select("user_id").distinct()
               .select("user_id", F.explode(grid_hours).alias("h"))
               .select("user_id",
                       (F.unix_seconds(start) + F.col("h") * 3600)
                       .alias("hour_epoch")))
    w = (W.partitionBy("user_id").orderBy("hour_epoch")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (users.join(hourly, ["user_id", "hour_epoch"], "left")
            .select("user_id", "hour_epoch",
                    (F.col("vq").cast("double") / 1e6).alias("hour_value"),
                    (F.coalesce(
                        F.last("vq", ignorenulls=True).over(w),
                        F.lit(0)).cast("double") / 1e6).alias("filled_value")))


GAPFILL_ORACLE = f"""
WITH hourly AS (
  SELECT user_id,
         CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_epoch,
         SUM(CAST(round_even(value * 1e6, 0) AS BIGINT)) AS vq
  FROM events WHERE user_id < {GAPFILL_USERS}
  GROUP BY 1, 2
),
grid AS (
  SELECT u.user_id,
         CAST(epoch(TIMESTAMP '{GAPFILL_START}') + h * 3600 AS BIGINT)
           AS hour_epoch
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < {GAPFILL_USERS}) u,
       UNNEST(range(0, {GAPFILL_HOURS})) AS t(h)
)
SELECT g.user_id, g.hour_epoch,
       CAST(h.vq AS DOUBLE) / 1e6 AS hour_value,
       CAST(COALESCE(
              LAST_VALUE(h.vq IGNORE NULLS) OVER (
                PARTITION BY g.user_id ORDER BY g.hour_epoch
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              0) AS DOUBLE) / 1e6 AS filled_value
FROM grid g LEFT JOIN hourly h
  ON g.user_id = h.user_id AND g.hour_epoch = h.hour_epoch
"""


HIST_BUCKETS = 24
HIST_WIDTH = 25000  # o_totalprice spans ~[900, 600k)


def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value: one scan, integer floor
    division to a bucket id (portable — no width_bucket dialect
    differences), map-side-combined counts. The profile/EDA building
    block; at 100 TB it's a single partial+final aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    b = F.least(F.greatest(F.floor(F.col("o_totalprice") / HIST_WIDTH),
                           F.lit(0)), F.lit(HIST_BUCKETS - 1)).cast("long")
    return (orders.groupBy(b.alias("bucket"))
            .agg(F.count("*").alias("n"))
            .select("bucket",
                    (F.col("bucket") * HIST_WIDTH).cast("double").alias("lo"),
                    ((F.col("bucket") + 1) * HIST_WIDTH).cast("double")
                    .alias("hi"),
                    "n"))


HISTOGRAM_ORACLE = f"""
SELECT bucket,
       CAST(bucket * {HIST_WIDTH} AS DOUBLE) AS lo,
       CAST((bucket + 1) * {HIST_WIDTH} AS DOUBLE) AS hi,
       COUNT(*) AS n
FROM (SELECT LEAST(GREATEST(CAST(FLOOR(o_totalprice / {HIST_WIDTH}) AS BIGINT),
                            0), {HIST_BUCKETS - 1}) AS bucket
      FROM orders)
GROUP BY bucket
"""


EQUIDEPTH_TILES = 16


def equidepth_hist_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram of order value: 16 tiles of
    equal row count — the optimizer-statistics companion of the
    equi-width ``histogram_totalprice`` (equal-count buckets resolve
    heavy tails that fixed-width buckets smear). A naive NTILE over
    all orders is a GLOBAL window = one partition; this uses
    ``operators/ranking.scalable_rank`` with $5k price-range
    sub-shards (order-preserving on cents) + the closed-form
    ``ntile_expr``, the same decomposition curriculum_phase_docs
    proves, with the naive single-window form as the oracle. Values
    are exact integer cents throughout."""
    from mapreduce_rust_spark.operators.ranking import ntile_expr, scalable_rank
    orders = load_table(spark, sf_dir, "orders")
    c = (orders.select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderkey")
         # narrow 2-column projection; scalable_rank consumes it twice
         .localCheckpoint(eager=False))
    totals = c.agg(F.count("*").alias("n"))
    ranked = (scalable_rank(c, F.expr("cents DIV 500000"),
                            ["cents", "o_orderkey"])
              .crossJoin(F.broadcast(totals)))
    tiled = ranked.withColumn("tile", ntile_expr(EQUIDEPTH_TILES))
    return (tiled.groupBy("tile")
            .agg(F.count("*").alias("n_orders"),
                 F.min("cents").alias("min_cents"),
                 F.max("cents").alias("max_cents"),
                 F.sum("cents").alias("sum_cents")))


EQUIDEPTH_ORACLE = f"""
WITH c AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents, o_orderkey
  FROM orders
),
p AS (
  SELECT cents,
         CAST(NTILE({EQUIDEPTH_TILES}) OVER (ORDER BY cents, o_orderkey)
              AS BIGINT) AS tile
  FROM c
)
SELECT tile, COUNT(*) AS n_orders, MIN(cents) AS min_cents,
       MAX(cents) AS max_cents, CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM p GROUP BY tile
"""


SESSION_GAP_US = 1800 * 1_000_000   # same 30-min gap as sessionize_events
PATH_MAX_STEPS = 8
PATH_TOP_K = 20


def session_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: the ``PATH_TOP_K`` most common event-type
    journeys, where a journey is the ordered sequence of a session's
    first ``PATH_MAX_STEPS`` event types joined with '>' — the
    product-analytics "what do users actually do" view, one step up
    from ``event_trigrams``' fixed-length windows.

    Sessions reuse sessionize_events' 30-min-gap definition (same
    (us, event_id) ordering, so the two operators agree on session
    boundaries). Scale: both windows and the path aggregate partition
    on user_id — the proven sessionize shape, sub-shardable per
    (user, day) at 100 TB; path strings are bounded (8 steps), the
    path aggregate map-side combines, and the top-20 plans as
    TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0))
    sess = F.sum("new_sess").over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow))
    paths = (marked.withColumn("sess", sess)
             .groupBy("user_id", "sess")
             .agg(F.sort_array(F.collect_list(
                 F.struct("us", "event_id", "event_type"))).alias("evs"))
             .select(F.array_join(
                 F.transform(F.slice("evs", 1, PATH_MAX_STEPS),
                             lambda e: e["event_type"]),
                 ">").alias("path")))
    return (paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
            .orderBy(F.desc("n_sessions"), "path")
            .limit(PATH_TOP_K))


SESSION_PATH_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
m AS (
  SELECT user_id, event_id, event_type, us,
         CASE WHEN us - LAG(us) OVER w IS NULL
               OR us - LAG(us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
  FROM m
),
p AS (
  SELECT user_id, sess,
         array_to_string(
           (array_agg(event_type ORDER BY us, event_id))[1:{PATH_MAX_STEPS}],
           '>') AS path
  FROM s GROUP BY user_id, sess
)
SELECT path, COUNT(*) AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path LIMIT {PATH_TOP_K}
"""


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (ANALYZE-style): per column — row count, null
    count, distinct count. One pass: every statistic is a conditional
    aggregate in a single partial+final agg (the n_distinct set uses
    Spark's multi-distinct rewrite); the per-column rows are then
    unpivoted from one 1-row result, so the table is scanned ONCE
    regardless of column count — the shape that matters when the
    table is 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    one = orders.agg(*aggs)
    rows = None
    for c in cols:
        r = one.select(
            F.lit(c).alias("column"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"))
        rows = r if rows is None else rows.unionAll(r)
    return rows


PROFILE_ORACLE = """
WITH s AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(o_orderkey) AS nn_1, COUNT(DISTINCT o_orderkey) AS nd_1,
         COUNT(o_custkey) AS nn_2, COUNT(DISTINCT o_custkey) AS nd_2,
         COUNT(o_orderstatus) AS nn_3, COUNT(DISTINCT o_orderstatus) AS nd_3,
         COUNT(o_totalprice) AS nn_4, COUNT(DISTINCT o_totalprice) AS nd_4,
         COUNT(o_orderdate) AS nn_5, COUNT(DISTINCT o_orderdate) AS nd_5,
         COUNT(o_orderpriority) AS nn_6, COUNT(DISTINCT o_orderpriority) AS nd_6
  FROM orders
)
SELECT 'o_orderkey' AS column, n_rows, n_rows - nn_1 AS n_null, nd_1 AS n_distinct FROM s
UNION ALL SELECT 'o_custkey', n_rows, n_rows - nn_2, nd_2 FROM s
UNION ALL SELECT 'o_orderstatus', n_rows, n_rows - nn_3, nd_3 FROM s
UNION ALL SELECT 'o_totalprice', n_rows, n_rows - nn_4, nd_4 FROM s
UNION ALL SELECT 'o_orderdate', n_rows, n_rows - nn_5, nd_5 FROM s
UNION ALL SELECT 'o_orderpriority', n_rows, n_rows - nn_6, nd_6 FROM s
"""


def event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining, order-1 form: the 20 most frequent
    3-step event-type sequences over per-user streams (the "what do
    users do next" path analysis). Two LEADs over one per-user window
    (single shuffle on user_id — the same partitioning sessionization
    uses, so at 100 TB the skew remedy is the proven (user, day)
    two-phase decomposition), map-side-combined trigram counts, then
    a global top-20 that plans as TakeOrderedAndProject (rank is
    (n DESC, e1, e2, e3) — a total order, so the LIMIT is
    deterministic on both engines)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    tri = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"))
    return (tri.where(F.col("e3").isNotNull())
               .groupBy("e1", "e2", "e3")
               .agg(F.count("*").alias("n"))
               .orderBy(F.desc("n"), "e1", "e2", "e3")
               .limit(20))


EVENT_TRIGRAMS_ORACLE = """
WITH tri AS (
  SELECT event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT e1, e2, e3, COUNT(*) AS n
FROM tri WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3
LIMIT 20
"""


def active_streaks_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the
    engagement metric behind "7-day streak" product features, and
    the date-grain gaps-and-islands classic: collapse events to
    DISTINCT (user, day), then ``day − row_number()`` is constant
    exactly within a run of consecutive days (the island key), so
    the longest streak is a max over island sizes. Two bounded
    shuffles (per-user day dedup, island aggregate); the rank window
    partitions per user — the sessionize scale shape on a ≤ |days|
    frame per user."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    isl = days.withColumn(
        "island", F.date_sub("day", F.row_number().over(w)))
    streaks = (isl.groupBy("user_id", "island")
               .agg(F.count("*").alias("len")))
    return (streaks.groupBy("user_id")
            .agg(F.max("len").cast("long").alias("longest_streak"),
                 F.sum("len").cast("long").alias("n_active_days")))


ACTIVE_STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
isl AS (
  SELECT user_id,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS island
  FROM days
),
s AS (SELECT user_id, island, COUNT(*) AS len FROM isl GROUP BY 1, 2)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(SUM(len) AS BIGINT) AS n_active_days
FROM s GROUP BY user_id
"""


ACTIVE_WINDOW_DAYS = 7


def active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day active users per day — THE dashboard engagement
    metric (WAU on a daily grid), computed EXACTLY: distinct
    (user, day) pairs range-joined to the observed-day grid
    (grid day − 6 ≤ active day ≤ grid day), then a distinct-user
    count per grid day. COUNT(DISTINCT) OVER a RANGE frame isn't
    expressible as a window in either engine — the range join IS the
    standard exact form. Fanout is ≤ 7 grid rows per (user, day)
    pair, the join is day↔day (no skew: days are uniform), and the
    mergeable-HLL sketch family is the documented approximate path
    when exactness can yield (stream_approx_distinct_users)."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    grid = ud.select("day").distinct().withColumnRenamed("day", "gday")
    j = ud.join(grid,
                (F.col("day") <= F.col("gday"))
                & (F.col("day") >= F.date_sub("gday",
                                              ACTIVE_WINDOW_DAYS - 1)))
    return (j.groupBy("gday")
            .agg(F.countDistinct("user_id").alias("active_users"))
            .select(F.col("gday").cast("string").alias("day"),
                    "active_users"))


ACTIVE_7D_ORACLE = f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
grid AS (SELECT DISTINCT day AS gday FROM ud)
SELECT CAST(gday AS VARCHAR) AS day,
       COUNT(DISTINCT user_id) AS active_users
FROM ud JOIN grid
  ON day <= gday AND day >= gday - {ACTIVE_WINDOW_DAYS - 1}
GROUP BY gday
"""


def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event type per day — the
    "lifetime audience" curve. COUNT(DISTINCT) over a growing window
    isn't a window function in either engine; the exact scalable form
    is the FIRST-SEEN decomposition: a user contributes to the
    cumulative count from their first-seen day onward, so

        cum(type, d) = Σ_{d' ≤ d} |{users whose min day = d'}|

    One shuffle for the (type, user) min-day aggregate (partial-
    combinable), one tiny prefix-sum window over the (type, day)
    SUMMARY grid (≤ types × days rows), never over event rows — the
    same summary-window discipline as scalable_rank / CUSUM. The
    naive correlated-subquery oracle is the decomposition proof.

    Output: ``(event_type, day, cum_users)`` for every observed
    (type, day)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.to_date("ts").alias("day"))
    grid = ev.select("event_type", "day").distinct()
    news = (ev.groupBy("event_type", "user_id")
            .agg(F.min("day").alias("fday"))
            .groupBy("event_type", F.col("fday").alias("day"))
            .agg(F.count("*").alias("n_new")))
    w = (W.partitionBy("event_type").orderBy("day")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (grid.join(news, ["event_type", "day"], "left")
            .withColumn("cum_users",
                        F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w))
            .select("event_type", F.col("day").cast("string").alias("day"),
                    F.col("cum_users").cast("long").alias("cum_users")))


CUMDIST_ORACLE = """
WITH td AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events
)
SELECT event_type, CAST(day AS VARCHAR) AS day,
       CAST((SELECT COUNT(DISTINCT e2.user_id) FROM events e2
             WHERE e2.event_type = td.event_type
               AND CAST(e2.ts AS DATE) <= td.day) AS BIGINT) AS cum_users
FROM td
"""


ASSOC_ITEM_MIN = 5    # Apriori item-support floor (a pair can't be
                      # frequent unless both items are)
ASSOC_PAIR_MIN = 3    # pair-support floor
ASSOC_TOP_K = 25
ASSOC_MAX_BASKET = 256   # per-basket width cap: one crawler-artifact
                         # mega-basket of frequent items would
                         # otherwise generate C(n,2) pair structs in
                         # a SINGLE row (the in-row analogue of a hot
                         # key); deterministic cap = the n smallest
                         # part ids, mirrored in the oracle


def assoc_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-purchased parts: the
    ``ASSOC_TOP_K`` part pairs with the highest lift, with support
    count and both directional confidences — the recommender /
    affinity-analysis classic (FP-growth's 2-itemset slice as one
    declarative plan).

    The Apriori property does the pruning: item supports are counted
    FIRST (one distinct (order, part) aggregate) and baskets are
    thinned to frequent items BEFORE any pair is generated — the
    downward-closure step that keeps the pair explosion proportional
    to frequent-item baskets, not raw baskets. Pairs then generate
    IN-ROW over each basket's sorted frequent-part set (bounded by
    basket width, the copurchase_edges discipline), one map-side
    combined pair count, and a pair-support floor before the top-k.
    Lift/confidence are fixed-order chains of correctly-rounded
    double divisions (c_ab/c_a, (c_ab/c_a)/(c_b/N)); N, the basket
    universe, is a 1-row broadcast."""
    from mapreduce_rust_spark.operators.graph import _ordered_pairs
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    item = (li.distinct()
              .groupBy("l_partkey").agg(F.count("*").alias("c_i")))
    # round 13: freq feeds THREE broadcast builds (basket thinning +
    # ca + cb) — without a lineage cut each build re-executes the
    # distinct+agg subtree from the scan (AQE builds each broadcast
    # from its own subtree). One lazy checkpoint = one execution.
    freq = (item.filter(F.col("c_i") >= ASSOC_ITEM_MIN)
                .localCheckpoint(eager=False))
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count("*").alias("n")).localCheckpoint(eager=False)
    baskets = (li.join(F.broadcast(freq), "l_partkey")
                 .groupBy("l_orderkey")
                 .agg(F.slice(F.array_sort(F.collect_set("l_partkey")),
                              1, ASSOC_MAX_BASKET).alias("ps")))
    pairs = (baskets.select(F.explode(_ordered_pairs(F.col("ps")))
                            .alias("e"))
             .groupBy(F.col("e.u").alias("part_a"),
                      F.col("e.v").alias("part_b"))
             .agg(F.count("*").alias("c_ab"))
             .filter(F.col("c_ab") >= ASSOC_PAIR_MIN))
    ca = freq.select(F.col("l_partkey").alias("part_a"),
                     F.col("c_i").alias("c_a"))
    cb = freq.select(F.col("l_partkey").alias("part_b"),
                     F.col("c_i").alias("c_b"))
    j = (pairs.join(F.broadcast(ca), "part_a")
              .join(F.broadcast(cb), "part_b")
              .crossJoin(F.broadcast(n_orders)))
    conf_ab = F.col("c_ab").cast("double") / F.col("c_a").cast("double")
    conf_ba = F.col("c_ab").cast("double") / F.col("c_b").cast("double")
    lift = conf_ab / (F.col("c_b").cast("double") / F.col("n").cast("double"))
    return (j.select("part_a", "part_b", "c_ab", "c_a", "c_b",
                     conf_ab.alias("conf_ab"), conf_ba.alias("conf_ba"),
                     lift.alias("lift"))
             .orderBy(F.desc("lift"), "part_a", "part_b")
             .limit(ASSOC_TOP_K))


ASSOC_RULES_ORACLE = f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
item AS (SELECT l_partkey, COUNT(*) AS c_i FROM d GROUP BY 1),
freq AS (SELECT * FROM item WHERE c_i >= {ASSOC_ITEM_MIN}),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lineitem),
-- oracle takes the self-join route on purpose: in-row pair
-- generation over collect_set ≡ the distinct-pair join, so the two
-- formulations checking each other is part of the evidence; the
-- basket cap (n smallest frequent part ids) mirrors via row_number
capped AS (
  SELECT l_orderkey, l_partkey
  FROM (SELECT d.l_orderkey, d.l_partkey,
               ROW_NUMBER() OVER (PARTITION BY d.l_orderkey
                                  ORDER BY d.l_partkey) AS rn
        FROM d JOIN freq f ON f.l_partkey = d.l_partkey)
  WHERE rn <= {ASSOC_MAX_BASKET}
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS c_ab
  FROM capped a
  JOIN capped b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {ASSOC_PAIR_MIN}
)
SELECT part_a, part_b, c_ab, fa.c_i AS c_a, fb.c_i AS c_b,
       CAST(c_ab AS DOUBLE) / CAST(fa.c_i AS DOUBLE) AS conf_ab,
       CAST(c_ab AS DOUBLE) / CAST(fb.c_i AS DOUBLE) AS conf_ba,
       (CAST(c_ab AS DOUBLE) / CAST(fa.c_i AS DOUBLE))
         / (CAST(fb.c_i AS DOUBLE) / CAST(n.n AS DOUBLE)) AS lift
FROM pairs
JOIN freq fa ON fa.l_partkey = part_a
JOIN freq fb ON fb.l_partkey = part_b, n
ORDER BY lift DESC, part_a, part_b
LIMIT {ASSOC_TOP_K}
"""


def abc_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: rank every
    part by total discounted revenue, accumulate the running share,
    and label A (first 80 % of revenue), B (next 15 %), C (tail) —
    the inventory-analytics classic ("which 20 % of parts make 80 %
    of revenue"). Everything stays exact until the last cast: revenue
    sums in DECIMAL(18,6) partials, the running total is a DECIMAL
    window sum, and the class test multiplies decimals by integer
    percentages (cum·100 ≤ total·80) — no division, no float
    compare. Scale: per-part agg with map-side combine, then one
    global window over PARTS (corpus/1000-scale; the scalable_rank
    bucket decomposition in operators/ranking.py is the drop-in if
    parts themselves outgrow one stage)."""
    from mapreduce_rust_spark.operators.relational import DEC_MONEY
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (li.groupBy("l_partkey")
                .agg(F.sum((F.col("l_extendedprice")
                            * (1 - F.col("l_discount"))).cast(DEC_MONEY))
                     .alias("rev")))
    w = W.orderBy(F.desc("rev"), "l_partkey")
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    total = per_part.agg(F.sum("rev").alias("tot")).localCheckpoint(eager=False)
    d = (per_part
         .withColumn("rnk", F.row_number().over(w).cast("long"))
         .withColumn("cum", F.sum("rev").over(wcum))
         .crossJoin(F.broadcast(total)))
    cls = (F.when(F.col("cum") * 100 <= F.col("tot") * 80, "A")
            .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
            .otherwise("C"))
    return d.select("l_partkey", "rnk",
                    F.col("rev").cast("double").alias("revenue"),
                    F.col("cum").cast("double").alias("cum_revenue"),
                    cls.alias("abc_class"))


ABC_PARETO_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS rev
  FROM lineitem GROUP BY l_partkey
),
t AS (SELECT SUM(rev) AS tot FROM per_part),
d AS (
  SELECT l_partkey, rev,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
         SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM per_part
  WINDOW w AS (ORDER BY rev DESC, l_partkey)
)
SELECT l_partkey, rnk,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(cum AS DOUBLE) AS cum_revenue,
       CASE WHEN cum * 100 <= tot * 80 THEN 'A'
            WHEN cum * 100 <= tot * 95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM d, t
"""


RFM_BINS = 5


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, quintile scores for Recency
    (days since last order, as-of the corpus max date), Frequency
    (order count), and Monetary (total spend in cents), concatenated
    into the marketing segment label ("555" = best). Scores are
    plain ascending NTILEs with custkey tiebreak, so a LOW r_score
    means a LONG time since the last order — every score is
    deterministic on both engines and all inputs are exact integers
    (date diffs in days, counts, cents). The as-of anchor is a 1-row
    broadcast (the decay_weighted convention). Scale: one per-
    customer aggregate, then three NTILE windows over CUSTOMERS —
    each replaceable by ranking.ntile_expr's two-phase form at
    100 TB (the curriculum decomposition)."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_dt"),
        F.count("*").alias("frequency"),
        F.sum(F.bround(F.col("o_totalprice") * 100).cast("long"))
         .alias("monetary_c"))
    anchor = orders.agg(F.max("o_orderdate").alias("t_max"))
    d = (per_cust.crossJoin(F.broadcast(anchor))
         .withColumn("recency_days",
                     F.datediff("t_max", "last_dt").cast("long")))
    wr = W.orderBy("recency_days", "o_custkey")
    wf = W.orderBy("frequency", "o_custkey")
    wm = W.orderBy("monetary_c", "o_custkey")
    d = (d.withColumn("r_score", F.ntile(RFM_BINS).over(wr).cast("long"))
          .withColumn("f_score", F.ntile(RFM_BINS).over(wf).cast("long"))
          .withColumn("m_score", F.ntile(RFM_BINS).over(wm).cast("long")))
    return d.select(
        "o_custkey", "recency_days", "frequency", "monetary_c",
        "r_score", "f_score", "m_score",
        F.concat(F.col("r_score").cast("string"),
                 F.col("f_score").cast("string"),
                 F.col("m_score").cast("string")).alias("segment"))


RFM_ORACLE = f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_dt,
         COUNT(*) AS frequency,
         SUM(CAST(round_even(o_totalprice * 100, 0) AS BIGINT))
           AS monetary_c
  FROM orders GROUP BY o_custkey
),
a AS (SELECT MAX(o_orderdate) AS t_max FROM orders),
d AS (
  SELECT o_custkey, frequency,
         CAST(monetary_c AS BIGINT) AS monetary_c,
         CAST(date_diff('day', last_dt, t_max) AS BIGINT) AS recency_days
  FROM per_cust, a
)
SELECT o_custkey, recency_days, frequency, monetary_c,
       CAST(NTILE({RFM_BINS}) OVER (ORDER BY recency_days, o_custkey)
            AS BIGINT) AS r_score,
       CAST(NTILE({RFM_BINS}) OVER (ORDER BY frequency, o_custkey)
            AS BIGINT) AS f_score,
       CAST(NTILE({RFM_BINS}) OVER (ORDER BY monetary_c, o_custkey)
            AS BIGINT) AS m_score,
       CAST(NTILE({RFM_BINS}) OVER (ORDER BY recency_days, o_custkey)
            AS VARCHAR)
         || CAST(NTILE({RFM_BINS}) OVER (ORDER BY frequency, o_custkey)
                 AS VARCHAR)
         || CAST(NTILE({RFM_BINS}) OVER (ORDER BY monetary_c, o_custkey)
                 AS VARCHAR) AS segment
FROM d
"""


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: every purchase event is
    credited to the MOST RECENT non-purchase event in the same
    30-min session (no prior touch ⇒ 'direct'), aggregated to
    credits per touch type — the marketing-analytics join of the
    sessionize family.

    The "last preceding touch" is a MAX over a preceding-rows window
    of a zero-padded '(us|event_id|type)' string — lexicographic max
    of fixed-width numeric text ≡ numeric (us, event_id) max, a
    total order both engines agree on (the struct-max argmax trick,
    in its portable string form because the window needs
    PRECEDING-frame aggregation over a composite). One sessionize
    window + one bounded aggregate; output ≤ |event types| + 1."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0))
    sess = F.sum("new_sess").over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow))
    s = marked.withColumn("sess", sess)
    ws = (W.partitionBy("user_id", "sess").orderBy("us", "event_id")
           .rowsBetween(W.unboundedPreceding, -1))
    touch_key = F.when(
        F.col("event_type") != "purchase",
        F.format_string("%020d|%020d|%s", F.col("us"), F.col("event_id"),
                        F.col("event_type")))
    credited = (s.withColumn("last_touch", F.max(touch_key).over(ws))
                 .filter(F.col("event_type") == "purchase")
                 .select(F.coalesce(
                     F.element_at(F.split("last_touch", r"\|"), 3),
                     F.lit("direct")).alias("touch_type")))
    return (credited.groupBy("touch_type")
            .agg(F.count("*").alias("n_conversions")))


ATTRIBUTION_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
m AS (
  SELECT *, CASE WHEN us - LAG(us) OVER w IS NULL
                  OR us - LAG(us) OVER w > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
  FROM m
),
c AS (
  SELECT event_type,
         MAX(CASE WHEN event_type <> 'purchase' THEN
               printf('%020d|%020d|%s', us, event_id, event_type) END)
           OVER (PARTITION BY user_id, sess ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_touch
  FROM s
)
SELECT COALESCE(string_split(last_touch, '|')[3], 'direct') AS touch_type,
       COUNT(*) AS n_conversions
FROM c WHERE event_type = 'purchase'
GROUP BY 1
"""


def markov_transitions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over sessionized event
    streams: for every (from_type, to_type) pair of CONSECUTIVE
    events inside a 30-min-gap session, the transition count and the
    conditional probability P(to | from) — the normalized pairwise
    companion of ``session_path_counts`` (paths show whole journeys;
    this is the memoryless model product analytics fits to them).

    Session boundaries reuse sessionize_events' definition verbatim
    (same gap, same (us, event_id) ordering): a transition exists
    only when the NEXT row of the per-user stream is in the same
    session, read off ``lead(new_sess) = 0`` — no second sessionize
    pass and no self-join. Scale: one user_id-partitioned window
    (the proven sessionize shape), then an aggregate whose output is
    bounded by |event_types|² — map-side combine collapses the
    shuffle to the matrix size. P is int÷int double division,
    correctly rounded identically on both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0))
    pairs = (marked
             .withColumn("to_type", F.lead("event_type").over(w))
             .withColumn("to_new", F.lead("new_sess").over(w))
             .filter(F.col("to_new") == 0)
             .select(F.col("event_type").alias("from_type"), "to_type"))
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_trans"))
    w_from = W.partitionBy("from_type")
    return (counts
            .withColumn("n_from", F.sum("n_trans").over(w_from))
            .select("from_type", "to_type", "n_trans",
                    (F.col("n_trans").cast("double")
                     / F.col("n_from").cast("double")).alias("p_cond")))


MARKOV_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
m AS (
  SELECT user_id, event_id, event_type, us,
         CASE WHEN us - LAG(us) OVER w IS NULL
               OR us - LAG(us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
p AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER w AS to_type,
         LEAD(new_sess) OVER w AS to_new
  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
c AS (
  SELECT from_type, to_type, COUNT(*) AS n_trans
  FROM p WHERE to_new = 0
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_trans,
       CAST(n_trans AS DOUBLE)
         / CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS DOUBLE)
         AS p_cond
FROM c
"""


def interp_gapfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill — the exact-arithmetic companion
    of ``gapfill_hourly_events``' LOCF: empty hourly buckets on the
    same dense per-user grid are filled by the straight line between
    the PREVIOUS and NEXT observed hours; hours before the first /
    after the last observation stay NULL (no extrapolation — an
    honest edge, unlike LOCF's zero-fill).

    Exactness: observations are 1e6-quantized longs, timestamps
    integer epoch-seconds, and the interpolation numerator
    ``vq_prev·(t_next−t) + vq_next·(t−t_prev)`` is computed wholly in
    int64 (bounded: |vq| ≲ 1e10 × grid span 2.6e6 s ≈ 2.6e16 ≪ 2^63)
    before ONE double division by ``(t_next−t_prev)·1e6`` — the same
    single-IEEE-op discipline as the OLS closed form, so floats
    hash-match. Scale: grid build and both IGNORE-NULLS windows
    partition per user (sub-shardable per (user, week) at 100 TB
    with boundary-observation exchange, the sessionize pattern)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < GAPFILL_USERS)
    hourly = (ev.groupBy("user_id",
                         (F.floor(F.unix_seconds(F.col("ts")) / 3600)
                          * 3600).alias("hour_epoch"))
                .agg(F.sum(F.bround(F.col("value") * 1e6, 0).cast("long"))
                      .alias("vq")))
    start = F.to_timestamp(F.lit(GAPFILL_START))
    users = (ev.select("user_id").distinct()
               .select("user_id",
                       F.explode(F.sequence(
                           F.lit(0), F.lit(GAPFILL_HOURS - 1))).alias("h"))
               .select("user_id",
                       (F.unix_seconds(start) + F.col("h") * 3600)
                       .alias("hour_epoch")))
    g = users.join(hourly, ["user_id", "hour_epoch"], "left")
    wp = (W.partitionBy("user_id").orderBy("hour_epoch")
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    wn = (W.partitionBy("user_id").orderBy("hour_epoch")
           .rowsBetween(W.currentRow, W.unboundedFollowing))
    t_obs = F.when(F.col("vq").isNotNull(), F.col("hour_epoch"))
    g = (g.withColumn("v_prev", F.last("vq", ignorenulls=True).over(wp))
          .withColumn("t_prev", F.last(t_obs, ignorenulls=True).over(wp))
          .withColumn("v_next", F.first("vq", ignorenulls=True).over(wn))
          .withColumn("t_next", F.first(t_obs, ignorenulls=True).over(wn)))
    num = (F.col("v_prev") * (F.col("t_next") - F.col("hour_epoch"))
           + F.col("v_next") * (F.col("hour_epoch") - F.col("t_prev")))
    interp = F.when(
        F.col("vq").isNotNull(), F.col("vq").cast("double") / 1e6).when(
        F.col("v_prev").isNotNull() & F.col("v_next").isNotNull(),
        num.cast("double")
        / ((F.col("t_next") - F.col("t_prev")).cast("double") * 1e6))
    return g.select("user_id", "hour_epoch",
                    (F.col("vq").cast("double") / 1e6).alias("hour_value"),
                    interp.alias("interp_value"))


INTERP_GAPFILL_ORACLE = f"""
WITH hourly AS (
  SELECT user_id,
         CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_epoch,
         SUM(CAST(round_even(value * 1e6, 0) AS BIGINT)) AS vq
  FROM events WHERE user_id < {GAPFILL_USERS}
  GROUP BY 1, 2
),
grid AS (
  SELECT u.user_id,
         CAST(epoch(TIMESTAMP '{GAPFILL_START}') + h * 3600 AS BIGINT)
           AS hour_epoch
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < {GAPFILL_USERS}) u,
       UNNEST(range(0, {GAPFILL_HOURS})) AS t(h)
),
g AS (
  SELECT g.user_id, g.hour_epoch, h.vq,
         CASE WHEN h.vq IS NOT NULL THEN g.hour_epoch END AS t_obs
  FROM grid g LEFT JOIN hourly h
    ON g.user_id = h.user_id AND g.hour_epoch = h.hour_epoch
),
w AS (
  SELECT user_id, hour_epoch, vq,
         LAST_VALUE(vq IGNORE NULLS) OVER wp AS v_prev,
         LAST_VALUE(t_obs IGNORE NULLS) OVER wp AS t_prev,
         FIRST_VALUE(vq IGNORE NULLS) OVER wn AS v_next,
         FIRST_VALUE(t_obs IGNORE NULLS) OVER wn AS t_next
  FROM g
  WINDOW wp AS (PARTITION BY user_id ORDER BY hour_epoch
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY hour_epoch
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, hour_epoch,
       CAST(vq AS DOUBLE) / 1e6 AS hour_value,
       CASE WHEN vq IS NOT NULL THEN CAST(vq AS DOUBLE) / 1e6
            WHEN v_prev IS NOT NULL AND v_next IS NOT NULL THEN
              CAST(v_prev * (t_next - hour_epoch)
                   + v_next * (hour_epoch - t_prev) AS DOUBLE)
                / (CAST(t_next - t_prev AS DOUBLE) * 1e6)
       END AS interp_value
FROM w
"""


SKYLINE_BUCKETS = 1024   # target sub-shard count for the price axis


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of ``part`` minimizing
    (retail price, size): the parts no other part beats on both
    dimensions (≤ on both, < on at least one). The classic research
    operator Spark has no primitive for (Börzsönyi et al., ICDE'01);
    the sort-filter-skyline algorithm collapses to pure window
    algebra in 2-D:

        dominated(p)  ⇔  min size over price < p  ≤  size(p)
                      OR  min size over price ≤ p  <  size(p)

    (first clause: a strictly-cheaper part no bigger; second: a
    no-pricier part strictly smaller — together exactly the ∃ with
    one strict inequality; equal (price, size) twins dominate
    neither way and both survive, matching the NOT EXISTS oracle).

    Scale design: the two prefix-mins are NOT a global single-
    partition window — prices sub-shard on an order-preserving
    bucket (the scalable_rank decomposition, ranking.py): per-bucket
    RANGE windows run in parallel and the cross-bucket carry-in is a
    prefix-min over BUCKET SUMMARIES only (≤ SKYLINE_BUCKETS rows,
    broadcast back). The bucket width ADAPTS to the observed price
    range (one tiny min/max agg, broadcast) — a fixed width would
    collapse to a single global window on any narrow-range
    distribution, the same degenerate-key hazard the sessionize
    decomposition guards. One data shuffle on (bucket), one summary
    window. Prices compared on the exact cents grid.

    Output: ``(p_partkey, price_cents, p_size)`` skyline rows.
    """
    base = (load_table(spark, sf_dir, "part")
            .select("p_partkey",
                    F.round(F.col("p_retailprice") * 100).cast("long")
                     .alias("price_cents"),
                    F.col("p_size").cast("long").alias("p_size")))
    rng = base.agg(F.min("price_cents").alias("_lo"),
                   F.max("price_cents").alias("_hi"))
    p = (base.crossJoin(F.broadcast(rng))
         .withColumn("_w", F.expr(
             f"greatest(1L, (_hi - _lo + 1) DIV {SKYLINE_BUCKETS})"))
         .withColumn("_b", F.expr("(price_cents - _lo) DIV _w"))
         .drop("_lo", "_hi", "_w"))
    # cross-bucket carry-in: min size over all STRICTLY LOWER buckets
    bmin = p.groupBy("_b").agg(F.min("p_size").alias("_bm"))
    wb = W.partitionBy().orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    carry = bmin.select("_b", F.min("_bm").over(wb).alias("_pm"))
    # within-bucket prefix mins on the exact cents axis (one window
    # stage, two frames over the same (bucket ORDER BY price) sort)
    wlt = (W.partitionBy("_b").orderBy("price_cents")
           .rangeBetween(W.unboundedPreceding, -1))
    wle = (W.partitionBy("_b").orderBy("price_cents")
           .rangeBetween(W.unboundedPreceding, 0))
    big = F.lit(1 << 62)
    scored = (p.join(F.broadcast(carry), "_b")
              .withColumn("_lt", F.least(F.coalesce(F.min("p_size").over(wlt), big),
                                         F.coalesce(F.col("_pm"), big)))
              .withColumn("_le", F.least(F.min("p_size").over(wle),
                                         F.coalesce(F.col("_pm"), big))))
    return (scored
            .where(~((F.col("_lt") <= F.col("p_size"))
                     | (F.col("_le") < F.col("p_size"))))
            .select("p_partkey", "price_cents", "p_size"))


SKYLINE_ORACLE = """
WITH p AS (
  SELECT p_partkey,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part)
SELECT p_partkey, price_cents, p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents <= a.price_cents AND b.p_size <= a.p_size
    AND (b.price_cents < a.price_cents OR b.p_size < a.p_size))
"""


ITEM_CF_TOP_K = 5
ITEM_CF_MIN_CO = 2   # min shared orders before a neighbor counts


def item_cf_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over order co-occurrence —
    the "customers who bought X also bought Y" neighbor table, scored
    by cosine over binary order-vectors: cos(u, v) =
    n_uv / √(n_u·n_v) where n_uv = orders containing both parts and
    n_u = orders containing u. The recsys companion of
    ``assoc_rules_parts`` (lift ranks by dependence; cosine is the
    symmetric similarity an item-kNN recommender serves).

    Exactness: all inputs are integer order counts; √ is IEEE-exact
    (correctly rounded everywhere, unlike libm ln/pow — the
    temperature-mix precedent), so cos is the same two-op double DAG
    on both engines and ranks/hashes match bit-for-bit. Ties in the
    top-k break on neighbor id.

    Scale shape: the pair stream comes from the capped IN-ROW basket
    pair generation (``graph.copurchase_edges`` discipline /
    ``ASSOC_MAX_BASKET``), one (u, v) count aggregate, one broadcast
    join back to per-item totals, and a per-item top-k window
    (partitioned by item — bounded by that item's neighbor count,
    itself Σ co-baskets, never corpus-wide).

    Output: ``(part, neighbor, n_co, cos, rk)``, top
    ``ITEM_CF_TOP_K`` per part with ≥ ``ITEM_CF_MIN_CO`` shared
    orders.
    """
    from mapreduce_rust_spark.operators.graph import _ordered_pairs
    from pyspark.sql import Window as W
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (li.groupBy(F.col("l_orderkey").alias("o"))
                 .agg(F.slice(F.array_sort(F.collect_set("l_partkey")),
                              1, ASSOC_MAX_BASKET).alias("ps"))
                 # EAGER on purpose (round-13 A/B): lazy moved the
                 # heavy basket aggregation INSIDE the first n_u
                 # broadcast-exchange build and the bench row went
                 # 1.80 → 2.55 s; eager keeps the big agg on the full
                 # scheduler and the broadcast builds tiny
                 .localCheckpoint(eager=True))
    n_u = (baskets.select(F.explode("ps").alias("part"))
                  .groupBy("part").agg(F.count("*").alias("n")))
    pairs = (baskets.select(F.explode(_ordered_pairs(F.col("ps")))
                            .alias("e"))
                    .groupBy(F.col("e.u").alias("u"),
                             F.col("e.v").alias("v"))
                    .agg(F.count("*").alias("n_co"))
                    .filter(F.col("n_co") >= ITEM_CF_MIN_CO))
    both = (pairs.select("u", "v", "n_co")
                 .unionAll(pairs.select(F.col("v").alias("u"),
                                        F.col("u").alias("v"), "n_co")))
    scored = (both
              .join(F.broadcast(n_u.withColumnRenamed("part", "u")
                                   .withColumnRenamed("n", "nu")), "u")
              .join(F.broadcast(n_u.withColumnRenamed("part", "v")
                                   .withColumnRenamed("n", "nv")), "v")
              .select(F.col("u").alias("part"),
                      F.col("v").alias("neighbor"),
                      F.col("n_co").cast("long").alias("n_co"),
                      (F.col("n_co").cast("double")
                       / F.sqrt((F.col("nu") * F.col("nv"))
                                .cast("double"))).alias("cos")))
    wk = W.partitionBy("part").orderBy(F.col("cos").desc(), "neighbor")
    return (scored.withColumn("rk", F.row_number().over(wk).cast("long"))
                  .filter(F.col("rk") <= ITEM_CF_TOP_K))


ITEM_CF_ORACLE = f"""
WITH op AS (
  SELECT o, p FROM (
    SELECT l_orderkey AS o, l_partkey AS p, ROW_NUMBER() OVER
           (PARTITION BY l_orderkey ORDER BY l_partkey) AS rn
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE rn <= {ASSOC_MAX_BASKET}),
n_u AS (SELECT p, COUNT(*) AS n FROM op GROUP BY p),
pairs AS (
  SELECT a.p AS u, b.p AS v, COUNT(*) AS n_co
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING COUNT(*) >= {ITEM_CF_MIN_CO}
),
bidir AS (SELECT u, v, n_co FROM pairs
          UNION ALL SELECT v, u, n_co FROM pairs),
scored AS (
  SELECT b.u AS part, b.v AS neighbor, CAST(b.n_co AS BIGINT) AS n_co,
         CAST(b.n_co AS DOUBLE)
           / sqrt(CAST(nu.n * nv.n AS DOUBLE)) AS cos
  FROM bidir b JOIN n_u nu ON nu.p = b.u JOIN n_u nv ON nv.p = b.v
),
rk AS (
  SELECT part, neighbor, n_co, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY part
              ORDER BY cos DESC, neighbor) AS BIGINT) AS rk
  FROM scored
)
SELECT part, neighbor, n_co, cos, rk FROM rk WHERE rk <= {ITEM_CF_TOP_K}
"""


FUNNEL_PATTERN = "v[vc]*p"   # view, any views/clicks, purchase


def event_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex sequence matching over per-user event streams — the
    MATCH_RECOGNIZE-lite behavioral operator: encode each user's
    (ts, event_id)-ordered event types as a character string (one
    char per event — types map to distinct first letters) and count
    non-overlapping matches of ``FUNNEL_PATTERN`` ("a view, then any
    run of views/clicks, then a purchase" — the browse-to-buy motif
    ``funnel_conversion_events``' fixed-step form can't express).

    Determinism note: for this pattern class (character classes with
    a required terminal literal) the match set is unambiguous — a
    match is a maximal v/c run ending at a p — so backtracking (JVM)
    and leftmost-longest (RE2/DuckDB) engines agree exactly; keep
    patterns in this class when adding variants.

    Scale shape: one shuffle on user_id; the sequence string builds
    in-row from the sorted struct array (per-human-bounded, with the
    chunked-carry template as the giant-key remedy — a regex over
    day segments needs only a has-open-prefix carry) and the regexp
    runs inside codegen. Output: ``(user_id, n_events, n_funnels)``
    for users with ≥1 match.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("user_id", F.unix_micros("ts").alias("us"),
                     "event_id",
                     F.substring("event_type", 1, 1).alias("tc"))
    g = (base.groupBy("user_id")
         .agg(F.sort_array(F.collect_list(
             F.struct("us", "event_id", "tc"))).alias("arr")))
    seq = F.array_join(F.transform("arr", lambda x: x["tc"]), "")
    out = g.select("user_id",
                   F.size("arr").cast("long").alias("n_events"),
                   F.regexp_count(seq, F.lit(FUNNEL_PATTERN))
                    .cast("long").alias("n_funnels"))
    return out.filter(F.col("n_funnels") > 0)


EVENT_PATTERN_ORACLE = f"""
WITH b AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         substr(event_type, 1, 1) AS tc
  FROM events
),
g AS (
  SELECT user_id,
         string_agg(tc, '' ORDER BY us, event_id) AS seq,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM b GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(len(regexp_extract_all(seq, '{FUNNEL_PATTERN}')) AS BIGINT)
         AS n_funnels
FROM g
WHERE len(regexp_extract_all(seq, '{FUNNEL_PATTERN}')) > 0
"""


def bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily session-quality report — sessions, bounce rate (share of
    single-event sessions) and mean dwell time per day — the standard
    web-analytics readout built ON TOP of the engine's gap
    sessionization (30-min ``relational.SESSION_GAP_S``): sessions
    get identities via the running new-session counter, collapse to
    (n_events, first, last), and roll up to the day of the session's
    FIRST event. Dwell is exact integer microseconds; rates/means are
    single int÷int IEEE divisions.

    Scale: one shuffle on user_id for the session windows (per-user
    event history in one sort — the giant-key remedy is the proven
    (user, day) decomposition of ``sessionize_events_scalable``,
    kept out of THIS plan so the oracle stays the naive window), one
    (user, session) aggregate, one day rollup.

    Output: ``(day, n_sessions, n_bounces, bounce_rate,
    avg_dwell_s)`` — day as epoch day.
    """
    from mapreduce_rust_spark.operators.relational import SESSION_GAP_S
    from pyspark.sql import Window as W
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id")
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    ns = F.when(gap.isNull()
                | (gap > SESSION_GAP_S * 1_000_000), 1).otherwise(0)
    wr = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = (ev.withColumn("ns", ns)
              .withColumn("sid", F.sum("ns").over(wr))
              .groupBy("user_id", "sid")
              .agg(F.count("*").alias("n_events"),
                   F.min("us").alias("f"), F.max("us").alias("l")))
    daily = (sess.withColumn("day", F.expr("f DIV 86400000000"))
             .groupBy("day")
             .agg(F.count("*").cast("long").alias("n_sessions"),
                  F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
                   .cast("long").alias("n_bounces"),
                  F.sum(F.col("l") - F.col("f")).alias("dwell_us")))
    return daily.select(
        "day", "n_sessions", "n_bounces",
        (F.col("n_bounces").cast("double")
         / F.col("n_sessions").cast("double")).alias("bounce_rate"),
        (F.col("dwell_us").cast("double")
         / (F.col("n_sessions") * 1_000_000).cast("double"))
        .alias("avg_dwell_s"))


def _bounce_oracle() -> str:
    from mapreduce_rust_spark.operators.relational import SESSION_GAP_S
    gap_us = SESSION_GAP_S * 1_000_000
    return f"""
WITH b AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
),
w1 AS (
  SELECT user_id, us, event_id,
         CASE WHEN lag(us) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) IS NULL
                OR us - lag(us) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id) > {gap_us}
              THEN 1 ELSE 0 END AS ns
  FROM b
),
w2 AS (
  SELECT user_id, us,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM w1
),
sess AS (
  SELECT user_id, sid, COUNT(*) AS n_events,
         MIN(us) AS f, MAX(us) AS l
  FROM w2 GROUP BY user_id, sid
),
daily AS (
  SELECT CAST(f // 86400000000 AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_sessions,
         CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
         CAST(SUM(l - f) AS BIGINT) AS dwell_us
  FROM sess GROUP BY 1
)
SELECT day, n_sessions, n_bounces,
       CAST(n_bounces AS DOUBLE) / CAST(n_sessions AS DOUBLE)
         AS bounce_rate,
       CAST(dwell_us AS DOUBLE) / CAST(n_sessions * 1000000 AS DOUBLE)
         AS avg_dwell_s
FROM daily
"""


BOUNCE_RATE_ORACLE = _bounce_oracle()


CORR_COLS = ("qty", "price", "disc", "tax")


def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's numeric
    measures (quantity, extendedprice, discount, tax on their exact
    cents/percent integer grids) — the relational profiling twin of
    ``embedding_covariance``: ALL pairwise statistics from ONE
    partial+final aggregate over the scan (n plus 4 sums, 4 squares,
    6 cross-products in DECIMAL(38,0) — the stats_agg/CUPED power-sum
    discipline), then each r = (n·Sxy − Sx·Sy) / (√dx·√dy) as a fixed
    IEEE DAG (√ is correctly rounded everywhere — oracle-safe).

    Scale: the aggregate is map-side combinable and its result is ONE
    row regardless of corpus size; the d² expansion to output rows is
    driver-free (an in-plan literal-pair explode). At 100 TB this is
    one scan, one 15-number shuffle.

    Output: ``(col_x, col_y, n, corr)`` for the 6 pairs x < y.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    v = {
        "qty": F.col("l_quantity").cast("long"),
        "price": F.bround(F.col("l_extendedprice") * 100).cast("long"),
        "disc": F.bround(F.col("l_discount") * 100).cast("long"),
        "tax": F.bround(F.col("l_tax") * 100).cast("long"),
    }
    base = li.select(*[c.alias(k) for k, c in v.items()])
    aggs = [F.count("*").alias("n")]
    for k in CORR_COLS:
        aggs.append(F.sum(F.col(k).cast(dec)).alias(f"s_{k}"))
    for i, a in enumerate(CORR_COLS):
        for b in CORR_COLS[i:]:
            aggs.append(F.sum((F.col(a) * F.col(b)).cast(dec))
                        .alias(f"p_{a}_{b}"))
    g = base.agg(*aggs)

    def corr(a: str, b: str) -> F.Column:
        n = F.col("n").cast(dec)
        num = (n * F.col(f"p_{a}_{b}")
               - F.col(f"s_{a}") * F.col(f"s_{b}")).cast("double")
        dx = (n * F.col(f"p_{a}_{a}")
              - F.col(f"s_{a}") * F.col(f"s_{a}")).cast("double")
        dy = (n * F.col(f"p_{b}_{b}")
              - F.col(f"s_{b}") * F.col(f"s_{b}")).cast("double")
        return num / (F.sqrt(dx) * F.sqrt(dy))

    pairs = [(a, b) for i, a in enumerate(CORR_COLS)
             for b in CORR_COLS[i + 1:]]
    rows = F.array(*[
        F.struct(F.lit(a).alias("col_x"), F.lit(b).alias("col_y"),
                 F.col("n").cast("long").alias("n"),
                 corr(a, b).alias("corr"))
        for a, b in pairs])
    return (g.select(F.explode(rows).alias("r"))
             .select("r.col_x", "r.col_y", "r.n", "r.corr"))


def _corr_matrix_oracle() -> str:
    expr = {
        "qty": "CAST(l_quantity AS BIGINT)",
        "price": "CAST(round_even(l_extendedprice * 100, 0) AS BIGINT)",
        "disc": "CAST(round_even(l_discount * 100, 0) AS BIGINT)",
        "tax": "CAST(round_even(l_tax * 100, 0) AS BIGINT)",
    }
    sums = ["COUNT(*) AS n"]
    for k in CORR_COLS:
        sums.append(f"SUM(CAST({k} AS DECIMAL(38,0))) AS s_{k}")
    for i, a in enumerate(CORR_COLS):
        for b in CORR_COLS[i:]:
            sums.append(f"SUM(CAST({a} * {b} AS DECIMAL(38,0)))"
                        f" AS p_{a}_{b}")
    sel = []
    for i, a in enumerate(CORR_COLS):
        for b in CORR_COLS[i + 1:]:
            num = (f"CAST(CAST(n AS DECIMAL(38,0)) * p_{a}_{b}"
                   f" - s_{a} * s_{b} AS DOUBLE)")
            dx = (f"CAST(CAST(n AS DECIMAL(38,0)) * p_{a}_{a}"
                  f" - s_{a} * s_{a} AS DOUBLE)")
            dy = (f"CAST(CAST(n AS DECIMAL(38,0)) * p_{b}_{b}"
                  f" - s_{b} * s_{b} AS DOUBLE)")
            sel.append(f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
                       f"CAST(n AS BIGINT) AS n, "
                       f"{num} / (sqrt({dx}) * sqrt({dy})) AS corr "
                       f"FROM g")
    cols = ", ".join(f"{v} AS {k}" for k, v in expr.items())
    nl = "\n"
    return (f"WITH b AS (SELECT {cols} FROM lineitem),{nl}"
            f"g AS (SELECT {', '.join(sums)} FROM b){nl}"
            + f"{nl}UNION ALL{nl}".join(sel))


CORR_MATRIX_ORACLE = _corr_matrix_oracle()


RECO_K = 10
RECO_EVAL_MOD = 10   # deterministic 10% customer evaluation sample


# Session-scoped memo of the item-CF neighbor MODEL table — the
# edge-memo justification (operators/graph.py): the CF table is a
# derived shared dataset (parts × top-5 rows, ~100 KB) that both the
# registered item_cf_neighbors query and every evaluation consuming
# the model would materialize once in a real session. Keyed by
# (applicationId, lineitem plan hash); checkpoint blocks die with the
# session.
_ITEM_CF_MEMO: dict[tuple[str, int], DataFrame] = {}


def item_cf_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    app_id = spark.sparkContext.applicationId
    graph.evict_stale_memo(_ITEM_CF_MEMO, app_id)
    key = (app_id, li.semanticHash())
    df = _ITEM_CF_MEMO.get(key)
    if df is None:
        df = item_cf_neighbors(spark, sf_dir).localCheckpoint(eager=True)
        _ITEM_CF_MEMO[key] = df
    return df


def recsys_eval_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline recommender evaluation — hit-rate@k of the item-CF
    neighbor table against each customer's HELD-OUT LAST order
    (leave-last-basket-out): recommend the top-k unseen parts scored
    by max cosine to any history part, score a hit if the held-out
    basket contains any of them. Evaluation-as-operator, the
    ``dedup_eval_lsh`` pattern: the Spark op COMPOSES the registered
    ``item_cf_neighbors`` query and the oracle NESTS its oracle as a
    CTE, so the checked artifact proves the composed pipeline, not
    just the parts.

    Exactness: cosines are the CF op's proven two-op doubles; the
    per-candidate score is an order-independent MAX of them; ranking
    ties break on candidate id; hit-rate is one int÷int division.
    Denominator = every customer with ≥ 2 orders (customers whose
    history has no CF neighbors simply can't hit — they stay in the
    denominator, as honest evaluation requires).

    Scale: the CF model is trained on the FULL basket corpus, but
    the evaluation runs on a deterministic 10% customer sample
    (``o_custkey % RECO_EVAL_MOD = 0`` — retry-safe, mirrored in the
    oracle), the standard offline-eval economy: metric variance
    shrinks with √sample, so evaluating every customer buys nothing.
    The argmax-last-order split is one customer-grain aggregate;
    candidate volume is history parts × top-5 neighbors (never
    corpus²); the per-customer top-k window is bounded by that
    candidate set. Inherits ``ASSOC_MAX_BASKET``.

    Output: one row ``(k, n_eval, n_hit, hit_rate)``.
    """
    orders = (load_table(spark, sf_dir, "orders")
              .where(F.col("o_custkey") % RECO_EVAL_MOD == 0)
              .select("o_orderkey", "o_custkey",
                      F.datediff(F.to_date("o_orderdate"),
                                 F.lit("1970-01-01"))
                      .cast("long").alias("d")))
    last = (orders.groupBy("o_custkey")
            .agg(F.max(F.struct("d", "o_orderkey")).alias("m"),
                 F.count("*").alias("n_orders"))
            .where(F.col("n_orders") >= 2)
            .select("o_custkey", F.col("m.o_orderkey").alias("last_ok"))
            .localCheckpoint(eager=False))   # consumed by 3 branches
    li = (load_table(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("o_orderkey"),
                  F.col("l_partkey").alias("part")).distinct())
    lines = (li.join(orders, "o_orderkey").join(last, "o_custkey")
             .localCheckpoint(eager=False))  # hist + hold both read it
    hist = (lines.where(F.col("o_orderkey") != F.col("last_ok"))
            .select("o_custkey", "part").distinct()
            .localCheckpoint(eager=False))   # consumed by 2 branches
    hold = (lines.where(F.col("o_orderkey") == F.col("last_ok"))
            .select("o_custkey", "part").distinct())
    cf = item_cf_cached(spark, sf_dir).select(
        "part", F.col("neighbor").alias("cand"), "cos")
    recs = (hist.join(cf, "part")
            .groupBy("o_custkey", "cand")
            .agg(F.max("cos").alias("score"))
            .join(hist.select("o_custkey",
                              F.col("part").alias("cand")),
                  ["o_custkey", "cand"], "left_anti"))
    w = W.partitionBy("o_custkey").orderBy(F.col("score").desc(), "cand")
    topk = (recs.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= RECO_K))
    hits = (topk.join(hold.withColumnRenamed("part", "cand"),
                      ["o_custkey", "cand"], "left_semi")
            .select("o_custkey").distinct())
    n_eval = last.agg(F.count("*").cast("long").alias("n_eval"))
    n_hit = hits.agg(F.count("*").cast("long").alias("n_hit"))
    return (n_eval.crossJoin(F.broadcast(n_hit))
            .select(F.lit(RECO_K).cast("long").alias("k"),
                    "n_eval", "n_hit",
                    (F.col("n_hit").cast("double")
                     / F.col("n_eval").cast("double"))
                    .alias("hit_rate")))


def _recsys_eval_oracle() -> str:
    return f"""
WITH cf AS ({ITEM_CF_ORACLE}),
o AS (
  SELECT o_orderkey, o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS d
  FROM orders WHERE o_custkey % {RECO_EVAL_MOD} = 0
),
last AS (
  SELECT o_custkey,
         (MAX({{'d': d, 'k': o_orderkey}})).k AS last_ok
  FROM o GROUP BY o_custkey HAVING COUNT(*) >= 2
),
li AS (SELECT DISTINCT l_orderkey AS o_orderkey, l_partkey AS part
       FROM lineitem),
lines AS (
  SELECT l.o_orderkey, l.part, o.o_custkey, la.last_ok
  FROM li l JOIN o ON o.o_orderkey = l.o_orderkey
  JOIN last la ON la.o_custkey = o.o_custkey
),
hist AS (SELECT DISTINCT o_custkey, part FROM lines
         WHERE o_orderkey <> last_ok),
hold AS (SELECT DISTINCT o_custkey, part FROM lines
         WHERE o_orderkey = last_ok),
recs AS (
  SELECT h.o_custkey, cf.neighbor AS cand, MAX(cf.cos) AS score
  FROM hist h JOIN cf ON cf.part = h.part
  GROUP BY h.o_custkey, cf.neighbor
),
open_recs AS (
  SELECT r.* FROM recs r
  WHERE NOT EXISTS (SELECT 1 FROM hist h
                    WHERE h.o_custkey = r.o_custkey
                      AND h.part = r.cand)
),
topk AS (
  SELECT o_custkey, cand FROM (
    SELECT o_custkey, cand,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY score DESC, cand) AS rk
    FROM open_recs
  ) WHERE rk <= {RECO_K}
),
hits AS (
  SELECT DISTINCT t.o_custkey
  FROM topk t JOIN hold h
    ON h.o_custkey = t.o_custkey AND h.part = t.cand
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_eval FROM last),
nh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hit FROM hits)
SELECT CAST({RECO_K} AS BIGINT) AS k, n.n_eval, nh.n_hit,
       CAST(nh.n_hit AS DOUBLE) / CAST(n.n_eval AS DOUBLE) AS hit_rate
FROM n, nh
"""


def xyz_variability_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification — the companion axis to
    ``abc_pareto_parts`` in the classic ABC-XYZ inventory matrix:
    parts with steady weekly demand (X, CV ≤ 0.5) can run lean
    replenishment; erratic ones (Z, CV > 1) need safety stock or
    make-to-order. Weekly demand series per part over the GLOBAL
    calendar span, empty weeks as implicit zeros (the Fano
    discipline — zeros add nothing to the sums, only n counts them).

    Exactness: with n = span weeks, S1 = Σ demand, S2 = Σ demand²,
    population CV² = (n·S2 − S1²)/S1² — the CLASS BOUNDARIES are
    decided by pure integer cross-multiplication (X ⟺ 4·(n·S2−S1²)
    ≤ S1², Y ⟺ n·S2−S1² ≤ S1²), so no float comparison can ever
    flip a class across engines; the reported cv is one
    div-then-sqrt on the exact integers. Scale: one (part, week)
    aggregate, one per-part rollup, a 1-row span broadcast.

    Output: ``(part, n_weeks, total_qty, cv, xyz)``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wk = (li.select(F.col("l_partkey").alias("part"),
                    F.expr("CAST(datediff(to_date(l_shipdate), "
                           "DATE'1970-01-01') AS LONG) DIV 7")
                    .alias("week"),
                    F.round("l_quantity").cast("long").alias("q"))
          .groupBy("part", "week").agg(F.sum("q").alias("d")))
    dec = "decimal(38,0)"
    span = wk.agg((F.max("week") - F.min("week") + 1).cast(dec)
                  .alias("n_weeks"))
    g = (wk.groupBy("part")
         .agg(F.sum("d").cast(dec).alias("s1"),
              F.sum((F.col("d") * F.col("d")).cast(dec)).alias("s2")))
    num = F.col("n_weeks") * F.col("s2") - F.col("s1") * F.col("s1")
    den = F.col("s1") * F.col("s1")
    xyz = (F.when(4 * num <= den, "X")
           .when(num <= den, "Y").otherwise("Z"))
    return (g.crossJoin(F.broadcast(span))
            .select("part",
                    F.col("n_weeks").cast("long").alias("n_weeks"),
                    F.col("s1").cast("long").alias("total_qty"),
                    F.sqrt(num.cast("double") / den.cast("double"))
                    .alias("cv"),
                    xyz.alias("xyz")))


XYZ_ORACLE = """
WITH wk AS (
  SELECT l_partkey AS part,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(l_shipdate AS DATE)) AS BIGINT) // 7
           AS week,
         CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS d
  FROM lineitem GROUP BY part, week
),
span AS (SELECT CAST(MAX(week) - MIN(week) + 1 AS DECIMAL(38,0))
                  AS n_weeks FROM wk),
g AS (
  SELECT part, CAST(SUM(d) AS DECIMAL(38,0)) AS s1,
         SUM(CAST(d * d AS DECIMAL(38,0))) AS s2
  FROM wk GROUP BY part
)
SELECT part,
       CAST(span.n_weeks AS BIGINT) AS n_weeks,
       CAST(g.s1 AS BIGINT) AS total_qty,
       sqrt(CAST(span.n_weeks * g.s2 - g.s1 * g.s1 AS DOUBLE)
            / CAST(g.s1 * g.s1 AS DOUBLE)) AS cv,
       CASE WHEN 4 * (span.n_weeks * g.s2 - g.s1 * g.s1)
                 <= g.s1 * g.s1 THEN 'X'
            WHEN span.n_weeks * g.s2 - g.s1 * g.s1 <= g.s1 * g.s1
                 THEN 'Y'
            ELSE 'Z' END AS xyz
FROM g, span
"""


def open_lines_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order-fulfilment backlog: how many lineitems are OPEN
    (ordered but not yet shipped, inclusive of the ship day) on each
    day the count changes — the interval-STACKING shape (concurrent
    sessions, room occupancy, WIP inventory) that naive SQL writes as
    interval × calendar explode.

    Sweep-line decomposition: each [order day, ship day] interval
    contributes exactly TWO boundary deltas (+1 at start, −1 at
    end+1) regardless of its length — a 1000-day interval is 2 rows,
    never 1000 — then one day-grain aggregate and ONE running sum
    over the DELTA table, which is bounded by distinct boundary days
    (dims-sized: the fixture span is ~2400 days at any corpus scale),
    so the global window never sees data-sized input. Output is the
    sparse step function: days where the backlog changes, with the
    level holding between rows.

    Exactness: pure integer counts; day = days since epoch of the
    NTZ date. Output: ``(day, net_change, open_lines)``.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("long").alias("s"))
    lines = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01"))
        .cast("long").alias("e"))
    iv = lines.join(orders, "o_orderkey")
    deltas = (iv.select(F.col("s").alias("day"), F.lit(1).alias("d"))
              .unionAll(iv.select((F.col("e") + 1).alias("day"),
                                  F.lit(-1).alias("d")))
              .groupBy("day")
              .agg(F.sum("d").cast("long").alias("net_change"))
              .where(F.col("net_change") != 0))
    w = (W.partitionBy().orderBy("day")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return deltas.select(
        "day", "net_change",
        F.sum("net_change").over(w).cast("long").alias("open_lines"))


OPEN_LINES_BACKLOG_ORACLE = """
WITH iv AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
           AS s,
         date_diff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE))
           AS e
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
deltas AS (
  SELECT day, CAST(SUM(d) AS BIGINT) AS net_change
  FROM (SELECT s AS day, 1 AS d FROM iv
        UNION ALL SELECT e + 1, -1 FROM iv)
  GROUP BY day HAVING SUM(d) <> 0
)
SELECT CAST(day AS BIGINT) AS day, net_change,
       CAST(SUM(net_change) OVER (ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_lines
FROM deltas
"""


REGISTRATIONS = [
    ("open_lines_backlog_daily", open_lines_backlog_daily,
     OPEN_LINES_BACKLOG_ORACLE),
    ("xyz_variability_parts", xyz_variability_parts, XYZ_ORACLE),
    ("recsys_eval_hitrate", recsys_eval_hitrate, _recsys_eval_oracle()),
    ("funnel_conversion_events", funnel_conversion_events, FUNNEL_ORACLE),
    ("funnel_timebound_events", funnel_timebound_events,
     FUNNEL_TIMEBOUND_ORACLE),
    ("event_trigrams", event_trigrams, EVENT_TRIGRAMS_ORACLE),
    ("cohort_retention_events", cohort_retention_events, COHORT_ORACLE),
    ("gapfill_hourly_events", gapfill_hourly_events, GAPFILL_ORACLE),
    ("histogram_totalprice", histogram_totalprice, HISTOGRAM_ORACLE),
    ("equidepth_hist_totalprice", equidepth_hist_totalprice,
     EQUIDEPTH_ORACLE),
    ("session_path_counts", session_path_counts, SESSION_PATH_ORACLE),
    ("markov_transitions_events", markov_transitions_events, MARKOV_ORACLE),
    ("interp_gapfill_events", interp_gapfill_events, INTERP_GAPFILL_ORACLE),
    ("active_streaks_users", active_streaks_users, ACTIVE_STREAKS_ORACLE),
    ("active_users_7d", active_users_7d, ACTIVE_7D_ORACLE),
    ("assoc_rules_parts", assoc_rules_parts, ASSOC_RULES_ORACLE),
    ("abc_pareto_parts", abc_pareto_parts, ABC_PARETO_ORACLE),
    ("rfm_segments", rfm_segments, RFM_ORACLE),
    ("attribution_last_touch", attribution_last_touch,
     ATTRIBUTION_ORACLE),
    ("profile_orders", profile_orders, PROFILE_ORACLE),
    ("skyline_parts", skyline_parts, SKYLINE_ORACLE),
    ("cumulative_distinct_users", cumulative_distinct_users,
     CUMDIST_ORACLE),
    ("funnel_time_to_convert", funnel_time_to_convert, FUNNEL_TTC_ORACLE),
    ("item_cf_neighbors", item_cf_neighbors, ITEM_CF_ORACLE),
    ("event_pattern_funnel", event_pattern_funnel, EVENT_PATTERN_ORACLE),
    ("bounce_rate_daily", bounce_rate_daily, BOUNCE_RATE_ORACLE),
    ("corr_matrix_lineitem", corr_matrix_lineitem, CORR_MATRIX_ORACLE),
]


def retention_cells(orders_like: DataFrame) -> DataFrame:
    """Mergeable sufficient statistic for the retention triangle: one
    row per (customer, active month) with an order count — a plain
    count aggregate, so a streaming twin can maintain it in complete
    mode (state = customers × active months, the honestly
    user-dims-sized shape of stream_two_proportion). Batch and stream
    share this builder and ``retention_closed_form``."""
    return (orders_like
            .select(F.col("o_custkey").alias("c"),
                    F.to_date(F.date_trunc("month", "o_orderdate"))
                     .alias("m"))
            .groupBy("c", "m").agg(F.count("*").alias("n_orders")))


def retention_closed_form(cells: DataFrame) -> DataFrame:
    """Cohort × age retention counts from the (customer, month) cells:
    cohort = the customer's first active month, age = whole months
    since cohort, n_customers = distinct customers active at that age
    (exact: cells are unique per (customer, month), so a plain count
    suffices). months_between on month-truncated dates is an exact
    integer on both engines."""
    coh = cells.groupBy("c").agg(F.min("m").alias("cohort"))
    return (cells.join(coh, "c")
            .groupBy(F.date_format("cohort", "yyyy-MM")
                     .alias("cohort_month"),
                     F.months_between("m", "cohort").cast("long")
                     .alias("age_months"))
            .agg(F.count("*").cast("long").alias("n_customers")))


def retention_triangle_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention triangle on ORDERS (the subscription /
    repeat-purchase readout): customers cohorted by first-order month,
    counted in every later month they ordered, keyed (cohort month,
    months since cohort). Complements ``cohort_retention_events``
    (events table, day grain, window-based) with the month-grain
    order-history form and a streaming kappa twin
    (``stream_retention_triangle``) sharing this oracle.

    Scale: orders collapse to (customer, month) rows FIRST (map-side
    combined — bounded by customers × active months, a small multiple
    of the customer dimension); the cohort min is a second small agg;
    the final rollup is triangle-sized (months²/2). No windows, no
    per-customer sort, three partial-combinable aggregates total.

    Output: ``(cohort_month, age_months, n_customers)``.
    """
    return retention_closed_form(
        retention_cells(load_table(spark, sf_dir, "orders")))


RETENTION_TRIANGLE_ORACLE = """
WITH cm AS (
  SELECT o_custkey AS c,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
),
coh AS (SELECT c, MIN(m) AS cohort FROM cm GROUP BY c)
SELECT strftime(coh.cohort, '%Y-%m') AS cohort_month,
       CAST(datediff('month', coh.cohort, cm.m) AS BIGINT) AS age_months,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM cm JOIN coh USING (c)
GROUP BY 1, 2
"""


REGISTRATIONS.append(("retention_triangle_orders",
                      retention_triangle_orders,
                      RETENTION_TRIANGLE_ORACLE))


ATTR_POS_CAP = 16       # touches credited per conversion (width cap)
ATTR_EDGE_BP = 4000     # U-shape: 40% first, 40% last, 20% split mid


def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) conversion attribution — the
    multi-touch companion of ``attribution_last_touch``: every
    purchase credits the touches in its session window 40% to the
    FIRST touch, 40% to the LAST, 20% split evenly over the middle
    (integer basis points; the middle split's remainder goes to the
    touch nearest the conversion so credit always sums to 10000 per
    converted purchase). One touch gets everything; two split 50/50.

    The credited window is the LAST ``ATTR_POS_CAP`` touches before
    the purchase in the same 30-min session — the in-row pair-width
    cap discipline (an unbounded touch×purchase session join is the
    c² hazard), mirrored in the oracle. Positions come from ONE
    ROW_NUMBER over the joined (purchase, touch) rows ordered
    touch-desc; all credit arithmetic is integer.

    Scale: sessionize window (user-partitioned, the proven shape) +
    an equi-join on (user, sess) capped at ATTR_POS_CAP rows per
    purchase + a |touch types|-bounded aggregate.

    Output: ``(touch_type, credit_bp, n_touches)`` — total basis
    points and credited touch rows per type.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0))
    s = (marked.withColumn(
            "sess", F.sum("new_sess").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)))
         .localCheckpoint(eager=False))   # purchases + touches branches
    p = (s.where(F.col("event_type") == "purchase")
         .select("user_id", "sess", F.col("us").alias("p_us"),
                 F.col("event_id").alias("p_id")))
    t = (s.where(F.col("event_type") != "purchase")
         .select("user_id", "sess", F.col("us").alias("t_us"),
                 F.col("event_id").alias("t_id"), "event_type"))
    j = (p.join(t, ["user_id", "sess"])
         .where((F.col("t_us") < F.col("p_us"))
                | ((F.col("t_us") == F.col("p_us"))
                   & (F.col("t_id") < F.col("p_id")))))
    wr = (W.partitionBy("user_id", "sess", "p_us", "p_id")
          .orderBy(F.col("t_us").desc(), F.col("t_id").desc()))
    ranked = (j.withColumn("rk", F.row_number().over(wr))
              .where(F.col("rk") <= ATTR_POS_CAP))
    wn = W.partitionBy("user_id", "sess", "p_us", "p_id")
    sized = ranked.withColumn("n", F.count("*").over(wn))
    mid_pool = 10000 - 2 * ATTR_EDGE_BP
    # integer DIV (exact, both engines floor for positives); the n<=2
    # branches fire first so DIV's divisor is never zero on a taken
    # branch (and DIV by 0 is NULL-safe, not an ANSI error, anyway)
    mid_each = F.expr(f"{mid_pool} DIV (n - 2)")
    mid_rem = F.lit(mid_pool) - mid_each * (F.col("n") - 2)
    credit = (F.when(F.col("n") == 1, 10000)
               .when(F.col("n") == 2, 5000)
               .when(F.col("rk") == 1, ATTR_EDGE_BP)       # last touch
               .when(F.col("rk") == F.col("n"), ATTR_EDGE_BP)  # first
               .when(F.col("rk") == 2, mid_each + mid_rem)  # nearest mid
               .otherwise(mid_each))
    return (sized.withColumn("credit", credit)
            .groupBy(F.col("event_type").alias("touch_type"))
            .agg(F.sum("credit").cast("long").alias("credit_bp"),
                 F.count("*").cast("long").alias("n_touches")))


ATTR_POS_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
m AS (
  SELECT *, CASE WHEN us - LAG(us) OVER w IS NULL
                  OR us - LAG(us) OVER w > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
  FROM m
),
j AS (
  SELECT p.user_id, p.sess, p.us AS p_us, p.event_id AS p_id,
         t.us AS t_us, t.event_id AS t_id, t.event_type
  FROM s p JOIN s t
    ON p.user_id = t.user_id AND p.sess = t.sess
   AND (t.us < p.us OR (t.us = p.us AND t.event_id < p.event_id))
  WHERE p.event_type = 'purchase' AND t.event_type <> 'purchase'
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sess, p_us, p_id
                               ORDER BY t_us DESC, t_id DESC) AS rk
  FROM j
),
capped AS (SELECT * FROM ranked WHERE rk <= {ATTR_POS_CAP}),
sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY user_id, sess, p_us, p_id) AS n
  FROM capped
),
credited AS (
  SELECT event_type,
         CASE WHEN n = 1 THEN 10000
              WHEN n = 2 THEN 5000
              WHEN rk = 1 THEN {ATTR_EDGE_BP}
              WHEN rk = n THEN {ATTR_EDGE_BP}
              WHEN rk = 2 THEN CAST(({10000 - 2 * ATTR_EDGE_BP}) // (n - 2)
                   + ({10000 - 2 * ATTR_EDGE_BP})
                   - (({10000 - 2 * ATTR_EDGE_BP}) // (n - 2)) * (n - 2)
                   AS BIGINT)
              ELSE CAST(({10000 - 2 * ATTR_EDGE_BP}) // (n - 2) AS BIGINT)
         END AS credit
  FROM sized
)
SELECT event_type AS touch_type,
       CAST(SUM(credit) AS BIGINT) AS credit_bp,
       CAST(COUNT(*) AS BIGINT) AS n_touches
FROM credited GROUP BY 1
"""


REGISTRATIONS.append(("attribution_position_based",
                      attribution_position_based, ATTR_POS_ORACLE))


BDAY_ANCHOR = "1992-01-06"   # a Monday; every fixture date is after it
SLA_BDAYS = 60               # breach threshold (business days to ship)


def sla_business_days_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency in BUSINESS DAYS (Mon–Fri) with an SLA
    breach flag — the ops-SLA readout that calendar-day datediff gets
    wrong by up to 2/7. No calendar table and no per-day explode:
    business days are a CLOSED FORM off a fixed Monday anchor,
    f(d) = 5·(n DIV 7) + LEAST(n % 7, 5) with n = days(anchor → d),
    which counts weekdays in [anchor, d); the latency is
    f(ship) − f(order) = weekdays in [order, ship). Pure integer
    arithmetic — both engines agree exactly.

    Scale: one map-side-combined aggregate over the
    lineitem⋈orders join (the q4 shape — orderkey equi-join);
    output is ≤ max-latency rows.

    Output: ``(bdays, n_lines, breach)``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return sla_closed_form(sla_bday_cells(li, o))


def _bdays_since_anchor(col) -> F.Column:
    """Weekdays in [BDAY_ANCHOR, col) — the Monday-anchor closed
    form; see sla_business_days_lineitem."""
    n = F.datediff(col, F.lit(BDAY_ANCHOR).cast("date"))
    return (n - n % 7) / 7 * 5 + F.least(n % 7, F.lit(5))


def sla_bday_cells(li: DataFrame, orders: DataFrame) -> DataFrame:
    """(bdays, n_lines) — the MERGEABLE sufficient statistic (one
    count aggregate after the orderkey join), shared by the batch op
    and ``streaming.windows.stream_sla_business_days`` (which joins
    the lineitem STREAM to the static orders dim)."""
    j = (li.select("l_orderkey", F.to_date("l_shipdate").alias("ship"))
         .join(orders.select(F.col("o_orderkey").alias("l_orderkey"),
                             F.to_date("o_orderdate").alias("odate")),
               "l_orderkey"))
    bdays = (_bdays_since_anchor(F.col("ship"))
             - _bdays_since_anchor(F.col("odate"))).cast("long")
    return (j.select(bdays.alias("bdays"))
            .groupBy("bdays")
            .agg(F.count("*").cast("long").alias("n_lines")))


def sla_closed_form(cells: DataFrame) -> DataFrame:
    return cells.withColumn("breach", F.col("bdays") > SLA_BDAYS)


SLA_BDAYS_ORACLE = f"""
WITH j AS (
  SELECT (5 * (datediff('day', DATE '{BDAY_ANCHOR}',
                        CAST(l_shipdate AS DATE)) // 7)
          + LEAST(datediff('day', DATE '{BDAY_ANCHOR}',
                           CAST(l_shipdate AS DATE)) % 7, 5))
         -
         (5 * (datediff('day', DATE '{BDAY_ANCHOR}',
                        CAST(o_orderdate AS DATE)) // 7)
          + LEAST(datediff('day', DATE '{BDAY_ANCHOR}',
                           CAST(o_orderdate AS DATE)) % 7, 5))
           AS bdays
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT CAST(bdays AS BIGINT) AS bdays,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       bdays > {SLA_BDAYS} AS breach
FROM j GROUP BY bdays
"""


REGISTRATIONS.append(("sla_business_days_lineitem",
                      sla_business_days_lineitem, SLA_BDAYS_ORACLE))


def abc_xyz_matrix_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABC-XYZ inventory matrix — the composition the two class
    axes exist for: revenue importance (A/B/C) × demand variability
    (X/Y/Z) per part, rolled up to the 9-cell planning matrix
    (AX = lean replenishment, CZ = review for discontinuation).
    Evaluation-as-operator like ``recsys_eval_hitrate``: the op JOINS
    the two registered queries and its oracle NESTS their oracle
    texts verbatim as CTEs, so the matrix can never drift from the
    class definitions it summarizes. Counts and quantities are
    integers (revenue deliberately excluded: a cross-part float sum
    is order-sensitive).

    Scale: both inputs are part-grain (corpus/1000-scale); the join
    and rollup are dims-sized.

    Output: ``(abc_class, xyz, n_parts, total_qty)``.
    """
    # round 13: the two class inputs come from the session memo (the
    # item_cf_cached evaluator-composition discipline) — the
    # registered abc_pareto/xyz queries always compute fresh; the
    # matrix reuses the materialized part-grain tables.
    abc = _abc_xyz_cached(spark, sf_dir, "abc").select(
        F.col("l_partkey").alias("part"), "abc_class")
    xyz = _abc_xyz_cached(spark, sf_dir, "xyz").select(
        "part", "xyz", "total_qty")
    return (abc.join(xyz, "part")
            .groupBy("abc_class", "xyz")
            .agg(F.count("*").cast("long").alias("n_parts"),
                 F.sum("total_qty").cast("long").alias("total_qty")))


# Session memo of the part-grain ABC / XYZ class tables consumed by
# the matrix composition (the _ITEM_CF_MEMO justification verbatim:
# derived shared datasets, corpus/1000-sized, keyed by
# (applicationId, lineitem plan hash, which)).
_ABC_XYZ_MEMO: dict[tuple[str, int, str], DataFrame] = {}


def _abc_xyz_cached(spark: SparkSession, sf_dir: str,
                    which: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    app_id = spark.sparkContext.applicationId
    graph.evict_stale_memo(_ABC_XYZ_MEMO, app_id)
    key = (app_id, li.semanticHash(), which)
    df = _ABC_XYZ_MEMO.get(key)
    if df is None:
        base = (abc_pareto_parts if which == "abc"
                else xyz_variability_parts)(spark, sf_dir)
        df = base.localCheckpoint(eager=True)
        _ABC_XYZ_MEMO[key] = df
    return df


def _abc_xyz_oracle() -> str:
    return f"""
WITH abc AS ({ABC_PARETO_ORACLE}),
xyz AS ({XYZ_ORACLE})
SELECT abc.abc_class, xyz.xyz,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(xyz.total_qty) AS BIGINT) AS total_qty
FROM abc JOIN xyz ON abc.l_partkey = xyz.part
GROUP BY 1, 2
"""


DUP_PAY_WINDOW_DAYS = 28   # duplicate-payment screen lookback
DUP_PAY_BAND_CENTS = 100_000   # same $1000 amount band = "similar amount"
DUP_PAY_CAP = 8                # pairs kept per (cust, band) block


def dup_payment_screen_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen — the classic AP-audit test: pairs of
    orders by the SAME customer for a SIMILAR amount (same
    ``DUP_PAY_BAND_CENTS`` band — exact-equality screens miss keyed-in
    cents typos, the audit literature's standard reason to band)
    within ``DUP_PAY_WINDOW_DAYS`` days: double-submitted invoices,
    double-shipped orders. Blocked on the exact (customer, band) key,
    with per-block pair width capped at ``DUP_PAY_CAP`` earliest
    partners per order (cap mirrored in the oracle; a degenerate
    band like 0 would otherwise go quadratic).

    Scale: one shuffle on (cust, band); in-block pair join bounded by
    cap; output ≤ cap·|suspect orders|.

    Output: ``(o_custkey, band, key_a, key_b, gap_days)``.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(f"CAST(round(o_totalprice * 100) AS BIGINT) "
               f"DIV {DUP_PAY_BAND_CENTS}").alias("band"),
        F.col("o_orderkey").alias("key"),
        F.to_date("o_orderdate").alias("d"))
    a = o.select("o_custkey", "band", F.col("key").alias("key_a"),
                 F.col("d").alias("da"))
    b = o.select("o_custkey", "band", F.col("key").alias("key_b"),
                 F.col("d").alias("db"))
    j = (a.join(b, ["o_custkey", "band"])
         .where((F.col("key_a") < F.col("key_b"))
                & (F.abs(F.datediff(F.col("db"), F.col("da")))
                   <= DUP_PAY_WINDOW_DAYS)))
    w = W.partitionBy("o_custkey", "band", "key_a") \
         .orderBy("key_b")
    return (j.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= DUP_PAY_CAP)
            .select("o_custkey", "band", "key_a", "key_b",
                    F.abs(F.datediff(F.col("db"), F.col("da")))
                    .cast("long").alias("gap_days")))


DUP_PAY_ORACLE = f"""
WITH o AS (
  SELECT o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT)
           // {DUP_PAY_BAND_CENTS} AS band,
         o_orderkey AS key, CAST(o_orderdate AS DATE) AS d
  FROM orders
),
j AS (
  SELECT a.o_custkey, a.band, a.key AS key_a, b.key AS key_b,
         ABS(datediff('day', a.d, b.d)) AS gap_days
  FROM o a JOIN o b
    ON a.o_custkey = b.o_custkey AND a.band = b.band
   AND a.key < b.key
  WHERE ABS(datediff('day', a.d, b.d)) <= {DUP_PAY_WINDOW_DAYS}
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, band, key_a
                               ORDER BY key_b) AS rk
  FROM j
)
SELECT o_custkey, band, key_a, key_b, CAST(gap_days AS BIGINT) AS gap_days
FROM r WHERE rk <= {DUP_PAY_CAP}
"""


def mase_baseline_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast baseline error — the MASE denominator:
    per event type, the mean absolute error of the lag-7 naive
    forecast x̂_t = x_{{t−7}} over the zero-filled daily cents series.
    Any model whose MAE beats this number has skill; one that doesn't
    is worse than "same as last week" (the honest yardstick
    forecast_backtest_events' in-sample trend needs). Exactness: the
    daily grid is integers (implicit-zero fill via the sequence
    explode), |x_t − x_{{t−7}}| sums exactly, ONE int÷int division.

    Scale: events collapse to day grain map-side first; the lag join
    and rollup run on the dims-sized grid.

    Output: ``(event_type, n_terms, sae_cents, mase_denom)``.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(datediff(to_date(ts), DATE'1970-01-01') AS LONG)")
        .alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("vc"))
    daily = ev.groupBy("event_type", "d").agg(F.sum("vc").alias("x"))
    span = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    grid = (daily.select("event_type").distinct()
            .crossJoin(F.broadcast(span))
            .select("event_type",
                    F.explode(F.sequence(F.col("lo"), F.col("hi")))
                    .alias("d")))
    full = (grid.join(daily, ["event_type", "d"], "left")
            .select("event_type", "d",
                    F.coalesce("x", F.lit(0)).alias("x")))
    lag = full.select("event_type", (F.col("d") + 7).alias("d"),
                      F.col("x").alias("x7"))
    t = full.join(lag, ["event_type", "d"])   # inner: first 7 days drop
    return (t.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_terms"),
                 F.sum(F.abs(F.col("x") - F.col("x7"))).cast("long")
                 .alias("sae_cents"))
            .withColumn("mase_denom",
                        F.col("sae_cents").cast("double")
                        / F.col("n_terms").cast("double")))


MASE_ORACLE = """
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
),
daily AS (SELECT event_type, d, CAST(SUM(vc) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2),
span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
grid AS (
  SELECT t.event_type, g.d
  FROM (SELECT DISTINCT event_type FROM daily) t,
       span, UNNEST(range(span.lo, span.hi + 1)) AS g(d)
),
full_ AS (
  SELECT grid.event_type, grid.d, COALESCE(daily.x, 0) AS x
  FROM grid LEFT JOIN daily USING (event_type, d)
),
t AS (
  SELECT a.event_type, a.x, b.x AS x7
  FROM full_ a JOIN full_ b
    ON a.event_type = b.event_type AND a.d = b.d + 7
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(ABS(x - x7)) AS BIGINT) AS sae_cents,
       CAST(SUM(ABS(x - x7)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mase_denom
FROM t GROUP BY event_type
"""


REGISTRATIONS.append(("abc_xyz_matrix_parts", abc_xyz_matrix_parts,
                      _abc_xyz_oracle()))
REGISTRATIONS.append(("dup_payment_screen_orders",
                      dup_payment_screen_orders, DUP_PAY_ORACLE))
REGISTRATIONS.append(("mase_baseline_events", mase_baseline_events,
                      MASE_ORACLE))


def revenue_gini_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Gini coefficient of revenue concentration across parts —
    the single-number companion of ``abc_pareto_parts`` (Pareto says
    "which parts are the head"; Gini says HOW concentrated the whole
    curve is, the number a catalog-health dashboard trends
    week-over-week). Formula: with per-part revenues x₁ ≤ … ≤ xₙ in
    exact micro-units and ascending ranks i,
    G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ), reported as integer ppm.

    Exactness: revenue sums in DECIMAL(18,6) (the ABC convention),
    ×10⁶ to integer-valued DECIMAL(38,0); rank sums and the final
    ratio stay in DECIMAL(38) on the Spark side / HUGEINT in DuckDB
    (probed: HUGEINT // HUGEINT is exact), so the ppm is a true
    floor division at ANY scale — no 2⁶³ ceiling anywhere.

    Scale: per-part aggregate with map-side combine, ascending ranks
    via the ``scalable_rank`` bucket decomposition (window over
    bucket COUNTS, never a single global data window), one 1-row
    reduction.

    Output: ``(n_parts, rev_total_u, gini_ppm)``.
    """
    from mapreduce_rust_spark.operators.ranking import scalable_rank
    from mapreduce_rust_spark.operators.relational import DEC_MONEY
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (li.groupBy("l_partkey")
                .agg(F.sum((F.col("l_extendedprice")
                            * (1 - F.col("l_discount"))).cast(DEC_MONEY))
                     .alias("rev")))
    u = (per_part.select(
            "l_partkey",
            F.expr("CAST(rev * 1000000 AS DECIMAL(38,0))").alias("x"))
         .localCheckpoint(eager=False))   # scalable_rank consumes twice
    # dollar-granularity bucket: monotone in x (double cast + floor
    # are order-preserving), so scalable_rank's precondition holds
    bucket = F.floor(F.col("x").cast("double") / 1e6).cast("long")
    ranked = scalable_rank(u, bucket, [F.col("x"), F.col("l_partkey")],
                           rank_col="i")
    a = ranked.agg(F.count("*").alias("n"),
                   F.sum("x").alias("sx"),
                   F.sum(F.col("i") * F.col("x")).alias("six"))
    return a.select(
        F.col("n").cast("long").alias("n_parts"),
        F.col("sx").cast("long").alias("rev_total_u"),
        F.expr("CAST((2 * six - (n + 1) * sx) * 1000000 DIV (n * sx) "
               "AS BIGINT)").alias("gini_ppm"))


REVENUE_GINI_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS rev
  FROM lineitem GROUP BY l_partkey
),
u AS (SELECT l_partkey, CAST(rev * 1000000 AS HUGEINT) AS x
      FROM per_part),
r AS (SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x, l_partkey)
                     AS HUGEINT) AS i FROM u),
a AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(i * x) AS six FROM r)
SELECT CAST(n AS BIGINT) AS n_parts,
       CAST(sx AS BIGINT) AS rev_total_u,
       CAST((2 * six - (n + 1) * sx) * 1000000 // (n * sx) AS BIGINT)
         AS gini_ppm
FROM a
"""


REGISTRATIONS.append(("revenue_gini_parts", revenue_gini_parts,
                      REVENUE_GINI_ORACLE))


SHIP_PCTS = (50, 90, 99)   # reported exact percentiles


def ship_delay_cells(li: DataFrame, orders: DataFrame) -> DataFrame:
    """(priority, days, c) — the MERGEABLE sufficient statistic for
    the per-priority delay percentiles (one count aggregate after the
    orderkey join; the sla_bday_cells shape with a group column).
    Shared by the batch op and ``streaming.windows.
    stream_ship_delay_percentiles``."""
    j = (li.select("l_orderkey", F.to_date("l_shipdate").alias("ship"))
         .join(orders.select(F.col("o_orderkey").alias("l_orderkey"),
                             "o_orderpriority",
                             F.to_date("o_orderdate").alias("odate")),
               "l_orderkey"))
    return (j.select("o_orderpriority",
                     F.datediff("ship", "odate").cast("long").alias("days"))
            .groupBy("o_orderpriority", "days")
            .agg(F.count("*").cast("long").alias("c")))


def ship_delay_closed_form(cells: DataFrame) -> DataFrame:
    """EXACT per-group percentiles from the (group, value, count)
    cells: P_p = the smallest value whose cumulative count reaches
    ceil(p·n/100) = (p·n + 99) DIV 100 — the nearest-rank definition,
    pure integer selection on both engines."""
    from pyspark.sql import Window as W
    wcum = (W.partitionBy("o_orderpriority").orderBy("days")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    t = cells.withColumn("cum", F.sum("c").over(wcum))
    n = cells.groupBy("o_orderpriority").agg(F.sum("c").alias("n"))
    j = t.join(F.broadcast(n), "o_orderpriority")
    aggs = [F.max("n").alias("n_lines")]
    for p in SHIP_PCTS:
        k = F.expr(f"({p} * n + 99) DIV 100")
        aggs.append(F.min(F.when(F.col("cum") >= k, F.col("days")))
                     .alias(f"p{p}_days"))
    return (j.groupBy("o_orderpriority").agg(*aggs)
             .select("o_orderpriority", F.col("n_lines").cast("long"),
                     *[F.col(f"p{p}_days") for p in SHIP_PCTS]))


def ship_delay_percentiles_priority(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """EXACT order→ship delay percentiles per order priority — the
    fulfillment-ops companion of ``sla_business_days_lineitem`` (the
    SLA op thresholds; this reports the whole latency profile a
    capacity planner reads: P50 steady-state, P90 commitment, P99
    tail). Nearest-rank percentiles, never an approximate sketch.

    Scale shape: the corpus collapses to (priority, days) counts in
    one map-side-combined aggregate after the orderkey equi-join —
    the value grid is bounded (≤ max-latency days × 5 priorities),
    so the cumsum window runs over a dims table, never data. The
    same cells drive the streaming twin.

    Output: ``(o_orderpriority, n_lines, p50_days, p90_days,
    p99_days)``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return ship_delay_closed_form(ship_delay_cells(li, o))


SHIP_DELAY_ORACLE = f"""
WITH cells AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) AS BIGINT) AS days,
         COUNT(*) AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
t AS (
  SELECT o_orderpriority, days, c,
         SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY days) AS cum
  FROM cells
),
n AS (SELECT o_orderpriority, CAST(SUM(c) AS BIGINT) AS n FROM cells
      GROUP BY 1)
SELECT t.o_orderpriority,
       CAST(MAX(n.n) AS BIGINT) AS n_lines,
       {", ".join(f"MIN(CASE WHEN cum >= ({p} * n + 99) // 100 "
                  f"THEN days END) AS p{p}_days" for p in SHIP_PCTS)}
FROM t JOIN n ON t.o_orderpriority = n.o_orderpriority
GROUP BY t.o_orderpriority
"""


REGISTRATIONS.append(("ship_delay_percentiles_priority",
                      ship_delay_percentiles_priority, SHIP_DELAY_ORACLE))


def hhi_revenue_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Herfindahl–Hirschman concentration index of customer
    revenue within each nation — the antitrust-standard "is this
    market a few whales or many minnows" number, and the
    within-group companion of ``revenue_gini_parts`` (Gini trends the
    whole curve; HHI is the regulator's Σ share² with hard policy
    thresholds at 0.15/0.25). For per-customer revenues xᵢ in a
    nation, HHI = Σ xᵢ² / (Σ xᵢ)², reported as integer ppm — no
    per-customer share is ever rounded (the Σ-of-rounded-shares
    error the cleared form avoids entirely).

    Exactness: revenue sums in DECIMAL(18,6) (the ABC convention) ×10⁶
    to integer DECIMAL(38,0); squares and both Σ stay in DECIMAL(38)
    / HUGEINT (xᵢ² overflows BIGINT at real scale — the
    revenue_gini discipline), final ppm one exact floor division.

    Scale: one customer-grain aggregate with map-side combine, one
    nation-grain reduction; the nation dimension joins broadcast.

    Output: ``(n_name, n_customers, rev_total_u, hhi_ppm)``.
    """
    from mapreduce_rust_spark.operators.relational import DEC_MONEY
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (li.join(orders, li.l_orderkey == orders.o_orderkey)
           .groupBy("o_custkey")
           .agg(F.sum((F.col("l_extendedprice")
                       * (1 - F.col("l_discount"))).cast(DEC_MONEY))
                .alias("rev")))
    per_cust = rev.select(
        "o_custkey",
        F.expr("CAST(rev * 1000000 AS DECIMAL(38,0))").alias("x"))
    by_nation = (per_cust
                 .join(cust, per_cust.o_custkey == cust.c_custkey)
                 .join(F.broadcast(nation),
                       cust.c_nationkey == nation.n_nationkey)
                 .groupBy("n_name")
                 .agg(F.count("*").cast("long").alias("n_customers"),
                      F.sum("x").alias("sx"),
                      F.sum(F.expr("x * x")).alias("sxx")))
    return by_nation.select(
        "n_name", "n_customers",
        F.col("sx").cast("long").alias("rev_total_u"),
        F.expr("CAST(sxx * 1000000 DIV (sx * sx) AS BIGINT)")
         .alias("hhi_ppm"))


HHI_ORACLE = """
WITH rev AS (
  SELECT o.o_custkey,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(18,6))) * 1000000
              AS HUGEINT) AS x
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey
),
by_nation AS (
  SELECT n.n_name, COUNT(*) AS n_customers,
         SUM(r.x) AS sx, SUM(r.x * r.x) AS sxx
  FROM rev r
  JOIN customer c ON r.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT n_name, CAST(n_customers AS BIGINT) AS n_customers,
       CAST(sx AS BIGINT) AS rev_total_u,
       CAST(sxx * 1000000 // (sx * sx) AS BIGINT) AS hhi_ppm
FROM by_nation
"""


REGISTRATIONS.append(("hhi_revenue_nations", hhi_revenue_nations,
                      HHI_ORACLE))


# --- Palma quantile-share ratio (round 10) ---------------------------------


def palma_ratio_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio of customer-revenue inequality within each nation
    — top-10% revenue share over bottom-40% share (Palma 2011;
    Cobham & Sumner's inequality-reporting standard next to Gini):
    where ``hhi_revenue_nations`` squares shares and
    ``revenue_gini_parts`` trends the whole curve, the Palma reads
    the two tails a revenue planner actually argues about.

    Exactness: revenues in exact micro-units (the HHI convention);
    the 10%/40% boundaries are nearest-rank COUNTS (k₁₀ = n DIV 10,
    k₄₀ = 4n DIV 10) over ascending exact ranks; tail sums stay
    DECIMAL(38)/HUGEINT and the ratio is one floor division on the
    ppm grid, NULL when the bottom-40 set is empty (n < 3) —
    mirrored in the oracle.

    Scale: per-customer aggregate with map-side combine; ascending
    ranks via the ``scalable_rank`` bucket decomposition PARTITIONED
    BY NATION (window over bucket counts, never a per-nation data
    window — the revenue_gini discipline); one broadcast of the
    25-row nation-count table; one final nation-grain aggregate.

    Output: ``(n_name, n_customers, bot40_rev_u, top10_rev_u,
    palma_ppm)``.
    """
    from mapreduce_rust_spark.operators.ranking import scalable_rank
    from mapreduce_rust_spark.operators.relational import DEC_MONEY
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (li.join(orders, li.l_orderkey == orders.o_orderkey)
           .groupBy("o_custkey")
           .agg(F.sum((F.col("l_extendedprice")
                       * (1 - F.col("l_discount"))).cast(DEC_MONEY))
                .alias("rev")))
    u = (rev.join(cust, rev.o_custkey == cust.c_custkey)
         .join(F.broadcast(nation),
               cust.c_nationkey == nation.n_nationkey)
         .select("n_name", "o_custkey",
                 F.expr("CAST(rev * 1000000 AS DECIMAL(38,0))").alias("x"))
         .localCheckpoint(eager=False))    # scalable_rank consumes twice
    bucket = F.floor(F.col("x").cast("double") / 1e6).cast("long")
    ranked = scalable_rank(u, bucket, [F.col("x"), F.col("o_custkey")],
                           part_cols=["n_name"], rank_col="i")
    n = u.groupBy("n_name").agg(F.count("*").cast("long").alias("n"))
    a = (ranked.join(F.broadcast(n), "n_name")
         .groupBy("n_name")
         .agg(F.max("n").alias("n_customers"),
              F.sum(F.when(F.col("i") <= F.expr("(4 * n) DIV 10"),
                           F.col("x")).otherwise(F.lit(0)))
               .alias("bot"),
              F.sum(F.when(F.col("i") > F.expr("n - n DIV 10"),
                           F.col("x")).otherwise(F.lit(0)))
               .alias("top")))
    return a.select(
        "n_name", "n_customers",
        F.col("bot").cast("long").alias("bot40_rev_u"),
        F.col("top").cast("long").alias("top10_rev_u"),
        F.expr("CASE WHEN bot > 0 THEN "
               "CAST(top * 1000000 DIV bot AS BIGINT) END")
         .alias("palma_ppm"))


PALMA_ORACLE = """
WITH rev AS (
  SELECT o.o_custkey,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(18,6))) * 1000000
              AS HUGEINT) AS x
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey
),
j AS (
  SELECT n.n_name, rev.o_custkey, x
  FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
),
r AS (
  SELECT n_name, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY x, o_custkey)
              AS HUGEINT) AS i,
         CAST(COUNT(*) OVER (PARTITION BY n_name) AS HUGEINT) AS n
  FROM j
),
a AS (
  SELECT n_name, MAX(n) AS n,
         SUM(CASE WHEN i <= (4 * n) // 10 THEN x ELSE 0 END) AS bot,
         SUM(CASE WHEN i > n - n // 10 THEN x ELSE 0 END) AS top
  FROM r GROUP BY 1
)
SELECT n_name, CAST(n AS BIGINT) AS n_customers,
       CAST(bot AS BIGINT) AS bot40_rev_u,
       CAST(top AS BIGINT) AS top10_rev_u,
       CASE WHEN bot > 0
            THEN CAST(top * 1000000 // bot AS BIGINT) END AS palma_ppm
FROM a
"""


REGISTRATIONS.append(("palma_ratio_nations", palma_ratio_nations,
                      PALMA_ORACLE))


# --- Lorenz curve decile points (round 11) ---------------------------------


def lorenz_curve_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer-revenue concentration within each
    nation, read at the ten decile points (Lorenz 1905): for
    d = 1..10, the revenue share of the bottom d·10% of customers —
    the FULL inequality curve behind the scalar tails
    (``palma_ratio_nations`` reads two points of this curve,
    ``hhi_revenue_nations`` a quadratic moment of it; an analyst
    plotting "how concentrated is revenue" wants the curve itself).

    Exactness: the Palma machinery verbatim — exact micro-unit
    revenues, nearest-rank decile boundaries k_d = (d·n) DIV 10 over
    the ``scalable_rank`` ascending order, DECIMAL(38)/HUGEINT cum
    sums, ppm shares via one floor division. Decile 10 always reads
    exactly 10⁶ ppm (k₁₀ = n), pinning the normalization.

    Scale: identical to palma — per-customer aggregate, partitioned
    bucket-decomposed ranks (never a per-nation data window), one
    broadcast of nation counts, one nation-grain aggregate fanned to
    ten conditional sums (plan-constant, no extra shuffle).

    Output: ``(n_name, decile, k_customers, cum_rev_u, share_ppm)``.
    """
    from mapreduce_rust_spark.operators.ranking import scalable_rank
    from mapreduce_rust_spark.operators.relational import DEC_MONEY
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (li.join(orders, li.l_orderkey == orders.o_orderkey)
           .groupBy("o_custkey")
           .agg(F.sum((F.col("l_extendedprice")
                       * (1 - F.col("l_discount"))).cast(DEC_MONEY))
                .alias("rev")))
    u = (rev.join(cust, rev.o_custkey == cust.c_custkey)
         .join(F.broadcast(nation),
               cust.c_nationkey == nation.n_nationkey)
         .select("n_name", "o_custkey",
                 F.expr("CAST(rev * 1000000 AS DECIMAL(38,0))").alias("x"))
         .localCheckpoint(eager=False))    # scalable_rank consumes twice
    bucket = F.floor(F.col("x").cast("double") / 1e6).cast("long")
    ranked = scalable_rank(u, bucket, [F.col("x"), F.col("o_custkey")],
                           part_cols=["n_name"], rank_col="i")
    n = u.groupBy("n_name").agg(F.count("*").cast("long").alias("n"))
    j = ranked.join(F.broadcast(n), "n_name")
    aggs = [F.max("n").alias("n")]
    for d in range(1, 11):
        aggs.append(
            F.sum(F.when(F.col("i") <= F.expr(f"({d} * n) DIV 10"),
                         F.col("x")).otherwise(F.lit(0)))
             .alias(f"cum{d}"))
    aggs.append(F.sum("x").alias("tot"))
    a = j.groupBy("n_name").agg(*aggs)
    stack = ", ".join(f"{d}L, cum{d}" for d in range(1, 11))
    return (a.selectExpr("n_name", "n", "tot",
                         f"stack(10, {stack}) AS (decile, cum)")
            .select("n_name", F.col("decile").cast("long").alias("decile"),
                    F.expr("CAST((decile * n) DIV 10 AS BIGINT)")
                     .alias("k_customers"),
                    F.col("cum").cast("long").alias("cum_rev_u"),
                    F.expr("CASE WHEN tot > 0 THEN "
                           "CAST(cum * 1000000 DIV tot AS BIGINT) END")
                     .alias("share_ppm")))


LORENZ_ORACLE = """
WITH rev AS (
  SELECT o.o_custkey,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(18,6))) * 1000000
              AS HUGEINT) AS x
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey
),
j AS (
  SELECT n.n_name, rev.o_custkey, x
  FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
),
r AS (
  SELECT n_name, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY n_name
                                 ORDER BY x, o_custkey)
              AS HUGEINT) AS i,
         CAST(COUNT(*) OVER (PARTITION BY n_name) AS HUGEINT) AS n,
         CAST(SUM(x) OVER (PARTITION BY n_name) AS HUGEINT) AS tot
  FROM j
),
d AS (SELECT UNNEST(generate_series(1, 10)) AS decile)
SELECT r.n_name, CAST(d.decile AS BIGINT) AS decile,
       CAST((d.decile * MAX(r.n)) // 10 AS BIGINT) AS k_customers,
       CAST(SUM(CASE WHEN r.i <= (d.decile * r.n) // 10
                     THEN r.x ELSE 0 END) AS BIGINT) AS cum_rev_u,
       CAST(CASE WHEN MAX(r.tot) > 0 THEN
         SUM(CASE WHEN r.i <= (d.decile * r.n) // 10
                  THEN r.x ELSE 0 END) * 1000000 // MAX(r.tot)
       END AS BIGINT) AS share_ppm
FROM r CROSS JOIN d
GROUP BY r.n_name, d.decile
"""


REGISTRATIONS.append(("lorenz_curve_nations", lorenz_curve_nations,
                      LORENZ_ORACLE))


# --- CR4 / CR8 supplier concentration ratios (round 11) --------------------


def cr_concentration_suppliers(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Four- and eight-firm concentration ratios of supplier revenue
    within each nation (the industrial-organization standard CR_k —
    the antitrust screen read BEFORE the HHI): the revenue share of
    the top 4 / top 8 suppliers, in exact ppm.

    Exactness: exact micro-unit revenues; "top k" selected as the
    LAST k ascending ranks (i > n − k over the scalable_rank order
    with supplier-key tiebreak — the palma top-tail idiom), so no
    descending window is needed; shares are one floor division each.

    Scale: per-supplier aggregate with map-side combine; partitioned
    bucket-decomposed ranks; one broadcast nation-count join; one
    nation-grain readout. Never a per-nation data window.

    Output: ``(n_name, n_suppliers, top4_rev_u, top8_rev_u, cr4_ppm,
    cr8_ppm)``.
    """
    from mapreduce_rust_spark.operators.ranking import scalable_rank
    from mapreduce_rust_spark.operators.relational import DEC_MONEY
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (li.groupBy("l_suppkey")
           .agg(F.sum((F.col("l_extendedprice")
                       * (1 - F.col("l_discount"))).cast(DEC_MONEY))
                .alias("rev")))
    u = (rev.join(supp, rev.l_suppkey == supp.s_suppkey)
         .join(F.broadcast(nation),
               supp.s_nationkey == nation.n_nationkey)
         .select("n_name", "l_suppkey",
                 F.expr("CAST(rev * 1000000 AS DECIMAL(38,0))").alias("x"))
         .localCheckpoint(eager=False))
    bucket = F.floor(F.col("x").cast("double") / 1e6).cast("long")
    ranked = scalable_rank(u, bucket, [F.col("x"), F.col("l_suppkey")],
                           part_cols=["n_name"], rank_col="i")
    n = u.groupBy("n_name").agg(F.count("*").cast("long").alias("n"))
    a = (ranked.join(F.broadcast(n), "n_name")
         .groupBy("n_name")
         .agg(F.max("n").alias("n_suppliers"),
              F.sum(F.when(F.col("i") > F.col("n") - 4, F.col("x"))
                     .otherwise(F.lit(0))).alias("top4"),
              F.sum(F.when(F.col("i") > F.col("n") - 8, F.col("x"))
                     .otherwise(F.lit(0))).alias("top8"),
              F.sum("x").alias("tot")))
    return a.select(
        "n_name", "n_suppliers",
        F.col("top4").cast("long").alias("top4_rev_u"),
        F.col("top8").cast("long").alias("top8_rev_u"),
        F.expr("CASE WHEN tot > 0 THEN "
               "CAST(top4 * 1000000 DIV tot AS BIGINT) END")
         .alias("cr4_ppm"),
        F.expr("CASE WHEN tot > 0 THEN "
               "CAST(top8 * 1000000 DIV tot AS BIGINT) END")
         .alias("cr8_ppm"))


CR_CONC_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) * 1000000
              AS HUGEINT) AS x
  FROM lineitem GROUP BY l_suppkey
),
j AS (
  SELECT n.n_name, rev.l_suppkey, x
  FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
),
r AS (
  SELECT n_name, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY n_name
                                 ORDER BY x, l_suppkey)
              AS HUGEINT) AS i,
         CAST(COUNT(*) OVER (PARTITION BY n_name) AS HUGEINT) AS n
  FROM j
)
SELECT n_name, CAST(MAX(n) AS BIGINT) AS n_suppliers,
       CAST(SUM(CASE WHEN i > n - 4 THEN x ELSE 0 END) AS BIGINT)
         AS top4_rev_u,
       CAST(SUM(CASE WHEN i > n - 8 THEN x ELSE 0 END) AS BIGINT)
         AS top8_rev_u,
       CAST(CASE WHEN SUM(x) > 0 THEN
         SUM(CASE WHEN i > n - 4 THEN x ELSE 0 END) * 1000000 // SUM(x)
       END AS BIGINT) AS cr4_ppm,
       CAST(CASE WHEN SUM(x) > 0 THEN
         SUM(CASE WHEN i > n - 8 THEN x ELSE 0 END) * 1000000 // SUM(x)
       END AS BIGINT) AS cr8_ppm
FROM r GROUP BY n_name
"""


REGISTRATIONS.append(("cr_concentration_suppliers",
                      cr_concentration_suppliers, CR_CONC_ORACLE))


# --- Gini mean difference (round 11) ---------------------------------------


def gini_mean_difference_orders(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Gini mean difference of order values (the GMD — Gini 1912's
    original dispersion measure): the mean |x_i − x_j| over all
    C(n,2) order pairs, plus its mean-relative form (= 2·Gini
    coefficient). Unlike the variance it is FIRST-order in the data,
    so heavy tails don't square their way into dominance — the
    dispersion companion of ``mad_outlier_orders``' location
    robustness.

    Exactness: on the cents value-count grid, Σ|diff| has the exact
    sorted-cumsum closed form Σ_v c_v·(v·m_<v − s_<v) (each pair
    counted once, larger minus smaller), carried in DECIMAL(38)/
    HUGEINT; the readouts are truncating divisions (gmd in cents,
    rel ppm = GMD·n·10⁶ DIV (C(n,2)·mean-sum algebra)). int64
    ceiling: Σ|diff| ~ n²·spread/2 leaves BIGINT near ~10⁹ orders —
    the sum stays DECIMAL(38) internally and only the bounded
    readouts are BIGINT.

    Scale: one aggregate to the cents grid, one dims-sized cumsum
    (the mannwhitney window discipline), one 1-row readout.

    Output: ``(n, gmd_cents, rel_gmd_ppm)``.
    """
    orders = load_table(spark, sf_dir, "orders")
    return gmd_closed_form(gmd_cells(orders))


def gmd_cells(orders: DataFrame) -> DataFrame:
    """Cents value counts of order totals — the MERGEABLE sufficient
    statistic (range-bounded grid state), shared by the batch op and
    ``streaming.windows.stream_gmd``."""
    return (orders.select(F.round(F.col("o_totalprice") * 100)
                          .cast("long").alias("vc"))
            .groupBy("vc").agg(F.count("*").cast("long").alias("c")))


def gmd_closed_form(cnt: DataFrame) -> DataFrame:
    """Sorted-cumsum pairwise |diff| algebra from the (vc, c) grid —
    shared by batch and streaming twin."""
    t = (cnt.withColumn("m", F.sum("c").over(W.orderBy("vc")) - F.col("c"))
            .withColumn("s", F.sum(F.col("c").cast("decimal(38,0)")
                                   * F.col("vc")).over(W.orderBy("vc"))
                             - F.col("c").cast("decimal(38,0)")
                             * F.col("vc")))
    agg = t.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("vc"))
         .cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("c").cast("decimal(38,0)")
              * (F.col("vc") * F.col("m") - F.col("s")))
         .cast("decimal(38,0)").alias("sabs"))
    return agg.select(
        "n",
        F.expr("CAST(CASE WHEN n > 1 THEN"
               " sabs DIV (CAST(n AS DECIMAL(38,0)) * (n - 1) DIV 2)"
               " END AS BIGINT)").alias("gmd_cents"),
        F.expr("CAST(CASE WHEN n > 1 AND sx > 0 THEN"
               " sabs * n * 1000000"
               " DIV ((CAST(n AS DECIMAL(38,0)) * (n - 1) DIV 2) * sx)"
               " END AS BIGINT)").alias("rel_gmd_ppm"))


GMD_ORACLE = """
WITH cnt AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS vc,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
t AS (
  SELECT vc, c,
         SUM(c) OVER (ORDER BY vc) - c AS m,
         SUM(CAST(c AS HUGEINT) * vc) OVER (ORDER BY vc)
           - CAST(c AS HUGEINT) * vc AS s
  FROM cnt
),
a AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CAST(c AS HUGEINT) * vc) AS HUGEINT) AS sx,
         CAST(SUM(CAST(c AS HUGEINT) * (vc * m - s)) AS HUGEINT) AS sabs
  FROM t
)
SELECT n,
       CAST(CASE WHEN n > 1 THEN
         sabs // (CAST(n AS HUGEINT) * (n - 1) // 2)
       END AS BIGINT) AS gmd_cents,
       CAST(CASE WHEN n > 1 AND sx > 0 THEN
         sabs * n * 1000000
         // ((CAST(n AS HUGEINT) * (n - 1) // 2) * sx)
       END AS BIGINT) AS rel_gmd_ppm
FROM a
"""


REGISTRATIONS.append(("gini_mean_difference_orders",
                      gini_mean_difference_orders, GMD_ORACLE))
