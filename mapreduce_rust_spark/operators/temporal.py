"""Temporal join operators Spark lacks natively (SURVEY.md §2b joins
row: 'as-of/range need window or custom logic').

``asof_last_error`` — the canonical as-of join, composed from
built-ins instead of a Pandas ``merge_asof`` (option (a) of the
custom-operator ladder): union-free single-pass window. For each
event, the most recent strictly-earlier 'error' event of the same
user. One shuffle on the partition key, sorted within partitions —
exactly the plan a dedicated as-of operator would produce, and it
scales as far as the window partition fits (salt the key if one user
dominates).

Contract: STRICT as-of — the matched error satisfies
``er.ts < e.ts``; same-timestamp errors are never matched. Enforced
with a RANGE window over epoch-micros ending at -1 µs, so the frame
cannot contain same-ts rows regardless of data uniqueness (the
row-frame form silently included same-ts errors with smaller
event_id whenever timestamps tied). Among earlier errors tying on
the max ts, the emitted value is that shared ts — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_rust_spark.tables import load_table


def asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # RANGE frame on epoch-micros ending at -1: strictly-earlier rows
    # only, matching the ASOF oracle's e.ts > er.ts on any data.
    w = (W.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")))
          .rangeBetween(W.unboundedPreceding, -1))
    err_ts = F.when(F.col("event_type") == "error", F.col("ts"))
    return (ev.withColumn("last_error_ts", F.last(err_ts, ignorenulls=True).over(w))
              .select("event_id", "user_id",
                      F.col("ts").cast("long").alias("ts_epoch"),
                      F.col("last_error_ts").cast("long").alias("last_error_epoch")))


ASOF_ORACLE = """
SELECT e.event_id, e.user_id,
       CAST(FLOOR(epoch(e.ts)) AS BIGINT) AS ts_epoch,
       CAST(FLOOR(epoch(er.ts)) AS BIGINT) AS last_error_epoch
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') er
  ON e.user_id = er.user_id AND e.ts > er.ts
"""


def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — for each event, the earliest strictly-
    later 'purchase' of the same user (lead-to-conversion lookup, the
    mirror of ``asof_last_error``). Same single-shuffle window plan;
    the RANGE frame starts at +1 µs so same-timestamp purchases never
    match, independent of data uniqueness."""
    ev = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")))
          .rangeBetween(1, W.unboundedFollowing))
    buy_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    return (ev.withColumn("next_buy_ts",
                          F.first(buy_ts, ignorenulls=True).over(w))
              .select("event_id", "user_id",
                      F.col("ts").cast("long").alias("ts_epoch"),
                      F.col("next_buy_ts").cast("long")
                       .alias("next_purchase_epoch")))


ASOF_FWD_ORACLE = """
SELECT event_id, user_id,
       CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_epoch,
       CAST(FLOOR(epoch(
         FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END
                     IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
       )) AS BIGINT) AS next_purchase_epoch
FROM events
"""


def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type functions: parse props into map<string,bigint>, read
    through map_keys/element_at (SURVEY.md §2b 'map functions')."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    # try_element_at: NULL (not an ANSI error) when the key is absent,
    # mirroring json_extract_string's NULL
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.try_element_at(m, F.lit("k")).alias("k_value"))


MAP_FUNCS_ORACLE = """
SELECT event_id,
       CAST(LEN(json_keys(props)) AS BIGINT) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
"""


def interval_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval (range) join: purchases attributed to clicks by
    the same user within the following 30 minutes. The equi key
    (user_id) carries the shuffle; the time bound is a residual
    predicate — the batch twin of the stream-stream interval join
    (tested in streaming). Attribution pairs per user."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("buy_ts"))
    return (clicks.join(buys, "user_id")
            .filter((F.col("buy_ts") >= F.col("click_ts")) &
                    (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")))
            .select("user_id", "click_id", "purchase_id"))


INTERVAL_JOIN_ORACLE = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
"""


def range_bin_join(left: DataFrame, lo_col: str, hi_col: str,
                   right: DataFrame, point_col: str,
                   bin_width_s: int) -> DataFrame:
    """PURE range join (no equi key at all): pair every ``left`` row
    whose ``[lo, hi]`` interval contains ``right``'s ``point``.
    Spark would plan the raw theta join as BroadcastNestedLoop or
    CartesianProduct — the shapes that die at scale. The bin trick
    makes it an equi join: quantize time into ``bin_width_s`` buckets,
    explode each interval over the bins it touches (≤ ceil(span/width)
    + 1 — a constant when spans are bounded), hash-join on the bin,
    then apply the exact predicate as a residual filter. No dedup
    needed: a qualifying pair meets in exactly one bin (the point's).
    Pick ``bin_width_s`` ≈ the max interval span: one explode row per
    interval, and candidate fan-in per bin stays
    |points in bin| × |intervals touching it|."""
    lo, hi, pt = F.col(lo_col), F.col(hi_col), F.col(point_col)
    w = F.lit(bin_width_s)
    lb = left.withColumn(
        "__bin", F.explode(F.sequence(F.floor(F.unix_timestamp(lo) / w),
                                      F.floor(F.unix_timestamp(hi) / w))))
    rb = right.withColumn("__bin", F.floor(F.unix_timestamp(pt) / w))
    return (lb.join(rb, "__bin")
              .filter((pt >= lo) & (pt <= hi))
              .drop("__bin"))


def range_join_ship_near_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per urgent order: how many lineitems (ANY order's — there is
    deliberately no key correlating the sides) shipped within 7 days
    after its order date. The no-equi-key range join every
    time-correlation analysis needs, via ``range_bin_join``."""
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_orderkey", "o_orderdate",
                      (F.col("o_orderdate")
                       + F.expr("INTERVAL 7 DAYS")).alias("o_end")))
    li = load_table(spark, sf_dir, "lineitem").select("l_shipdate")
    j = range_bin_join(orders, "o_orderdate", "o_end",
                       li, "l_shipdate", 7 * 86400)
    return j.groupBy("o_orderkey").agg(F.count("*").alias("n_shipments"))


RANGE_JOIN_ORACLE = """
SELECT o_orderkey, COUNT(*) AS n_shipments
FROM orders o JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY o_orderkey
"""


def twa_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED average of ``value`` per user — each reading
    weighted by how long it was current (until the next event), the
    correct mean for irregularly-sampled gauges (a plain AVG
    over-weights bursts). Step-function-and-hold semantics; the last
    reading carries zero weight (nothing observed after it).

    One per-user window (lead) + one aggregation. Exactness: values
    quantize to a 1e-3 grid and durations truncate to whole
    milliseconds, so the weighted sum is a product of longs summed in
    DECIMAL — exact, order-independent, and with per-user totals
    (≤ ~2.6e15 for a month of ms) safely inside the 2^53 envelope
    where the final DECIMAL→DOUBLE cast single-rounds on BOTH engines
    (a 1e-6/µs grid overflows that and drifts 1 ulp — measured)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    base = ev.select("user_id", "event_id",
                     F.unix_micros("ts").alias("us"),
                     F.bround(F.col("value") * 1e3, 0).cast("long")
                      .alias("vq"))
    stepped = base.withColumn(
        "dt", F.floor((F.lead("us").over(w) - F.col("us"))
                      / F.lit(1000)).cast("long"))
    return (stepped.filter(F.col("dt").isNotNull())
            .groupBy("user_id")
            .agg((F.sum(F.col("vq").cast("decimal(38,0)") * F.col("dt"))
                  .cast("double")
                  / F.sum(F.col("dt").cast("decimal(38,0)")).cast("double")
                  / F.lit(1e3)).alias("twa_value"),
                 F.count("*").alias("n_intervals")))


TWA_ORACLE = """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(round_even(value * 1e3, 0) AS BIGINT) AS vq
  FROM events
), stepped AS (
  SELECT user_id, vq,
         CAST(FLOOR((LEAD(us) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id)
               - us) / 1000) AS BIGINT) AS dt
  FROM base
)
SELECT user_id,
       CAST(SUM(CAST(vq AS DECIMAL(38,0)) * dt) AS DOUBLE)
         / CAST(SUM(CAST(dt AS DECIMAL(38,0))) AS DOUBLE) / 1e3
         AS twa_value,
       COUNT(*) AS n_intervals
FROM stepped
WHERE dt IS NOT NULL
GROUP BY user_id
"""


DECAY_MAX_K = 20  # oldest half-life bucket that still carries weight


def decay_weighted_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay weighted mean of ``value`` per user
    (half-life = 1 day, as-of the corpus max timestamp) — the
    recency-weighted feature aggregation (user activity scores,
    freshness-decayed metrics).

    Decay weights are EXACT powers of two: weight(age) = 2^(K - k)
    with k = min(whole days of age, K) computed by integer shift —
    no pow()/exp(), which are libm calls whose low bits differ per
    engine and which the oracle discipline bans. The shared 2^K
    factor cancels in the ratio. Numerator terms are
    vq(≤5e5 grid units) × 2^20 summed exactly in DECIMAL(38,0);
    per-user totals stay under 2^53 for ≤~10k events/user, so the
    final DOUBLE casts single-round on both engines (the envelope
    rule from twa_user_value, one power-of-two up).

    Scale shape: the as-of anchor is a 1-row broadcast aggregate (no
    driver action — the tf_df pattern); everything else is one
    map-side-combinable aggregation. At 100 TB pass the anchor as a
    parameter instead and the plan is a single agg over the scan."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("user_id",
                     F.unix_micros("ts").alias("us"),
                     F.bround(F.col("value") * 1e3, 0).cast("long")
                      .alias("vq"))
    anchor = base.agg(F.max("us").alias("t_max"))
    return (base.crossJoin(F.broadcast(anchor))
            .withColumn("w", F.expr(
                f"shiftleft(CAST(1 AS BIGINT), {DECAY_MAX_K} - "
                "CAST(least((t_max - us) DIV 86400000000, "
                f"{DECAY_MAX_K}) AS INT))"))
            .groupBy("user_id")
            .agg((F.sum(F.col("vq").cast("decimal(38,0)") * F.col("w"))
                  .cast("double")
                  / F.sum(F.col("w").cast("decimal(38,0)")).cast("double")
                  / F.lit(1e3)).alias("decayed_mean"),
                 F.count("*").alias("n_events")))


DECAY_ORACLE = f"""
WITH base AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(round_even(value * 1e3, 0) AS BIGINT) AS vq
  FROM events
), anchor AS (SELECT MAX(us) AS t_max FROM base),
weighted AS (
  SELECT user_id, vq,
         (CAST(1 AS BIGINT) << ({DECAY_MAX_K} - CAST(LEAST(
            (t_max - us) // 86400000000, {DECAY_MAX_K}) AS INTEGER))) AS w
  FROM base, anchor
)
SELECT user_id,
       CAST(SUM(CAST(vq AS DECIMAL(38,0)) * w) AS DOUBLE)
         / CAST(SUM(CAST(w AS DECIMAL(38,0))) AS DOUBLE) / 1e3
         AS decayed_mean,
       COUNT(*) AS n_events
FROM weighted GROUP BY user_id
"""


def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential EWMA per user with α = 1/2: s₁ = v₁,
    sᵢ = (vᵢ + sᵢ₋₁)/2 over the (us, event_id)-ordered event stream —
    the event-ORDER-weighted companion of
    ``decay_weighted_user_value``'s wall-clock decay (α=1/2 halves a
    value's weight per EVENT, not per day), and the batch half of a
    kappa pair with ``stream_ewma_user_value``.

    A sequential recurrence has no commutative partial-aggregate
    form, so it runs as an in-row left fold over the sorted per-user
    array — the general Spark recipe for order-sensitive per-key
    recurrences (and why the dyadic α matters: /2.0 is an exact
    exponent decrement, and +/÷ are single IEEE ops both engines
    apply in the SAME left-to-right order, so floats hash-match;
    an arbitrary α would need pow()). Scale: one shuffle on
    user_id; state per user is its event list — bounded by per-human
    activity. If a key ever isn't bounded, the (user, day)-segment
    decomposition applies: a segment of length m maps an incoming
    carry c to A + c·2⁻ᵐ (the 2⁻ᵐ scaling is exact), so day partials
    chain with one FMA-shaped step per day — value-equivalent to ulp
    accuracy, but NOT bit-identical (the composition moves rounding
    points), so the oracle-checked registry form stays the direct
    fold."""
    return ewma_from_events(load_table(spark, sf_dir, "events"))


def ewma_from_events(ev: DataFrame) -> DataFrame:
    """Core of :func:`ewma_user_value` over any
    ``(user_id, ts, event_id, value)`` frame."""
    base = ev.select("user_id", F.unix_micros("ts").alias("us"),
                     "event_id",
                     F.bround(F.col("value") * 100).cast("long").alias("vc"))
    arr = F.sort_array(F.collect_list(F.struct("us", "event_id", "vc")))
    g = base.groupBy("user_id").agg(arr.alias("arr"))
    darr = F.transform("arr", lambda x: x["vc"].cast("double"))
    s = F.aggregate(F.slice(darr, 2, F.size(darr) - 1),
                    F.element_at(darr, 1),
                    lambda acc, x: (x + acc) / F.lit(2.0))
    return g.select("user_id",
                    F.size("arr").cast("long").alias("n_events"),
                    (s / F.lit(100.0)).alias("ewma"))


EWMA_ORACLE = """
WITH b AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(round_even(value * 100, 0) AS BIGINT) AS vc
  FROM events
),
g AS (
  SELECT user_id,
         CAST(array_agg(vc ORDER BY us, event_id) AS DOUBLE[]) AS darr
  FROM b GROUP BY user_id
)
SELECT user_id,
       CAST(len(darr) AS BIGINT) AS n_events,
       list_reduce(darr, (acc, x) -> (x + acc) / 2.0) / 100.0 AS ewma
FROM g
"""


def ewma_user_value_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The giant-user remedy for :func:`ewma_user_value`, implemented
    (VERDICT r5 item 5) rather than documented: the (user, day)
    two-phase decomposition the sessionize/CUSUM family already uses.

    Phase 1 groups by (user, day) and folds each day SEGMENT in-row:
    ``a0`` = the recurrence run from carry 0, ``a1`` = the run with
    the first element as init (only a user's FIRST segment uses it),
    ``m`` = segment length. Linearity of sᵢ = (vᵢ + sᵢ₋₁)/2 in the
    carry means a segment maps an incoming carry c to a0 + c·2⁻ᵐ —
    and 2⁻ᵐ = pow(0.5, m) is bit-exact on BOTH engines for every m
    (probed 0..100k: powers of two are exactly representable and both
    libms return them exactly), so phase 2 chains day partials with
    one fused step per day, in-row over the user's sorted segment
    list. State per ROW is now one day's events (phase 1) or one
    day-partial per active day (phase 2) — the 400k-event giant user
    becomes ~280 rows of ≤1440 events, no single row ever holds the
    whole history.

    NOT registered as a replacement for ``ewma_user_value``: the
    composition moves IEEE rounding points, so it is value-equivalent
    (ulp-level, asserted in tests/test_worstcase_scale.py) but not
    bit-identical to the direct fold, and the direct fold is the
    stream twin's shared-oracle anchor. This query carries its OWN
    oracle running the identical decomposition (same DAG both
    engines, so floats hash-match)."""
    return ewma_chunked_from_events(load_table(spark, sf_dir, "events"))


def ewma_chunked_from_events(ev: DataFrame) -> DataFrame:
    """Core of :func:`ewma_user_value_chunked` over any
    ``(user_id, ts, event_id, value)`` frame."""
    base = ev.select("user_id", F.unix_micros("ts").alias("us"),
                     "event_id",
                     F.bround(F.col("value") * 100).cast("long").alias("vc"))
    base = base.withColumn("day", F.expr("us DIV 86400000000"))
    seg = (base.groupBy("user_id", "day")
           .agg(F.sort_array(F.collect_list(
               F.struct("us", "event_id", "vc"))).alias("arr")))
    darr = F.transform("arr", lambda x: x["vc"].cast("double"))
    step = lambda acc, x: (x + acc) / F.lit(2.0)          # noqa: E731
    a0 = F.aggregate(darr, F.lit(0.0), step)
    a1 = F.aggregate(F.slice(darr, 2, F.size(darr) - 1),
                     F.element_at(darr, 1), step)
    p = seg.select("user_id", "day",
                   F.size("arr").cast("long").alias("m"),
                   a0.alias("a0"), a1.alias("a1"))
    u = (p.groupBy("user_id")
         .agg(F.sort_array(F.collect_list(
                  F.struct("day", "m", "a0", "a1"))).alias("segs"),
              F.sum("m").alias("n_events")))
    chain = F.aggregate(
        F.slice(F.col("segs"), 2, F.size("segs") - 1),
        F.element_at(F.col("segs"), 1)["a1"],
        lambda acc, s: s["a0"] + acc * F.pow(F.lit(0.5), s["m"]))
    return u.select("user_id", F.col("n_events").cast("long"),
                    (chain / F.lit(100.0)).alias("ewma"))


EWMA_CHUNKED_ORACLE = """
WITH RECURSIVE b AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(round_even(value * 100, 0) AS BIGINT) AS vc,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
seg AS (
  SELECT user_id, day,
         CAST(array_agg(vc ORDER BY us, event_id) AS DOUBLE[]) AS darr
  FROM b GROUP BY user_id, day
),
p AS (
  SELECT user_id, day, len(darr) AS m,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), darr),
                     (acc, x) -> (x + acc) / 2.0) AS a0,
         list_reduce(darr, (acc, x) -> (x + acc) / 2.0) AS a1,
         row_number() OVER (PARTITION BY user_id ORDER BY day) AS i
  FROM seg
),
n AS (SELECT user_id, COUNT(*) AS k, CAST(SUM(m) AS BIGINT) AS n_events
      FROM p GROUP BY user_id),
walk(user_id, i, acc) AS (
  SELECT user_id, i, a1 FROM p WHERE i = 1
  UNION ALL
  SELECT p.user_id, p.i, p.a0 + w.acc * pow(0.5, p.m)
  FROM walk w JOIN p ON p.user_id = w.user_id AND p.i = w.i + 1
)
SELECT w.user_id, n.n_events, w.acc / 100.0 AS ewma
FROM walk w JOIN n ON n.user_id = w.user_id AND w.i = n.k
"""


def holt_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing per user (α = β = 1/2):
    level + trend state over the (us, event_id)-ordered value stream,

        l₁ = y₁, t₁ = 0
        lᵢ = (yᵢ + (lᵢ₋₁ + tᵢ₋₁)) / 2
        tᵢ = ((lᵢ − lᵢ₋₁) + tᵢ₋₁) / 2

    — the trend-aware member of the order-sensitive kappa family
    (EWMA tracks level only; Holt's one-step forecast l + t leads a
    drifting series instead of lagging it). Same exactness argument
    as ``ewma_user_value``: dyadic α/β make every update a single
    IEEE add/divide both engines apply in the same order, so the
    floats hash-match; the DuckDB oracle is a RECURSIVE CTE running
    the identical expression DAG (a two-component accumulator is
    where list_reduce stops working — its accumulator coerces to the
    list element type — so recursion is the oracle's only faithful
    form). Scale: one shuffle on user_id; in-row fold; state bounded
    by per-human activity (same note as EWMA).

    Output: ``(user_id, n_events, level, trend, forecast1)``.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("user_id", F.unix_micros("ts").alias("us"),
                     "event_id",
                     F.bround(F.col("value") * 100).cast("long").alias("vc"))
    arr = F.sort_array(F.collect_list(F.struct("us", "event_id", "vc")))
    g = base.groupBy("user_id").agg(arr.alias("arr"))
    darr = F.transform("arr", lambda x: x["vc"].cast("double"))

    def step(a, x):
        # newl is repeated verbatim inside newt — same expression DAG
        # as the oracle's recursive step (no let-binding in either)
        newl = (x + (a["l"] + a["t"])) / F.lit(2.0)
        newt = ((newl - a["l"]) + a["t"]) / F.lit(2.0)
        return F.struct(newl.alias("l"), newt.alias("t"))

    init = F.struct(F.element_at(darr, 1).alias("l"),
                    F.lit(0.0).alias("t"))
    acc = F.aggregate(F.slice(darr, 2, F.size(darr) - 1), init, step)
    return g.select(
        "user_id", F.size("arr").cast("long").alias("n_events"),
        (acc["l"] / F.lit(100.0)).alias("level"),
        (acc["t"] / F.lit(100.0)).alias("trend"),
        ((acc["l"] + acc["t"]) / F.lit(100.0)).alias("forecast1"))


HOLT_ORACLE = """
WITH RECURSIVE b AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(round_even(value * 100, 0) AS BIGINT) AS vc
  FROM events
),
o AS (
  SELECT user_id, CAST(vc AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS i
  FROM b
),
n AS (SELECT user_id, COUNT(*) AS n FROM o GROUP BY 1),
walk(user_id, i, l, t) AS (
  SELECT user_id, i, y, CAST(0.0 AS DOUBLE) FROM o WHERE i = 1
  UNION ALL
  SELECT o.user_id, o.i,
         (o.y + (w.l + w.t)) / 2.0,
         ((((o.y + (w.l + w.t)) / 2.0) - w.l) + w.t) / 2.0
  FROM walk w JOIN o ON o.user_id = w.user_id AND o.i = w.i + 1
)
SELECT w.user_id, CAST(n.n AS BIGINT) AS n_events,
       w.l / 100.0 AS level, w.t / 100.0 AS trend,
       (w.l + w.t) / 100.0 AS forecast1
FROM walk w JOIN n ON n.user_id = w.user_id AND w.i = n.n
"""


def holt_user_value_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The giant-user remedy for :func:`holt_user_value` (VERDICT r5
    item 5), extending the chunked-carry template from EWMA's scalar
    carry to Holt's TWO-component (level, trend) carry.

    The per-event update is affine in the carry, so a whole segment
    is an affine map F(c) = off + M·c. Phase 1 computes, per
    (user, day) segment and entirely in-row, FOUR folds of the same
    IEEE step: the Holt-init run (l1,t1 — used only for a user's
    first segment) and three basis runs from carries (0,0), (1,0),
    (0,1), which yield off and the two columns of M (a = F(e1)−off,
    b = F(e2)−off, componentwise subtraction AFTER the fold, same
    point in the oracle). Phase 2 chains the per-day affine maps
    in-row over the user's sorted segment list:
    c' = ((off + c_l·a) + c_t·b) per component — a fixed
    parenthesization both engines share, so floats hash-match.

    Like the EWMA twin, this is value-equivalent to the direct fold
    (rounding points move: ulp-level, asserted in
    tests/test_worstcase_scale.py) but not bit-identical, so it
    carries its OWN decomposition-mirroring oracle (a recursive CTE
    that walks each day segment's four states, then a second
    recursion chaining days) and the direct form stays the stream
    twin's shared-oracle anchor. Cost: 4× the per-event arithmetic of
    the direct fold, bought down from one unbounded row per user to
    per-day rows — the 100 TB trade."""
    return holt_chunked_from_events(load_table(spark, sf_dir, "events"))


def holt_chunked_from_events(ev: DataFrame) -> DataFrame:
    """Core of :func:`holt_user_value_chunked` over any
    ``(user_id, ts, event_id, value)`` frame."""
    base = ev.select("user_id", F.unix_micros("ts").alias("us"),
                     "event_id",
                     F.bround(F.col("value") * 100).cast("long").alias("vc"))
    base = base.withColumn("day", F.expr("us DIV 86400000000"))
    seg = (base.groupBy("user_id", "day")
           .agg(F.sort_array(F.collect_list(
               F.struct("us", "event_id", "vc"))).alias("arr")))
    darr = F.transform("arr", lambda x: x["vc"].cast("double"))

    def step(a, x):
        newl = (x + (a["l"] + a["t"])) / F.lit(2.0)
        newt = ((newl - a["l"]) + a["t"]) / F.lit(2.0)
        return F.struct(newl.alias("l"), newt.alias("t"))

    def basis(l0, t0):
        return F.aggregate(
            darr, F.struct(F.lit(l0).cast("double").alias("l"),
                           F.lit(t0).cast("double").alias("t")), step)

    init1 = F.struct(F.element_at(darr, 1).alias("l"),
                     F.lit(0.0).alias("t"))
    run1 = F.aggregate(F.slice(darr, 2, F.size(darr) - 1), init1, step)
    off, ra, rb = basis(0.0, 0.0), basis(1.0, 0.0), basis(0.0, 1.0)
    p = seg.select(
        "user_id", "day", F.size("arr").cast("long").alias("m"),
        run1["l"].alias("l1"), run1["t"].alias("t1"),
        off["l"].alias("offl"), off["t"].alias("offt"),
        (ra["l"] - off["l"]).alias("al"), (ra["t"] - off["t"]).alias("at"),
        (rb["l"] - off["l"]).alias("bl"), (rb["t"] - off["t"]).alias("bt"))
    u = (p.groupBy("user_id")
         .agg(F.sort_array(F.collect_list(F.struct(
                  "day", "m", "l1", "t1", "offl", "offt",
                  "al", "at", "bl", "bt"))).alias("segs"),
              F.sum("m").alias("n_events")))
    first = F.element_at(F.col("segs"), 1)
    chain = F.aggregate(
        F.slice(F.col("segs"), 2, F.size("segs") - 1),
        F.struct(first["l1"].alias("l"), first["t1"].alias("t")),
        lambda acc, s: F.struct(
            ((s["offl"] + acc["l"] * s["al"]) + acc["t"] * s["bl"])
            .alias("l"),
            ((s["offt"] + acc["l"] * s["at"]) + acc["t"] * s["bt"])
            .alias("t")))
    return u.select(
        "user_id", F.col("n_events").cast("long"),
        (chain["l"] / F.lit(100.0)).alias("level"),
        (chain["t"] / F.lit(100.0)).alias("trend"),
        ((chain["l"] + chain["t"]) / F.lit(100.0)).alias("forecast1"))


HOLT_CHUNKED_ORACLE = """
WITH RECURSIVE b AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(round_even(value * 100, 0) AS BIGINT) AS vc,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
o AS (
  SELECT user_id, day, CAST(vc AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY user_id, day
                            ORDER BY us, event_id) AS j
  FROM b
),
sm AS (SELECT user_id, day, COUNT(*) AS m FROM o GROUP BY user_id, day),
-- four simultaneous state walks per (user, day) segment: the
-- Holt-init run (l1,t1) and the three basis runs (off / F(e1) / F(e2))
w1(user_id, day, j, l1, t1, fl, ft, al, at, bl, bt) AS (
  SELECT user_id, day, j, y, CAST(0.0 AS DOUBLE),
         (y + (0.0 + 0.0)) / 2.0,
         ((((y + (0.0 + 0.0)) / 2.0) - 0.0) + 0.0) / 2.0,
         (y + (1.0 + 0.0)) / 2.0,
         ((((y + (1.0 + 0.0)) / 2.0) - 1.0) + 0.0) / 2.0,
         (y + (0.0 + 1.0)) / 2.0,
         ((((y + (0.0 + 1.0)) / 2.0) - 0.0) + 1.0) / 2.0
  FROM o WHERE j = 1
  UNION ALL
  SELECT o.user_id, o.day, o.j,
         (o.y + (w.l1 + w.t1)) / 2.0,
         ((((o.y + (w.l1 + w.t1)) / 2.0) - w.l1) + w.t1) / 2.0,
         (o.y + (w.fl + w.ft)) / 2.0,
         ((((o.y + (w.fl + w.ft)) / 2.0) - w.fl) + w.ft) / 2.0,
         (o.y + (w.al + w.at)) / 2.0,
         ((((o.y + (w.al + w.at)) / 2.0) - w.al) + w.at) / 2.0,
         (o.y + (w.bl + w.bt)) / 2.0,
         ((((o.y + (w.bl + w.bt)) / 2.0) - w.bl) + w.bt) / 2.0
  FROM w1 w JOIN o ON o.user_id = w.user_id AND o.day = w.day
                  AND o.j = w.j + 1
),
p AS (
  SELECT w.user_id, w.day, sm.m, w.l1, w.t1, w.fl AS offl, w.ft AS offt,
         w.al - w.fl AS al, w.at - w.ft AS at,
         w.bl - w.fl AS bl, w.bt - w.ft AS bt,
         row_number() OVER (PARTITION BY w.user_id ORDER BY w.day) AS i
  FROM w1 w JOIN sm ON sm.user_id = w.user_id AND sm.day = w.day
                   AND w.j = sm.m
),
n AS (SELECT user_id, COUNT(*) AS k, CAST(SUM(m) AS BIGINT) AS n_events
      FROM p GROUP BY user_id),
w2(user_id, i, l, t) AS (
  SELECT user_id, i, l1, t1 FROM p WHERE i = 1
  UNION ALL
  SELECT p.user_id, p.i,
         ((p.offl + w.l * p.al) + w.t * p.bl),
         ((p.offt + w.l * p.at) + w.t * p.bt)
  FROM w2 w JOIN p ON p.user_id = w.user_id AND p.i = w.i + 1
)
SELECT w.user_id, n.n_events, w.l / 100.0 AS level,
       w.t / 100.0 AS trend, (w.l + w.t) / 100.0 AS forecast1
FROM w2 w JOIN n ON n.user_id = w.user_id AND w.i = n.k
"""


REGISTRATIONS = [
    ("asof_last_error", asof_last_error, ASOF_ORACLE),
    ("decay_weighted_user_value", decay_weighted_user_value, DECAY_ORACLE),
    ("ewma_user_value", ewma_user_value, EWMA_ORACLE),
    ("ewma_user_value_chunked", ewma_user_value_chunked,
     EWMA_CHUNKED_ORACLE),
    ("holt_user_value", holt_user_value, HOLT_ORACLE),
    ("holt_user_value_chunked", holt_user_value_chunked,
     HOLT_CHUNKED_ORACLE),
    ("asof_next_purchase", asof_next_purchase, ASOF_FWD_ORACLE),
    ("twa_user_value", twa_user_value, TWA_ORACLE),
    ("range_join_ship_near_order", range_join_ship_near_order,
     RANGE_JOIN_ORACLE),
    ("map_funcs_events", map_funcs_events, MAP_FUNCS_ORACLE),
    ("interval_join_click_purchase", interval_join_click_purchase,
     INTERVAL_JOIN_ORACLE),
]
