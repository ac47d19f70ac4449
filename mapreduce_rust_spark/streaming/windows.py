"""Event-time streaming operators over ``events``.

Execution model: ``readStream`` over the parquet fixture with an
explicit schema (``ts`` arrives as raw nanos — same adapter story as
the batch path), ``Trigger.AvailableNow`` to drain the source
deterministically, memory sink, then the materialized table is
returned. In production the source is Kafka/files-in-motion and the
sink is a real table — the dataflow in the middle is identical, and
that's the part these operators define.

Watermarks: every aggregation declares ``withWatermark`` so the state
store is bounded (late data beyond the watermark is dropped — the
100 TB requirement; unbounded state OOMs long before that). With
AvailableNow + complete/update output the fixture results stay
deterministic and batch-equivalent, which is what the oracles check.

Post-sink checkpoints (round 13): every ``localCheckpoint`` that
breaks a closed form's MemorySink self-reference is LAZY
(``eager=False``, the bpe_train precedent) — the self-reference fix
is plan-level (the checkpoint's fresh LogicalRDD), not a function of
WHEN the RDD materializes, so the first closed-form action
materializes it inside its own job instead of paying a separate
eager job per twin. Results identical; one fewer Spark job each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduce_rust_spark.operators.relational import DEC_FINE
from mapreduce_rust_spark.tables import table_path

WATERMARK = "10 minutes"

# Session-scoped memo of stream-source schema probes (round 13, the
# tables._TABLE_MEMO discipline): every twin build batch-reads the
# fixture footer just to get an explicit schema for readStream —
# across 62 twins × reps that driver-side probe is pure fixed cost.
# Schemas only (no DataFrames, no rows); keyed by (applicationId,
# path); other-app entries evicted.
_SRC_SCHEMA_MEMO: dict[tuple[str, str], object] = {}


def _probe_schema(spark: SparkSession, path: str, nanos_fallback: bool):
    app_id = spark.sparkContext.applicationId
    for k in [k for k in _SRC_SCHEMA_MEMO if k[0] != app_id]:
        del _SRC_SCHEMA_MEMO[k]
    key = (app_id, path)
    schema = _SRC_SCHEMA_MEMO.get(key)
    if schema is None:
        if nanos_fallback:
            try:
                schema = spark.read.parquet(path).schema
            except Exception:
                # TIMESTAMP(NANOS) parquet: readable as long only via
                # the legacy conf
                spark.conf.set(
                    "spark.sql.legacy.parquet.nanosAsLong", "true")
                schema = spark.read.parquet(path).schema
        else:
            schema = spark.read.parquet(path).schema
        _SRC_SCHEMA_MEMO[key] = schema
    return schema


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the events fixture, schema-adaptive on
    ``ts`` exactly like the batch loader (``tables.load_table``): a
    file stream needs an explicit schema, so probe the parquet footer
    with a batch read and branch on the encoding era — INT64-nanos
    loads as long and converts; ``timestamp[us]`` passes through with
    an NTZ→local normalize. Hard-coding either era reads the other
    era's raw int64 as the wrong unit (silently, off by 10^3)."""
    path = table_path(sf_dir, "events")
    src_schema = _probe_schema(spark, path, nanos_fallback=True)
    # file-stream source wants a directory/glob, not a bare file —
    # glob to the single fixture file (prod: a landing directory)
    raw = spark.readStream.schema(src_schema).parquet(path + "*")
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def read_orders_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the orders fixture — the CDC-feed shape
    for order-history analytics (retention, LTV). Orders'
    ``o_orderdate`` has stayed plain ``timestamp[us]`` across fixture
    eras, but the schema is still probed from the footer (the
    read_events_stream discipline) so an encoding change breaks
    loudly in one place."""
    path = table_path(sf_dir, "orders")
    src_schema = _probe_schema(spark, path, nanos_fallback=False)
    return spark.readStream.schema(src_schema).parquet(path + "*")


# Cost accounting for the most recent micro-batch run (VERDICT r9
# item 6): a stream_* query's wall time conflates fixed harness setup
# (plan/start/stop) with per-batch plan cost — bench.py reads this
# after each timed run and records it beside the wall time, so a
# regression can be attributed to batches vs harness.
LAST_STREAM_STATS: dict | None = None

# Shuffle (= state store) partition count bound at every twin's start.
# Round-12 measurement (OPTIMIZATION_r12.md): per-partition state-store
# overhead — store open, delta-file write+fsync, commit, memory-sink
# collect task — dominates the micro-batch at ANY parallelism the
# fixture can use, so "== cores" (the round-9 choice, 32 locally) pays
# ~1.2 s/query over 8 partitions on identical plans, and the
# stream-stream interval join (4 state stores per partition) pays 4x
# that (13.4 s → 3.7 s). Every stateful shape measured faster at 8
# (complete-mode aggs ~2.1 s → 0.9 s; applyInPandasWithState twins
# 2.5-4.4 s → 1.8-2.5 s — Python-worker reuse means task slots, not
# partitions, bound their parallelism). At production scale the state
# partition count must track keyspace/throughput instead — it is fixed
# at the query's FIRST start by the checkpoint — so a cluster overrides
# via this conf; the default keeps the local bench comparable across
# SPARK_GRAFT_CPUS values (the old cores-coupling made the driver's
# low-core bench time a different plan shape, not the same one slower).
_STATE_PARTITIONS_CONF = "spark.mapreduce_rust_spark.stream.statePartitions"


def _stream_state_partitions(spark: SparkSession) -> int:
    try:
        return int(spark.conf.get(_STATE_PARTITIONS_CONF, "8"))
    except ValueError:
        return 8


# Scratch base for the harness's THROWAWAY stream checkpoints
# (round 13). Each twin drains once into a memory sink and its
# checkpoint is never restarted, but Spark's default temp checkpoint
# lands under java.io.tmpdir — ext4 here — so every micro-batch pays
# real disk fsyncs for WAL/offsets/state deltas that are garbage
# seconds later. A tmpfs scratch (when the host has one) removes that
# I/O without touching semantics. PRODUCTION NOTE: a restartable
# deployment must point checkpointLocation at durable shared storage
# (recovery correctness depends on it) — this conf only governs the
# drain-once harness path, and the default falls back to the normal
# temp dir when no tmpfs exists.
_SCRATCH_CONF = "spark.mapreduce_rust_spark.stream.scratchDir"


def _scratch_checkpoint_dir(spark: SparkSession) -> str:
    import os
    import tempfile
    base = spark.conf.get(_SCRATCH_CONF, "")
    if not base:
        base = "/dev/shm" if os.path.isdir("/dev/shm") \
            else tempfile.gettempdir()
    return tempfile.mkdtemp(prefix="mrs-stream-ckpt-", dir=base)


def _run_to_table(df: DataFrame, name: str, mode: str) -> DataFrame:
    """Drain the stream into a memory sink and return the result.

    The state store allocates one task per shuffle partition per
    micro-batch; a vanilla session's 200 is pathological for the
    fixture (and for any small topic). Pin a sane value for the
    stream's lifetime, restore afterwards — streaming queries bind
    confs at start, so this can't leak into the caller's queries.
    """
    global LAST_STREAM_STATS
    spark = df.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    # recentProgress is a ring buffer capped by
    # spark.sql.streaming.numRecentProgressUpdates (default 100), so
    # num_batches/trigger_ms_sum would silently undercount any stream
    # exceeding 100 micro-batches at larger SFs; raise it for the
    # query's lifetime (bound at start) and flag saturation anyway.
    _PROG_CAP = 10_000
    old_prog = spark.conf.get(
        "spark.sql.streaming.numRecentProgressUpdates", "100")
    ckpt = None
    try:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(_stream_state_partitions(spark)))
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
                       str(_PROG_CAP))
        ckpt = _scratch_checkpoint_dir(spark)
        q = (df.writeStream.outputMode(mode)
               .format("memory").queryName(name)
               .option("checkpointLocation", ckpt)
               .trigger(availableNow=True)
               .start())
        q.awaitTermination()
        try:
            prog = q.recentProgress
            LAST_STREAM_STATS = {
                "sink": name,
                "num_batches": len(prog),
                "trigger_ms_sum": sum(
                    int(p["durationMs"].get("triggerExecution", 0))
                    for p in prog),
                # True would mean the ring buffer saturated and the
                # two fields above are lower bounds, not totals.
                "progress_truncated": len(prog) >= _PROG_CAP,
            }
        except Exception:  # noqa: BLE001 — accounting must never fail a query
            LAST_STREAM_STATS = None
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
                       old_prog)
        # Round 12: drop the finished query's state-store providers.
        # Every twin drains into a FRESH temp checkpoint, so a stopped
        # query's providers are never reused — but Spark keeps them
        # loaded (state maps in memory + a maintenance thread listing
        # checkpoint dirs every 60 s), so a long multi-query session
        # (bench: 62 twins × ≥3 reps) accumulates hundreds of dead
        # providers whose churn shows up as one-sided stream-row noise
        # (measured ~0.3-0.5 s/query by the 12-twin A/B in
        # OPTIMIZATION_r12.md). StateStore.stop() unloads them all and
        # stops the maintenance pool; the next stream reloads its own
        # providers from scratch, which it would do anyway for a new
        # checkpoint. No other stream is active here by construction
        # (the harness is sequential and stops same-name queries).
        # ADVICE r12: StateStore.stop() is JVM-GLOBAL — it unloads
        # providers of ANY active streaming query — and a private
        # internal that may drift across Spark upgrades. Guard on
        # "no other stream active" instead of assuming it, and WARN
        # (not swallow) unexpected failures so API drift is visible;
        # cleanup still never fails the query.
        try:
            if not spark.streams.active:
                jvm = spark.sparkContext._jvm
                (jvm.org.apache.spark.sql.execution.streaming
                    .state.StateStore.stop())
        except Exception as exc:  # noqa: BLE001 — never fail the query
            import warnings
            warnings.warn(f"StateStore.stop() unavailable: {exc!r}",
                          stacklevel=2)
        # an EXPLICIT checkpointLocation is not auto-deleted the way
        # Spark's temporary one is — remove the drained scratch dir
        if ckpt is not None:
            import shutil
            shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation with watermark, complete
    mode (deterministic under AvailableNow). Batch-equivalent to
    ``tumbling_event_counts`` — and checked against the same oracle."""
    ev = read_events_stream(spark, sf_dir)
    agg = (ev.withWatermark("ts", WATERMARK)
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n"),
                  F.sum(F.col("value").cast(DEC_FINE)).cast("double")
                   .alias("sum_value")))
    out = _run_to_table(agg, "stream_tumbling", "complete")
    return out.select(F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
                      "event_type", "n", "sum_value")


STREAM_TUMBLING_ORACLE = """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,12))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def stream_tumbling_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation in APPEND mode — the FINALIZATION
    semantics the complete-mode twin cannot exercise, and the
    production default for append-only sinks (files, Kafka): a
    window's row emits ONCE, only after the watermark passes the
    window end and its state is dropped. Deterministic under
    AvailableNow: every window whose end ≤ final watermark
    (max event time − delay) emits; the trailing windows stay in
    state and never appear. The oracle mirrors that cutoff exactly —
    the batch aggregate FILTERED to finalized windows — so the
    emit-once machinery is hash-checkable (the
    stream_interval_join_left discipline applied to aggregation).

    Output: ``(bucket_start, event_type, n, sum_value)`` for
    finalized windows only.
    """
    ev = read_events_stream(spark, sf_dir)
    agg = (ev.withWatermark("ts", WATERMARK)
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n"),
                  F.sum(F.col("value").cast(DEC_FINE)).cast("double")
                   .alias("sum_value")))
    out = _run_to_table(agg, "stream_tumbling_append", "append")
    return out.select(F.unix_timestamp(F.col("w.start"))
                      .alias("bucket_start"),
                      "event_type", "n", "sum_value")


STREAM_TUMBLING_APPEND_ORACLE = """
WITH wm AS (
  SELECT MAX(ts) - INTERVAL '10 minutes' AS w FROM events
)
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
         AS bucket_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,12))) AS DOUBLE) AS sum_value
FROM events, wm
GROUP BY 1, 2, wm.w
HAVING time_bucket(INTERVAL '1 hour', MAX(ts)) + INTERVAL '1 hour'
         <= wm.w
"""


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour / 15 min slide): each event lands in 4
    overlapping windows."""
    ev = read_events_stream(spark, sf_dir)
    agg = (ev.withWatermark("ts", WATERMARK)
             .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
             .agg(F.count("*").alias("n")))
    out = _run_to_table(agg, "stream_sliding", "complete")
    return out.select(F.unix_timestamp(F.col("w.start")).alias("win_start"), "n")


# each event belongs to exactly 4 slide offsets of its 15-min bucket
STREAM_SLIDING_ORACLE = """
SELECT CAST(epoch(time_bucket(INTERVAL '15 minutes', ts)) AS BIGINT)
         - k * 900 AS win_start,
       COUNT(*) AS n
FROM events, UNNEST(range(0, 4)) AS t(k)
GROUP BY 1
"""


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-min inactivity gap) — the
    streaming-native form of ``sessionize_events``. Session end =
    last event + gap (Spark's session_window contract)."""
    ev = read_events_stream(spark, sf_dir)
    agg = (ev.withWatermark("ts", WATERMARK)
             .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
             .agg(F.count("*").alias("n_events")))
    out = _run_to_table(agg, "stream_sessions", "complete")
    return out.select("user_id",
                      F.unix_timestamp(F.col("w.start")).alias("sess_start"),
                      F.unix_timestamp(F.col("w.end")).alias("sess_end"),
                      "n_events")


STREAM_SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w IS NULL
               OR epoch(ts) - LAG(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), islands AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess_id
  FROM marked
)
SELECT user_id,
       CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS sess_start,
       CAST(FLOOR(epoch(MAX(ts) + INTERVAL '30 minutes')) AS BIGINT) AS sess_end,
       COUNT(*) AS n_events
FROM islands GROUP BY user_id, sess_id
"""


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases attributed to same-user
    clicks within 30 minutes, both sides watermarked so each side's
    buffered state is bounded by watermark + interval (the 100 TB
    requirement for an unbounded stream pair). Driver-checked against
    the BATCH interval join's oracle — the stream and batch dataflows
    must agree exactly."""
    ev = read_events_stream(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", F.col("event_id").alias("click_id"),
                        F.col("ts").alias("click_ts"))
                .withWatermark("click_ts", "1 hour"))
    buys = (ev.filter(F.col("event_type") == "purchase")
              .select(F.col("user_id").alias("b_user_id"),
                      F.col("event_id").alias("purchase_id"),
                      F.col("ts").alias("buy_ts"))
              .withWatermark("buy_ts", "1 hour"))
    joined = clicks.join(
        buys,
        F.expr("""user_id = b_user_id AND
                  buy_ts >= click_ts AND
                  buy_ts <= click_ts + INTERVAL 30 MINUTES"""))
    out = _run_to_table(joined, "stream_interval_join", "append")
    return out.select("user_id", "click_id", "purchase_id")


def stream_interval_join_left(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the state-eviction
    semantics ``stream_interval_join`` (inner) cannot exercise: a
    click with no same-user purchase within 30 minutes emits a
    NULL-padded row only when the GLOBAL watermark passes the end of
    its join window (click_ts + 30 min), i.e. when Spark can prove
    no future match exists and evicts the buffered row. State stays
    bounded by watermark + interval on both sides.

    Determinism under AvailableNow: matched pairs are the batch
    inner join; unmatched clicks emit iff their join window closed
    strictly before the FINAL watermark = min(max click_ts,
    max buy_ts) − 1 h (per-side maxima — each withWatermark tracks
    its own input; the trailing ~90 min of clicks stay in state and
    never emit). The oracle mirrors exactly that cutoff, so the
    stream is hash-checkable even though a pure batch left join
    would disagree on the watermark tail.

    Output: ``(user_id, click_id, purchase_id)`` — purchase_id NULL
    on the emitted unmatched rows.
    """
    ev = read_events_stream(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", F.col("event_id").alias("click_id"),
                        F.col("ts").alias("click_ts"))
                .withWatermark("click_ts", "1 hour"))
    buys = (ev.filter(F.col("event_type") == "purchase")
              .select(F.col("user_id").alias("b_user_id"),
                      F.col("event_id").alias("purchase_id"),
                      F.col("ts").alias("buy_ts"))
              .withWatermark("buy_ts", "1 hour"))
    joined = clicks.join(
        buys,
        F.expr("""user_id = b_user_id AND
                  buy_ts >= click_ts AND
                  buy_ts <= click_ts + INTERVAL 30 MINUTES"""),
        "leftOuter")
    out = _run_to_table(joined, "stream_interval_join_left", "append")
    return out.select("user_id", "click_id", "purchase_id")


STREAM_INTERVAL_LEFT_ORACLE = """
WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
           FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, event_id AS purchase_id, ts AS buy_ts
      FROM events WHERE event_type = 'purchase'),
wm AS (
  SELECT least((SELECT MAX(click_ts) FROM c),
               (SELECT MAX(buy_ts) FROM p))
         - INTERVAL '1 hour' AS w
),
matched AS (
  SELECT c.user_id, c.click_id, p.purchase_id
  FROM c JOIN p
    ON c.user_id = p.user_id
   AND p.buy_ts >= c.click_ts
   AND p.buy_ts <= c.click_ts + INTERVAL '30 minutes'
),
unmatched AS (
  SELECT c.user_id, c.click_id, CAST(NULL AS BIGINT) AS purchase_id
  FROM c, wm
  WHERE NOT EXISTS (
          SELECT 1 FROM p
          WHERE p.user_id = c.user_id
            AND p.buy_ts >= c.click_ts
            AND p.buy_ts <= c.click_ts + INTERVAL '30 minutes')
    AND c.click_ts + INTERVAL '30 minutes' < wm.w
)
SELECT * FROM matched UNION ALL SELECT * FROM unmatched
"""


def stream_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: first-seen (user_id, event_type)
    pairs, state bounded by the watermark
    (``dropDuplicatesWithinWatermark`` — duplicates later than
    watermark + delay can resurface, the documented contract; the
    fixture's duplicates all fall inside it, so the result equals the
    batch DISTINCT, which is what the oracle checks). The streaming
    twin of ``exact_dedup_docs``'s shuffle-on-key shape: state is one
    entry per distinct key, not per event."""
    ev = read_events_stream(spark, sf_dir)
    dd = (ev.withWatermark("ts", WATERMARK)
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .select("user_id", "event_type"))
    return _run_to_table(dd, "stream_dedup", "append")


STREAM_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events
"""


def stream_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``olap.active_users_7d``: the trailing-WAU
    metric's streaming state is just the distinct (user_id, day) set
    — one complete-mode count aggregate (state: one entry per
    user-day, NOT per event); the day-grid range join and the exact
    distinct count finish batch-side on the ≤ \\|users\\|·\\|days\\|
    output table. Same DuckDB oracle as the batch op."""
    from mapreduce_rust_spark.operators.olap import ACTIVE_WINDOW_DAYS
    ev = (read_events_stream(spark, sf_dir)
          .select("user_id", F.to_date("ts").alias("day")))
    ud = ev.groupBy("user_id", "day").agg(F.count("*").alias("n"))
    out = _run_to_table(ud, "stream_active_7d", "complete")
    ud2 = out.select("user_id", "day")
    grid = ud2.select("day").distinct().withColumnRenamed("day", "gday")
    j = ud2.join(grid,
                 (F.col("day") <= F.col("gday"))
                 & (F.col("day") >= F.date_sub("gday",
                                               ACTIVE_WINDOW_DAYS - 1)))
    return (j.groupBy("gday")
            .agg(F.countDistinct("user_id").alias("active_users"))
            .select(F.col("gday").cast("string").alias("day"),
                    "active_users"))


def _active_7d_oracle() -> str:
    from mapreduce_rust_spark.operators.olap import ACTIVE_7D_ORACLE
    return ACTIVE_7D_ORACLE


from mapreduce_rust_spark.operators.temporal import INTERVAL_JOIN_ORACLE  # noqa: E402

def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joined to the
    static ``customer`` dimension (user_id = c_custkey), aggregated
    to windowed per-segment revenue. The canonical serving-layer
    pattern — the dim table is a plain batch DataFrame re-read per
    micro-batch, needs no watermark on the static side, and Catalyst
    BROADCASTS it under the stream (no stream-side shuffle for the
    join). The windowed agg carries the usual watermark so state
    stays bounded."""
    from mapreduce_rust_spark.tables import load_table
    ev = read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer") \
        .select(F.col("c_custkey"), F.col("c_mktsegment"))
    joined = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
    agg = (joined.withWatermark("ts", WATERMARK)
                 .groupBy(F.window("ts", "6 hours").alias("w"),
                          "c_mktsegment")
                 .agg(F.count("*").alias("n"),
                      F.sum(F.col("value").cast(DEC_FINE)).cast("double")
                       .alias("sum_value")))
    out = _run_to_table(agg, "stream_static_enrich", "complete")
    return out.select(F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
                      "c_mktsegment", "n", "sum_value")


STREAM_STATIC_ENRICH_ORACLE = """
SELECT CAST(epoch(time_bucket(INTERVAL '6 hours', ts)) AS BIGINT)
         AS bucket_start,
       c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,12))) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""


def stream_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed APPROXIMATE distinct users on the stream — a
    deterministic HLL register table inside a watermarked tumbling
    window. The sketch state is constant-size per window (≤ 512
    register cells vs an exact distinct whose state grows with
    cardinality — the difference between bounded and unbounded state
    at 100 TB/day). Register maxima are commutative/associative, so
    the result is identical under any micro-batching.

    ORACLED since round 12 (previously rows-only on the engine's
    built-in approx_count_distinct, whose HLL++ internals DuckDB
    cannot mirror): the in-stream aggregate is the engine's own
    register algebra (``relational.sketch_distinct_parts``), the
    per-window readout runs batch-side, and the oracle re-derives
    both exactly. Estimation note: ~70 users per 6 h window fill
    m = 512 sparsely, so consumers apply the standard linear-counting
    correction m·ln(m/zero_regs) client-side (ln is libm, excluded
    from oracle-checked output); ``est_raw`` is the standard-regime
    estimator, exact-DAG-checked like the batch op's."""
    from mapreduce_rust_spark.operators.relational import (
        hll_readout, hll_rho_select)
    ev = read_events_stream(spark, sf_dir)
    rho = hll_rho_select(
        ev.withWatermark("ts", WATERMARK)
          .withColumn("w", F.window("ts", "6 hours")),
        ["w"], "user_id")
    agg = (rho.groupBy("w", "bucket")
              .agg(F.max("rho").alias("reg"),
                   F.count("*").alias("cnt")))
    out = _run_to_table(agg, "stream_approx_distinct", "complete")
    per = out.select(F.unix_timestamp(F.col("w.start"))
                     .alias("bucket_start"), "bucket", "reg", "cnt")
    return hll_readout(per, ["bucket_start"])


def _approx_distinct_oracle() -> str:
    from mapreduce_rust_spark.operators.relational import hll_oracle_sql
    return hll_oracle_sql(
        "events",
        "CAST(FLOOR(epoch(ts)) AS BIGINT)"
        " - CAST(FLOOR(epoch(ts)) AS BIGINT) % 21600",
        "user_id", "bucket_start")


# Fixed x-origin for the streaming OLS twin: 2024-01-01T00:00:00 as
# epoch microseconds. The batch op (monitoring.trend_ols_events) uses
# the GLOBAL min event time — a second aggregation a single streaming
# query cannot nest — so the stream pins the origin to the fixture
# window's start instead; slope and R² are origin-invariant, the
# intercept is 'cents at 2024-01-01'.
TREND_T0_US = 1_704_067_200_000_000


def stream_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.trend_ols_events`` — the OLS
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are classic
    mergeable streaming state: one complete-mode aggregate per event
    type, updated per micro-batch, with the closed-form combination
    applied on top. Same exactness discipline as the batch op
    (integer seconds/cents, DECIMAL(38) products), so the float
    outputs hash-match the oracle bit-for-bit."""
    from mapreduce_rust_spark.operators.monitoring import (
        ols_closed_form, ols_stats_agg)
    ev = read_events_stream(spark, sf_dir)
    dec = "decimal(38,0)"
    # Integer DIV like the batch op and the oracle's `//` — no float
    # rounding in the x path even for extreme epoch ranges. (A
    # pre-2024 event would still differ trunc-vs-floor; the fixture
    # and the fixed-origin design keep diffs nonnegative.)
    x = F.expr(f"(unix_micros(ts) - {TREND_T0_US}) DIV 1000000").cast(dec)
    y = F.round(F.col("value") * 100).cast("long").cast(dec)
    stats = ols_stats_agg(ev.select("event_type", x.alias("x"),
                                    y.alias("y")))
    out = _run_to_table(stats, "stream_trend_ols", "complete")
    return ols_closed_form(out)


def _stream_trend_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import OLS_ORACLE_TAIL
    return f"""
WITH xy AS (
  SELECT event_type,
         CAST((epoch_us(ts) - {TREND_T0_US}) // 1000000 AS DECIMAL(38,0))
           AS x,
         CAST(CAST(round(value * 100, 0) AS BIGINT) AS DECIMAL(38,0)) AS y
  FROM events
),
{OLS_ORACLE_TAIL}
"""


STREAM_TREND_ORACLE = _stream_trend_oracle()


def stream_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.dow_seasonality_events`` —
    fourth leg of the kappa-parity family (tumbling, z-score, OLS
    trend, now seasonality): per-(event_type, ISO weekday) count and
    Σcents are mergeable sums maintained as one complete-mode
    aggregate; the shared closed form divides on top. Checked against
    the IDENTICAL DuckDB oracle as the batch op, and unlike the OLS
    twin there is no origin parameter, so twin and batch agree
    bit-for-bit."""
    from mapreduce_rust_spark.operators.monitoring import (
        dow_profile_closed_form, dow_profile_stats)
    ev = (read_events_stream(spark, sf_dir)
          .select("event_type",
                  (F.weekday("ts") + 1).cast("long").alias("dow"),
                  F.round(F.col("value") * 100).cast("long").alias("vc")))
    stats = dow_profile_stats(ev)
    out = _run_to_table(stats, "stream_dow_profile", "complete")
    # the closed form checkpoints internally, which also breaks the
    # MemorySink lineage its self-join can't otherwise resolve
    return dow_profile_closed_form(out)


def stream_chisq_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.chisq_cells_events`` (fifth leg
    of the kappa-parity family): the contingency cells are one
    complete-mode count aggregate; the shared closed form computes
    expected counts and χ² terms on top. Same oracle as the batch op;
    bit-identical (pure counts, no origin parameter)."""
    from mapreduce_rust_spark.operators.monitoring import chisq_closed_form
    ev = (read_events_stream(spark, sf_dir)
          .select("event_type",
                  (F.weekday("ts") + 1).cast("long").alias("dow")))
    cells = ev.groupBy("event_type", "dow").agg(F.count("*").alias("o"))
    out = _run_to_table(cells, "stream_chisq_cells", "complete")
    return chisq_closed_form(out)


def stream_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.mannwhitney_events`` — the
    experimentation wing joins the kappa family: the per-distinct-
    value arm counts are plain mergeable sums (ONE complete-mode
    aggregate over the cents grid), and the shared closed form ranks
    and divides on top batch-side. Same DuckDB oracle as the batch
    op; bit-identical (pure integer counts, one final division)."""
    from mapreduce_rust_spark.operators.experiment import mw_closed_form
    ev = (read_events_stream(spark, sf_dir)
          .select((F.col("user_id") % 2 == 1).alias("treat"),
                  F.round(F.col("value") * 100).cast("long").alias("vc")))
    cnt = (ev.groupBy("vc")
           .agg(F.sum(F.when(F.col("treat"), 1).otherwise(0))
                .cast("long").alias("ct"),
                F.sum(F.when(~F.col("treat"), 1).otherwise(0))
                .cast("long").alias("cc")))
    out = _run_to_table(cnt, "stream_mannwhitney", "complete")
    return mw_closed_form(out)


def stream_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.fano_burstiness_events`` —
    seventh leg of the kappa-parity family: the per-(type, UTC day)
    arrival counts are ONE complete-mode mergeable count aggregate
    (day grain, so state is dims-sized: types × span days, never
    events), and the shared closed form clears variance/mean to the
    all-integer (n·Σc² − (Σc)²)/(n·Σc) on top batch-side. Same DuckDB
    oracle as the batch op; bit-identical (pure integer counts, one
    final division per output column)."""
    from mapreduce_rust_spark.operators.monitoring import (
        fano_closed_form, fano_daily_counts)
    ev = read_events_stream(spark, sf_dir)
    daily = fano_daily_counts(ev)
    out = _run_to_table(daily, "stream_fano_burstiness", "complete")
    return fano_closed_form(out)


def _dow_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import DOW_ORACLE
    return DOW_ORACLE


def _mw_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import (
        MANNWHITNEY_ORACLE)
    return MANNWHITNEY_ORACLE


def _chisq_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import CHISQ_ORACLE
    return CHISQ_ORACLE


def _fano_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import FANO_ORACLE
    return FANO_ORACLE


def stream_strat_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.strat_effect_events`` — eighth
    leg of the kappa-parity family: the 7×2 per-stratum cell sums are
    ONE complete-mode mergeable aggregate; the shared closed form
    (int÷int means, effect, weight) runs on top batch-side.
    Bit-identical to the batch op; same DuckDB oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        strat_effect_cells, strat_effect_closed_form)
    ev = read_events_stream(spark, sf_dir)
    cells = strat_effect_cells(ev)
    out = _run_to_table(cells, "stream_strat_effect", "complete")
    return strat_effect_closed_form(out)


def _strat_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import (
        STRAT_EFFECT_ORACLE)
    return STRAT_EFFECT_ORACLE


def stream_two_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.two_proportion_test_events`` —
    ninth kappa pair: the per-user conversion flag is ONE
    complete-mode idempotent-max aggregate (state = one bit per user,
    the stream_dedup_users shape, honestly user-dims-sized), and the
    shared closed form computes the four arm integers and the fixed
    IEEE z-tree on top batch-side. Bit-identical to the batch op;
    same DuckDB oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        two_prop_closed_form, two_prop_user_conv)
    ev = read_events_stream(spark, sf_dir)
    conv = two_prop_user_conv(ev)
    out = _run_to_table(conv, "stream_two_proportion", "complete")
    return two_prop_closed_form(out)


def _two_prop_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import TWO_PROP_ORACLE
    return TWO_PROP_ORACLE


def stream_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``olap.retention_triangle_orders`` — tenth
    kappa pair, and the first over the ORDERS feed: the (customer,
    active month) order counts are ONE complete-mode count aggregate
    (state = customers × active months — honestly user-dims-sized,
    the stream_two_proportion argument), and the shared closed form
    derives cohorts and ages batch-side. Bit-identical to the batch
    op (pure integer counts and month arithmetic); same DuckDB
    oracle."""
    from mapreduce_rust_spark.operators.olap import (
        retention_cells, retention_closed_form)
    orders = read_orders_stream(spark, sf_dir)
    cells = retention_cells(orders)
    out = _run_to_table(cells, "stream_retention_triangle", "complete")
    # the closed form joins the cells against their own cohort
    # aggregate; checkpoint breaks the MemorySink self-reference the
    # resolver can't disambiguate (the stream_dow_profile lesson)
    return retention_closed_form(out.localCheckpoint(eager=False))


def _retention_oracle() -> str:
    from mapreduce_rust_spark.operators.olap import (
        RETENTION_TRIANGLE_ORACLE)
    return RETENTION_TRIANGLE_ORACLE


def stream_winsorized_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.winsorized_mean_delta`` —
    eleventh kappa pair: the per-distinct-value arm counts are the
    SAME mergeable sufficient statistic Mann–Whitney streams (one
    complete-mode aggregate over the cents grid), and the shared
    closed form computes the exact pooled P5/P95 bounds, clipping and
    means batch-side. Bit-identical to the batch op; same DuckDB
    oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        mw_value_counts, winsorized_closed_form)
    ev = (read_events_stream(spark, sf_dir)
          .select((F.col("user_id") % 2 == 1).alias("treat"),
                  F.round(F.col("value") * 100).cast("long").alias("vc")))
    cnt = mw_value_counts(ev)
    out = _run_to_table(cnt, "stream_winsorized_delta", "complete")
    # MemorySink discipline: the closed form fans the cells into
    # multiple branches — checkpoint once so the sink lineage is not
    # recomputed per branch (matches the other round-7 twins).
    return winsorized_closed_form(out.localCheckpoint(eager=False))


def _winsorized_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import WINSORIZED_ORACLE
    return WINSORIZED_ORACLE


def read_docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the documents fixture — the
    corpus-ingest feed shape (a crawler landing directory in
    production). Plain string/bigint schema, still footer-probed."""
    path = table_path(sf_dir, "documents")
    src_schema = _probe_schema(spark, path, nanos_fallback=False)
    return spark.readStream.schema(src_schema).parquet(path + "*")


def stream_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``llm.evaluation.isotonic_calibration_docs``
    — twelfth kappa pair, and the first over the DOCUMENTS feed: the
    per-bin (count, positives) cells are ONE complete-mode aggregate
    over ≤21 fixed-width score bins (dims state — the smallest state
    store in the engine), and the shared minimax closed form fits the
    monotone curve batch-side. Bit-identical to the batch op (integer
    bin counts, identical division/min/max DAG); same DuckDB
    oracle."""
    from mapreduce_rust_spark.llm.evaluation import (
        calibration_bin_counts, isotonic_closed_form, scored_from_docs)
    docs = read_docs_stream(spark, sf_dir)
    bins = calibration_bin_counts(scored_from_docs(docs))
    out = _run_to_table(bins, "stream_isotonic_calibration", "complete")
    # closed form self-joins the bins; checkpoint breaks the
    # MemorySink self-reference (stream_retention_triangle lesson)
    return isotonic_closed_form(out.localCheckpoint(eager=False))


def _isotonic_oracle() -> str:
    from mapreduce_rust_spark.llm.evaluation import ISOTONIC_ORACLE
    return ISOTONIC_ORACLE


def read_lineitem_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the lineitem fixture — the fact-feed
    shape for stream-static fact⋈dim work. Footer-probed schema,
    like every stream source here."""
    path = table_path(sf_dir, "lineitem")
    src_schema = _probe_schema(spark, path, nanos_fallback=False)
    return spark.readStream.schema(src_schema).parquet(path + "*")


def stream_sla_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``olap.sla_business_days_lineitem`` —
    thirteenth kappa pair, and the first STREAM-STATIC-JOIN member:
    the lineitem FEED joins the static orders dimension per
    micro-batch (the serving-layer enrich shape of
    stream_static_enrich), and the (bdays, n_lines) cells are ONE
    complete-mode count aggregate (state ≤ max-latency rows); the
    shared closed form adds the breach flag. Bit-identical to the
    batch op (pure integer date arithmetic); same DuckDB oracle."""
    from mapreduce_rust_spark.operators.olap import (
        sla_bday_cells, sla_closed_form)
    from mapreduce_rust_spark.tables import load_table
    li = read_lineitem_stream(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cells = sla_bday_cells(li, orders)
    out = _run_to_table(cells, "stream_sla_business_days", "complete")
    return sla_closed_form(out)


def _sla_oracle() -> str:
    from mapreduce_rust_spark.operators.olap import SLA_BDAYS_ORACLE
    return SLA_BDAYS_ORACLE


def stream_shuffle_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``llm.sharding.shuffle_quality_stats`` —
    fourteenth kappa pair: the per-(shard, source) doc/token cells
    are ONE complete-mode aggregate (state = shards × sources —
    dims), and the shared closed form computes the argmax/rollup
    batch-side. The shard audit as a LIVE ingest monitor. Same DuckDB
    oracle; bit-identical (integer counts, one final division)."""
    from mapreduce_rust_spark.llm.sharding import (
        shard_quality_cells, shard_quality_closed_form)
    docs = read_docs_stream(spark, sf_dir)
    cells = shard_quality_cells(docs)
    out = _run_to_table(cells, "stream_shuffle_quality", "complete")
    # closed form reads the cells from two branches (argmax + rollup)
    return shard_quality_closed_form(out.localCheckpoint(eager=False))


def _shufq_oracle() -> str:
    from mapreduce_rust_spark.llm.sharding import SHUFFLE_QUALITY_ORACLE
    return SHUFFLE_QUALITY_ORACLE



def stream_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``dataquality.t_closeness_orders`` —
    fifteenth kappa pair, second over the ORDERS feed: the (QI class,
    sensitive bucket) counts are ONE complete-mode aggregate (state =
    classes × B buckets — the same class-dims size the batch op
    groups to), and the shared closed form derives the global
    distribution and the integer EMD batch-side. Bit-identical to the
    batch op (pure integer cross-multiplied prefix sums); same DuckDB
    oracle."""
    from mapreduce_rust_spark.operators.dataquality import (
        tclose_cells, tclose_closed_form)
    orders = read_orders_stream(spark, sf_dir)
    cells = tclose_cells(orders)
    out = _run_to_table(cells, "stream_t_closeness", "complete")
    # closed form fans the cells into global/total/class branches —
    # checkpoint so the MemorySink lineage is not recomputed per branch
    return tclose_closed_form(out.localCheckpoint(eager=False))


def _tclose_oracle() -> str:
    from mapreduce_rust_spark.operators.dataquality import (
        T_CLOSENESS_ORACLE)
    return T_CLOSENESS_ORACLE



def stream_median_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.median_sign_test_events`` —
    sixteenth kappa pair: the per-distinct-value arm counts are the
    SAME mergeable Mann–Whitney sufficient statistic (one
    complete-mode aggregate over the cents grid), and the shared
    closed form selects the pooled median and splits the 2×3 table
    batch-side. Bit-identical to the batch op (order statistics and
    integer basis points only); same DuckDB oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        median_sign_closed_form, mw_value_counts)
    ev = (read_events_stream(spark, sf_dir)
          .select((F.col("user_id") % 2 == 1).alias("treat"),
                  F.round(F.col("value") * 100).cast("long").alias("vc")))
    cnt = mw_value_counts(ev)
    out = _run_to_table(cnt, "stream_median_sign_test", "complete")
    # the closed form fans the cells into cum/median/split branches
    return median_sign_closed_form(out.localCheckpoint(eager=False))


def _median_sign_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import (
        MEDIAN_SIGN_ORACLE)
    return MEDIAN_SIGN_ORACLE



def stream_ship_delay_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``olap.ship_delay_percentiles_priority`` —
    seventeenth kappa pair, second stream-static-join member: the
    lineitem FEED joins the static orders dimension per micro-batch
    and the (priority, days) counts are ONE complete-mode aggregate
    (state ≤ priorities × max-latency days); the shared closed form
    selects the exact nearest-rank percentiles batch-side.
    Bit-identical to the batch op (pure integer order statistics);
    same DuckDB oracle."""
    from mapreduce_rust_spark.operators.olap import (
        ship_delay_cells, ship_delay_closed_form)
    from mapreduce_rust_spark.tables import load_table
    li = read_lineitem_stream(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cells = ship_delay_cells(li, orders)
    out = _run_to_table(cells, "stream_ship_delay_percentiles", "complete")
    # closed form fans the cells into cum + per-group-count branches
    return ship_delay_closed_form(out.localCheckpoint(eager=False))


def _ship_delay_oracle() -> str:
    from mapreduce_rust_spark.operators.olap import SHIP_DELAY_ORACLE
    return SHIP_DELAY_ORACLE



def stream_len_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``llm.textanalysis.len_quantiles_sources`` —
    nineteenth kappa pair, second over the DOCUMENTS feed: the
    (source, len) counts are ONE complete-mode aggregate (state =
    sources × distinct lengths, the bounded value grid), and the
    shared closed form selects the exact nearest-rank percentiles
    batch-side. Bit-identical to the batch op (pure integer order
    statistics); same DuckDB oracle."""
    from mapreduce_rust_spark.llm.textanalysis import (
        len_cells, len_quantiles_closed_form)
    docs = read_docs_stream(spark, sf_dir)
    cells = len_cells(docs)
    out = _run_to_table(cells, "stream_len_quantiles", "complete")
    # closed form fans the cells into cum + per-source-count branches
    return len_quantiles_closed_form(out.localCheckpoint(eager=False))


def _len_quantiles_oracle() -> str:
    from mapreduce_rust_spark.llm.textanalysis import (
        LEN_QUANTILES_ORACLE)
    return LEN_QUANTILES_ORACLE


def stream_audio_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``llm.multimodal.multimodal_audio_pcm_stats``
    — twentieth kappa pair, third over the DOCUMENTS feed and the
    first STATELESS one: media decode is the canonical ingest-time
    transform (decode on arrival, store features), so the twin is the
    same Arrow-batched RIFF/PCM kernel applied per micro-batch in
    append mode — no state store at all, the kappa architecture's
    map-only degenerate case. Per-document windows never span
    batches, so output is row-identical to the batch op (the batch
    op's per-DISTINCT-text duplicate collapse is a batch-side cost
    optimization, not a semantic one); same DuckDB oracle."""
    from mapreduce_rust_spark.core.runner import _ensure_self_shipping
    from mapreduce_rust_spark.llm.multimodal import (
        AUDIO_PCM_SCHEMA, _audio_pcm_batches, with_payload)
    _ensure_self_shipping()
    docs = read_docs_stream(spark, sf_dir).where(F.length("text") >= 1)
    # round 12: the file-stream source is one partition (single-row-
    # group fixture), so the decode kernel ran serially inside the
    # micro-batch; a stateless repartition parallelizes it (measured
    # 4.2 s -> 1.5 s on the ADPCM twin; functions.spread rationale)
    from mapreduce_rust_spark.functions import spread
    stats = spread(with_payload(docs), "doc_id").mapInPandas(
        _audio_pcm_batches, AUDIO_PCM_SCHEMA)
    return _run_to_table(stats, "stream_audio_pcm_stats", "append")


def _audio_pcm_oracle() -> str:
    from mapreduce_rust_spark.llm.multimodal import AUDIO_PCM_ORACLE
    return AUDIO_PCM_ORACLE


def stream_audio_ulaw_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``multimodal_audio_ulaw_stats`` —
    thirty-eighth kappa pair, the third STATELESS one: the G.711
    expansion kernel as an append-mode ingest transform, same
    map-only shape as ``stream_audio_pcm_stats`` (per-document
    windows never span batches, so output is row-identical to the
    batch op); same DuckDB oracle."""
    from mapreduce_rust_spark.core.runner import _ensure_self_shipping
    from mapreduce_rust_spark.llm.multimodal import (
        AUDIO_PCM_SCHEMA, _audio_ulaw_batches, with_payload)
    _ensure_self_shipping()
    docs = read_docs_stream(spark, sf_dir).where(F.length("text") >= 1)
    # round 12: the file-stream source is one partition (single-row-
    # group fixture), so the decode kernel ran serially inside the
    # micro-batch; a stateless repartition parallelizes it (measured
    # 4.2 s -> 1.5 s on the ADPCM twin; functions.spread rationale)
    from mapreduce_rust_spark.functions import spread
    stats = spread(with_payload(docs), "doc_id").mapInPandas(
        _audio_ulaw_batches, AUDIO_PCM_SCHEMA)
    return _run_to_table(stats, "stream_audio_ulaw_stats", "append")


def _audio_ulaw_oracle() -> str:
    from mapreduce_rust_spark.llm.multimodal import AUDIO_ULAW_ORACLE
    return AUDIO_ULAW_ORACLE


def stream_audio_alaw_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``multimodal_audio_alaw_stats`` —
    forty-ninth kappa pair, the fourth STATELESS one: the G.711
    A-law expansion kernel as an append-mode ingest transform, same
    map-only shape as ``stream_audio_ulaw_stats`` (per-document
    windows never span batches, so output is row-identical to the
    batch op); same DuckDB oracle."""
    from mapreduce_rust_spark.core.runner import _ensure_self_shipping
    from mapreduce_rust_spark.llm.multimodal import (
        AUDIO_PCM_SCHEMA, _audio_alaw_batches, with_payload)
    _ensure_self_shipping()
    docs = read_docs_stream(spark, sf_dir).where(F.length("text") >= 1)
    # round 12: the file-stream source is one partition (single-row-
    # group fixture), so the decode kernel ran serially inside the
    # micro-batch; a stateless repartition parallelizes it (measured
    # 4.2 s -> 1.5 s on the ADPCM twin; functions.spread rationale)
    from mapreduce_rust_spark.functions import spread
    stats = spread(with_payload(docs), "doc_id").mapInPandas(
        _audio_alaw_batches, AUDIO_PCM_SCHEMA)
    return _run_to_table(stats, "stream_audio_alaw_stats", "append")


def _audio_alaw_oracle() -> str:
    from mapreduce_rust_spark.llm.multimodal import AUDIO_ALAW_ORACLE
    return AUDIO_ALAW_ORACLE


def stream_audio_float_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``multimodal_audio_float_stats`` — fiftieth
    kappa pair, the fifth STATELESS one: the IEEE-float PCM decode +
    q16 quantization kernel as an append-mode ingest transform, same
    map-only shape as ``stream_audio_alaw_stats`` (per-document
    windows never span batches, so output is row-identical to the
    batch op); same DuckDB oracle."""
    from mapreduce_rust_spark.core.runner import _ensure_self_shipping
    from mapreduce_rust_spark.llm.multimodal import (
        AUDIO_PCM_SCHEMA, _audio_float_batches, with_payload)
    _ensure_self_shipping()
    docs = read_docs_stream(spark, sf_dir).where(F.length("text") >= 1)
    # round 12: the file-stream source is one partition (single-row-
    # group fixture), so the decode kernel ran serially inside the
    # micro-batch; a stateless repartition parallelizes it (measured
    # 4.2 s -> 1.5 s on the ADPCM twin; functions.spread rationale)
    from mapreduce_rust_spark.functions import spread
    stats = spread(with_payload(docs), "doc_id").mapInPandas(
        _audio_float_batches, AUDIO_PCM_SCHEMA)
    return _run_to_table(stats, "stream_audio_float_stats", "append")


def _audio_float_oracle() -> str:
    from mapreduce_rust_spark.llm.multimodal import AUDIO_FLOAT_ORACLE
    return AUDIO_FLOAT_ORACLE


def stream_grid_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``analytic.grid_median_event_value`` —
    fifty-first kappa pair: the per-type value-median monitor whose
    ENTIRE state is the fixed-boundary grid-cell table (≤ ~200
    (type, bucket) counts per type — bounded regardless of event
    cardinality, the state-size contrast to a reservoir or full
    value log). Cells are order-independent mergeable counts, so any
    micro-batching yields the identical table; the median readout
    runs batch-side on the result. Same integer-arithmetic oracle.
    """
    from mapreduce_rust_spark.operators.analytic import (
        grid_median_cells, grid_median_readout)
    ev = read_events_stream(spark, sf_dir)
    out = _run_to_table(grid_median_cells(ev), "stream_grid_median",
                        "complete")
    return grid_median_readout(out)


def _grid_median_oracle() -> str:
    from mapreduce_rust_spark.operators.analytic import GRID_MEDIAN_ORACLE
    return GRID_MEDIAN_ORACLE


def stream_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.cramers_v_events`` —
    thirty-ninth kappa pair: the (type, weekday) contingency counts
    are ONE complete-mode aggregate (types × 7 state, the
    stream_chisq_cells grid), and the shared closed form completes
    the zero cells, runs the order-fixed fold, and takes the one
    sqrt batch-side. Bit-identical; same oracle."""
    from mapreduce_rust_spark.operators.monitoring import (
        cramers_v_cells, cramers_v_closed_form)
    ev = (read_events_stream(spark, sf_dir)
          .select("event_type",
                  (F.weekday("ts") + 1).cast("long").alias("dow")))
    out = _run_to_table(cramers_v_cells(ev), "stream_cramers_v",
                        "complete")
    return cramers_v_closed_form(out)


def _cramers_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import CRAMERS_V_ORACLE
    return CRAMERS_V_ORACLE


def stream_mood_median_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.mood_median_k_events`` —
    fortieth kappa pair: the (type, cents) value counts are ONE
    complete-mode mergeable aggregate (the mw_value_counts state
    shape keyed by type), and the shared closed form derives the
    grand median and the cleared per-type terms batch-side.
    Bit-identical (pure integer chain); same oracle."""
    from mapreduce_rust_spark.operators.monitoring import (
        mood_k_cells, mood_k_closed_form)
    ev = read_events_stream(spark, sf_dir)
    out = _run_to_table(mood_k_cells(ev), "stream_mood_median_k",
                        "complete")
    return mood_k_closed_form(out)


def _mood_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import (
        MOOD_MEDIAN_K_ORACLE)
    return MOOD_MEDIAN_K_ORACLE


def stream_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.cox_stuart_events`` —
    forty-first kappa pair, seventh consumer of the (type, day)
    grid family: the per-day value sums are ONE complete-mode
    aggregate (``bartels_daily_cells``), and the shared closed form
    runs the half-offset sign scan batch-side. Bit-identical; same
    oracle."""
    from mapreduce_rust_spark.operators.monitoring import (
        bartels_daily_cells, cox_stuart_closed_form)
    ev = read_events_stream(spark, sf_dir)
    out = _run_to_table(bartels_daily_cells(ev), "stream_cox_stuart",
                        "complete")
    return cox_stuart_closed_form(out)


def _cox_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import COX_STUART_ORACLE
    return COX_STUART_ORACLE


def stream_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.hampel_outliers_events`` —
    forty-second kappa pair, eighth consumer of the (type, day) grid
    family: same complete-mode daily cells, with the rolling
    median/MAD flag work batch-side over the dims-sized sink.
    Bit-identical; same oracle."""
    from mapreduce_rust_spark.operators.monitoring import (
        bartels_daily_cells, hampel_closed_form)
    ev = read_events_stream(spark, sf_dir)
    out = _run_to_table(bartels_daily_cells(ev), "stream_hampel",
                        "complete")
    return hampel_closed_form(out)


def _hampel_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import HAMPEL_ORACLE
    return HAMPEL_ORACLE


def stream_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.odds_ratio_events`` —
    forty-third kappa pair: the per-user conversion flag is the SAME
    idempotent-max aggregate the two-proportion twin maintains (one
    bit per user), and the shared closed form clears OR/RR
    batch-side. Bit-identical; same oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        or_closed_form, two_prop_user_conv)
    ev = read_events_stream(spark, sf_dir)
    out = _run_to_table(two_prop_user_conv(ev), "stream_odds_ratio",
                        "complete")
    return or_closed_form(out)


def _or_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import ODDS_RATIO_ORACLE
    return ODDS_RATIO_ORACLE


def stream_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.friedman_events`` —
    forty-fourth kappa pair: the (user, daypart) value sums are ONE
    complete-mode mergeable aggregate (user×4 state — the
    user-dims-sized class), and the shared closed form filters to
    complete blocks and ranks within user batch-side. Bit-identical
    (pure integer chain); same oracle. The closed form branches the
    cells (complete-block filter + rank grid), so it checkpoints
    internally."""
    from mapreduce_rust_spark.operators.experiment import (
        friedman_cells, friedman_closed_form)
    ev = read_events_stream(spark, sf_dir)
    out = _run_to_table(friedman_cells(ev), "stream_friedman",
                        "complete")
    return friedman_closed_form(out)


def _friedman_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import FRIEDMAN_ORACLE
    return FRIEDMAN_ORACLE


def stream_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.cohens_d_events`` — forty-fifth
    kappa pair, and the SMALLEST state in the fleet alongside the CA
    twin: the six exact sufficient statistics (n/Σx/Σx² per arm) are
    ONE no-key complete-mode aggregate, and the shared readout runs
    the fixed effect-size DAG batch-side. Bit-identical; same
    oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        cohens_agg, cohens_readout)
    ev = (read_events_stream(spark, sf_dir)
          .select((F.col("user_id") % 2 == 1).alias("treat"),
                  F.round(F.col("value") * 100).cast("long").alias("vc")))
    out = _run_to_table(cohens_agg(ev), "stream_cohens_d", "complete")
    return cohens_readout(out)


def _cohens_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import COHENS_D_ORACLE
    return COHENS_D_ORACLE


def stream_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.hodges_lehmann_events`` —
    forty-sixth kappa pair, fourth consumer of the Mann–Whitney
    value-count cells: the dime-grid difference cross join and the
    nearest-rank median run batch-side over the dims-sized sink.
    Bit-identical (pure integer chain); same oracle. The closed form
    branches the cells (two arm projections), so the MemorySink
    table is checkpointed first."""
    from mapreduce_rust_spark.operators.experiment import hl_closed_form
    out = _mw_stream_cells(spark, sf_dir, "stream_hodges_lehmann")
    return hl_closed_form(out.localCheckpoint(eager=False))


def _hl_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import (
        HODGES_LEHMANN_ORACLE)
    return HODGES_LEHMANN_ORACLE


def stream_gmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``olap.gini_mean_difference_orders`` —
    forty-seventh kappa pair, on the ORDERS feed: the cents
    value-count grid is ONE complete-mode aggregate (range-bounded
    state, the stream_tukey_fences shape without the priority key),
    and the sorted-cumsum |diff| algebra runs batch-side.
    Bit-identical; same oracle."""
    from mapreduce_rust_spark.operators.olap import (
        gmd_cells, gmd_closed_form)
    orders = read_orders_stream(spark, sf_dir)
    out = _run_to_table(gmd_cells(orders), "stream_gmd", "complete")
    return gmd_closed_form(out)


def _gmd_oracle() -> str:
    from mapreduce_rust_spark.operators.olap import GMD_ORACLE
    return GMD_ORACLE


def stream_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.kendall_tau_events`` —
    forty-eighth kappa pair: the per-user (activity, spend) sums are
    ONE complete-mode mergeable aggregate (user-dims-sized state,
    the stream_two_proportion class), and the shared closed form
    runs the decile ranking and the ≤100-cell pair scan batch-side.
    Bit-identical (exact pair counts + one shared IEEE DAG); same
    oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        tau_closed_form, tau_user_cells)
    ev = read_events_stream(spark, sf_dir)
    out = _run_to_table(tau_user_cells(ev), "stream_kendall_tau",
                        "complete")
    return tau_closed_form(out)


def _tau_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import (
        KENDALL_TAU_ORACLE)
    return KENDALL_TAU_ORACLE


def stream_audio_adpcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``multimodal_audio_adpcm_stats`` —
    twenty-ninth kappa pair, the second STATELESS one: the IMA-ADPCM
    decode kernel as an append-mode ingest transform, same map-only
    shape as ``stream_audio_pcm_stats`` (per-document blocks never
    span batches, so output is row-identical to the batch op); same
    DuckDB oracle."""
    from mapreduce_rust_spark.core.runner import _ensure_self_shipping
    from mapreduce_rust_spark.llm.multimodal import (
        AUDIO_ADPCM_SCHEMA, _audio_adpcm_batches, with_payload)
    _ensure_self_shipping()
    docs = read_docs_stream(spark, sf_dir).where(F.length("text") >= 1)
    # round 12: the file-stream source is one partition (single-row-
    # group fixture), so the decode kernel ran serially inside the
    # micro-batch; a stateless repartition parallelizes it (measured
    # 4.2 s -> 1.5 s on the ADPCM twin; functions.spread rationale)
    from mapreduce_rust_spark.functions import spread
    stats = spread(with_payload(docs), "doc_id").mapInPandas(
        _audio_adpcm_batches, AUDIO_ADPCM_SCHEMA)
    return _run_to_table(stats, "stream_audio_adpcm_stats", "append")


def _audio_adpcm_oracle() -> str:
    from mapreduce_rust_spark.llm.multimodal import AUDIO_ADPCM_ORACLE
    return AUDIO_ADPCM_ORACLE


def stream_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.mann_kendall_events`` —
    twenty-first kappa pair: the per-(type, day) count grid is ONE
    complete-mode mergeable aggregate (dims-sized state, the Fano
    twin's shape), and the shared closed form runs the day-pair sign
    sum + tie correction batch-side. Bit-identical (exact integer S /
    n / variance numerator, same 3-op IEEE z DAG); same DuckDB
    oracle. The closed form self-joins the cells, so the MemorySink
    table is checkpointed first (stream_retention_triangle lesson)."""
    from mapreduce_rust_spark.operators.monitoring import (
        mk_closed_form, mk_daily_cells)
    ev = read_events_stream(spark, sf_dir)
    daily = mk_daily_cells(ev)
    out = _run_to_table(daily, "stream_mann_kendall", "complete")
    return mk_closed_form(out.localCheckpoint(eager=False))


def _mk_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import (
        MANN_KENDALL_ORACLE)
    return MANN_KENDALL_ORACLE


def stream_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.page_hinkley_events`` —
    thirtieth kappa pair (registered round 10 after the ADPCM
    twin): the per-(type, day) value-sum grid is ONE complete-mode
    mergeable aggregate (dims-sized state), and the shared closed
    form runs the cleared running-min/argmax scan batch-side over the
    day grid. Bit-identical (pure BIGINT chain); same DuckDB oracle.
    The closed form branches the cells (totals + prefix), so the
    MemorySink table is checkpointed first."""
    from mapreduce_rust_spark.operators.monitoring import (
        ph_closed_form, ph_daily_cells)
    ev = read_events_stream(spark, sf_dir)
    daily = ph_daily_cells(ev)
    out = _run_to_table(daily, "stream_page_hinkley", "complete")
    return ph_closed_form(out.localCheckpoint(eager=False))


def _ph_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import (
        PAGE_HINKLEY_ORACLE)
    return PAGE_HINKLEY_ORACLE


def _mw_stream_cells(spark: SparkSession, sf_dir: str, sink: str) -> DataFrame:
    """The Mann–Whitney family's (vc, ct, cc) value-count cells as a
    complete-mode streaming aggregate — shared by the MW twin and the
    round-10 rank-biserial / QTE twins (one mergeable dims-grid
    state, the kappa family's canonical shape)."""
    ev = (read_events_stream(spark, sf_dir)
          .select((F.col("user_id") % 2 == 1).alias("treat"),
                  F.round(F.col("value") * 100).cast("long").alias("vc")))
    cnt = (ev.groupBy("vc")
           .agg(F.sum(F.when(F.col("treat"), 1).otherwise(0))
                .cast("long").alias("ct"),
                F.sum(F.when(~F.col("treat"), 1).otherwise(0))
                .cast("long").alias("cc")))
    return _run_to_table(cnt, sink, "complete")


def stream_rank_biserial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.rank_biserial_events`` —
    thirty-first kappa pair: the U test's twin already maintains the
    value-count cells; the effect-size readout rides the same state,
    so a live dashboard publishes significance AND magnitude from one
    aggregate. Bit-identical (pure integer chain); same oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        mw_closed_form, rb_from_mw)
    out = _mw_stream_cells(spark, sf_dir, "stream_rank_biserial")
    return rb_from_mw(mw_closed_form(out.localCheckpoint(eager=False)))


def _rb_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import (
        RANK_BISERIAL_ORACLE)
    return RANK_BISERIAL_ORACLE


def stream_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.qte_events`` — thirty-second
    kappa pair, third consumer of the MW cells: per-arm nearest-rank
    quantiles are a closed-form read of the complete-mode value grid
    (the stream_ship_delay_percentiles shape on the experiment
    surface). Bit-identical; same oracle."""
    from mapreduce_rust_spark.operators.experiment import qte_closed_form
    out = _mw_stream_cells(spark, sf_dir, "stream_qte")
    return qte_closed_form(out.localCheckpoint(eager=False))


def _qte_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import QTE_ORACLE
    return QTE_ORACLE


def stream_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.runs_test_events`` —
    thirty-third kappa pair, fifth consumer of the Mann–Kendall
    (type, day) count grid: the median, sign sequence, lag, and run
    count are all batch-side closed-form work over the dims-sized
    sink. Bit-identical; same oracle."""
    from mapreduce_rust_spark.operators.monitoring import (
        mk_daily_cells, runs_closed_form)
    ev = read_events_stream(spark, sf_dir)
    daily = mk_daily_cells(ev)
    out = _run_to_table(daily, "stream_runs_test", "complete")
    return runs_closed_form(out.localCheckpoint(eager=False))


def _runs_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import RUNS_TEST_ORACLE
    return RUNS_TEST_ORACLE


def stream_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``dataquality.tukey_fences_orders`` —
    thirty-fourth kappa pair, on the ORDERS feed: the (priority,
    cents) value-count cells are one complete-mode aggregate
    (range-bounded state), and the fence + tail-count readout is
    closed-form over the sink. Bit-identical; same oracle. The
    closed form branches the cells (quartiles + tail counts), so the
    MemorySink table is checkpointed first."""
    from mapreduce_rust_spark.operators.dataquality import (
        tukey_closed_form)
    o = (read_orders_stream(spark, sf_dir)
         .select("o_orderpriority",
                 F.round(F.col("o_totalprice") * 100).cast("long")
                  .alias("vc")))
    cells = (o.groupBy("o_orderpriority", "vc")
             .agg(F.count("*").cast("long").alias("c")))
    out = _run_to_table(cells, "stream_tukey_fences", "complete")
    return tukey_closed_form(out.localCheckpoint(eager=False))


def _tukey_oracle() -> str:
    from mapreduce_rust_spark.operators.dataquality import (
        TUKEY_FENCES_ORACLE)
    return TUKEY_FENCES_ORACLE


def stream_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.mcnemar_events`` — thirty-fifth
    kappa pair: the per-user (pre, post) purchase flags are ONE
    complete-mode idempotent-max aggregate (two bits per user — the
    stream_two_proportion shape), and the shared closed form counts
    the discordant pairs and clears the (b−c)²/(b+c) statistic
    batch-side. Bit-identical (pure integer chain); same oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        mcnemar_closed_form, mcnemar_user_flags)
    ev = read_events_stream(spark, sf_dir)
    flags = mcnemar_user_flags(ev)
    out = _run_to_table(flags, "stream_mcnemar", "complete")
    return mcnemar_closed_form(out)


def _mcnemar_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import MCNEMAR_ORACLE
    return MCNEMAR_ORACLE


def stream_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.jonckheere_events`` —
    thirty-sixth kappa pair: the (daypart, cents) value-count cells
    are ONE complete-mode mergeable aggregate (4 × values grid —
    the mw_value_counts state shape with an ordered group key), and
    the shared closed form runs the doubled-tie-credit pair scan and
    the z DAG batch-side over the dims grid. Bit-identical; same
    oracle. The closed form branches the cells (grid + group sizes),
    so the MemorySink table is checkpointed inside it."""
    from mapreduce_rust_spark.operators.experiment import (
        jt_cells, jt_closed_form)
    ev = read_events_stream(spark, sf_dir)
    cells = jt_cells(ev)
    out = _run_to_table(cells, "stream_jonckheere", "complete")
    return jt_closed_form(out)


def _jt_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import JONCKHEERE_ORACLE
    return JONCKHEERE_ORACLE


def stream_bartels_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.bartels_rank_events`` —
    thirty-seventh kappa pair, sixth consumer of the (type, day)
    grid family: the per-day value sums are ONE complete-mode
    mergeable aggregate (dims-sized state, the stream_page_hinkley
    shape), and the shared closed form runs the doubled-midrank
    differencing batch-side over the sink. Bit-identical (pure
    BIGINT chain); same oracle. The closed form branches the cells
    (ranks + counts), so it checkpoints internally."""
    from mapreduce_rust_spark.operators.monitoring import (
        bartels_closed_form, bartels_daily_cells)
    ev = read_events_stream(spark, sf_dir)
    daily = bartels_daily_cells(ev)
    out = _run_to_table(daily, "stream_bartels_rank", "complete")
    return bartels_closed_form(out)


def _bartels_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import BARTELS_ORACLE
    return BARTELS_ORACLE


def stream_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.srm_check_events`` —
    twenty-second kappa pair, and the guardrail's natural home: SRM
    is monitored LIVE during a rollout (catching broken randomization
    after the experiment ends is too late). The (type, arm) traffic
    counts are ONE complete-mode mergeable aggregate (types × 2
    state rows — the smallest state grid in the engine alongside the
    two-proportion twin), and the shared closed form emits the
    chi-square + flag batch-side. Bit-identical; same DuckDB
    oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        srm_arm_counts, srm_closed_form)
    ev = read_events_stream(spark, sf_dir)
    cells = srm_arm_counts(ev)
    out = _run_to_table(cells, "stream_srm_check", "complete")
    return srm_closed_form(out)


def _srm_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import SRM_ORACLE
    return SRM_ORACLE


def stream_weco_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.weco_rules_events`` —
    twenty-third kappa pair, sharing the Mann–Kendall twin's
    (type, day) count cells (one complete-mode aggregate, dims-sized
    state) with the cleared-inequality zone tests run batch-side.
    This is how SPC alarms deploy in practice: maintain the daily
    grid live, evaluate the rule windows on read. Bit-identical
    (pure integer comparisons); same DuckDB oracle."""
    from mapreduce_rust_spark.operators.monitoring import (
        mk_daily_cells, weco_closed_form)
    ev = read_events_stream(spark, sf_dir)
    daily = mk_daily_cells(ev)
    out = _run_to_table(daily, "stream_weco_rules", "complete")
    return weco_closed_form(out.localCheckpoint(eager=False))


def _weco_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import WECO_ORACLE
    return WECO_ORACLE


def stream_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.kruskal_wallis_events`` —
    twenty-fourth kappa pair: the per-(group, distinct cents value)
    counts are ONE complete-mode aggregate (state = groups × cents
    grid, the Mann–Whitney twin's dims bound times k), and the shared
    closed form derives the doubled midranks and the tie-corrected H
    batch-side. The k-sample rank test as a LIVE multi-variant
    monitor. Bit-identical to the batch op (pure integer floor-DIV
    ppm); same DuckDB oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        kruskal_wallis_closed_form, kw_value_counts)
    ev = (read_events_stream(spark, sf_dir)
          .select("event_type",
                  F.round(F.col("value") * 100).cast("long").alias("vc")))
    cells = kw_value_counts(ev)
    out = _run_to_table(cells, "stream_kruskal_wallis", "complete")
    # the closed form fans the cells into pooled/per-group/tie branches
    return kruskal_wallis_closed_form(out.localCheckpoint(eager=False))


def _kw_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import (
        KRUSKAL_WALLIS_ORACLE)
    return KRUSKAL_WALLIS_ORACLE


def stream_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.brown_forsythe_events`` —
    twenty-fifth kappa pair: the (vc, ct, cc) arm counts are the
    SAME mergeable Mann–Whitney sufficient statistic (one
    complete-mode aggregate over the cents grid) that already backs
    the median-sign twin, and the shared closed form selects the
    per-arm medians and finishes W batch-side — a live dispersion
    guardrail next to the live location tests. Bit-identical to the
    batch op (order statistics and integer floor-DIV ppm only); same
    DuckDB oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        brown_forsythe_closed_form, mw_value_counts)
    ev = (read_events_stream(spark, sf_dir)
          .select((F.col("user_id") % 2 == 1).alias("treat"),
                  F.round(F.col("value") * 100).cast("long").alias("vc")))
    cnt = mw_value_counts(ev)
    out = _run_to_table(cnt, "stream_brown_forsythe", "complete")
    # the closed form fans the cells into median/deviation branches
    return brown_forsythe_closed_form(out.localCheckpoint(eager=False))


def _bf_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import (
        BROWN_FORSYTHE_ORACLE)
    return BROWN_FORSYTHE_ORACLE


def stream_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.pettitt_changepoint_events`` —
    twenty-sixth kappa pair, third consumer of the Mann–Kendall
    twin's (type, day) count cells (one complete-mode aggregate,
    dims-sized state), with the rank prefix statistic and the argmax
    run batch-side. The homogeneity screen as a LIVE monitor: the
    detected split point updates as days accumulate. Bit-identical
    to the batch op (pure integer doubled-midrank prefix sums); same
    DuckDB oracle."""
    from mapreduce_rust_spark.operators.monitoring import (
        mk_daily_cells, pettitt_closed_form)
    ev = read_events_stream(spark, sf_dir)
    daily = mk_daily_cells(ev)
    out = _run_to_table(daily, "stream_pettitt_changepoint", "complete")
    # checkpoint: the closed form SELF-JOINS the cells (grid ⋈ rank
    # table) and a MemorySink view can't resolve conflicting refs
    return pettitt_closed_form(out.localCheckpoint(eager=False))


def _pettitt_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import PETTITT_ORACLE
    return PETTITT_ORACLE


def stream_ca_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``experiment.ca_trend_events`` —
    twenty-seventh kappa pair, and the SMALLEST state in the fleet:
    the per-daypart (traffic, successes) cells are one complete-mode
    aggregate with exactly 4 rows, and the shared closed form
    finishes the dose-response z² batch-side. A conversion-trend
    guardrail that is live by construction. Bit-identical to the
    batch op (integer sufficient statistics, one floor-DIV ppm);
    same DuckDB oracle."""
    from mapreduce_rust_spark.operators.experiment import (
        ca_daypart_cells, ca_trend_closed_form)
    ev = read_events_stream(spark, sf_dir)
    cells = ca_daypart_cells(ev)
    out = _run_to_table(cells, "stream_ca_trend", "complete")
    return ca_trend_closed_form(out)


def _ca_oracle() -> str:
    from mapreduce_rust_spark.operators.experiment import CA_TREND_ORACLE
    return CA_TREND_ORACLE


def stream_seasonal_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``monitoring.seasonal_kendall_events`` —
    twenty-eighth kappa pair, fourth consumer of the Mann–Kendall
    twin's (type, day) count cells (one complete-mode aggregate,
    dims-sized state); the season key and the within-season pair
    statistics derive batch-side. The seasonality-proof trend test
    as a LIVE monitor. Bit-identical to the batch op (integer S/Var
    sums, the shared one-division/one-sqrt/one-division IEEE DAG);
    same DuckDB oracle."""
    from mapreduce_rust_spark.operators.monitoring import (
        mk_daily_cells, sk_closed_form)
    ev = read_events_stream(spark, sf_dir)
    daily = mk_daily_cells(ev)
    out = _run_to_table(daily, "stream_seasonal_kendall", "complete")
    # checkpoint: the closed form SELF-JOINS the day grid (the
    # Pettitt-twin MemorySink conflicting-refs lesson)
    return sk_closed_form(out.localCheckpoint(eager=False))


def _sk_oracle() -> str:
    from mapreduce_rust_spark.operators.monitoring import (
        SEASONAL_KENDALL_ORACLE)
    return SEASONAL_KENDALL_ORACLE


REGISTRATIONS = [
    ("stream_tumbling_counts", stream_tumbling_counts, STREAM_TUMBLING_ORACLE),
    ("stream_tumbling_append", stream_tumbling_append,
     STREAM_TUMBLING_APPEND_ORACLE),
    ("stream_trend_ols", stream_trend_ols, STREAM_TREND_ORACLE),
    # twins share the batch op's oracle on purpose (kappa parity)
    ("stream_dow_profile", stream_dow_profile, _dow_oracle()),
    ("stream_chisq_cells", stream_chisq_cells, _chisq_oracle()),
    ("stream_approx_distinct_users", stream_approx_distinct_users,
     _approx_distinct_oracle()),
    ("stream_static_enrich", stream_static_enrich,
     STREAM_STATIC_ENRICH_ORACLE),
    ("stream_sliding_counts", stream_sliding_counts, STREAM_SLIDING_ORACLE),
    ("stream_session_windows", stream_session_windows, STREAM_SESSION_ORACLE),
    ("stream_interval_join", stream_interval_join, INTERVAL_JOIN_ORACLE),
    ("stream_interval_join_left", stream_interval_join_left,
     STREAM_INTERVAL_LEFT_ORACLE),
    ("stream_dedup_users", stream_dedup_users, STREAM_DEDUP_ORACLE),
    # twin shares the batch op's oracle (kappa parity)
    ("stream_active_users_7d", stream_active_users_7d,
     _active_7d_oracle()),
    ("stream_mannwhitney", stream_mannwhitney, _mw_oracle()),
    ("stream_fano_burstiness", stream_fano_burstiness, _fano_oracle()),
    ("stream_strat_effect", stream_strat_effect, _strat_oracle()),
    ("stream_two_proportion", stream_two_proportion, _two_prop_oracle()),
    ("stream_retention_triangle", stream_retention_triangle,
     _retention_oracle()),
    ("stream_winsorized_delta", stream_winsorized_delta,
     _winsorized_oracle()),
    ("stream_isotonic_calibration", stream_isotonic_calibration,
     _isotonic_oracle()),
    ("stream_sla_business_days", stream_sla_business_days,
     _sla_oracle()),
    ("stream_shuffle_quality", stream_shuffle_quality, _shufq_oracle()),
    ("stream_t_closeness", stream_t_closeness, _tclose_oracle()),
    ("stream_median_sign_test", stream_median_sign_test,
     _median_sign_oracle()),
    ("stream_ship_delay_percentiles", stream_ship_delay_percentiles,
     _ship_delay_oracle()),
    ("stream_len_quantiles", stream_len_quantiles,
     _len_quantiles_oracle()),
    ("stream_audio_pcm_stats", stream_audio_pcm_stats,
     _audio_pcm_oracle()),
    ("stream_audio_adpcm_stats", stream_audio_adpcm_stats,
     _audio_adpcm_oracle()),
    ("stream_mann_kendall", stream_mann_kendall, _mk_oracle()),
    ("stream_page_hinkley", stream_page_hinkley, _ph_oracle()),
    ("stream_rank_biserial", stream_rank_biserial, _rb_oracle()),
    ("stream_qte", stream_qte, _qte_oracle()),
    ("stream_runs_test", stream_runs_test, _runs_oracle()),
    ("stream_tukey_fences", stream_tukey_fences, _tukey_oracle()),
    ("stream_srm_check", stream_srm_check, _srm_oracle()),
    ("stream_weco_rules", stream_weco_rules, _weco_oracle()),
    ("stream_kruskal_wallis", stream_kruskal_wallis, _kw_oracle()),
    ("stream_brown_forsythe", stream_brown_forsythe, _bf_oracle()),
    ("stream_pettitt_changepoint", stream_pettitt_changepoint,
     _pettitt_oracle()),
    ("stream_ca_trend", stream_ca_trend, _ca_oracle()),
    ("stream_seasonal_kendall", stream_seasonal_kendall, _sk_oracle()),
    ("stream_mcnemar", stream_mcnemar, _mcnemar_oracle()),
    ("stream_jonckheere", stream_jonckheere, _jt_oracle()),
    ("stream_bartels_rank", stream_bartels_rank, _bartels_oracle()),
    ("stream_audio_ulaw_stats", stream_audio_ulaw_stats,
     _audio_ulaw_oracle()),
    ("stream_audio_alaw_stats", stream_audio_alaw_stats,
     _audio_alaw_oracle()),
    ("stream_audio_float_stats", stream_audio_float_stats,
     _audio_float_oracle()),
    ("stream_grid_median", stream_grid_median,
     _grid_median_oracle()),
    ("stream_cramers_v", stream_cramers_v, _cramers_oracle()),
    ("stream_mood_median_k", stream_mood_median_k, _mood_oracle()),
    ("stream_cox_stuart", stream_cox_stuart, _cox_oracle()),
    ("stream_hampel", stream_hampel, _hampel_oracle()),
    ("stream_odds_ratio", stream_odds_ratio, _or_oracle()),
    ("stream_friedman", stream_friedman, _friedman_oracle()),
    ("stream_cohens_d", stream_cohens_d, _cohens_oracle()),
    ("stream_hodges_lehmann", stream_hodges_lehmann, _hl_oracle()),
    ("stream_gmd", stream_gmd, _gmd_oracle()),
    ("stream_kendall_tau", stream_kendall_tau, _tau_oracle()),
]
