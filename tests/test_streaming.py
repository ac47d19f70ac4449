"""M4 — streaming slice: batch-equivalence and watermark behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _collect_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_stream_tumbling_equals_batch(spark):
    from mapreduce_rust_spark.operators.relational import tumbling_event_counts
    from mapreduce_rust_spark.streaming.windows import stream_tumbling_counts
    cols = ["bucket_start", "event_type", "n", "sum_value"]
    got = _collect_set(stream_tumbling_counts(spark, SF_SMOKE), cols)
    want = _collect_set(tumbling_event_counts(spark, SF_SMOKE), cols)
    assert got == want


def test_stream_session_equals_batch_sessionize(spark):
    """Session-window streaming result must agree with the batch
    gap-based sessionization on session counts per user."""
    from mapreduce_rust_spark.operators.relational import sessionize_events
    from mapreduce_rust_spark.streaming.windows import stream_session_windows
    sess = stream_session_windows(spark, SF_SMOKE)
    got = {r.user_id: r.n for r in
           sess.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    want = {r.user_id: r.n_sessions for r in
            sessionize_events(spark, SF_SMOKE).collect()}
    assert got == want


def test_stateful_totals_match_batch(spark):
    from mapreduce_rust_spark.streaming.stateful import stateful_user_totals
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    want = {r.user_id: r.n for r in
            ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    got = {r.user_id: r.n_events for r in
           stateful_user_totals(spark, SF_SMOKE).collect()}
    assert got == want


def test_watermark_bounds_state(spark):
    """The windowed agg must declare an event-time watermark (bounded
    state at scale); assert it's present in the analyzed plan."""
    from mapreduce_rust_spark.streaming.windows import WATERMARK, read_events_stream
    ev = read_events_stream(spark, SF_SMOKE)
    agg = (ev.withWatermark("ts", WATERMARK)
             .groupBy(F.window("ts", "1 hour")).agg(F.count("*").alias("n")))
    assert "EventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString()
