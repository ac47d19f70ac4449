"""STRICT as-of tie-break contract, pinned on planted tied timestamps.

The fixture's timestamps are near-unique, so oracle parity alone can't
prove the strictness contract (``temporal.py`` module docstring): a
row-frame implementation that silently matched same-ts rows would
still pass at sf0.01. These tests plant exact ties and assert
same-timestamp rows are NEVER matched, in both directions.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import types as T


def _plant_events(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    t = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, t(100), 1, "error", 1.0, "{}"),
        (2, t(100), 1, "click", 1.0, "{}"),      # tied with error @100
        (3, t(200), 1, "error", 1.0, "{}"),
        (4, t(200), 1, "error", 1.0, "{}"),      # two errors tied @200
        (5, t(300), 1, "view", 1.0, "{}"),
        (6, t(300), 1, "purchase", 1.0, "{}"),   # purchase tied with view
        (7, t(400), 1, "purchase", 1.0, "{}"),
    ]
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    sf_dir = tmp_path / "tied_sf"
    sf_dir.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1) \
         .write.parquet(str(sf_dir / "events.parquet"))
    return str(sf_dir)


EPOCH = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())


def test_asof_last_error_excludes_tied_timestamps(spark, tmp_path):
    from mapreduce_rust_spark.operators.temporal import asof_last_error
    sf = _plant_events(spark, tmp_path)
    got = {r.event_id: r.last_error_epoch for r in asof_last_error(spark, sf).collect()}
    assert got == {
        1: None,            # no strictly-earlier error
        2: None,            # the @100 error is TIED, not earlier — excluded
        3: EPOCH + 100,     # the tied @200 twin is excluded
        4: EPOCH + 100,
        5: EPOCH + 200,
        6: EPOCH + 200,
        7: EPOCH + 200,
    }


def test_twa_hand_computed(spark, tmp_path):
    """Time-weighted average on a hand-computable step function:
    user 1 holds value 10 for 10 s, then 20 for 30 s, then a final
    reading that carries zero weight -> TWA = (10·10 + 20·30)/40 =
    17.5 over exactly 2 intervals. A plain AVG would say 11.0 —
    asserting 17.5 pins the step-and-hold semantics, not just parity."""
    import datetime as dt
    from pyspark.sql import types as T
    from mapreduce_rust_spark.operators.temporal import twa_user_value
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base, 1, "view", 10.0, "{}"),
            (2, base + dt.timedelta(seconds=10), 1, "view", 20.0, "{}"),
            (3, base + dt.timedelta(seconds=40), 1, "view", 3.0, "{}")]
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    sf_dir = tmp_path / "twa_sf"
    sf_dir.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1) \
         .write.parquet(str(sf_dir / "events.parquet"))
    got = twa_user_value(spark, str(sf_dir)).collect()
    assert len(got) == 1
    assert got[0]["twa_value"] == 17.5
    assert got[0]["n_intervals"] == 2


def test_asof_next_purchase_excludes_tied_timestamps(spark, tmp_path):
    from mapreduce_rust_spark.operators.temporal import asof_next_purchase
    sf = _plant_events(spark, tmp_path)
    got = {r.event_id: r.next_purchase_epoch
           for r in asof_next_purchase(spark, sf).collect()}
    assert got == {
        1: EPOCH + 300,
        2: EPOCH + 300,
        3: EPOCH + 300,
        4: EPOCH + 300,
        5: EPOCH + 400,     # the @300 purchase is TIED — excluded
        6: EPOCH + 400,     # a purchase never matches itself
        7: None,            # nothing strictly later
    }
