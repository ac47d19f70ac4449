"""Behavioral checks for duplicate-span extraction, strided
chunking, rolling z-score anomalies, and TV drift (bit-level
correctness is covered by the DuckDB oracle mirror; these pin the
semantics on planted inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


def _doc(doc_id, words):
    return (doc_id, " ".join(words))


def test_dup_spans_finds_planted_maximal_run(spark):
    """Two docs share a 12-token run; with w=8 that is 5 consecutive
    duplicated windows → ONE maximal span of span_tokens=12 in each
    doc, starting at the planted offset. Unique docs yield nothing."""
    from mapreduce_rust_spark.llm.spans import dup_spans
    shared = [f"s{i}" for i in range(12)]
    a = [f"a{i}" for i in range(10)] + shared + [f"A{i}" for i in range(10)]
    b = [f"b{i}" for i in range(4)] + shared + [f"B{i}" for i in range(7)]
    c = [f"c{i}" for i in range(30)]
    docs = spark.createDataFrame(
        [_doc(1, a), _doc(2, b), _doc(3, c)], ["doc_id", "text"])
    rows = {r.doc_id: r for r in dup_spans(docs, w=8).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].span_start == 10 and rows[1].span_tokens == 12
    assert rows[2].span_start == 4 and rows[2].span_tokens == 12
    assert rows[1].n_windows == rows[2].n_windows == 5


def test_dup_spans_flags_within_doc_repeat(spark):
    """A doc repeating its own 8-gram is self-duplicated (Lee et al.
    semantics) even with no other doc involved."""
    from mapreduce_rust_spark.llm.spans import dup_spans
    run = [f"r{i}" for i in range(8)]
    solo = run + ["x", "y"] + run
    docs = spark.createDataFrame([_doc(1, solo)], ["doc_id", "text"])
    rows = sorted(dup_spans(docs, w=8).collect(),
                  key=lambda r: r.span_start)
    assert [r.span_start for r in rows] == [0, 10]
    assert all(r.span_tokens == 8 for r in rows)


def test_chunk_stride_covers_and_overlaps(spark):
    """Chunks must (a) start every CHUNK_S tokens, (b) overlap by
    C−S tokens, (c) jointly cover every token, (d) reconstruct the
    doc from stride-slices."""
    from mapreduce_rust_spark.llm.spans import (
        CHUNK_C, CHUNK_S, chunk_stride)
    n = 200
    words = [f"w{i}" for i in range(n)]
    docs = spark.createDataFrame([_doc(7, words)], ["doc_id", "text"])
    rows = sorted(chunk_stride(docs).collect(), key=lambda r: r.chunk_id)
    # expected chunk count: 1 + ceil((200-64)/48) = 1 + ceil(136/48) = 4
    assert len(rows) == 4
    seen = set()
    for r in rows:
        toks = r.chunk.split(" ")
        start = r.chunk_id * CHUNK_S
        assert toks == words[start:start + CHUNK_C]
        assert r.n_tokens == len(toks) == min(CHUNK_C, n - start)
        seen.update(range(start, start + r.n_tokens))
    assert seen == set(range(n))
    # consecutive chunks overlap by C - S tokens
    assert rows[0].chunk.split(" ")[CHUNK_S:] == \
        rows[1].chunk.split(" ")[:CHUNK_C - CHUNK_S]


def test_chunk_stride_short_doc_single_chunk(spark):
    from mapreduce_rust_spark.llm.spans import chunk_stride
    docs = spark.createDataFrame(
        [_doc(1, ["only", "three", "words"]), (2, "   ")],
        ["doc_id", "text"])
    rows = chunk_stride(docs).collect()
    assert len(rows) == 1  # whitespace-only doc yields nothing
    assert rows[0].doc_id == 1 and rows[0].chunk_id == 0
    assert rows[0].n_tokens == 3 and rows[0].chunk == "only three words"


def test_zscore_flags_planted_spike_only(spark):
    """120 flat-value events then one 100× spike, same type+day: only
    the spike (and nothing in the flat tail after it re-inflates the
    variance) is anomalous; the first Z_MIN_N events are unscored."""
    from datetime import datetime, timedelta
    from mapreduce_rust_spark.operators.monitoring import (
        Z_MIN_N, zscore_anomaly)
    t0 = datetime(2024, 3, 1)
    rows = [(i, "click", t0 + timedelta(seconds=i),
             10.0 + (0.01 * (i % 7)))  # tiny jitter, nonzero variance
            for i in range(120)]
    rows.append((120, "click", t0 + timedelta(seconds=120), 1000.0))
    rows += [(121 + i, "click", t0 + timedelta(seconds=121 + i), 10.0)
             for i in range(5)]
    ev = spark.createDataFrame(
        rows, ["event_id", "event_type", "ts", "value"])
    got = {r.event_id: r for r in zscore_anomaly(ev).collect()}
    assert min(got) == Z_MIN_N  # cold start: first 30 unscored
    anomalous = {eid for eid, r in got.items() if r.is_anomaly}
    assert anomalous == {120}


def test_zscore_baseline_resets_per_day(spark):
    """The same spike value is NOT anomalous when the day boundary
    wipes its baseline (fewer than Z_MIN_N predecessors that day)."""
    from datetime import datetime, timedelta
    from mapreduce_rust_spark.operators.monitoring import zscore_anomaly
    d1 = datetime(2024, 3, 1, 23, 0)
    rows = [(i, "click", d1 + timedelta(seconds=i), 10.0 + 0.01 * (i % 7))
            for i in range(60)]
    # next day: spike arrives with only 3 same-day predecessors
    d2 = datetime(2024, 3, 2, 0, 0)
    rows += [(100 + i, "click", d2 + timedelta(seconds=i), 10.0)
             for i in range(3)]
    rows.append((200, "click", d2 + timedelta(seconds=10), 1000.0))
    ev = spark.createDataFrame(
        rows, ["event_id", "event_type", "ts", "value"])
    got = {r.event_id for r in zscore_anomaly(ev).collect()}
    assert 200 not in got  # unscored, not "normal"


def test_tv_drift_zero_for_identical_uniform_slices(spark):
    """Two sources with identical length histograms drift 0 from the
    corpus; a shifted third source drifts strictly more."""
    from mapreduce_rust_spark.operators.monitoring import tv_drift
    rows = []
    for src in ("a", "b"):
        rows += [(src, 100 + 50 * (i % 4)) for i in range(40)]
    rows += [("c", 5000 + 50 * (i % 4)) for i in range(40)]
    docs = spark.createDataFrame(rows, ["source", "n_chars"])
    got = {r.source: r for r in tv_drift(docs).collect()}
    assert got["a"].tv_ppm == got["b"].tv_ppm
    assert got["c"].tv_ppm > got["a"].tv_ppm
    assert all(r.n_docs == 40 for r in got.values())
    # c occupies disjoint buckets from the a+b mass (2/3 of corpus):
    # TV(c, corpus) = 2/3 → 666666 ppm (floor-div grid)
    assert abs(got["c"].tv_ppm - 666_666) <= 4


def test_new_ops_fixture_nondegenerate(spark):
    """On the real fixture: spans exist (fixture has near-dup docs),
    chunks cover the corpus token count, anomalies are scored, drift
    is finite and nonzero somewhere."""
    from mapreduce_rust_spark.llm.spans import (
        chunk_stride_docs, dup_span_docs)
    from mapreduce_rust_spark.operators.monitoring import (
        tv_drift_sources, zscore_anomaly_events)
    assert dup_span_docs(spark, SF_CORRECT).count() > 0
    ch = chunk_stride_docs(spark, SF_CORRECT)
    assert ch.where(F.col("n_tokens") <= 0).count() == 0
    z = zscore_anomaly_events(spark, SF_CORRECT)
    assert z.count() > 0
    tv = tv_drift_sources(spark, SF_CORRECT).collect()
    assert len(tv) == 20 and all(0 <= r.tv_ppm <= 1_000_000 for r in tv)


def test_normalize_text_planted_and_idempotent(spark):
    """Case folds, ASCII punctuation to space, whitespace collapses,
    CJK/accents pass through; normalizing twice is a fixpoint."""
    from mapreduce_rust_spark.llm.textanalysis import normalize_text
    docs = spark.createDataFrame(
        [(1, "Hello,   World!! (test)"),
         (2, "hello world test"),
         (3, "中文 text—with dash"),  # em-dash is non-ASCII: kept
         (4, "")],
        ["doc_id", "text"])
    rows = {r.doc_id: r for r in normalize_text(docs).collect()}
    assert rows[1].norm_text == "hello world test"
    assert rows[1].changed and not rows[2].changed
    # normalized forms of 1 and 2 collide — the dedup key property
    assert rows[1].norm_sha == rows[2].norm_sha
    assert "中文" in rows[3].norm_text and "—" in rows[3].norm_text
    assert rows[4].norm_text == "" and not rows[4].changed
    # idempotence: re-normalizing the normalized text changes nothing
    again = normalize_text(
        spark.createDataFrame(
            [(i, r.norm_text) for i, r in rows.items()],
            ["doc_id", "text"]))
    assert all(not r.changed for r in again.collect())


def test_event_trigrams_hand_computed(spark):
    """The trigram core (same window/lead/agg expressions the
    registry op builds over the events table), hand-checked on a
    planted two-user stream — no trigram crosses a user boundary."""
    from datetime import datetime, timedelta
    t0 = datetime(2024, 1, 1)
    # user 1: a b a b a  -> trigrams aba, bab, aba
    # user 2: a b a      -> aba
    seq1 = ["a", "b", "a", "b", "a"]
    seq2 = ["a", "b", "a"]
    rows = [(i, 1, t0 + timedelta(seconds=i), s, 1.0)
            for i, s in enumerate(seq1)]
    rows += [(10 + i, 2, t0 + timedelta(seconds=i), s, 1.0)
             for i, s in enumerate(seq2)]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"])
    from pyspark.sql import Window as W
    w = W.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    tri = (ev.select(F.col("event_type").alias("e1"),
                     F.lead("event_type", 1).over(w).alias("e2"),
                     F.lead("event_type", 2).over(w).alias("e3"))
             .where(F.col("e3").isNotNull())
             .groupBy("e1", "e2", "e3").agg(F.count("*").alias("n")))
    got = {(r.e1, r.e2, r.e3): r.n for r in tri.collect()}
    assert got == {("a", "b", "a"): 3, ("b", "a", "b"): 1}


from hypothesis import given, settings, strategies as st

# token-id docs over a tiny vocab: repeats within AND across docs
_span_docs = st.lists(
    st.lists(st.integers(min_value=0, max_value=3),
             min_size=0, max_size=20),
    min_size=1, max_size=6)


def _py_dup_spans(docs, w):
    """Pure-Python reference: positional w-windows, corpus-wide
    occurrence counts, maximal runs of duplicated positions."""
    from collections import Counter
    cnt = Counter()
    for _d, t in docs:
        for i in range(len(t) - w + 1):
            cnt[tuple(t[i:i + w])] += 1
    out = set()
    for d, t in docs:
        flagged = [i for i in range(len(t) - w + 1)
                   if cnt[tuple(t[i:i + w])] > 1]
        run_start = None
        prev = None
        for i in flagged + [None]:
            if i is not None and prev is not None and i == prev + 1:
                prev = i
                continue
            if prev is not None:
                n_win = prev - run_start + 1
                out.add((d, run_start, n_win, n_win + w - 1))
            run_start, prev = i, i
    return out


@settings(max_examples=10, deadline=None)
@given(docs=_span_docs)
def test_dup_spans_matches_python_reference(spark, docs):
    """For ANY corpus, the distributed gap-and-islands span extraction
    must equal the brute-force positional reference (w=3 so tiny docs
    exercise the boundary: len == w, len < w, all-duplicate docs)."""
    from mapreduce_rust_spark.llm.spans import dup_spans
    data = [(i, [f"t{x}" for x in toks]) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in data], ["doc_id", "text"])
    got = {(r.doc_id, r.span_start, r.n_windows, r.span_tokens)
           for r in dup_spans(df, w=3).collect()}
    want = _py_dup_spans(data, 3)
    assert got == want


def test_trend_ols_matches_numpy(spark):
    """The closed-form sufficient-statistics slope/intercept/R2 must
    agree with numpy's least squares on the same (x, y) points."""
    import numpy as np
    from mapreduce_rust_spark.operators.monitoring import trend_ols_events
    from mapreduce_rust_spark.tables import load_table
    from tests.conftest import SF_CORRECT

    got = {r.event_type: r for r in
           trend_ols_events(spark, SF_CORRECT).collect()}
    ev = load_table(spark, SF_CORRECT, "events") \
        .select("event_type", F.unix_micros("ts").alias("us"),
                F.round(F.col("value") * 100).cast("long").alias("vc")) \
        .collect()
    us0 = min(r.us for r in ev)
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(
            ((r.us - us0) // 1_000_000, r.vc))
    for t, pts in by_type.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        g = got[t]
        assert abs(g.slope_cents_per_sec - slope) <= 1e-9 * max(1, abs(slope))
        assert abs(g.intercept_cents - intercept) <= 1e-6 * max(1, abs(intercept))
        assert abs(g.r2 - r * r) <= 1e-9
        assert g.n == len(pts)


def test_cusum_finds_planted_level_shift(spark):
    """A series that jumps from level 100 to level 200 at position
    300/500 must peak its CUSUM exactly at the shift point; a flat
    series peaks with a near-zero score."""
    import datetime
    from mapreduce_rust_spark.operators import monitoring
    from mapreduce_rust_spark.tables import load_table

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(500):
        level = 1.00 if i < 300 else 2.00
        rows.append((i, base + datetime.timedelta(seconds=i),
                     "shifted", level))
        rows.append((1000 + i, base + datetime.timedelta(seconds=i),
                     "flat", 1.50))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double")

    import unittest.mock as mock
    with mock.patch.object(monitoring, "load_table",
                           lambda spark_, sf_, name: ev):
        got = {r.event_type: r for r in
               monitoring.cusum_changepoint_events(spark, "ignored")
               .collect()}
    # CUSUM of a level shift peaks AT the last pre-shift point
    assert got["shifted"].changepoint_pos == 300
    assert got["shifted"].n == 500
    # flat series: every deviation is 0, peak score 0
    assert got["flat"].peak_score == 0.0


def test_dow_profile_invariants(spark):
    """Per type: Σ(cell n) = type total, and the n-weighted mean of
    cell means equals the type mean (lift weighted-average = 1)."""
    from mapreduce_rust_spark.operators.monitoring import (
        dow_seasonality_events)
    rows = dow_seasonality_events(spark, SF_CORRECT).collect()
    assert rows and all(1 <= r.dow <= 7 for r in rows)
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, cells in by_type.items():
        n = sum(c.n_events for c in cells)
        wlift = sum(c.dow_lift * c.n_events for c in cells) / n
        assert abs(wlift - 1.0) < 1e-9, (et, wlift)


def test_chisq_cells_margins_consistent(spark):
    """Expected counts must reproduce the observed margins exactly:
    Σ over a row (col) of E equals that row's (col's) observed total
    — the defining property of the independence model."""
    from mapreduce_rust_spark.operators.monitoring import chisq_cells_events
    rows = chisq_cells_events(spark, SF_CORRECT).collect()
    assert rows
    row_o, row_e, col_o, col_e = {}, {}, {}, {}
    for r in rows:
        row_o[r.event_type] = row_o.get(r.event_type, 0) + r.observed
        row_e[r.event_type] = row_e.get(r.event_type, 0.0) + r.expected
        col_o[r.dow] = col_o.get(r.dow, 0) + r.observed
        col_e[r.dow] = col_e.get(r.dow, 0.0) + r.expected
        assert r.chisq_term >= 0.0
    for k in row_o:
        assert abs(row_e[k] - row_o[k]) < 1e-6 * row_o[k]
    for k in col_o:
        assert abs(col_e[k] - col_o[k]) < 1e-6 * col_o[k]


def test_session_paths_planted(spark, tmp_path):
    """Two users with known journeys (one gap-split) — paths and
    session counts are exactly the hand-derived set."""
    import pandas as pd
    from mapreduce_rust_spark.operators.olap import session_path_counts
    base = 1_704_067_200_000_000
    rows = [
        # user 1: A>B then (31-min gap) C
        (1, 1, "A", base), (2, 1, "B", base + 60_000_000),
        (3, 1, "C", base + 60_000_000 + 1860_000_000),
        # user 2: A>B (same path as user 1's first session)
        (4, 2, "A", base), (5, 2, "B", base + 120_000_000),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id",
                                      "event_type", "us"])
    d = str(tmp_path / "events.parquet")
    spark.createDataFrame(pdf).select(
        "event_id", "user_id", "event_type",
        F.lit("{}").alias("props"), F.lit(1.0).alias("value"),
        F.timestamp_micros("us").alias("ts")).write.parquet(d)
    got = {r.path: r.n_sessions
           for r in session_path_counts(spark, str(tmp_path)).collect()}
    assert got == {"A>B": 2, "C": 1}


def test_equidepth_tiles_balanced_and_ordered(spark):
    """Equi-depth contract: tile sizes differ by at most 1, tiles are
    contiguous (max of tile t <= min of tile t+1), and counts sum to
    the table size."""
    from mapreduce_rust_spark.operators.olap import (
        EQUIDEPTH_TILES, equidepth_hist_totalprice)
    from mapreduce_rust_spark.tables import load_table
    rows = sorted(equidepth_hist_totalprice(spark, SF_CORRECT).collect(),
                  key=lambda r: r.tile)
    assert [r.tile for r in rows] == list(range(1, EQUIDEPTH_TILES + 1))
    sizes = {r.n_orders for r in rows}
    assert max(sizes) - min(sizes) <= 1
    total = load_table(spark, SF_CORRECT, "orders").count()
    assert sum(r.n_orders for r in rows) == total
    for a, b in zip(rows, rows[1:]):
        assert a.max_cents <= b.min_cents
