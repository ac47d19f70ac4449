"""Behavioral checks for the round-5 second crop (Markov transitions,
interpolating gapfill, rolling median, Benford, table checksum, BM25,
PMI collocations, Simpson diversity, vocab overlap, EWMA + twin).
Bit-level correctness is covered by the DuckDB oracle mirror; these
pin semantics and cross-operator consistency on the fixture."""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


# --- markov_transitions_events ----------------------------------------

def test_markov_rows_are_probability_distributions(spark):
    from mapreduce_rust_spark.operators.olap import markov_transitions_events
    rows = markov_transitions_events(spark, SF_CORRECT).collect()
    assert rows
    by_from: dict[str, float] = {}
    for r in rows:
        assert r.n_trans > 0 and 0.0 < r.p_cond <= 1.0
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.p_cond
    for total in by_from.values():
        assert math.isclose(total, 1.0, rel_tol=1e-12)


def test_markov_transition_total_matches_sessionize(spark):
    """Total transitions ≡ Σ(session length − 1): both operators claim
    the same 30-min session boundaries, so the counts must agree."""
    from mapreduce_rust_spark.operators.olap import markov_transitions_events
    from mapreduce_rust_spark.operators.relational import sessionize_events
    n_trans = (markov_transitions_events(spark, SF_CORRECT)
               .agg(F.sum("n_trans")).collect()[0][0])
    sess = sessionize_events(spark, SF_CORRECT)   # per-USER rollup
    agg = sess.agg(F.sum("n_events").alias("ev"),
                   F.sum("n_sessions").alias("se")).collect()[0]
    assert n_trans == agg.ev - agg.se


# --- interp_gapfill_events --------------------------------------------

def test_interp_matches_observed_and_bounds(spark):
    from mapreduce_rust_spark.operators.olap import interp_gapfill_events
    df = interp_gapfill_events(spark, SF_CORRECT)
    # observed hours: interp == hour_value exactly
    assert df.filter(
        F.col("hour_value").isNotNull()
        & (F.col("interp_value") != F.col("hour_value"))).count() == 0
    pdf = df.orderBy("user_id", "hour_epoch").toPandas()
    for _uid, g in pdf.groupby("user_id"):
        obs = g["hour_value"].dropna()
        if obs.empty:
            continue
        lo, hi = obs.min(), obs.max()
        filled = g["interp_value"].dropna()
        # interpolation never exceeds the observed envelope
        assert (filled >= lo - 1e-9).all() and (filled <= hi + 1e-9).all()
        # before first / after last observation stays NULL
        first_obs = g["hour_value"].first_valid_index()
        last_obs = g["hour_value"].last_valid_index()
        assert g.loc[: first_obs - 1, "interp_value"].isna().all() \
            if first_obs is not None and first_obs > g.index[0] else True
        assert g.loc[last_obs + 1:, "interp_value"].isna().all()


# --- rolling_median_orders --------------------------------------------

def test_rolling_median_matches_pandas(spark):
    from mapreduce_rust_spark.operators.analytic import (
        ROLLING_MEDIAN_N, rolling_median_orders)
    from mapreduce_rust_spark.tables import load_table
    got = rolling_median_orders(spark, SF_CORRECT).toPandas()
    orders = (load_table(spark, SF_CORRECT, "orders")
              .filter(F.col("o_custkey") < 300)
              .select("o_custkey", "o_orderkey", "o_orderdate",
                      F.bround(F.col("o_totalprice") * 100).cast("long")
                      .alias("vc"))
              .toPandas()
              .sort_values(["o_custkey", "o_orderdate", "o_orderkey"]))
    exp = (orders.groupby("o_custkey")["vc"]
           .rolling(ROLLING_MEDIAN_N, min_periods=1).median()
           .reset_index(level=0, drop=True) / 100.0)
    orders["expect"] = exp
    merged = got.merge(orders, on=["o_custkey", "o_orderkey"])
    assert len(merged) == len(got) > 0
    assert (merged["rolling_median"] - merged["expect"]).abs().max() < 1e-9
    assert merged["n_window"].max() <= ROLLING_MEDIAN_N


def test_weighted_median_matches_pandas(spark):
    from mapreduce_rust_spark.operators.analytic import (
        weighted_median_price)
    from mapreduce_rust_spark.tables import load_table
    got = {r.l_returnflag: r for r in
           weighted_median_price(spark, SF_CORRECT).collect()}
    li = (load_table(spark, SF_CORRECT, "lineitem")
          .select("l_returnflag", "l_orderkey", "l_linenumber",
                  F.bround(F.col("l_extendedprice") * 100).cast("long")
                  .alias("pc"),
                  F.col("l_quantity").cast("long").alias("q")).toPandas())
    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values(["pc", "l_orderkey", "l_linenumber"])
        tot = g["q"].sum()
        cum = g["q"].cumsum()
        crossing = g.loc[2 * cum >= tot, "pc"].iloc[0]
        assert got[flag].weighted_median_price == crossing / 100.0
        assert got[flag].total_qty == tot


def test_life_table_conserves_spells(spark):
    """Every order opens exactly one spell: Σd = reorders
    (orders − customers), Σc = customers (each censored once), and
    the largest risk set equals total spells; hazards in [0, 1] and
    risk sets shrink as buckets grow."""
    from mapreduce_rust_spark.operators.analytic import life_table_reorders
    from mapreduce_rust_spark.tables import load_table
    rows = sorted(life_table_reorders(spark, SF_CORRECT).collect(),
                  key=lambda r: r.bucket)
    orders = load_table(spark, SF_CORRECT, "orders")
    n_orders = orders.count()
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.d for r in rows) == n_orders - n_cust
    assert sum(r.c for r in rows) == n_cust
    assert rows[0].n_risk == n_orders
    for a, b in zip(rows, rows[1:]):
        assert a.n_risk > b.n_risk or a.n_risk == b.n_risk
        assert b.n_risk == a.n_risk - a.d - a.c
    assert all(0.0 <= r.hazard <= 1.0 for r in rows)


# --- benford_orders ---------------------------------------------------

def test_benford_report_shape_and_exactness(spark):
    from mapreduce_rust_spark.operators.dataquality import (
        BENFORD_EXP_PPM, benford_orders)
    rows = benford_orders(spark, SF_CORRECT).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert sum(BENFORD_EXP_PPM) == 1_000_000
    n = sum(r.n_orders for r in rows)
    for r in rows:
        assert r.obs_ppm == (r.n_orders * 1_000_000) // n
        assert r.exp_ppm == BENFORD_EXP_PPM[r.digit - 1]
        assert r.dev_ppm == r.obs_ppm - r.exp_ppm


# --- table_checksum_orders --------------------------------------------

def test_checksum_is_partition_order_independent(spark):
    """The fingerprint must not depend on row order or partitioning —
    the property that makes shard partials mergeable by addition."""
    from mapreduce_rust_spark.operators.dataquality import (
        table_checksum_orders)
    from mapreduce_rust_spark.tables import load_table
    base = table_checksum_orders(spark, SF_CORRECT).collect()[0]
    orders = load_table(spark, SF_CORRECT, "orders").repartition(17)
    orders.createOrReplaceTempView("_chk_orders")
    # same op over a reshuffled copy via a temp-table round trip
    shuffled = spark.table("_chk_orders")
    canon = F.concat_ws(
        "|", F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"), F.col("o_orderstatus"),
        F.bround(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.col("o_orderdate").cast("string"))
    from mapreduce_rust_spark.operators.dataquality import CHECKSUM_MOD
    h48 = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("long")
    again = (shuffled.agg(F.sum(h48.cast("decimal(38,0)")).alias("s"))
             .select((F.col("s") % F.lit(CHECKSUM_MOD)).cast("long")
                     .alias("checksum")).collect()[0])
    assert base.checksum == again.checksum
    spark.catalog.dropTempView("_chk_orders")


def test_checksum_detects_single_value_change(spark):
    from mapreduce_rust_spark.operators.dataquality import (
        CHECKSUM_MOD, table_checksum_orders)
    from mapreduce_rust_spark.tables import load_table
    base = table_checksum_orders(spark, SF_CORRECT).collect()[0]
    orders = load_table(spark, SF_CORRECT, "orders")
    mutated = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == orders.select(F.min("o_orderkey"))
               .collect()[0][0],
               F.col("o_totalprice") + 0.01).otherwise(
                   F.col("o_totalprice")))
    canon = F.concat_ws(
        "|", F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"), F.col("o_orderstatus"),
        F.bround(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.col("o_orderdate").cast("string"))
    h48 = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("long")
    mut = (mutated.agg(F.sum(h48.cast("decimal(38,0)")).alias("s"))
           .select((F.col("s") % F.lit(CHECKSUM_MOD)).cast("long")
                   .alias("checksum")).collect()[0])
    assert base.checksum != mut.checksum


# --- bm25_search_docs -------------------------------------------------

def test_bm25_matches_pure_python(spark):
    """Re-derive the exact BM25 ranking in pure Python/pandas over the
    fixture and compare doc-by-doc (same float formula, so equality is
    to near-ulp; ranking must match exactly)."""
    from mapreduce_rust_spark.llm.textanalysis import (
        BM25_B, BM25_K1, BM25_TOP_K, SEARCH_TERMS, bm25_search_docs)
    from mapreduce_rust_spark.tables import load_table
    got = bm25_search_docs(spark, SF_CORRECT).toPandas()
    assert 0 < len(got) <= BM25_TOP_K
    docs = load_table(spark, SF_CORRECT, "documents") \
        .select("doc_id", "text").toPandas()
    toks = {r.doc_id: [t for t in r.text.split() if t]
            for r in docs.itertuples()}
    n_docs = len(toks)
    avg_dl = sum(len(v) for v in toks.values()) / n_docs
    df_t = {t: sum(1 for v in toks.values() if t in v)
            for t in SEARCH_TERMS}
    scores = {}
    for did, words in toks.items():
        s = 0.0
        hits = 0
        for t in SEARCH_TERMS:
            tf = words.count(t)
            if not tf:
                continue
            hits += 1
            norm = (tf * (BM25_K1 + 1.0)
                    / (tf + BM25_K1 * (1.0 - BM25_B
                                       + BM25_B * (len(words) / avg_dl))))
            s += norm * (n_docs / df_t[t])
        if hits:
            scores[did] = (s, hits)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
    expect = expect[:BM25_TOP_K]
    assert list(got["doc_id"]) == [d for d, _ in expect]
    for (_, (s, hits)), (_, row) in zip(expect, got.iterrows()):
        assert row["n_terms"] == hits
        assert math.isclose(row["score"], s, rel_tol=1e-9)


# --- collocations_pmi_docs --------------------------------------------

def test_collocations_respect_window_and_support(spark):
    from mapreduce_rust_spark.llm.textanalysis import (
        COLLOC_MIN_COUNT, COLLOC_TOP_K, collocations_pmi_docs)
    rows = collocations_pmi_docs(spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= COLLOC_TOP_K
    for r in rows:
        assert r.w1 <= r.w2                  # canonical pair order
        assert r.c_ab >= COLLOC_MIN_COUNT
        assert r.c_a >= r.c_ab or r.c_b >= r.c_ab
        assert r.lift > 0.0
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


# --- simpson_diversity_sources ----------------------------------------

def test_simpson_bounds_and_token_totals(spark):
    from mapreduce_rust_spark.llm.textanalysis import (
        simpson_diversity_sources)
    from mapreduce_rust_spark.tables import load_table
    rows = simpson_diversity_sources(spark, SF_CORRECT).collect()
    assert rows
    total_direct = (load_table(spark, SF_CORRECT, "documents")
                    .select(F.explode(F.split("text", r"\s+")).alias("t"))
                    .filter(F.col("t") != "").count())
    assert sum(r.n_tokens for r in rows) == total_direct
    for r in rows:
        # 1/vocab (uniform) <= simpson <= 1 (single token)
        assert 1.0 / r.vocab - 1e-12 <= r.simpson <= 1.0
        assert r.vocab <= r.n_tokens


# --- source_vocab_overlap ---------------------------------------------

def test_vocab_overlap_jaccard_bounds(spark):
    from mapreduce_rust_spark.llm.textanalysis import source_vocab_overlap
    rows = source_vocab_overlap(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r.src_a < r.src_b
        assert 0 < r.n_common <= min(r.v_a, r.v_b)
        expect = r.n_common / (r.v_a + r.v_b - r.n_common)
        assert math.isclose(r.jaccard, expect, rel_tol=1e-12)


# --- ewma_user_value + streaming twin ---------------------------------

def _py_ewma(vals):
    s = None
    for v in vals:
        s = float(v) if s is None else (float(v) + s) / 2.0
    return s / 100.0


def test_ewma_matches_pure_python(spark):
    from mapreduce_rust_spark.operators.temporal import ewma_user_value
    from mapreduce_rust_spark.tables import load_table
    got = {r.user_id: r for r in
           ewma_user_value(spark, SF_CORRECT).collect()}
    ev = (load_table(spark, SF_CORRECT, "events")
          .select("user_id", F.unix_micros("ts").alias("us"), "event_id",
                  F.bround(F.col("value") * 100).cast("long").alias("vc"))
          .toPandas())
    ev = ev.sort_values(["user_id", "us", "event_id"])
    for uid, g in ev.groupby("user_id"):
        expect = _py_ewma(list(g["vc"]))
        assert got[uid].n_events == len(g)
        assert got[uid].ewma == expect      # bit-identical fold


# --- assoc_rules_parts ------------------------------------------------

def test_assoc_rules_internal_consistency(spark):
    from mapreduce_rust_spark.operators.olap import (
        ASSOC_ITEM_MIN, ASSOC_PAIR_MIN, assoc_rules_parts)
    rows = assoc_rules_parts(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b
        assert ASSOC_PAIR_MIN <= r.c_ab <= min(r.c_a, r.c_b)
        assert r.c_a >= ASSOC_ITEM_MIN and r.c_b >= ASSOC_ITEM_MIN
        assert math.isclose(r.conf_ab, r.c_ab / r.c_a, rel_tol=1e-12)
        assert math.isclose(r.conf_ba, r.c_ab / r.c_b, rel_tol=1e-12)


def test_temperature_mix_rates_follow_isqrt_weights(spark):
    """keep_ppm must equal the integer algebra w_d·M DIV n_d with
    w_d = isqrt(n_d) and M = min(n_d·GRID DIV w_d) — recomputed in
    Python with math.isqrt; the binding (smallest-rate-capacity)
    source keeps everything."""
    import math
    from mapreduce_rust_spark.llm.quality import (
        MIX_GRID, temperature_mix_docs)
    rows = temperature_mix_docs(spark, SF_CORRECT).collect()
    assert rows
    n = {r.source: r.n_total for r in rows}
    w = {s: math.isqrt(v) for s, v in n.items()}
    m = min(n[s] * MIX_GRID // w[s] for s in n)
    for r in rows:
        assert r.keep_ppm == min(MIX_GRID, w[r.source] * m // n[r.source])
        assert 0 < r.n_kept <= r.n_total
    assert any(r.keep_ppm == MIX_GRID for r in rows)   # binding source


# --- abc_pareto_parts -------------------------------------------------

def test_abc_classes_partition_revenue(spark):
    from mapreduce_rust_spark.operators.olap import abc_pareto_parts
    pdf = (abc_pareto_parts(spark, SF_CORRECT)
           .orderBy("rnk").toPandas())
    n = len(pdf)
    assert list(pdf["rnk"]) == list(range(1, n + 1))
    assert pdf["revenue"].is_monotonic_decreasing
    assert pdf["cum_revenue"].is_monotonic_increasing
    total = pdf["revenue"].sum()
    # class boundaries: A ends at the first part whose cumulative
    # share EXCEEDS 80%, B at 95%
    classes = list(pdf["abc_class"])
    assert classes == sorted(classes)        # A block, then B, then C
    a = pdf[pdf["abc_class"] == "A"]
    assert not a.empty and a["cum_revenue"].iloc[-1] <= total * 0.8 + 1e-6
    assert set(classes) <= {"A", "B", "C"} and classes[-1] == "C"


# --- rfm_segments -----------------------------------------------------

def test_rfm_scores_are_balanced_quintiles(spark):
    from mapreduce_rust_spark.operators.olap import RFM_BINS, rfm_segments
    pdf = rfm_segments(spark, SF_CORRECT).toPandas()
    assert len(pdf) > 0
    for col in ("r_score", "f_score", "m_score"):
        sizes = pdf[col].value_counts()
        assert set(sizes.index) == set(range(1, RFM_BINS + 1))
        assert sizes.max() - sizes.min() <= 1          # NTILE balance
    assert (pdf["segment"]
            == pdf["r_score"].astype(str) + pdf["f_score"].astype(str)
            + pdf["m_score"].astype(str)).all()


# --- attribution_last_touch -------------------------------------------

def test_attribution_conserves_purchases(spark):
    from mapreduce_rust_spark.operators.olap import attribution_last_touch
    from mapreduce_rust_spark.tables import load_table
    rows = attribution_last_touch(spark, SF_CORRECT).collect()
    total = sum(r.n_conversions for r in rows)
    purchases = (load_table(spark, SF_CORRECT, "events")
                 .filter(F.col("event_type") == "purchase").count())
    assert total == purchases                 # every purchase credited once
    types = {r.touch_type for r in rows}
    assert "purchase" not in types            # never self-credited


# --- semantic_dedup_embeddings ----------------------------------------

def test_semantic_dedup_agrees_with_pair_view(spark):
    """kept ≡ vectors that never appear as the HIGHER id of a
    near-dup pair — the keep-list must be exactly the pair view's
    complement."""
    from mapreduce_rust_spark.llm.dedup import (
        embedding_neardup_pairs, semantic_dedup_embeddings)
    from mapreduce_rust_spark.tables import load_table
    dropped = {r.vec_b for r in
               embedding_neardup_pairs(spark, SF_CORRECT).collect()}
    per_label_drop: dict[int, int] = {}
    labels = (load_table(spark, SF_CORRECT, "embeddings")
              .select("vec_id", "label").toPandas())
    for r in labels.itertuples():
        if r.vec_id in dropped:
            per_label_drop[r.label] = per_label_drop.get(r.label, 0) + 1
    for row in semantic_dedup_embeddings(spark, SF_CORRECT).collect():
        assert row.n_kept == row.n_vecs - per_label_drop.get(row.label, 0)
        assert 1 <= row.n_kept <= row.n_vecs


# --- quantile_normalize_docs ------------------------------------------

def test_quantile_normalize_matches_pandas_mapping(spark):
    """norm value ≡ global (n_chars, doc_id)-ordered value at rank
    ⌈r·N/n_s⌉ — recomputed independently in pandas."""
    from mapreduce_rust_spark.llm.quality import quantile_normalize_docs
    from mapreduce_rust_spark.tables import load_table
    got = quantile_normalize_docs(spark, SF_CORRECT).toPandas()
    docs = (load_table(spark, SF_CORRECT, "documents")
            .select("doc_id", "source", "n_chars").toPandas())
    assert len(got) == len(docs)
    docs = docs.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    global_vals = list(docs["n_chars"])          # rank i+1 -> vals[i]
    n = len(docs)
    expect = {}
    for _src, g in docs.groupby("source"):
        g = g.sort_values(["n_chars", "doc_id"])
        n_s = len(g)
        for r, doc_id in enumerate(g["doc_id"], start=1):
            expect[doc_id] = global_vals[-(-r * n // n_s) - 1]
    for row in got.itertuples():
        assert row.norm_chars == expect[row.doc_id]


# --- active_streaks_users / active_users_7d ---------------------------

def test_streaks_and_wau_match_python(spark):
    from mapreduce_rust_spark.operators.olap import (
        ACTIVE_WINDOW_DAYS, active_streaks_users, active_users_7d)
    from mapreduce_rust_spark.tables import load_table
    ud = (load_table(spark, SF_CORRECT, "events")
          .select("user_id", F.to_date("ts").alias("day"))
          .distinct().toPandas())
    by_user: dict[int, list] = {}
    for r in ud.itertuples():
        by_user.setdefault(r.user_id, []).append(r.day)
    streaks = {r.user_id: (r.longest_streak, r.n_active_days)
               for r in active_streaks_users(spark, SF_CORRECT).collect()}
    for uid, days in by_user.items():
        days = sorted(days)
        best = run = 1
        for a, b in zip(days, days[1:]):
            run = run + 1 if (b - a).days == 1 else 1
            best = max(best, run)
        assert streaks[uid] == (best, len(days))
    wau = {r.day: r.active_users
           for r in active_users_7d(spark, SF_CORRECT).collect()}
    all_days = sorted({r.day for r in ud.itertuples()})
    for g in all_days:
        expect = len({r.user_id for r in ud.itertuples()
                      if 0 <= (g - r.day).days < ACTIVE_WINDOW_DAYS})
        assert wau[str(g)] == expect


# --- seasonal_outlier_events ------------------------------------------

def test_seasonal_outlier_is_leave_one_out_3_sigma(spark):
    from mapreduce_rust_spark.operators.monitoring import (
        SEASONAL_MIN_N, seasonal_outlier_events)
    from mapreduce_rust_spark.tables import load_table
    ev = (load_table(spark, SF_CORRECT, "events")
          .select("event_id", "event_type",
                  (F.weekday("ts") + 1).alias("dow"),
                  F.round(F.col("value") * 100).cast("long").alias("vc"))
          .toPandas())
    groups: dict[tuple, list] = {}
    for r in ev.itertuples():
        groups.setdefault((r.event_type, r.dow), []).append((r.event_id,
                                                            int(r.vc)))
    expect = {}
    for key, rows in groups.items():
        n = len(rows)
        s = sum(v for _, v in rows)
        q = sum(v * v for _, v in rows)
        for eid, v in rows:
            m, s1, q1 = n - 1, s - v, q - v * v
            if m >= SEASONAL_MIN_N:
                d = v * m - s1
                expect[eid] = d * d > 9 * (m * q1 - s1 * s1)
    got = {r.event_id: r.is_outlier
           for r in seasonal_outlier_events(spark, SF_CORRECT).collect()}
    assert got == expect
    assert any(got.values())          # the fixture has real outliers


# --- forecast backtest / k-anonymity ----------------------------------

def test_forecast_backtest_wape_consistency(spark):
    """Σ|err| and Σactual re-derived in pandas over the zero-filled
    lag-7 alignment must reproduce MAE and WAPE exactly."""
    from mapreduce_rust_spark.operators.monitoring import (
        FORECAST_LAG_DAYS, forecast_backtest_events)
    from mapreduce_rust_spark.tables import load_table
    got = {r.event_type: r
           for r in forecast_backtest_events(spark, SF_CORRECT).collect()}
    ev = (load_table(spark, SF_CORRECT, "events")
          .select("event_type",
                  F.datediff(F.to_date("ts"),
                             F.lit("2024-01-01").cast("date")).alias("d"),
                  F.round(F.col("value") * 100).cast("long").alias("vc"))
          .toPandas())
    daily = ev.groupby(["event_type", "d"])["vc"].sum()
    d0, d1 = int(ev["d"].min()), int(ev["d"].max())
    for et in got:
        series = {d: daily.get((et, d), 0) for d in range(d0, d1 + 1)}
        pairs = [(series[d], series[d - FORECAST_LAG_DAYS])
                 for d in range(d0 + FORECAST_LAG_DAYS, d1 + 1)]
        sae = sum(abs(a - p) for a, p in pairs)
        sa = sum(a for a, _ in pairs)
        assert got[et].n_days == len(pairs)
        assert got[et].mae_cents == sae / len(pairs)
        assert got[et].wape == sae / sa


def test_k_anonymity_accounts_every_row(spark):
    from mapreduce_rust_spark.operators.dataquality import (
        KANON_K, k_anonymity_orders)
    from mapreduce_rust_spark.tables import load_table
    r = k_anonymity_orders(spark, SF_CORRECT).collect()[0]
    n_orders = load_table(spark, SF_CORRECT, "orders").count()
    assert r.n_rows == n_orders
    assert 0 <= r.n_risky_rows <= r.n_rows
    assert r.n_risky_classes <= r.n_classes
    assert r.risk_ppm == r.n_risky_rows * 1_000_000 // r.n_rows
    assert r.min_class_size >= 1
    # fixture is sparse at day grain — risk must actually be present
    assert r.n_risky_classes > 0 or r.min_class_size >= KANON_K


# --- experimentation analytics ----------------------------------------

def test_did_matches_cell_means(spark):
    from mapreduce_rust_spark.operators.experiment import (
        EXP_SPLIT, did_estimate_events)
    from mapreduce_rust_spark.tables import load_table
    row = did_estimate_events(spark, SF_CORRECT).collect()[0]
    ev = (load_table(spark, SF_CORRECT, "events")
          .select((F.col("user_id") % 2 == 1).alias("treat"),
                  (F.to_date("ts") >= F.lit(EXP_SPLIT).cast("date"))
                  .alias("post"),
                  F.round(F.col("value") * 100).cast("long").alias("vc"))
          .toPandas())
    means = {}
    for (t, p), g in ev.groupby(["treat", "post"]):
        means[(t, p)] = g["vc"].sum() / len(g) / 100.0
    assert row.treat_pre == means[(True, False)]
    assert row.treat_post == means[(True, True)]
    assert row.ctrl_pre == means[(False, False)]
    assert row.ctrl_post == means[(False, True)]
    assert row.did == ((means[(True, True)] - means[(True, False)])
                       - (means[(False, True)] - means[(False, False)]))


def test_cuped_theta_and_ratio_match_numpy(spark):
    import numpy as np
    from mapreduce_rust_spark.operators.experiment import (
        EXP_SPLIT, cuped_adjusted_events)
    from mapreduce_rust_spark.tables import load_table
    rows = {r.treat: r
            for r in cuped_adjusted_events(spark, SF_CORRECT).collect()}
    ev = (load_table(spark, SF_CORRECT, "events")
          .select("user_id",
                  (F.to_date("ts") >= F.lit(EXP_SPLIT).cast("date"))
                  .alias("post"),
                  F.round(F.col("value") * 100).cast("long").alias("vc"))
          .toPandas())
    pre = ev[~ev["post"]].groupby("user_id")["vc"].sum()
    post = ev[ev["post"]].groupby("user_id")["vc"].sum()
    both = pre.index.intersection(post.index)
    for treat in (True, False):
        uids = [u for u in both if (u % 2 == 1) == treat]
        x = np.array([pre[u] for u in uids], dtype=float)
        y = np.array([post[u] for u in uids], dtype=float)
        r = rows[treat]
        assert r.n == len(uids)
        cov = np.cov(x, y, ddof=1)
        theta = cov[0, 1] / cov[0, 0]
        rho2 = cov[0, 1] ** 2 / (cov[0, 0] * cov[1, 1])
        assert abs(r.theta - theta) < 1e-9 * max(1, abs(theta))
        assert abs(r.rho2 - rho2) < 1e-9
        assert 0.0 <= r.rho2 < 1.0
        assert abs(r.var_ratio - (1.0 - rho2)) < 1e-9


# --- lagged_corr_events -----------------------------------------------

def test_lagged_corr_matches_numpy(spark):
    import numpy as np
    from mapreduce_rust_spark.operators.monitoring import (
        LAGCORR_A, LAGCORR_B, LAGCORR_MAX, lagged_corr_events)
    from mapreduce_rust_spark.tables import load_table
    got = {r.lag: r for r in lagged_corr_events(spark, SF_CORRECT).collect()}
    ev = (load_table(spark, SF_CORRECT, "events")
          .filter(F.col("event_type").isin(LAGCORR_A, LAGCORR_B))
          .select("event_type",
                  F.datediff(F.to_date("ts"),
                             F.lit("2024-01-01").cast("date")).alias("d"),
                  F.round(F.col("value") * 100).cast("long").alias("vc"))
          .toPandas())
    daily = ev.groupby(["event_type", "d"])["vc"].sum()
    d0 = int(ev["d"].min())
    d1 = int(ev["d"].max())
    days = range(d0, d1 + 1)
    x = np.array([daily.get((LAGCORR_A, d), 0) for d in days], dtype=float)
    y = np.array([daily.get((LAGCORR_B, d), 0) for d in days], dtype=float)
    for k in range(LAGCORR_MAX + 1):
        xs, ys = x[: len(x) - k or None], y[k:]
        assert got[k].n == len(xs) == len(days) - k
        expect = np.corrcoef(xs, ys)[0, 1]
        assert abs(got[k].corr - expect) < 1e-9


# --- kwic_snippets_docs -----------------------------------------------

def test_kwic_positions_and_snippets(spark):
    from mapreduce_rust_spark.llm.textanalysis import (
        KWIC_RADIUS, KWIC_TERM, kwic_snippets_docs)
    from mapreduce_rust_spark.tables import load_table
    rows = kwic_snippets_docs(spark, SF_CORRECT).collect()
    assert rows
    texts = {r.doc_id: [t for t in r.text.split() if t]
             for r in load_table(spark, SF_CORRECT, "documents")
             .select("doc_id", "text").collect()}
    hits = {d for d, toks in texts.items() if KWIC_TERM in toks}
    assert {r.doc_id for r in rows} == hits
    for r in rows:
        toks = texts[r.doc_id]
        first = toks.index(KWIC_TERM) + 1          # 1-based
        assert r.pos == first
        lo = max(0, first - 1 - KWIC_RADIUS)
        hi = min(len(toks), first + KWIC_RADIUS)
        assert r.snippet == " ".join(toks[lo:hi])


# --- containment_pairs_docs -------------------------------------------

def test_containment_superset_of_high_jaccard(spark):
    """J ≥ 0.9 ⟹ containment ≥ 0.9 in BOTH directions (c/na ≥
    c/(na+nb−c) = J): every very-high-Jaccard pair from the exact
    inverted-index join must appear twice in the containment output."""
    from mapreduce_rust_spark.llm.dedup import (
        containment_pairs_docs, exact_dedup_docs, ngram_jaccard_pairs)
    cont = {(r.doc_inner, r.doc_outer)
            for r in containment_pairs_docs(spark, SF_CORRECT).collect()}
    assert cont
    # containment runs on exact-dedup representatives (pipeline
    # ordering) — restrict the expectation to representative pairs
    reps = {r.keep_doc_id
            for r in exact_dedup_docs(spark, SF_CORRECT).collect()}
    high_j = [r for r in ngram_jaccard_pairs(spark, SF_CORRECT).collect()
              if r.jaccard >= 0.9
              and r.doc_a in reps and r.doc_b in reps]
    for r in high_j:
        assert (r.doc_a, r.doc_b) in cont
        assert (r.doc_b, r.doc_a) in cont
    rows = containment_pairs_docs(spark, SF_CORRECT).collect()
    assert all(r.containment >= 0.9 - 1e-12 for r in rows)


# --- dedup_eval_lsh ---------------------------------------------------

def test_dedup_eval_confusion_row_is_consistent(spark):
    from mapreduce_rust_spark.llm.dedup import (
        dedup_eval_lsh, minhash_lsh_pairs, ngram_jaccard_pairs)
    row = dedup_eval_lsh(spark, SF_CORRECT).collect()[0]
    n_pred = minhash_lsh_pairs(spark, SF_CORRECT).count()
    n_truth = ngram_jaccard_pairs(spark, SF_CORRECT).count()
    assert row.tp + row.fp == n_pred
    assert row.tp + row.fn == n_truth
    assert 0.0 <= row.precision <= 1.0 and 0.0 <= row.recall <= 1.0
    assert row.f1 == 2 * row.tp / (2 * row.tp + row.fp + row.fn)


# --- labelprop_components ---------------------------------------------

def test_labelprop_matches_python_simulation(spark):
    """Exactly LABELPROP_ROUNDS synchronous min-label rounds,
    re-simulated in pure Python over the same edge set — label
    histogram must match row-for-row."""
    from mapreduce_rust_spark.operators.graph import (
        LABELPROP_ROUNDS, copurchase_edges, labelprop_components)
    from mapreduce_rust_spark.tables import load_table
    li = load_table(spark, SF_CORRECT, "lineitem")
    edges = [(r.u, r.v) for r in copurchase_edges(li).collect()]
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    lbl = {n: n for n in nbrs}
    for _ in range(LABELPROP_ROUNDS):
        lbl = {n: min([lbl[n]] + [lbl[m] for m in nbrs[n]]) for n in nbrs}
    expect: dict[int, int] = {}
    for v in lbl.values():
        expect[v] = expect.get(v, 0) + 1
    got = {r.component_min: r.n_nodes
           for r in labelprop_components(spark, SF_CORRECT).collect()}
    assert got == expect


# --- stream_markov_transitions ----------------------------------------

def test_stream_markov_twin_is_row_identical_to_batch(spark):
    from mapreduce_rust_spark.operators.olap import markov_transitions_events
    from mapreduce_rust_spark.streaming.stateful import (
        stream_markov_transitions)
    batch = {(r.from_type, r.to_type): (r.n_trans, r.p_cond)
             for r in markov_transitions_events(spark, SF_CORRECT).collect()}
    twin = {(r.from_type, r.to_type): (r.n_trans, r.p_cond)
            for r in stream_markov_transitions(spark, SF_CORRECT).collect()}
    assert batch == twin


def test_winnow_finds_near_identical_docs(spark):
    """Winnowing guarantee (shared run of ≥ w+k−1 tokens ⟹ shared
    fingerprint): near-identical representative pairs from the exact
    Jaccard join must surface in the winnowed pair set."""
    from mapreduce_rust_spark.llm.dedup import (
        WINNOW_MIN_SHARED, exact_dedup_docs, ngram_jaccard_pairs,
        winnow_pairs_docs)
    rows = winnow_pairs_docs(spark, SF_CORRECT).collect()
    assert rows
    assert all(r.n_shared >= WINNOW_MIN_SHARED for r in rows)
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    reps = {r.keep_doc_id
            for r in exact_dedup_docs(spark, SF_CORRECT).collect()}
    for r in ngram_jaccard_pairs(spark, SF_CORRECT).collect():
        if r.jaccard >= 0.9 and r.doc_a in reps and r.doc_b in reps:
            assert (r.doc_a, r.doc_b) in pairs


def test_stream_wau_twin_is_row_identical_to_batch(spark):
    from mapreduce_rust_spark.operators.olap import active_users_7d
    from mapreduce_rust_spark.streaming.windows import (
        stream_active_users_7d)
    batch = {r.day: r.active_users
             for r in active_users_7d(spark, SF_CORRECT).collect()}
    twin = {r.day: r.active_users
            for r in stream_active_users_7d(spark, SF_CORRECT).collect()}
    assert batch == twin


def test_stream_attribution_twin_is_row_identical_to_batch(spark):
    from mapreduce_rust_spark.operators.olap import attribution_last_touch
    from mapreduce_rust_spark.streaming.stateful import stream_attribution
    batch = {r.touch_type: r.n_conversions
             for r in attribution_last_touch(spark, SF_CORRECT).collect()}
    twin = {r.touch_type: r.n_conversions
            for r in stream_attribution(spark, SF_CORRECT).collect()}
    assert batch == twin


def test_stream_ewma_twin_is_row_identical_to_batch(spark):
    from mapreduce_rust_spark.operators.temporal import ewma_user_value
    from mapreduce_rust_spark.streaming.stateful import (
        stream_ewma_user_value)
    batch = {r.user_id: (r.n_events, r.ewma)
             for r in ewma_user_value(spark, SF_CORRECT).collect()}
    twin = {r.user_id: (r.n_events, r.ewma)
            for r in stream_ewma_user_value(spark, SF_CORRECT).collect()}
    assert batch == twin


# --- skyline_parts ----------------------------------------------------

def test_skyline_is_exact_pareto_frontier(spark):
    """Every skyline row is undominated and every non-skyline part is
    dominated by some part — the NOT EXISTS semantics recomputed
    in-process over the full fixture."""
    from mapreduce_rust_spark.operators.olap import skyline_parts
    from mapreduce_rust_spark.tables import load_table
    sky = skyline_parts(spark, SF_CORRECT).toPandas()
    allp = (load_table(spark, SF_CORRECT, "part")
            .select("p_partkey",
                    F.round(F.col("p_retailprice") * 100).cast("long")
                     .alias("price_cents"),
                    F.col("p_size").cast("long").alias("p_size"))
            .toPandas())
    pts = list(allp[["price_cents", "p_size"]].itertuples(index=False))

    def dominated(p, s):
        return any((bp <= p and bs <= s) and (bp < p or bs < s)
                   for bp, bs in pts)

    sky_keys = set(sky["p_partkey"])
    for r in allp.itertuples(index=False):
        assert (r.p_partkey in sky_keys) == (
            not dominated(r.price_cents, r.p_size))
    # 2-D frontier is a strict staircase: sorted by price, sizes
    # strictly decrease except among exact (price, size) twins
    srt = sky.sort_values(["price_cents", "p_size"]).drop_duplicates(
        ["price_cents", "p_size"])
    sizes = list(srt["p_size"])
    assert all(a > b for a, b in zip(sizes, sizes[1:]))


# --- clustering_coeff_parts -------------------------------------------

def test_clustering_coeff_consistency(spark):
    """Corner totals tie back to the global triangle count (×3), the
    coefficient stays in [0, 1], and a hand-checked node matches a
    pandas recomputation of its neighborhood density."""
    from mapreduce_rust_spark.operators.graph import (
        clustering_coeff_parts, copurchase_edges, triangle_count)
    from mapreduce_rust_spark.tables import load_table
    lcc = clustering_coeff_parts(spark, SF_CORRECT).toPandas()
    assert ((lcc["lcc"] >= 0) & (lcc["lcc"] <= 1.0)).all()
    li = load_table(spark, SF_CORRECT, "lineitem")
    edges = copurchase_edges(li).localCheckpoint(eager=True)
    n = edges.count()
    glob = triangle_count(edges, n_edges=n).collect()[0]["n_triangles"]
    assert int(lcc["n_tri"].sum()) == 3 * glob
    # recompute one mid-degree node's lcc from the raw edge list
    ep = edges.toPandas()
    nbrs: dict[int, set[int]] = {}
    for r in ep.itertuples(index=False):
        nbrs.setdefault(r.u, set()).add(r.v)
        nbrs.setdefault(r.v, set()).add(r.u)
    node = int(lcc.sort_values("deg").iloc[len(lcc) // 2]["p_partkey"])
    ns = nbrs[node]
    tri = sum(1 for a in ns for b in ns
              if a < b and b in nbrs.get(a, ()))
    row = lcc[lcc["p_partkey"] == node].iloc[0]
    assert int(row["deg"]) == len(ns) and int(row["n_tri"]) == tri


# --- cumulative_distinct_users ----------------------------------------

def test_cumulative_distinct_monotone_and_totals(spark):
    from mapreduce_rust_spark.operators.olap import cumulative_distinct_users
    from mapreduce_rust_spark.tables import load_table
    cum = cumulative_distinct_users(spark, SF_CORRECT).toPandas()
    ev = (load_table(spark, SF_CORRECT, "events")
          .groupBy("event_type")
          .agg(F.countDistinct("user_id").alias("n"))
          .toPandas().set_index("event_type")["n"])
    for t, g in cum.groupby("event_type"):
        vals = list(g.sort_values("day")["cum_users"])
        assert all(a <= b for a, b in zip(vals, vals[1:]))
        assert vals[-1] == ev[t]   # last day has seen every user


# --- conformal_interval_events ----------------------------------------

def test_conformal_quantile_is_kth_residual(spark):
    """q_cents is exactly the ⌈(n+1)·0.8⌉-th smallest calibration
    residual and the reported coverage matches a pandas replay of the
    held-out half."""
    from mapreduce_rust_spark.operators.monitoring import (
        FORECAST_LAG_DAYS, _dense_daily, conformal_interval_events)
    out = conformal_interval_events(spark, SF_CORRECT).toPandas()
    assert len(out) and out["coverage"].between(0, 1).all()
    dense = _dense_daily(spark, SF_CORRECT).toPandas()
    for r in out.itertuples(index=False):
        g = (dense[dense["event_type"] == r.event_type]
             .sort_values("d").reset_index(drop=True))
        ds = int(g["d0"][0] + (g["d1"][0] - g["d0"][0]) // 2)
        y = g.set_index("d")["y"]
        resid = {int(d): abs(int(y[d]) - int(y[d - FORECAST_LAG_DAYS]))
                 for d in y.index if d - FORECAST_LAG_DAYS in y.index}
        cal = sorted(v for d, v in resid.items() if d < ds)
        k = ((len(cal) + 1) * 4 + 4) // 5
        assert r.n_cal == len(cal) and r.q_cents == cal[k - 1]
        tst = [v for d, v in resid.items() if d >= ds]
        cov = sum(v <= r.q_cents for v in tst) / len(tst)
        assert r.n_test == len(tst) and abs(r.coverage - cov) < 1e-15


# --- theil_sen_trend_events -------------------------------------------

def test_theil_sen_matches_numpy_lower_median(spark):
    from mapreduce_rust_spark.operators.monitoring import (
        _dense_daily, theil_sen_trend_events)
    out = (theil_sen_trend_events(spark, SF_CORRECT).toPandas()
           .set_index("event_type"))
    dense = _dense_daily(spark, SF_CORRECT).toPandas()
    for t, g in dense.groupby("event_type"):
        ds = list(g.sort_values("d")["d"])
        ys = list(g.sort_values("d")["y"])
        slopes = sorted((ys[j] - ys[i]) / (ds[j] - ds[i])
                        for i in range(len(ds)) for j in range(i + 1, len(ds)))
        k = (len(slopes) + 1) // 2
        r = out.loc[t]
        assert r["n_pairs"] == len(slopes) and r["n_days"] == len(ds)
        assert r["sen_slope"] == slopes[k - 1]


def test_theil_sen_robust_to_planted_outlier(spark):
    """The estimator's reason to exist: a single corrupted day swings
    the OLS slope but leaves the Theil–Sen slope (near-)unchanged.
    Build a 30-day synthetic series, corrupt one day by 1000×."""
    import numpy as np
    days = list(range(30))
    clean = [(100 + 3 * d) for d in days]
    dirty = list(clean)
    dirty[28] = 100_000   # near the end: high leverage on OLS
    def sen(ys):
        slopes = sorted((ys[j] - ys[i]) / (j - i)
                        for i in days for j in days if i < j)
        return slopes[(len(slopes) + 1) // 2 - 1]
    def ols(ys):
        x = np.array(days, dtype=float); y = np.array(ys, dtype=float)
        return float(np.polyfit(x, y, 1)[0])
    assert abs(sen(dirty) - 3.0) < 0.5
    assert abs(ols(dirty) - 3.0) > 100


# --- holt_user_value + stream twin ------------------------------------

def test_stream_holt_twin_is_row_identical_to_batch(spark):
    from mapreduce_rust_spark.operators.temporal import holt_user_value
    from mapreduce_rust_spark.streaming.stateful import stream_holt_user_value
    batch = {r["user_id"]: r for r in
             holt_user_value(spark, SF_CORRECT).collect()}
    stream = {r["user_id"]: r for r in
              stream_holt_user_value(spark, SF_CORRECT).collect()}
    assert set(batch) == set(stream)
    for uid, b in batch.items():
        s = stream[uid]
        assert (b["n_events"], b["level"], b["trend"], b["forecast1"]) \
            == (s["n_events"], s["level"], s["trend"], s["forecast1"])


def test_holt_matches_python_replay(spark):
    """Replay the recurrence in pure Python for every user and
    require bit-identical doubles (the dyadic-α exactness claim)."""
    from mapreduce_rust_spark.operators.temporal import holt_user_value
    from mapreduce_rust_spark.tables import load_table
    out = {r["user_id"]: r for r in
           holt_user_value(spark, SF_CORRECT).collect()}
    ev = (load_table(spark, SF_CORRECT, "events")
          .select("user_id", F.unix_micros("ts").alias("us"), "event_id",
                  F.bround(F.col("value") * 100).cast("long").alias("vc"))
          .collect())
    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], r["vc"]))
    for uid, rows in per_user.items():
        rows.sort()
        l = t = None
        for idx, (_u, _e, vc) in enumerate(rows):
            if idx == 0:
                l, t = float(vc), 0.0
            else:
                newl = (float(vc) + (l + t)) / 2.0
                t = ((newl - l) + t) / 2.0
                l = newl
        r = out[uid]
        assert r["n_events"] == len(rows)
        assert r["level"] == l / 100.0 and r["trend"] == t / 100.0
        assert r["forecast1"] == (l + t) / 100.0


def test_holt_tracks_linear_trend():
    """On y_i = a + b·i the fixed point of the α=β=1/2 recurrence is
    level ≈ current value, trend ≈ b: the one-step forecast leads a
    drifting series where EWMA lags it by design."""
    l = t = None
    b = 5.0
    for i in range(200):
        y = 100.0 + b * i
        if l is None:
            l, t = y, 0.0
        else:
            newl = (y + (l + t)) / 2.0
            t = ((newl - l) + t) / 2.0
            l = newl
    assert abs(t - b) < 1e-6           # trend converges to the slope
    assert abs((l + t) - (100.0 + b * 200)) < 1e-4   # forecast leads


# --- embedding_covariance / embedding_pca_topk ------------------------

def test_embedding_covariance_is_psd_and_matches_numpy(spark):
    import numpy as np
    from mapreduce_rust_spark.llm.similarity import (
        COV_GRID, embedding_covariance, embedding_pca_topk)
    from mapreduce_rust_spark.tables import load_table
    cov = embedding_covariance(spark, SF_CORRECT).toPandas()
    d = int(cov["j"].max()) + 1
    assert len(cov) == d * (d + 1) // 2
    m = np.zeros((d, d))
    for r in cov.itertuples(index=False):
        m[r.i, r.j] = m[r.j, r.i] = r.cov
    assert (np.diag(m) >= 0).all()
    assert np.linalg.eigvalsh(m).min() > -1e-9       # PSD
    # numpy parity: same grid quantization, same assembly
    E = np.array(load_table(spark, SF_CORRECT, "embeddings")
                 .select("embedding").toPandas()["embedding"].tolist())
    Q = np.round(E.astype(np.float64) * COV_GRID)
    C = (Q.T @ Q / len(Q)
         - np.outer(Q.mean(0), Q.mean(0))) / (COV_GRID * COV_GRID)
    assert np.allclose(m, C, rtol=0, atol=1e-12)
    pca = embedding_pca_topk(spark, SF_CORRECT).toPandas()
    vals = np.linalg.eigvalsh(C)[::-1]
    assert np.allclose(pca["eigenvalue"], vals[:5], rtol=1e-12)
    ratios = list(pca["explained_ratio"])
    assert all(a >= b for a, b in zip(ratios, ratios[1:]))
    assert 0 < sum(ratios) <= 1.0


# --- hard_negatives ---------------------------------------------------

def test_hard_negatives_cross_label_and_gap(spark):
    """Every mined negative carries a different label than its query,
    ranks are the true cross-label cosine order (numpy recompute),
    and rank-adjacent similarity gaps dwarf cross-engine ulp
    divergence (the knn_bruteforce near-tie contract)."""
    import numpy as np
    from mapreduce_rust_spark.llm.similarity import (
        K, N_QUERIES, _emb, hard_negatives)
    out = hard_negatives(spark, SF_CORRECT).toPandas()
    rows = _emb(spark, SF_CORRECT).collect()
    labels = {r.vec_id: r.label for r in rows}
    units = {r.vec_id: (lambda v: v / np.linalg.norm(v))(
        np.asarray(r.e, dtype=np.float64)) for r in rows}
    min_gap = float("inf")
    for q in range(N_QUERIES):
        g = out[out["query_id"] == q].sort_values("rank")
        assert list(g["rank"]) == list(range(1, K + 1))
        assert all(labels[n] != labels[q] for n in g["neighbor_id"])
        scored = sorted(((float(units[q] @ u), -k) for k, u in units.items()
                         if labels[k] != labels[q]), reverse=True)
        expect = [-s[1] for s in scored[:K]]
        assert list(g["neighbor_id"]) == expect
        sims = [s[0] for s in scored[: K + 1]]
        min_gap = min(min_gap, *(a - b for a, b in zip(sims, sims[1:])))
    assert min_gap > 1e-9, f"near-tie at {min_gap}"


# --- funnel_time_to_convert -------------------------------------------

def test_funnel_ttc_consistent_with_funnel_counts(spark):
    """n_converted per step pair must equal the reach counts the
    funnel op reports, and the median is the lower median of a
    pandas replay of the stage-delay multiset."""
    from mapreduce_rust_spark.operators.olap import (
        _funnel_user_stages, funnel_conversion_events,
        funnel_time_to_convert)
    ttc = {r["step_pair"]: r for r in
           funnel_time_to_convert(spark, SF_CORRECT).collect()}
    fun = funnel_conversion_events(spark, SF_CORRECT).collect()[0]
    assert ttc["view_click"]["n_converted"] == fun["n_view_click"]
    assert (ttc["click_purchase"]["n_converted"]
            == fun["n_view_click_purchase"])
    pu = _funnel_user_stages(spark, SF_CORRECT).toPandas()
    for pair, a, b in [("view_click", "t1", "t2"),
                       ("click_purchase", "t2", "t3")]:
        d = pu.dropna(subset=[b])
        secs = sorted((d[b].astype(int) - d[a].astype(int)) // 1_000_000)
        k = (len(secs) + 1) // 2
        assert ttc[pair]["median_seconds"] == secs[k - 1]
