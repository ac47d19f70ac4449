"""Behavioral tests for the round-11 crop — planted extremes and
degenerate inputs the fixture-driven oracle mirror cannot see."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd


def _duck_on(tmp_path, *tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')")
    return con


def _events(tmp_path, rows):
    """rows: list of (event_type, ts, user_id, value)."""
    ev = pd.DataFrame({
        "event_id": np.arange(len(rows)),
        "ts": [r[1] for r in rows],
        "user_id": [r[2] for r in rows],
        "event_type": [r[0] for r in rows],
        "value": [float(r[3]) for r in rows],
        "props": "{}"})
    ev.to_parquet(tmp_path / "events.parquet")


def test_cohens_d_hand_computed(spark, tmp_path):
    """treat = user 1 with values 1.00/3.00, ctrl = user 2 with
    1.00/1.00: pooled sd = 100 cents, d = 1.0 exactly, and Hedges'
    g = d·(1 − 3/7) = 4/7."""
    t = pd.Timestamp("2024-01-10")
    _events(tmp_path, [("view", t, 1, 1.00), ("view", t, 1, 3.00),
                       ("view", t, 2, 1.00), ("view", t, 2, 1.00)])
    from mapreduce_rust_spark.operators.experiment import cohens_d_events
    r = cohens_d_events(spark, str(tmp_path)).collect()[0]
    assert (r.n_treat, r.n_ctrl) == (2, 2)
    assert r.mean_diff == 100.0 and r.pooled_sd == 100.0
    assert r.cohens_d == 1.0
    assert abs(r.hedges_g - 4.0 / 7.0) < 1e-15


def test_mcnemar_counts_discordant_pairs_and_guards_zero(spark, tmp_path):
    """3 users purchase only pre, 1 only post: b=3, c=1, χ² = 4/4 = 1
    (ppm 10⁶). A corpus with NO discordant users must yield NULL on
    BOTH engines (the guarded division), not an oracle error."""
    pre = pd.Timestamp("2024-01-10")
    post = pd.Timestamp("2024-01-20")
    rows = []
    for u in (1, 2, 3):                       # pre-only purchasers
        rows.append(("purchase", pre, u, 1.0))
        rows.append(("view", post, u, 1.0))
    rows.append(("view", pre, 4, 1.0))        # post-only purchaser
    rows.append(("purchase", post, 4, 1.0))
    rows.append(("purchase", pre, 5, 1.0))    # concordant both
    rows.append(("purchase", post, 5, 1.0))
    rows.append(("view", pre, 6, 1.0))        # concordant neither
    _events(tmp_path, rows)
    from mapreduce_rust_spark.operators.experiment import (
        MCNEMAR_ORACLE, mcnemar_events)
    r = mcnemar_events(spark, str(tmp_path)).collect()[0]
    assert (r.n_users, r.n10, r.n01) == (6, 3, 1)
    assert r.mcnemar_x2_ppm == 1_000_000
    con = _duck_on(tmp_path, "events")
    assert tuple(con.execute(MCNEMAR_ORACLE).fetchone()) == (6, 3, 1,
                                                             1_000_000)

    # degenerate: all concordant -> b+c = 0 -> NULL, no engine error
    _events(tmp_path, [("purchase", pre, 1, 1.0),
                       ("purchase", post, 1, 1.0),
                       ("view", pre, 2, 1.0)])
    r = mcnemar_events(spark, str(tmp_path)).collect()[0]
    assert r.mcnemar_x2_ppm is None
    con = _duck_on(tmp_path, "events")
    w = con.execute(MCNEMAR_ORACLE).fetchone()
    assert w[3] is None


def test_jonckheere_hand_computed_two_groups(spark, tmp_path):
    """Group 0 (hours 0–5) values {1.00, 2.00}, group 3 (hours
    18–23) values {3.00, 4.00}: every cross pair rises, so
    J = 4 (j2 = 8), E[2J] = n₀·n₃ = 4, var = [N²(2N+3) −
    Σn²(2n+3)]/72 = [16·11 − 2·4·7]/72 = 120/72, and
    z = (8−4)/(2·sqrt(120/72))."""
    lo = pd.Timestamp("2024-01-10 03:00:00")
    hi = pd.Timestamp("2024-01-10 20:00:00")
    _events(tmp_path, [("view", lo, 1, 1.00), ("view", lo, 1, 2.00),
                       ("view", hi, 1, 3.00), ("view", hi, 1, 4.00)])
    from mapreduce_rust_spark.operators.experiment import (
        JONCKHEERE_ORACLE, jonckheere_events)
    r = jonckheere_events(spark, str(tmp_path)).collect()[0]
    assert (r.n_total, r.j2, r.e_j2, r.var_num) == (4, 8, 4, 120)
    assert abs(r.z - (8 - 4) / (2 * (120 / 72.0) ** 0.5)) < 1e-15
    con = _duck_on(tmp_path, "events")
    assert tuple(con.execute(JONCKHEERE_ORACLE).fetchone()) == \
        (4, 8, 4, 120, r.z)


def test_mood_median_k_split_types(spark, tmp_path):
    """Type A all at 1.00, type B all at 3.00 (n each): the grand
    lower median is 1.00, every B value is above it — the perfect
    split. Each type's cleared χ² contribution is
    D²/(A(N−A)n_g) = 100²/(10·10·10) = 10 exactly (so the full
    statistic is 20 = N, the 2×2 perfect-association ceiling):
    10,000,000 ppm per type."""
    t = pd.Timestamp("2024-01-10")
    rows = [("A", t, i, 1.00) for i in range(10)] + \
           [("B", t, i, 3.00) for i in range(10)]
    _events(tmp_path, rows)
    from mapreduce_rust_spark.operators.monitoring import (
        MOOD_MEDIAN_K_ORACLE, mood_median_k_events)
    got = {r.event_type: r for r in
           mood_median_k_events(spark, str(tmp_path)).collect()}
    assert (got["A"].n_g, got["A"].n_above) == (10, 0)
    assert (got["B"].n_g, got["B"].n_above) == (10, 10)
    assert got["A"].mood_term_ppm == 10_000_000
    assert got["B"].mood_term_ppm == 10_000_000

    # degenerate: every value equal -> A = 0 -> NULL terms, no error
    _events(tmp_path, [("A", t, 1, 2.0), ("B", t, 2, 2.0)])
    got = {r.event_type: r.mood_term_ppm for r in
           mood_median_k_events(spark, str(tmp_path)).collect()}
    assert got == {"A": None, "B": None}
    con = _duck_on(tmp_path, "events")
    for _, r in con.execute(MOOD_MEDIAN_K_ORACLE).fetchdf().iterrows():
        assert pd.isna(r["mood_term_ppm"])


def test_cramers_v_perfect_and_independent(spark, tmp_path):
    """Perfect association (each type on its own weekday) gives
    V = 1; a uniform grid gives χ² = 0 and V = 0."""
    mon = pd.Timestamp("2024-01-01")   # Monday
    tue = pd.Timestamp("2024-01-02")
    from mapreduce_rust_spark.operators.monitoring import (
        cramers_v_events)
    _events(tmp_path, [("X", mon, 1, 1.0)] * 5 + [("Y", tue, 1, 1.0)] * 5)
    r = cramers_v_events(spark, str(tmp_path)).collect()[0]
    assert (r.n, r.n_rows, r.n_cols) == (10, 2, 2)
    assert r.cramers_v == 1.0

    rows = [(t, d, 1, 1.0) for t in ("X", "Y") for d in (mon, tue)
            for _ in range(5)]
    _events(tmp_path, rows)
    r = cramers_v_events(spark, str(tmp_path)).collect()[0]
    assert r.chi2 == 0.0 and r.cramers_v == 0.0


def test_bartels_rank_monotone_vs_alternating(spark, tmp_path):
    """A strictly increasing 20-day series: successive rank diffs are
    all 1, so NM4 = 4·19 = 76 and D4 = Σ(2i−21)² = 2660 →
    rvn_ppm = 28571 (strong positive serial dependence, RVN ≪ 2).
    An alternating series must read ABOVE 2·10⁶ (here ranks
    interleave 1,11,2,12,… so NM4 = 4·(10·10² + 9·9²) = 6916 and
    RVN = 2.6 exactly)."""
    rows = []
    for d in range(20):
        rows.append(("up", pd.Timestamp("2024-03-01")
                     + pd.Timedelta(days=d), 1, 1.0 + d))
        rows.append(("alt", pd.Timestamp("2024-03-01")
                     + pd.Timedelta(days=d), 1,
                     100.0 + (d % 2) * 50 + d * 0.01))
    _events(tmp_path, rows)
    from mapreduce_rust_spark.operators.monitoring import (
        BARTELS_ORACLE, bartels_rank_events)
    got = {r.event_type: r for r in
           bartels_rank_events(spark, str(tmp_path)).collect()}
    assert (got["up"].n_days, got["up"].nm4, got["up"].d4) == \
        (20, 76, 2660)
    assert got["up"].rvn_ppm == 76 * 1_000_000 // 2660
    assert got["alt"].nm4 == 6916
    assert got["alt"].rvn_ppm == 2_600_000
    con = _duck_on(tmp_path, "events")
    want = {r[0]: r for r in con.execute(BARTELS_ORACLE).fetchall()}
    for k, g in got.items():
        assert (g.n_days, g.nm4, g.d4, g.rvn_ppm) == tuple(want[k][1:])


def test_cox_stuart_monotone_series(spark, tmp_path):
    """21 strictly increasing days: c = 11, ten pairs all rising →
    n_plus = 10, n_minus = 0, cleared χ² = 10⁶·100/10 = 10⁷, the
    middle day dropped."""
    rows = [("up", pd.Timestamp("2024-03-01") + pd.Timedelta(days=d),
             1, 1.0 + d) for d in range(21)]
    _events(tmp_path, rows)
    from mapreduce_rust_spark.operators.monitoring import (
        COX_STUART_ORACLE, cox_stuart_events)
    r = cox_stuart_events(spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n_plus, r.n_minus) == (21, 10, 0)
    assert r.cs_x2_ppm == 10_000_000 and r.trend_sign == 1
    con = _duck_on(tmp_path, "events")
    assert tuple(con.execute(COX_STUART_ORACLE).fetchone()) == \
        ("up", 21, 10, 0, 10_000_000, 1)


def test_hampel_flags_exactly_the_planted_spike(spark, tmp_path):
    """A flat 15-day series with one 100× spike: the spike day's
    window median stays flat and the MAD is 0, so only the spike is
    flagged (|v − med| > 3·0); its flat neighbors are not."""
    rows = []
    for d in range(15):
        v = 100.0 if d == 7 else 1.0
        rows.append(("m", pd.Timestamp("2024-03-01")
                     + pd.Timedelta(days=d), 1, v))
    _events(tmp_path, rows)
    from mapreduce_rust_spark.operators.monitoring import (
        hampel_outliers_events)
    got = hampel_outliers_events(spark, str(tmp_path)).collect()
    flagged = sorted(str(r.d) for r in got if r.is_outlier)
    assert flagged == ["2024-03-08"]
    assert len(got) == 15


def test_stream_twins_match_batch_round11(spark, tmp_path):
    """The three round-11 kappa twins must be bit-identical to their
    batch ops on a fixture with ties, gaps, and both arms."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        d = int(rng.integers(0, 25))
        if d in (5, 13):          # calendar gaps
            d += 1
        rows.append((["view", "purchase"][int(rng.integers(0, 2))],
                     pd.Timestamp("2024-01-02")
                     + pd.Timedelta(days=d, hours=int(rng.integers(0, 24))),
                     int(rng.integers(1, 40)),
                     float(rng.integers(1, 30)) / 2))
    _events(tmp_path, rows)
    from mapreduce_rust_spark.operators.experiment import (
        jonckheere_events, mcnemar_events)
    from mapreduce_rust_spark.operators.monitoring import (
        bartels_rank_events)
    from mapreduce_rust_spark.streaming.windows import (
        stream_bartels_rank, stream_jonckheere, stream_mcnemar)
    for batch, stream in [(mcnemar_events, stream_mcnemar),
                          (jonckheere_events, stream_jonckheere),
                          (bartels_rank_events, stream_bartels_rank)]:
        b = sorted(map(tuple, batch(spark, str(tmp_path)).collect()))
        s = sorted(map(tuple, stream(spark, str(tmp_path)).collect()))
        assert b == s, batch.__name__


def _tpch_mini(tmp_path, cust_revs=None, supp_revs=None):
    """Single-nation TPC-H micro-fixture: one order+lineitem per
    customer (revenue = list value, discount 0), optional suppliers."""
    cust_revs = cust_revs or []
    supp_revs = supp_revs or [1.0]
    pd.DataFrame({"n_nationkey": [0], "n_name": ["AAA"],
                  "n_regionkey": [0], "n_comment": [""]}).to_parquet(
        tmp_path / "nation.parquet")
    nc = len(cust_revs) if cust_revs else 1
    pd.DataFrame({"c_custkey": range(1, nc + 1),
                  "c_nationkey": 0, "c_name": "c",
                  "c_acctbal": 0.0}).to_parquet(
        tmp_path / "customer.parquet")
    pd.DataFrame({"s_suppkey": range(1, len(supp_revs) + 1),
                  "s_nationkey": 0, "s_name": "s"}).to_parquet(
        tmp_path / "supplier.parquet")
    n_orders = max(len(cust_revs), 1)
    pd.DataFrame({
        "o_orderkey": range(1, n_orders + 1),
        "o_custkey": range(1, n_orders + 1),
        "o_orderstatus": "F",
        "o_totalprice": [float(r) for r in (cust_revs or [1.0])],
        "o_orderdate": pd.Timestamp("2024-01-01"),
        "o_orderpriority": "1-URGENT"}).to_parquet(
        tmp_path / "orders.parquet")
    li = []
    for i, r in enumerate(cust_revs or [0.0]):
        li.append((i + 1, 1, r))
    for j, r in enumerate(supp_revs):
        li.append((1, j + 1, r))
    pd.DataFrame({
        "l_orderkey": [x[0] for x in li],
        "l_suppkey": [x[1] for x in li],
        "l_partkey": 1, "l_quantity": 1.0,
        "l_extendedprice": [float(x[2]) for x in li],
        "l_discount": 0.0, "l_tax": 0.0,
        "l_returnflag": "N", "l_linestatus": "O",
        "l_shipdate": pd.Timestamp("2024-01-01"),
        "l_commitdate": pd.Timestamp("2024-01-01"),
        "l_receiptdate": pd.Timestamp("2024-01-02")}).to_parquet(
        tmp_path / "lineitem.parquet")


def test_lorenz_curve_hand_computed(spark, tmp_path):
    """Four customers with revenues 1,1,1,7 (per-customer lineitem
    revenue INCLUDING the supplier rows landing on customer 1):
    decile boundaries (d·4) DIV 10 = 0,0,0,1,2,2,2,3,3,4 and the
    bottom-k shares follow the sorted revenue prefix; decile 10
    always reads exactly 10⁶."""
    _tpch_mini(tmp_path, cust_revs=[1.0, 1.0, 1.0, 7.0],
               supp_revs=[0.0])
    from mapreduce_rust_spark.operators.olap import lorenz_curve_nations
    got = {r.decile: r for r in
           lorenz_curve_nations(spark, str(tmp_path)).collect()}
    assert len(got) == 10
    assert [got[d].k_customers for d in range(1, 11)] == \
        [0, 0, 1, 1, 2, 2, 2, 3, 3, 4]
    assert got[10].share_ppm == 1_000_000
    assert got[5].share_ppm == 200_000          # bottom 2 of total 10
    assert got[8].share_ppm == 300_000          # bottom 3
    mono = [got[d].share_ppm for d in range(1, 11)]
    assert mono == sorted(mono)


def test_cr_concentration_dominant_supplier(spark, tmp_path):
    """Ten suppliers where one takes 91% of revenue: CR4 counts the
    top FOUR ascending-tail ranks (dominant + three 1% peers)."""
    _tpch_mini(tmp_path, cust_revs=[1.0],
               supp_revs=[91.0] + [1.0] * 9)
    from mapreduce_rust_spark.operators.olap import (
        cr_concentration_suppliers)
    r = cr_concentration_suppliers(spark, str(tmp_path)).collect()[0]
    # total = 91 + 9 + the 1.0 customer lineitem on supplier 1 = 101
    assert r.n_suppliers == 10
    assert r.cr4_ppm == (92 + 3) * 1_000_000 // 101
    assert r.cr8_ppm == (92 + 7) * 1_000_000 // 101


def test_gmd_hand_computed(spark, tmp_path):
    """Orders at 1.00/2.00/4.00: pairwise |diffs| 100+300+200 = 600
    cents over 3 pairs → GMD 200 cents; relative GMD
    = 600·3·10⁶ DIV (3·700) = 857142 ppm."""
    _tpch_mini(tmp_path, cust_revs=[1.0, 2.0, 4.0])
    from mapreduce_rust_spark.operators.olap import (
        GMD_ORACLE, gini_mean_difference_orders)
    r = gini_mean_difference_orders(spark, str(tmp_path)).collect()[0]
    assert (r.n, r.gmd_cents, r.rel_gmd_ppm) == (3, 200, 857142)
    con = _duck_on(tmp_path, "orders")
    assert tuple(con.execute(GMD_ORACLE).fetchone()) == (3, 200, 857142)


def _docs(tmp_path, texts, sources=None, langs=None):
    pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
        "lang": langs or ["en"] * len(texts),
        "source": sources or ["s0"] * len(texts),
        "n_chars": [len(t) for t in texts]}).to_parquet(
        tmp_path / "documents.parquet")


def test_token_burstiness_uniform_vs_bursty(spark, tmp_path):
    """A token appearing once in every one of 20 docs has zero
    variance (vmr_ppm = 0); a token with all 20 occurrences in ONE
    doc has population VMR = (20·400 − 400)/(20·20) = 19."""
    texts = ["uni " + ("bur " * 20 if i == 0 else "pad")
             for i in range(20)]
    _docs(tmp_path, texts)
    from mapreduce_rust_spark.llm.textanalysis import (
        token_burstiness_docs)
    got = {r.tok: r for r in
           token_burstiness_docs(spark, str(tmp_path)).collect()}
    assert got["uni"].vmr_ppm == 0 and got["uni"].df == 20
    assert got["bur"].vmr_ppm == 19_000_000 and got["bur"].df == 1
    assert "pad" not in got            # tf 19 < BURST_MIN_TF


def test_encoding_quality_counts_planted_junk(spark, tmp_path):
    """Two U+FFFD, one C0 control byte, and two non-ASCII letters in
    one doc; a clean ASCII doc alongside — counts and ppm exact on
    both engines."""
    bad = "ab��c\x01dé é"            # len 10, fffd 2, ctrl 1
    _docs(tmp_path, [bad, "clean ascii"], sources=["dirty", "clean"])
    from mapreduce_rust_spark.llm.textanalysis import (
        ENCODING_QUALITY_ORACLE, encoding_quality_docs)
    got = {r.source: r for r in
           encoding_quality_docs(spark, str(tmp_path)).collect()}
    d = got["dirty"]
    assert (d.n_chars, d.fffd, d.ctrl, d.non_ascii) == (10, 2, 1, 4)
    assert d.fffd_ppm == 200_000 and d.ctrl_ppm == 100_000
    c = got["clean"]
    assert (c.fffd, c.ctrl, c.non_ascii) == (0, 0, 0)
    con = _duck_on(tmp_path, "documents")
    want = {r[0]: r for r in
            con.execute(ENCODING_QUALITY_ORACLE).fetchall()}
    for k, g in got.items():
        assert tuple(g) == tuple(want[k])


def test_knn_prefix_recall_is_total_when_tail_dims_are_zero(
        spark, tmp_path):
    """Embeddings whose dims beyond PREFIX_DIMS are all zero: the
    truncated ranking IS the full ranking, so recall_ppm = 10⁶ for
    every query."""
    rng = np.random.default_rng(3)
    vecs = []
    for _ in range(30):
        v = np.zeros(64, dtype=np.float32)
        v[:16] = rng.normal(size=16).astype(np.float32)
        vecs.append(v)
    pd.DataFrame({"vec_id": range(30),
                  "embedding": [list(v) for v in vecs],
                  "label": 0}).to_parquet(tmp_path / "embeddings.parquet")
    from mapreduce_rust_spark.llm.similarity import knn_prefix_dim_recall
    got = knn_prefix_dim_recall(spark, str(tmp_path)).collect()
    assert len(got) == 10
    assert all(r.recall_ppm == 1_000_000 for r in got)


def test_ulaw_decode_hand_computed_window(spark, tmp_path):
    """One-char doc 'a' (code 97): u = 158 → negative segment-1
    sample 132 − ((14·8 + 132)·2) = −356; the single window must
    read sum_sq = 356², peak = 356."""
    _docs(tmp_path, ["a"])
    from mapreduce_rust_spark.llm.multimodal import (
        multimodal_audio_ulaw_stats)
    r = multimodal_audio_ulaw_stats(spark, str(tmp_path)).collect()[0]
    assert (r.n_samples, r.sum_sq, r.peak) == (1, 356 * 356, 356)
    # 356² = 126736 is under the 2e6 mean-square threshold
    assert r.silence


def test_ahash_flags_single_bit_neighbor(spark, tmp_path):
    """Doc B = doc A with ONE sampled pixel pushed from far-below-mean
    to far-above-mean (all sampled pixels sit at 48 or 122, so the
    +74 mean shift of ~1.3 flips nothing else): exactly one hash bit
    differs, the other three bands stay identical (so LSH keeps the
    candidate), and the pair surfaces with hamming 1. An exact copy
    of A collapses into A's representative and produces no pair."""
    from mapreduce_rust_spark.llm.multimodal import (
        AHASH_COL_STRIDE, AHASH_COLS, AHASH_ROWS, DHASH_WIDTH)
    base = ["m"] * 300
    sampled = [r * DHASH_WIDTH + c * AHASH_COL_STRIDE
               for r in range(AHASH_ROWS) for c in range(AHASH_COLS)]
    for i, pos in enumerate(sampled):
        base[pos] = "z" if i % 2 == 0 else "0"   # 122 / 48, mean 85
    a = base.copy()
    b = base.copy(); b[sampled[1]] = "z"         # flip bit 1 only
    _docs(tmp_path, ["".join(a), "".join(b), "".join(a)])
    from mapreduce_rust_spark.llm.multimodal import (
        IMAGE_AHASH_ORACLE, image_ahash_neardup)
    got = sorted(map(tuple,
                     image_ahash_neardup(spark, str(tmp_path)).collect()))
    assert got == [(0, 1, 1)]
    con = _duck_on(tmp_path, "documents")
    assert sorted(map(tuple, con.execute(IMAGE_AHASH_ORACLE).fetchall())) \
        == got


def test_odds_ratio_hand_computed_and_guarded(spark, tmp_path):
    """2×2 = (a=2, b=1, c=1, d=2): OR = 4 (4·10⁶ ppm), RR = 2.
    With an empty b·c denominator the OR is NULL on both engines."""
    t = pd.Timestamp("2024-01-10")
    rows = [("purchase", t, 1, 1.0), ("purchase", t, 3, 1.0),  # a = 2
            ("view", t, 5, 1.0),                                # b = 1
            ("purchase", t, 2, 1.0),                            # c = 1
            ("view", t, 4, 1.0), ("view", t, 6, 1.0)]           # d = 2
    _events(tmp_path, rows)
    from mapreduce_rust_spark.operators.experiment import (
        ODDS_RATIO_ORACLE, odds_ratio_events)
    r = odds_ratio_events(spark, str(tmp_path)).collect()[0]
    assert (r.conv_treat, r.noconv_treat, r.conv_ctrl, r.noconv_ctrl) \
        == (2, 1, 1, 2)
    assert r.odds_ratio_ppm == 4_000_000 and r.rel_risk_ppm == 2_000_000
    con = _duck_on(tmp_path, "events")
    assert tuple(con.execute(ODDS_RATIO_ORACLE).fetchone()) == \
        (2, 1, 1, 2, 4_000_000, 2_000_000)

    # all treatment users convert -> b = 0 -> OR NULL, RR defined
    _events(tmp_path, [("purchase", t, 1, 1.0), ("purchase", t, 2, 1.0),
                       ("view", t, 4, 1.0)])
    r = odds_ratio_events(spark, str(tmp_path)).collect()[0]
    assert r.odds_ratio_ppm is None


def test_friedman_perfect_agreement(spark, tmp_path):
    """Three users whose spend strictly rises through the dayparts:
    every block ranks them 1<2<3<4, so χ²_F hits its maximum
    n(k−1) = 9 (9·10⁶ ppm); a user missing a daypart is excluded
    from the blocks."""
    rows = []
    for u in (1, 2, 3):
        for g, hour in enumerate((3, 9, 15, 21)):
            rows.append(("view",
                         pd.Timestamp(f"2024-01-10 {hour:02d}:00:00"),
                         u, float(g + 1)))
    rows.append(("view", pd.Timestamp("2024-01-10 03:00:00"), 9, 5.0))
    _events(tmp_path, rows)
    from mapreduce_rust_spark.operators.experiment import (
        FRIEDMAN_ORACLE, friedman_events)
    got = {r.g: r for r in friedman_events(spark, str(tmp_path)).collect()}
    assert len(got) == 4
    assert all(r.n_blocks == 3 for r in got.values())
    # doubled rank sums: R2_j = 2·3·(j+1)
    assert [got[g].r2_sum for g in range(4)] == [6, 12, 18, 24]
    assert got[0].friedman_chi2_ppm == 9_000_000
    con = _duck_on(tmp_path, "events")
    want = {r[0]: r for r in con.execute(FRIEDMAN_ORACLE).fetchall()}
    for g, r in got.items():
        assert (r.r2_sum, r.n_blocks, r.friedman_chi2_ppm) == \
            tuple(want[g][1:])


def test_stream_twins_match_batch_round11_wave2(spark, tmp_path):
    """The six second-wave round-11 kappa twins must be bit-identical
    to their batch ops on a mixed fixture."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(500):
        rows.append((["view", "purchase", "click"][int(rng.integers(0, 3))],
                     pd.Timestamp("2024-01-02")
                     + pd.Timedelta(days=int(rng.integers(0, 20)),
                                    hours=int(rng.integers(0, 24))),
                     int(rng.integers(1, 30)),
                     float(rng.integers(1, 40)) / 4))
    _events(tmp_path, rows)
    from mapreduce_rust_spark.operators.experiment import (
        friedman_events, odds_ratio_events)
    from mapreduce_rust_spark.operators.monitoring import (
        cox_stuart_events, cramers_v_events, hampel_outliers_events,
        mood_median_k_events)
    from mapreduce_rust_spark.streaming.windows import (
        stream_cox_stuart, stream_cramers_v, stream_friedman,
        stream_hampel, stream_mood_median_k, stream_odds_ratio)
    for batch, stream in [(cramers_v_events, stream_cramers_v),
                          (mood_median_k_events, stream_mood_median_k),
                          (cox_stuart_events, stream_cox_stuart),
                          (hampel_outliers_events, stream_hampel),
                          (odds_ratio_events, stream_odds_ratio),
                          (friedman_events, stream_friedman)]:
        b = sorted(map(tuple, batch(spark, str(tmp_path)).collect()))
        s = sorted(map(tuple, stream(spark, str(tmp_path)).collect()))
        assert b == s, batch.__name__


def test_stream_twins_match_batch_round11_wave3(spark, tmp_path):
    """Third-wave twins (Cohen's d, Hodges–Lehmann, GMD) bit-identical
    to their batch ops."""
    rng = np.random.default_rng(23)
    rows = [(["view", "purchase"][int(rng.integers(0, 2))],
             pd.Timestamp("2024-01-02")
             + pd.Timedelta(days=int(rng.integers(0, 20))),
             int(rng.integers(1, 50)),
             float(rng.integers(1, 60)) / 3) for _ in range(400)]
    _events(tmp_path, rows)
    from mapreduce_rust_spark.operators.experiment import (
        cohens_d_events, hodges_lehmann_events)
    from mapreduce_rust_spark.streaming.windows import (
        stream_cohens_d, stream_hodges_lehmann)
    for batch, stream in [(cohens_d_events, stream_cohens_d),
                          (hodges_lehmann_events, stream_hodges_lehmann)]:
        b = sorted(map(tuple, batch(spark, str(tmp_path)).collect()))
        s = sorted(map(tuple, stream(spark, str(tmp_path)).collect()))
        assert b == s, batch.__name__

    _tpch_mini(tmp_path, cust_revs=[float(x) for x in
                                    rng.integers(1, 500, size=40)])
    from mapreduce_rust_spark.operators.olap import (
        gini_mean_difference_orders)
    from mapreduce_rust_spark.streaming.windows import stream_gmd
    b = sorted(map(tuple,
                   gini_mean_difference_orders(spark,
                                               str(tmp_path)).collect()))
    s = sorted(map(tuple, stream_gmd(spark, str(tmp_path)).collect()))
    assert b == s


def test_grouping_id_flags_subtotal_rows(spark, tmp_path):
    """GROUPING flags: detail rows gid=0, the per-returnflag subtotal
    gid=1 (linestatus bit), the grand total gid=3 — same bit order
    both engines."""
    _tpch_mini(tmp_path, cust_revs=[1.0, 2.0])
    from mapreduce_rust_spark.operators.relational import (
        GROUPING_ID_ORACLE, grouping_id_rollup_qty)
    got = sorted(map(tuple,
                     grouping_id_rollup_qty(spark,
                                            str(tmp_path)).collect()),
                 key=lambda t: (t[6], str(t[0])))
    gids = [r[6] for r in got]
    assert gids == [0, 1, 3]
    assert got[-1][4:7] == (1, 1, 3)       # grand total row flags
    con = _duck_on(tmp_path, "lineitem")
    want = sorted(map(tuple, con.execute(GROUPING_ID_ORACLE).fetchall()),
                  key=lambda t: (t[6], str(t[0])))
    assert [tuple(map(str, r)) for r in got] == \
        [tuple(map(str, r)) for r in want]


def test_hof_funcs_hand_computed(spark, tmp_path):
    """One doc 'the cat catalogue  x': 4 tokens after empty-filter,
    one ≥5 chars, fold length sum 3+3+9+1=16, sorted head 'cat'."""
    _docs(tmp_path, ["the cat catalogue  x"])
    from mapreduce_rust_spark.llm.textanalysis import hof_funcs_docs
    r = hof_funcs_docs(spark, str(tmp_path)).collect()[0]
    assert (r.n_tokens, r.n_long, r.len_sum, r.max_len) == (4, 1, 16, 9)
    assert r.first_token_sorted == "cat" and r.has_the


def test_k_anon_generalize_picks_first_qualifying_level(spark, tmp_path):
    """Ten orders at distinct cents within one dollar: exact level
    fails (classes of 1), the dollars level collapses them into one
    class of 10 ≥ k=5 → chosen level 1, everything above unchosen."""
    _tpch_mini(tmp_path, cust_revs=[1.00 + i / 100 for i in range(10)])
    from mapreduce_rust_spark.operators.dataquality import (
        k_anon_generalize_orders)
    got = {r.level: r for r in
           k_anon_generalize_orders(spark, str(tmp_path)).collect()}
    assert got[0].min_class == 1 and not got[0].chosen
    assert got[0].at_risk_ppm == 1_000_000
    assert got[1].min_class == 10 and got[1].chosen
    assert got[1].at_risk_rows == 0
    assert not got[2].chosen and not got[4].chosen


def test_stream_interval_join_left_watermark_tail(spark, tmp_path):
    """Left-outer stream-stream interval join: an early unmatched
    click (window long closed before the final watermark) emits a
    NULL purchase row; a trailing unmatched click inside the
    watermark+interval tail stays in state and must NOT emit.
    Matched pairs equal the batch inner join."""
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        ("click", t0, 1, 1.0),                                  # early, no buy
        ("click", t0 + pd.Timedelta(hours=5), 2, 1.0),          # matched
        ("purchase", t0 + pd.Timedelta(hours=5, minutes=10), 2, 1.0),
        ("click", t0 + pd.Timedelta(hours=9, minutes=30), 3, 1.0),  # tail
        # late sentinels push both sides' watermarks to t0+10h:
        ("click", t0 + pd.Timedelta(hours=10), 8, 1.0),
        ("purchase", t0 + pd.Timedelta(hours=10), 9, 1.0),
    ]
    _events(tmp_path, rows)
    from mapreduce_rust_spark.streaming.windows import (
        STREAM_INTERVAL_LEFT_ORACLE, stream_interval_join_left)
    got = sorted(map(tuple, stream_interval_join_left(
        spark, str(tmp_path)).collect()))
    # final watermark = 10h − 1h = 9h; user-1 click window closed at
    # 0:30 < 9h -> emits unmatched; user-3 click window closes at
    # 10h > 9h -> held in state; user-8 click window closes 10:30 >
    # 9h -> held; user-2 pair matches.
    assert got == [(1, 0, None), (2, 1, 2)]
    con = _duck_on(tmp_path, "events")
    want = sorted(map(tuple, con.execute(
        STREAM_INTERVAL_LEFT_ORACLE).fetchall()))
    assert [(a, b, c) for a, b, c in want] == \
        [(g[0], g[1], g[2]) for g in got]


def test_stream_tumbling_append_emits_only_finalized_windows(
        spark, tmp_path):
    """Append mode: a window emits once its end passes the final
    watermark (max ts − 10 min); open windows never appear. Data
    ending at 02:05 → watermark 01:55 → only [00,01) (end 01:00 ≤
    01:55) emits; [01,02) (end 02:00 > 01:55) and [02,03) are both
    still open and held in state."""
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [("view", t0 + pd.Timedelta(minutes=m), 1, 1.0)
            for m in (5, 30, 65, 90, 125)]
    _events(tmp_path, rows)
    from mapreduce_rust_spark.streaming.windows import (
        stream_tumbling_append)
    got = sorted((r.bucket_start, r.n) for r in
                 stream_tumbling_append(spark, str(tmp_path)).collect())
    e = int(t0.timestamp())
    assert got == [(e, 2)]


def test_round11_self_joins_never_plan_cartesian(spark):
    """The round-11 dims-grid self-joins (Jonckheere value grid,
    Hampel/Cox–Stuart day grids, aHash band buckets) must plan as
    hash joins on their equi keys — a lost key would degrade to
    BroadcastNestedLoop/CartesianProduct, the shapes that die at
    scale."""
    import io
    from contextlib import redirect_stdout

    import __spark_entry__ as e
    qs = e.queries()
    sf = "/root/testdata/sf0.001"
    for name in ("jonckheere_events", "hampel_outliers_events",
                 "cox_stuart_events", "image_ahash_neardup",
                 "knn_prefix_dim_recall", "kendall_tau_events"):
        buf = io.StringIO()
        with redirect_stdout(buf):
            qs[name](spark, sf).explain("formatted")
        plan = buf.getvalue()
        # CartesianProduct = two UNbroadcast sides with no key — the
        # always-fatal shape. (BroadcastNestedLoop appears here only
        # for legitimate tiny-side cross joins: 1-row stat rows, the
        # 4-row daypart grid, the 10-row probe set — so it is not
        # asserted on.)
        assert "CartesianProduct" not in plan, name
        # every pair scan must keep its equi key: at least one hash
        # join must survive in each of these multi-join plans.
        # (kendall_tau_events is exempt: its user_id equi joins sit
        # BEFORE the localCheckpoint that feeds the ≤100-cell pair
        # scan, so the explained plan legitimately shows only the
        # broadcast nested-loop over the bounded grid.)
        if name != "kendall_tau_events":
            assert ("BroadcastHashJoin" in plan
                    or "SortMergeJoin" in plan
                    or "ShuffledHashJoin" in plan), name


def test_kendall_tau_perfect_and_reversed(spark, tmp_path):
    """20 users where spend is a strictly increasing function of
    activity: every decile pair is concordant → τ_b = 1. Reversing
    spend flips every pair → τ_b = −1."""
    rows = []
    for u in range(1, 21):
        for i in range(u):             # activity = u events
            rows.append(("view", pd.Timestamp("2024-01-05"), u,
                         float(u)))    # spend = u·u cents·100
    _events(tmp_path, rows)
    from mapreduce_rust_spark.operators.experiment import (
        KENDALL_TAU_ORACLE, kendall_tau_events)
    r = kendall_tau_events(spark, str(tmp_path)).collect()[0]
    assert r.n_users == 20 and r.tau_b == 1.0
    # 20 users over 10 tiles -> 2 per tile -> 10·1 = 10 tie pairs
    assert r.tie_x_pairs == 10.0 and r.tie_y_pairs == 10.0
    con = _duck_on(tmp_path, "events")
    assert con.execute(KENDALL_TAU_ORACLE).fetchone()[5] == 1.0

    # reversed: activity u but TOTAL spend (21−u) dollars — zero
    # filler events plus one carrier event (a per-event value of
    # 21−u would make total spend u·(21−u), a parabola with τ = 0)
    rows = []
    for u in range(1, 21):
        for i in range(u - 1):
            rows.append(("view", pd.Timestamp("2024-01-05"), u, 0.0))
        rows.append(("view", pd.Timestamp("2024-01-05"), u,
                     float(21 - u)))
    _events(tmp_path, rows)
    r = kendall_tau_events(spark, str(tmp_path)).collect()[0]
    assert r.tau_b == -1.0


def test_stream_kendall_tau_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(31)
    rows = [(["view", "purchase"][int(rng.integers(0, 2))],
             pd.Timestamp("2024-01-02")
             + pd.Timedelta(days=int(rng.integers(0, 20))),
             int(rng.integers(1, 60)),
             float(rng.integers(1, 50)) / 2) for _ in range(600)]
    _events(tmp_path, rows)
    from mapreduce_rust_spark.operators.experiment import (
        kendall_tau_events)
    from mapreduce_rust_spark.streaming.windows import stream_kendall_tau
    b = sorted(map(tuple, kendall_tau_events(spark,
                                             str(tmp_path)).collect()))
    s = sorted(map(tuple, stream_kendall_tau(spark,
                                             str(tmp_path)).collect()))
    assert b == s
