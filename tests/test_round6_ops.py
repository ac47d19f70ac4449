"""Behavioral tests for the round-6 operator crop — planted-input
properties that the oracle-parity mirror (which proves Spark ≡ DuckDB
on the fixtures) cannot see: does KS actually detect a planted drift,
does CDC honor U-then-D ordering, does k-core equal the true fixpoint
when rounds suffice, is item-CF cosine symmetric, does the label
screen flag a planted mislabel.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_ks_detects_planted_shift(spark):
    """A source whose lengths are shifted by a constant must carry a
    (near-)maximal KS statistic against the rest; identical sources
    must carry a small one. Pure-python KS cross-check included."""
    from mapreduce_rust_spark.operators.monitoring import ks_drift_sources
    rows = ([("a", v) for v in range(100, 200)]
            + [("b", v) for v in range(100, 200)]
            + [("c", v + 1000) for v in range(100, 200)])
    docs = spark.createDataFrame(rows, "source string, n_chars long")
    from mapreduce_rust_spark.operators import monitoring
    orig = monitoring.load_table
    try:
        monitoring.load_table = lambda s, d, n: docs
        got = {r.source: r for r in
               monitoring.ks_drift_sources(spark, SF_SMOKE).collect()}
    finally:
        monitoring.load_table = orig
    # c is fully separated from a∪b: D = 1 exactly
    assert got["c"].ks == 1.0
    # a vs (b∪c): half the rest matches a exactly, half is shifted:
    # D = 1/2 at the boundary
    assert abs(got["a"].ks - 0.5) < 1e-12
    assert got["a"].n_src == 100 and got["a"].n_rest == 200


def test_mannwhitney_no_effect_on_identical_arms(spark):
    """If both arms see the same value multiset, AUC must be exactly
    0.5 (ties give midranks, U = n²/2)."""
    from mapreduce_rust_spark.operators import experiment
    rows = [(u, "2024-01-0%d 00:00:00" % (u % 5 + 1), float(u % 13))
            for u in range(200)]
    ev = (spark.createDataFrame(rows, "user_id long, raw string, value double")
          .select("user_id", F.col("raw").cast("timestamp").alias("ts"),
                  "value"))
    orig = experiment.load_table
    try:
        experiment.load_table = lambda s, d, n: ev
        got = experiment.mannwhitney_events(spark, SF_SMOKE).collect()[0]
    finally:
        experiment.load_table = orig
    # one event per user: 100 odd + 100 even users; values u % 13
    # give both parities a near-identical multiset, so AUC ≈ 0.5
    assert got.n_treat == got.n_ctrl == 100
    assert abs(got.auc - 0.5) < 0.02


def test_kcore_rounds_reach_fixpoint_on_small_graph(spark):
    """On a graph small enough that KCORE_ROUNDS exceed the peeling
    depth, the bounded-round result must equal the true k-core
    (computed by a python fixpoint)."""
    from mapreduce_rust_spark.operators import graph as G
    # a 4-clique (core_3) with a pendant path hanging off it
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (6, 7)]
    li = spark.createDataFrame(
        [(i, a) for i, (a, b) in enumerate(edges)]
        + [(i, b) for i, (a, b) in enumerate(edges)],
        "l_orderkey long, l_partkey long")
    orig = G.load_table
    try:
        G.load_table = lambda s, d, n: li
        got = {r.part: r.core_deg for r in
               G.kcore_parts(spark, SF_SMOKE).collect()}
    finally:
        G.load_table = orig
    # python fixpoint at k=3
    import collections
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive
                if len(adj[n] & alive) < G.KCORE_K}
        if not drop:
            break
        alive -= drop
    want = {n: len(adj[n] & alive) for n in alive}
    assert got == want == {1: 3, 2: 3, 3: 3, 4: 3}


def test_cdc_update_then_delete_deletes(spark):
    """A key carrying U(seq 1) then D(seq 2) must come out DELETED
    (latest-wins), an update-only key must carry the updated price,
    and inserts must appear."""
    from mapreduce_rust_spark.operators.merge import (
        CDC_DEL_MOD, CDC_N_INS, CDC_UPD_MOD, cdc_apply_orders)
    from mapreduce_rust_spark.tables import load_table
    got = {r.o_orderkey: r for r in
           cdc_apply_orders(spark, SF_SMOKE).collect()}
    base = {r.o_orderkey: r for r in
            load_table(spark, SF_SMOKE, "orders").collect()}
    both = [k for k in base if k % (CDC_UPD_MOD * CDC_DEL_MOD) == 0]
    upd_only = [k for k in base
                if k % CDC_UPD_MOD == 0 and k % CDC_DEL_MOD != 0]
    del_only = [k for k in base
                if k % CDC_DEL_MOD == 0 and k % CDC_UPD_MOD != 0]
    assert both and upd_only and del_only
    for k in both + del_only:
        assert k not in got, k
    for k in upd_only:
        assert got[k].status == "P"
        assert got[k].price_cents == round(base[k].o_totalprice * 100) + 1000
    for i in range(1, CDC_N_INS + 1):
        assert got[-i].status == "N" and got[-i].price_cents == i * 100
    # untouched keys pass through byte-identical
    clean = next(k for k in base
                 if k % CDC_UPD_MOD != 0 and k % CDC_DEL_MOD != 0)
    assert got[clean].status == base[clean].o_orderstatus


def test_item_cf_symmetric_and_bounded(spark):
    """cos(u,v) must be symmetric, in (0, 1], and every item's
    neighbor list deterministic top-k (rk 1..k, no gaps)."""
    from mapreduce_rust_spark.operators.olap import (
        ITEM_CF_TOP_K, item_cf_neighbors)
    rows = item_cf_neighbors(spark, SF_SMOKE).collect()
    assert rows
    sim = {(r.part, r.neighbor): r.cos for r in rows}
    for (u, v), c in sim.items():
        assert 0.0 < c <= 1.0
        if (v, u) in sim:
            assert sim[(v, u)] == c  # identical float both directions
    by_part = {}
    for r in rows:
        by_part.setdefault(r.part, []).append(r.rk)
    for p, rks in by_part.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= ITEM_CF_TOP_K


def test_phrase_search_equals_inrow_scan(spark):
    """The posting-list join must equal a brute-force in-row scan of
    the token arrays — same doc set, same counts, same first hit."""
    from mapreduce_rust_spark.llm.textanalysis import (
        PHRASE_TERMS, WS_RE, phrase_search_docs)
    from mapreduce_rust_spark.tables import load_table
    got = {r.doc_id: (r.n_hits, r.first_pos) for r in
           phrase_search_docs(spark, SF_SMOKE).collect()}
    import re
    want = {}
    for r in load_table(spark, SF_SMOKE, "documents").collect():
        toks = [t for t in re.split(r"\s+", r.text) if t]
        hits = [i for i in range(len(toks) - len(PHRASE_TERMS) + 1)
                if all(toks[i + j] == t
                       for j, t in enumerate(PHRASE_TERMS))]
        if hits:
            want[r.doc_id] = (len(hits), hits[0] + 1)
    assert got == want


def test_label_consensus_flags_planted_mislabel(spark):
    """Plant a tight cluster of identical vectors where one vector
    carries a different language label: that vector must score 0
    agreement, its peers near 1."""
    from mapreduce_rust_spark.llm import similarity as S
    emb_rows = [(i, [1.0, 0.0, 0.0], 0) for i in range(6)]
    doc_rows = [(i, "en" if i != 3 else "fr") for i in range(6)]
    emb = spark.createDataFrame(
        emb_rows, "vec_id long, embedding array<float>, label int")
    docs = spark.createDataFrame(doc_rows, "doc_id long, lang string")
    orig = S.load_table
    try:
        S.load_table = (lambda s, d, n:
                        docs if n == "documents" else emb)
        got = {r.vec_id: r for r in
               S.knn_label_consensus(spark, SF_SMOKE).collect()}
    finally:
        S.load_table = orig
    assert got[3].n_agree == 0
    for i in (0, 1, 2, 4, 5):
        # 5 neighbors, one (vec 3) disagrees
        assert got[i].n_agree == 4 and got[i].n_nbrs == 5


def test_bounce_rate_semantics(spark):
    """Two sessions for one user (one single-event = bounce, one
    two-event with known dwell) must produce exact counts and dwell."""
    from mapreduce_rust_spark.operators import olap as O
    rows = [
        (1, 10, "2024-01-01 08:00:00"),          # bounce (alone)
        (1, 11, "2024-01-01 12:00:00"),          # session 2, ev 1
        (1, 12, "2024-01-01 12:10:00"),          # session 2, ev 2
        (2, 20, "2024-01-02 09:00:00"),          # bounce on day 2
    ]
    ev = (spark.createDataFrame(rows, "user_id long, event_id long, raw string")
          .select("user_id", "event_id",
                  F.col("raw").cast("timestamp").alias("ts")))
    orig = O.load_table
    try:
        O.load_table = lambda s, d, n: ev
        got = {r.day: r for r in
               O.bounce_rate_daily(spark, SF_SMOKE).collect()}
    finally:
        O.load_table = orig
    d1, d2 = sorted(got)
    assert got[d1].n_sessions == 2 and got[d1].n_bounces == 1
    assert got[d1].bounce_rate == 0.5
    assert got[d1].avg_dwell_s == 600.0 / 2    # 10 min dwell / 2 sessions
    assert got[d2].n_sessions == 1 and got[d2].n_bounces == 1


def test_corr_matrix_perfect_correlation(spark):
    """A column that is an exact linear function of another must give
    corr = ±1 exactly (integer sufficient statistics make the
    numerator and denominator identical up to sign)."""
    from mapreduce_rust_spark.operators import olap as O
    rows = [(float(i), float(2 * i), float(100 - i) / 100, 0.01 * (i % 3))
            for i in range(1, 50)]
    li = spark.createDataFrame(
        rows, "l_quantity double, l_extendedprice double, "
              "l_discount double, l_tax double")
    orig = O.load_table
    try:
        O.load_table = lambda s, d, n: li
        got = {(r.col_x, r.col_y): r.corr for r in
               O.corr_matrix_lineitem(spark, SF_SMOKE).collect()}
    finally:
        O.load_table = orig
    # price = 200·qty (cents grid), disc = 100−qty: ±1 up to the one
    # sqrt·sqrt product's final-ulp rounding
    assert abs(got[("qty", "price")] - 1.0) < 1e-14
    assert abs(got[("qty", "disc")] + 1.0) < 1e-14


from hypothesis import given, settings, strategies as st

_vals = st.lists(st.tuples(st.booleans(),
                           st.integers(min_value=0, max_value=12)),
                 min_size=2, max_size=60)


@settings(max_examples=10, deadline=None)
@given(data=_vals)
def test_mannwhitney_property_vs_python(spark, data):
    """For ANY (arm, value) multiset with ties, the doubled-midrank U
    must equal a direct python midrank computation."""
    from mapreduce_rust_spark.operators import experiment
    # need both arms present
    data = data + [(True, 0), (False, 0)]
    rows = [(2 * i + (1 if treat else 0),  # odd user_id = treat
             "2024-01-01 00:00:00", float(v))
            for i, (treat, v) in enumerate(data)]
    ev = (spark.createDataFrame(
              rows, "user_id long, raw string, value double")
          .select("user_id", F.col("raw").cast("timestamp").alias("ts"),
                  "value"))
    orig = experiment.load_table
    try:
        experiment.load_table = lambda s, d, n: ev
        got = experiment.mannwhitney_events(spark, SF_SMOKE).collect()[0]
    finally:
        experiment.load_table = orig

    vals = sorted((v, t) for t, v in data)
    # python midranks over the sorted multiset
    u2 = 0
    i = 0
    svals = [v for v, _ in vals]
    while i < len(svals):
        j = i
        while j < len(svals) and svals[j] == svals[i]:
            j += 1
        r2 = (i + 1) + (j)          # 2·midrank = (i+1) + j
        u2 += sum(r2 for k in range(i, j) if vals[k][1])
        i = j
    nt = sum(1 for t, _ in data if t)
    u2 -= nt * (nt + 1)
    assert got.u2 == u2
    assert got.n_treat == nt and got.n_ctrl == len(data) - nt


_two_src = st.lists(st.tuples(st.sampled_from(["a", "b"]),
                              st.integers(min_value=0, max_value=20)),
                    min_size=2, max_size=60)


@settings(max_examples=10, deadline=None)
@given(data=_two_src)
def test_ks_property_vs_python(spark, data):
    """For ANY two-source value multiset, ks_num must equal the
    direct python sup over jump points of |cum_s·n_r − cum_r·n_s|."""
    from mapreduce_rust_spark.operators import monitoring
    data = data + [("a", 0), ("b", 0)]  # both sources present
    docs = spark.createDataFrame(
        [(s, v) for s, v in data], "source string, n_chars long")
    orig = monitoring.load_table
    try:
        monitoring.load_table = lambda s, d, n: docs
        got = {r.source: r for r in
               monitoring.ks_drift_sources(spark, SF_SMOKE).collect()}
    finally:
        monitoring.load_table = orig
    xs = sorted({v for _, v in data})
    for src in ("a", "b"):
        mine = [v for s, v in data if s == src]
        rest = [v for s, v in data if s != src]
        best = 0
        for x in xs:
            cs = sum(1 for v in mine if v <= x)
            cr = sum(1 for v in rest if v <= x)
            best = max(best, abs(cs * len(rest) - cr * len(mine)))
        assert got[src].ks_num == best, (src, data)
        assert got[src].n_src == len(mine)


def test_stl_lite_identities(spark):
    """Per-weekday residual means must vanish (the seasonal mean is
    defined exactly as the per-dow detrended mean), and a planted
    pure-weekly signal over a gap-free grid must decompose with ~zero
    residual everywhere."""
    from mapreduce_rust_spark.operators import monitoring as M

    rows = M.stl_lite_events(spark, SF_SMOKE).collect()
    assert rows
    by_dow = {}
    for r in rows:
        by_dow.setdefault(r.dow, []).append(r.residual)
        # additive identity holds by construction
        assert abs((r.value_c - r.trend - r.seasonal) - r.residual) < 1e-6
    for dow, res in by_dow.items():
        assert abs(sum(res) / len(res)) < 1e-6, dow

    # planted: value depends ONLY on weekday -> residual == 0 and
    # trend == the flat weekly mean on every interior day
    season = [700, 100, 300, 900, 500, 200, 400]
    ev = spark.createDataFrame(
        [(d, float(season[(d + 3) % 7]))
         for d in range(19723, 19723 + 28)], "day long, v double") \
        .select(F.timestamp_seconds(F.col("day") * 86400).alias("ts"),
                F.col("v").alias("value"))
    orig = M.load_table
    try:
        M.load_table = lambda s, dd, n: ev
        got = M.stl_lite_events(spark, SF_SMOKE).collect()
    finally:
        M.load_table = orig
    assert len(got) == 28 - 6
    weekly_mean = sum(x * 100 for x in season) / 7.0
    for r in got:
        assert abs(r.trend - weekly_mean) < 1e-9
        assert abs(r.residual) < 1e-9
        assert abs(r.seasonal - (season[(r.day + 3) % 7] * 100
                                 - weekly_mean)) < 1e-9


def test_fano_closed_form_on_planted_traffic(spark):
    """A metronomic type (1 event/day) must score F = 0; a two-burst
    type (10 events on the first and last day of a 10-day span) must
    hit the exact closed form (n*sum(c^2) - sum(c)^2)/(n*sum(c)) = 8,
    with the 8 empty days counted as implicit zeros."""
    from mapreduce_rust_spark.operators import monitoring as M

    rows = ([("steady", d) for d in range(10)]
            + [("burst", 0)] * 10 + [("burst", 9)] * 10)
    ev = spark.createDataFrame(rows, "event_type string, day long") \
        .select("event_type",
                F.timestamp_seconds(F.col("day") * 86400).alias("ts"))
    orig = M.load_table
    try:
        M.load_table = lambda s, dd, n: ev
        got = {r.event_type: r
               for r in M.fano_burstiness_events(spark, SF_SMOKE).collect()}
    finally:
        M.load_table = orig
    assert got["steady"].n_days == 10
    assert got["steady"].fano == 0.0
    assert got["steady"].mean_per_day == 1.0
    assert got["burst"].n_days == 10
    assert got["burst"].mean_per_day == 2.0
    assert got["burst"].fano == 8.0


def test_heaps_curve_totals_and_monotonicity(spark):
    """The curve's last point must equal the corpus totals (sum of
    token counts, global distinct vocabulary), both cumulative
    series must be nondecreasing in doc_id order, and vocabulary can
    never outgrow tokens."""
    from mapreduce_rust_spark.llm import textanalysis as T

    rows = sorted(T.heaps_curve_docs(spark, SF_SMOKE).collect(),
                  key=lambda r: r.doc_id)
    assert rows
    docs = T.load_table(spark, SF_SMOKE, "documents")
    toks = F.filter(F.split("text", T.WS_RE), lambda t: t != F.lit(""))
    n_tokens = docs.select(F.sum(F.size(toks))).collect()[0][0]
    n_vocab = (docs.select(F.explode(toks).alias("t"))
               .agg(F.countDistinct("t")).collect()[0][0])
    assert rows[-1].cum_tokens == n_tokens
    assert rows[-1].cum_vocab == n_vocab
    assert sum(r.new_types for r in rows) == n_vocab
    prev_t = prev_v = 0
    for r in rows:
        assert r.cum_tokens == prev_t + r.n_toks
        assert r.cum_vocab == prev_v + r.new_types
        assert r.cum_vocab <= r.cum_tokens
        prev_t, prev_v = r.cum_tokens, r.cum_vocab


def test_stream_fano_twin_equals_batch(spark):
    """The complete-mode daily-counts twin must be bit-identical to
    the batch Fano op (pure integer counts + one shared division)."""
    from mapreduce_rust_spark.operators.monitoring import (
        fano_burstiness_events)
    from mapreduce_rust_spark.streaming.windows import (
        stream_fano_burstiness)
    b = {(r.event_type, r.n_days, r.mean_per_day, r.fano)
         for r in fano_burstiness_events(spark, SF_SMOKE).collect()}
    t = {(r.event_type, r.n_days, r.mean_per_day, r.fano)
         for r in stream_fano_burstiness(spark, SF_SMOKE).collect()}
    assert b == t and b


def test_record_high_planted_sequence(spark):
    """Planted price path 5, 3, 8, 8, 2, 9 (one order/day) must flag
    exactly days {0, 2, 5} — first row, strict new highs only (the
    repeated 8 is NOT a record) — with the true previous best on each.
    Days span two 64-day buckets (day 150 in bucket 2) so the carry
    path is exercised, and day 150's price 9 beats a carry that came
    from a PRUNED row's bucket."""
    from mapreduce_rust_spark.operators import analytic as A

    prices = [(0, 5.0), (1, 3.0), (2, 8.0), (3, 8.0), (4, 2.0),
              (150, 9.0)]
    orders = spark.createDataFrame(
        [(i, float(p), f"1995-01-01") for i, (d, p) in enumerate(prices)],
        "o_orderkey long, o_totalprice double, _ string") \
        .select("o_orderkey", "o_totalprice",
                F.timestamp_seconds(
                    F.lit(0) + F.element_at(
                        F.array(*[F.lit(d * 86400) for d, _ in prices]),
                        F.col("o_orderkey").cast("int") + 1))
                .cast("timestamp_ntz").alias("o_orderdate"))
    orig = A._t
    try:
        A._t = lambda s, dd, n: orders
        got = sorted(A.record_high_orders(spark, SF_SMOKE).collect(),
                     key=lambda r: r.o_orderkey)
    finally:
        A._t = orig
    assert [(r.o_orderkey, r.cents, r.prev_best) for r in got] == [
        (0, 500, None), (2, 800, 500), (5, 900, 800)]


def test_assortativity_closed_form_on_planted_graphs(spark):
    """A star graph is maximally disassortative (r = −1 exactly: every
    edge joins the hub, degree n, to a leaf, degree 1); a triangle is
    degree-regular, so the denominator vanishes and r must be an
    honest NULL (the cross-engine ±Inf-vs-NULL guard)."""
    from mapreduce_rust_spark.operators import graph as G

    def run(baskets):
        rows = [(o, p) for o, parts in baskets for p in parts]
        li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
        orig = G.load_table
        try:
            G.load_table = lambda s, dd, n: li
            return G.assortativity_copurchase(spark, SF_SMOKE).collect()[0]
        finally:
            G.load_table = orig

    # star: hub part 0 co-purchased with each leaf in its own order
    star = run([(i, [0, 10 + i]) for i in range(5)])
    assert star.n_edges == 5 and star.n_nodes == 6
    assert star.assortativity == -1.0
    # triangle: one basket of 3 parts — 2-regular, r undefined
    tri = run([(0, [1, 2, 3])])
    assert tri.n_edges == 3
    assert tri.assortativity is None


def test_linkpred_planted_path_and_anti_join(spark):
    """On the path 0—5—9: seed 0 must predict 9 (one shared neighbor,
    jaccard 1/(1+2-1)... with degrees d(0)=1, d(9)=1, cn=1 → jaccard
    1.0) and must NOT predict 5 (already adjacent); wedges back to the
    seed itself are excluded."""
    from mapreduce_rust_spark.operators import graph as G

    li = spark.createDataFrame(
        [(100, 0), (100, 5), (200, 5), (200, 9)],
        "l_orderkey long, l_partkey long")
    orig = G.load_table
    try:
        G.load_table = lambda s, dd, n: li
        got = G.linkpred_common_neighbors(spark, SF_SMOKE).collect()
    finally:
        G.load_table = orig
    assert [(r.seed, r.cand, r.cn, r.jaccard, r.rnk) for r in got] == [
        (0, 9, 1, 1.0, 1)]


def test_token_budget_ppm_table_and_arithmetic(spark):
    """The ppm table must sum to exactly 1e6 over the fixture's 20
    sources, allocations must sum to ≤ the budget (DIV truncation
    only), and epochs must equal alloc/n_tokens exactly."""
    from mapreduce_rust_spark.llm.quality import (
        BUDGET_DEFAULT_PPM, BUDGET_PPM, TOKEN_BUDGET, token_budget_epochs)

    rows = token_budget_epochs(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    assert sum(r.ppm for r in rows) == 1_000_000
    assert (sum(BUDGET_PPM.values())
            + (20 - len(BUDGET_PPM)) * BUDGET_DEFAULT_PPM == 1_000_000)
    assert sum(r.alloc_tokens for r in rows) <= TOKEN_BUDGET
    for r in rows:
        assert r.alloc_tokens == TOKEN_BUDGET * r.ppm // 1_000_000
        assert r.epochs == r.alloc_tokens / r.n_tokens
        assert r.repeats == (r.alloc_tokens > r.n_tokens)


def test_strat_effect_planted_cells(spark):
    """Two planted strata with disjoint arm values must reproduce the
    exact cell means, effects, and weights; a stratum with an empty
    control arm must yield NULL mean_ctrl/effect."""
    from mapreduce_rust_spark.operators import experiment as E

    # Mon (day 1): treat users {1,3} value 2.00, ctrl {2,4} value 1.00
    # Tue (day 2): treat user {5} value 3.00, no ctrl rows
    rows = ([(1, 5 * 86400, 2.0), (3, 5 * 86400, 2.0),     # 1970-01-06 Tue?
             (2, 5 * 86400, 1.0), (4, 5 * 86400, 1.0),
             (5, 6 * 86400, 3.0)])
    ev = spark.createDataFrame(rows, "user_id long, sec long, value double") \
        .select("user_id", F.timestamp_seconds("sec").alias("ts"), "value")
    orig = E.load_table
    try:
        E.load_table = lambda s, d, n: ev
        got = {r.dow: r for r in
               E.strat_effect_events(spark, SF_SMOKE).collect()}
    finally:
        E.load_table = orig
    assert len(got) == 2
    full = [r for r in got.values() if r.n_ctrl == 2][0]
    solo = [r for r in got.values() if r.n_ctrl == 0][0]
    assert (full.n_treat, full.mean_treat, full.mean_ctrl,
            full.effect, full.weight) == (2, 2.0, 1.0, 1.0, 0.8)
    assert (solo.n_treat, solo.mean_treat, solo.mean_ctrl,
            solo.effect, solo.weight) == (1, 3.0, None, None, 0.2)


def test_dedup_multiplicity_planted_clusters(spark):
    """3 copies of A + 2 of B + 1 of C must report exactly the
    k ∈ {1, 2, 3} rows with the right cluster/doc/excess counts."""
    from mapreduce_rust_spark.llm import dedup as D

    rows = [(i, t) for i, t in enumerate(
        ["A", "A", "A", "B", "B", "C"])]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    orig = D.load_table
    try:
        D.load_table = lambda s, d, n: docs
        got = {r.n_copies: r for r in
               D.dedup_multiplicity_hist(spark, SF_SMOKE).collect()}
    finally:
        D.load_table = orig
    assert {(k, v.n_clusters, v.n_docs, v.n_excess)
            for k, v in got.items()} == {
        (3, 1, 3, 2), (2, 1, 2, 1), (1, 1, 1, 0)}


def test_trigram_cosine_planted_sources(spark):
    """'aaaa' vs 'aaab': dot = 2·1, norms 4 and 2 → the exact IEEE
    value 2/(sqrt(4)·sqrt(2)); identical sources → cosine 1.0;
    a disjoint-alphabet source pair must emit NO row (inner-join
    semantics)."""
    import math
    from mapreduce_rust_spark.llm import textanalysis as T

    docs = spark.createDataFrame(
        [(0, "aaaa", "s1"), (1, "aaab", "s2"),
         (2, "aaaa", "s3"), (3, "zzzz", "s4")],
        "doc_id long, text string, source string")
    orig = T.load_table
    try:
        T.load_table = lambda s, d, n: docs
        got = {(r.src_a, r.src_b): r for r in
               T.source_trigram_cosine(spark, SF_SMOKE).collect()}
    finally:
        T.load_table = orig
    # s1 grams: 'aaaa' → aaa,aaa → c=2, n2=4; s2: aaa,aab → n2=2
    r12 = got[("s1", "s2")]
    assert r12.dot == 2   # 2 (aaa in s1) × 1 (aaa in s2)
    assert r12.cosine == 2.0 / (math.sqrt(4.0) * math.sqrt(2.0))
    assert got[("s1", "s3")].cosine == 1.0
    assert not any("s4" in k for k in got)


def test_longest_run_planted_docs(spark):
    """'a a a b b a' → run (3, 'a', start 0); a tie between two equal
    runs must pick the earliest start; a single-token doc reports run
    1; an empty doc is omitted."""
    from mapreduce_rust_spark.llm import quality as Q

    docs = spark.createDataFrame(
        [(0, "a a a b b a"), (1, "x y y z z w"), (2, "solo"), (3, "  ")],
        "doc_id long, text string")
    orig = Q.load_table
    try:
        Q.load_table = lambda s, d, n: docs
        got = {r.doc_id: r for r in
               Q.longest_run_docs(spark, SF_SMOKE).collect()}
    finally:
        Q.load_table = orig
    assert (got[0].run_len, got[0].run_tok, got[0].run_start) == (3, "a", 0)
    # y-run at pos 1 and z-run at pos 3 both have length 2 → earliest
    assert (got[1].run_len, got[1].run_tok, got[1].run_start) == (2, "y", 1)
    assert (got[2].run_len, got[2].run_tok) == (1, "solo")
    assert 3 not in got


def test_leakage_safe_split_no_pair_crosses(spark):
    """THE invariant: no verified near-dup pair may straddle a split
    boundary — checked on the fixture corpus; exact duplicates (a
    fortiori near-dups) must share a split; every doc gets exactly
    one split label."""
    from mapreduce_rust_spark.llm.dedup import minhash_lsh_pairs
    from mapreduce_rust_spark.llm.pipeline import leakage_safe_split_docs

    from mapreduce_rust_spark.tables import load_table

    split = {r.doc_id: r.split
             for r in leakage_safe_split_docs(spark, SF_SMOKE).collect()}
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(split) == n_docs, (len(split), n_docs)  # full coverage
    assert set(split.values()) <= {"train", "val", "test"}
    pairs = minhash_lsh_pairs(spark, SF_SMOKE) \
        .select("doc_a", "doc_b").collect()
    assert pairs, "fixture must contain near-dup pairs for this test"
    for p in pairs:
        assert split[p.doc_a] == split[p.doc_b], (p.doc_a, p.doc_b)


def test_editdist1_fastss_complete_vs_bruteforce(spark):
    """The deletion-neighborhood join must return EXACTLY the
    brute-force set of dist-≤1 pairs: substitution, deletion, and
    insertion neighbors all found; dist-2 pairs and other-nation rows
    excluded."""
    from mapreduce_rust_spark.llm import textanalysis as T

    names = {1: "abc", 2: "abd", 3: "ab", 4: "abcd", 5: "zzz",
             6: "abc"}   # 6 duplicates 1 → dist-0 pair
    cust = spark.createDataFrame(
        [(k, v, 0) for k, v in names.items()] + [(7, "abe", 3)],
        "c_custkey long, c_name string, c_nationkey long")
    orig = T.load_table
    try:
        T.load_table = lambda s, d, n: cust
        got = {(r.cust_a, r.cust_b): r.dist for r in
               T.editdist1_name_pairs(spark, SF_SMOKE).collect()}
    finally:
        T.load_table = orig

    def lev(a, b):
        import itertools
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            nd = [i]
            for j, cb in enumerate(b, 1):
                nd.append(min(d[j] + 1, nd[-1] + 1,
                              d[j - 1] + (ca != cb)))
            d = nd
        return d[-1]

    want = {(a, b): lev(names[a], names[b])
            for a in names for b in names
            if a < b and lev(names[a], names[b]) <= 1}
    assert got == want
    assert got[(1, 6)] == 0          # exact-dup pair found
    assert (3, 4) not in got         # dist 2 correctly rejected
    assert not any(7 in k for k in got)   # other nation filtered


def test_stream_strat_effect_twin_equals_batch(spark):
    """The complete-mode cells twin must be bit-identical to the
    batch post-stratified readout (integer cells + shared closed
    form)."""
    from mapreduce_rust_spark.operators.experiment import (
        strat_effect_events)
    from mapreduce_rust_spark.streaming.windows import (
        stream_strat_effect)
    key = lambda r: (r.dow, r.n_treat, r.n_ctrl, r.mean_treat,
                     r.mean_ctrl, r.effect, r.weight)
    b = {key(r) for r in strat_effect_events(spark, SF_SMOKE).collect()}
    t = {key(r) for r in stream_strat_effect(spark, SF_SMOKE).collect()}
    assert b == t and b


def test_two_proportion_planted_arms(spark):
    """4v4 users with 3-vs-1 converters must yield the hand-computed
    z = 0.5 / sqrt(0.5·0.5·(1/4 + 1/4)) (same IEEE DAG); identical
    full-conversion arms must yield NULL z (se = 0)."""
    import math
    from mapreduce_rust_spark.operators import experiment as E

    def run(rows):
        ev = spark.createDataFrame(
            rows, "user_id long, sec long, event_type string") \
            .select("user_id", F.timestamp_seconds("sec").alias("ts"),
                    "event_type", F.lit(1.0).alias("value"))
        orig = E.load_table
        try:
            E.load_table = lambda s, d, n: ev
            return E.two_proportion_test_events(spark, SF_SMOKE) \
                .collect()[0]
        finally:
            E.load_table = orig

    # treat = odd ids {1,3,5,7}: 3 convert; ctrl {2,4,6,8}: 1 converts
    rows = ([(u, 0, "purchase") for u in (1, 3, 5, 2)]
            + [(u, 0, "view") for u in (7, 4, 6, 8)])
    got = run(rows)
    assert (got.n_treat, got.n_ctrl, got.conv_treat, got.conv_ctrl) \
        == (4, 4, 3, 1)
    assert got.p_treat == 0.75 and got.p_ctrl == 0.25
    assert got.z == (0.75 - 0.25) / math.sqrt(
        0.5 * (1.0 - 0.5) * (1.0 / 4.0 + 1.0 / 4.0))
    # degenerate: everyone converts -> pooled variance 0 -> NULL z
    allconv = [(u, 0, "purchase") for u in (1, 2, 3, 4)]
    assert run(allconv).z is None


def test_backlog_sweep_line_planted_intervals(spark):
    """Intervals [(day0..2), (day1..1)] must produce the exact step
    function 1, 2, 1, 0 at delta days 0..3; deltas must net to zero
    and the level must match a brute-force per-day count."""
    from mapreduce_rust_spark.operators import olap as O

    orders = spark.createDataFrame(
        [(1, 0), (2, 1)], "o_orderkey long, sd long") \
        .select("o_orderkey",
                F.timestamp_seconds(F.col("sd") * 86400)
                .cast("timestamp_ntz").alias("o_orderdate"))
    lines = spark.createDataFrame(
        [(1, 2), (2, 1)], "l_orderkey long, ed long") \
        .select("l_orderkey",
                F.timestamp_seconds(F.col("ed") * 86400)
                .cast("timestamp_ntz").alias("l_shipdate"))
    orig = O.load_table
    try:
        O.load_table = lambda s, d, n: orders if n == "orders" else lines
        got = sorted(O.open_lines_backlog_daily(spark, SF_SMOKE)
                     .collect(), key=lambda r: r.day)
    finally:
        O.load_table = orig
    assert [(r.day, r.net_change, r.open_lines) for r in got] == [
        (0, 1, 1), (1, 1, 2), (2, -1, 1), (3, -1, 0)]
    assert sum(r.net_change for r in got) == 0


def test_xyz_classes_planted_demand(spark):
    """Constant weekly demand must class X with cv = 0; a 2,2,2,0
    series over a 4-week span has CV² = 1/3 → Y; a single-burst
    series has CV² = 3 → Z — all boundaries decided by the integer
    cross-multiplication, cv by the exact closed form."""
    import math
    from mapreduce_rust_spark.operators import olap as O

    rows = ([("A", w, 1) for w in range(4)]            # constant
            + [("B", 0, 8)]                            # one burst
            + [("C", 0, 2), ("C", 1, 2), ("C", 2, 2)])  # 2,2,2,0
    li = spark.createDataFrame(
        [(p, w, q) for p, w, q in rows],
        "pname string, w long, q long") \
        .select(F.abs(F.hash("pname")).alias("l_partkey"), "pname",
                F.timestamp_seconds(F.col("w") * 7 * 86400)
                .cast("timestamp_ntz").alias("l_shipdate"),
                F.col("q").cast("double").alias("l_quantity"))
    keys = {r.pname: r.l_partkey for r in
            li.select("pname", "l_partkey").distinct().collect()}
    orig = O.load_table
    try:
        O.load_table = lambda s, d, n: li
        got = {r.part: r for r in
               O.xyz_variability_parts(spark, SF_SMOKE).collect()}
    finally:
        O.load_table = orig
    a, b, c = got[keys["A"]], got[keys["B"]], got[keys["C"]]
    assert (a.xyz, a.cv, a.n_weeks, a.total_qty) == ("X", 0.0, 4, 4)
    assert b.xyz == "Z" and b.cv == math.sqrt(3.0)
    assert c.xyz == "Y" and c.cv == math.sqrt(12.0 / 36.0)


def test_stream_two_proportion_twin_equals_batch(spark):
    """The complete-mode per-user-conversion twin must be
    bit-identical to the batch z-test (idempotent-max state + shared
    closed form)."""
    from mapreduce_rust_spark.operators.experiment import (
        two_proportion_test_events)
    from mapreduce_rust_spark.streaming.windows import (
        stream_two_proportion)
    b = two_proportion_test_events(spark, SF_SMOKE).collect()[0]
    t = stream_two_proportion(spark, SF_SMOKE).collect()[0]
    assert (b.n_treat, b.n_ctrl, b.conv_treat, b.conv_ctrl,
            b.p_treat, b.p_ctrl, b.z) == \
        (t.n_treat, t.n_ctrl, t.conv_treat, t.conv_ctrl,
         t.p_treat, t.p_ctrl, t.z)


_seqs = st.lists(st.tuples(st.integers(min_value=0, max_value=200),
                           st.integers(min_value=0, max_value=50)),
                 min_size=1, max_size=60)


@settings(max_examples=10, deadline=None)
@given(seq=_seqs)
def test_record_high_property_vs_python(spark, seq):
    """For ANY (day, price) multiset — duplicate days, bucket
    boundaries, monotone and adversarial orders — the pruned
    two-phase prefix-MAX must flag exactly the strict records of the
    (day, key) sequence with the exact previous best."""
    from mapreduce_rust_spark.operators import analytic as A

    rows = [(i, d, float(p)) for i, (d, p) in enumerate(seq)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, d long, o_totalprice double") \
        .select("o_orderkey", "o_totalprice",
                F.timestamp_seconds(F.col("d") * 86400)
                .cast("timestamp_ntz").alias("o_orderdate"))
    orig = A._t
    try:
        A._t = lambda s, dd, n: orders
        got = {r.o_orderkey: (r.cents, r.prev_best) for r in
               A.record_high_orders(spark, SF_SMOKE).collect()}
    finally:
        A._t = orig

    best = None
    want = {}
    for i, d, p in sorted(rows, key=lambda r: (r[1], r[0])):
        c = round(p * 100)
        if best is None or c > best:
            want[i] = (c, best)
        best = c if best is None else max(best, c)
    assert got == want


def test_recsys_eval_planted_hit_and_miss(spark):
    """Train CF on baskets where parts 1 and 2 co-occur twice
    (passing ITEM_CF_MIN_CO); eval customer 10 holds out a basket
    containing the known neighbor (hit), customer 20 holds out an
    unrelated part (miss) → n_eval 2, n_hit 1, rate 0.5. Filler
    customers (single order, non-multiple-of-10 keys) train the
    model but stay out of the denominator."""
    from mapreduce_rust_spark.operators import olap as O

    # (orderkey, custkey, day) — custkeys 10/20 are in the 10% sample
    orders = [(1, 10, 0), (2, 10, 1),      # eval cust 10: hist O1, hold O2
              (3, 20, 0), (4, 20, 1),      # eval cust 20: hist O3, hold O4
              (5, 3, 0), (6, 7, 0)]        # filler: train co-occurrence
    lines = [(1, 1), (2, 2),               # hist {1} -> hold {2}
             (3, 1), (4, 9),               # hist {1} -> hold {9}
             (5, 1), (5, 2), (6, 1), (6, 2)]  # {1,2} co-occurs twice
    odf = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, d long") \
        .select("o_orderkey", "o_custkey",
                F.timestamp_seconds(F.col("d") * 86400)
                .cast("timestamp_ntz").alias("o_orderdate"))
    ldf = spark.createDataFrame(
        lines, "l_orderkey long, l_partkey long")
    orig = O.load_table
    try:
        O.load_table = lambda s, d, n: odf if n == "orders" else ldf
        got = O.recsys_eval_hitrate(spark, SF_SMOKE).collect()[0]
    finally:
        O.load_table = orig
    assert (got.n_eval, got.n_hit, got.hit_rate) == (2, 1, 0.5)
