"""Plan + semantics audits for the analytic breadth (TPC-H shapes,
correlated subqueries, unpivot, explode_outer, advanced windows) and
the sharding/embedding operators. Value correctness is the driver
oracle's job; these pin the PHYSICAL properties that decide 100 TB
viability and the semantic edges the oracles can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_predicates_reach_scan(spark):
    """Q6 is the canonical pushdown probe: every filter column must be
    in PushedFilters, and ReadSchema must carry only the 4 needed
    columns."""
    from mapreduce_rust_spark.operators.analytic import q6_forecast_revenue
    scan = q6_forecast_revenue(spark, SF_CORRECT) \
        ._jdf.queryExecution().sparkPlan().toString()
    assert "PushedFilters: [" in scan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan.split("PushedFilters:")[1].splitlines()[0]
    read_schema = scan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_q3_q10_topk_plans_take_ordered(spark):
    """The top-N of Q3/Q10 must plan as TakeOrderedAndProject (per-
    partition heaps), never a global range sort of all groups."""
    from mapreduce_rust_spark.operators.analytic import (
        q3_shipping_priority, q10_returned_items)
    for fn in (q3_shipping_priority, q10_returned_items):
        plan = _plan(fn(spark, SF_CORRECT))
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan


def test_q5_broadcasts_all_dims(spark):
    from mapreduce_rust_spark.operators.analytic import q5_local_supplier
    plan = _plan(q5_local_supplier(spark, SF_CORRECT))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier+nation+region


def test_exists_rewrites_to_semi_and_anti_joins(spark):
    """Catalyst must decorrelate EXISTS/NOT EXISTS into single semi /
    anti hash joins — no per-row subquery execution."""
    from mapreduce_rust_spark.operators.analytic import (
        exists_big_order_customers, not_exists_idle_suppliers)
    p1 = _plan(exists_big_order_customers(spark, SF_CORRECT))
    assert "LeftSemi" in p1
    p2 = _plan(not_exists_idle_suppliers(spark, SF_CORRECT))
    assert "LeftAnti" in p2
    for p in (p1, p2):
        assert "CartesianProduct" not in p


def test_unpivot_is_expand_no_shuffle(spark):
    """unpivot = one Expand over one scan; melting must not shuffle."""
    from mapreduce_rust_spark.operators.analytic import unpivot_part_metrics
    plan = _plan(unpivot_part_metrics(spark, SF_CORRECT))
    assert "Expand" in plan
    assert "Exchange" not in plan


def test_explode_outer_preserves_empty_docs(spark):
    """Docs with no rare tokens must keep a NULL row (the LEFT-shaped
    lateral); plain explode would drop them."""
    from mapreduce_rust_spark.operators.analytic import (
        explode_outer_rare_tokens)
    df = explode_outer_rare_tokens(spark, SF_CORRECT)
    n_docs = df.select("doc_id").distinct().count()
    assert n_docs == 500  # every doc survives
    assert df.filter(F.col("rare_tok").isNull()).count() > 0


def test_new_windows_are_partition_bounded(spark):
    """No new window may run unpartitioned over the full input (the
    single-task trap): every Window node must carry a partition
    spec."""
    import re
    from mapreduce_rust_spark.operators.analytic import (
        window_first_last_orders, window_ntile_orders,
        window_range_hour_events)
    from mapreduce_rust_spark.llm.sharding import shuffle_shard_docs
    for fn in (window_range_hour_events, window_ntile_orders,
               window_first_last_orders, shuffle_shard_docs):
        plan = _plan(fn(spark, SF_CORRECT))
        for line in plan.splitlines():
            if re.search(r"\bWindow\b", line):
                assert "hashpartitioning" in plan or "partitionBy" in line, \
                    f"{fn.__name__} window looks unpartitioned:\n{line}"


def test_window_range_frame_semantics(spark):
    """The RANGE frame must include exactly the events within 3599 s
    before each row (verified on one user against a Python replay)."""
    from mapreduce_rust_spark.operators.analytic import (
        window_range_hour_events)
    rows = (window_range_hour_events(spark, SF_CORRECT)
            .filter(F.col("user_id") == 7).collect())
    raw = {(r.epoch, r.event_id): r.hour_sum for r in rows}
    from mapreduce_rust_spark.tables import load_table
    ev = (load_table(spark, SF_CORRECT, "events")
          .filter(F.col("user_id") == 7)
          .select(F.col("ts").cast("long").alias("epoch"), "event_id",
                  F.bround(F.col("value") * 1e6, 0).cast("long").alias("vq"))
          .collect())
    src = sorted((r.epoch, r.event_id, r.vq) for r in ev)
    for epoch, eid, _ in src:
        want = sum(vq for e2, _, vq in src if epoch - 3599 <= e2 <= epoch)
        assert abs(raw[(epoch, eid)] - want / 1e6) < 1e-9


def test_dup_ngram_fraction_bounds_and_short_docs(spark):
    from mapreduce_rust_spark.llm.sharding import dup_ngram_fraction_docs
    rows = dup_ngram_fraction_docs(spark, SF_CORRECT).collect()
    assert len(rows) == 500
    assert all(0.0 <= r.dup_frac <= 1.0 for r in rows)
    assert all(r.n_dup <= r.n_grams for r in rows)
    assert any(r.dup_frac > 0 for r in rows)  # fixture has near-dups


def test_shuffle_shard_is_balanced_permutation(spark):
    """Every doc appears exactly once; positions are dense 1..n per
    shard; shard sizes are within a sane band of uniform."""
    from mapreduce_rust_spark.llm.sharding import N_SHARDS, shuffle_shard_docs
    rows = shuffle_shard_docs(spark, SF_CORRECT).collect()
    assert len({r.doc_id for r in rows}) == 500
    from collections import defaultdict
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r.pos)
    assert set(by_shard) <= set(range(N_SHARDS))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 3 * (500 // N_SHARDS)  # no pathological skew


def test_embedding_quantize_range_and_norm(spark):
    """int8 range respected; quantized vector re-normalizes to ~unit
    length (quantization error ≤ 1% at 64 dims)."""
    from mapreduce_rust_spark.llm.sharding import (
        embedding_normalize_quantize)
    df = embedding_normalize_quantize(spark, SF_CORRECT)
    agg = (df.groupBy("vec_id")
             .agg(F.max(F.abs(F.col("q"))).alias("maxq"),
                  F.sum(F.col("q") * F.col("q")).alias("sumsq"))
             .collect())
    assert len(agg) == 500
    for r in agg:
        assert r.maxq <= 127
        # ||q|| should be close to 127 (unit vector scaled)
        assert abs((r.sumsq ** 0.5) - 127.0) < 127.0 * 0.15


def test_hll_mergeable_sketch_accuracy(spark):
    """The max-merged monthly register rollup must (a) equal the
    directly-computed per-flag registers (merge is LOSSLESS, not
    just 'close' — the round-12 deterministic-HLL upgrade) and
    (b) estimate distinct parts within 10% of exact."""
    from mapreduce_rust_spark.operators.analytic import sketch_hll_mergeable
    from mapreduce_rust_spark.operators.relational import (
        sketch_distinct_parts)
    from mapreduce_rust_spark.tables import load_table
    merged = {r.l_returnflag: r
              for r in sketch_hll_mergeable(spark, SF_CORRECT).collect()}
    direct = {r.l_returnflag: r
              for r in sketch_distinct_parts(spark, SF_CORRECT).collect()}
    exact = {r.l_returnflag: r.x for r in
             load_table(spark, SF_CORRECT, "lineitem")
             .groupBy("l_returnflag")
             .agg(F.countDistinct("l_partkey").alias("x")).collect()}
    assert set(merged) == set(exact) == set(direct)
    for k in exact:
        m, d = merged[k], direct[k]
        assert (m.sum_scaled, m.reg_sum, m.zero_regs, m.est_raw) == \
            (d.sum_scaled, d.reg_sum, d.zero_regs, d.est_raw)
        assert m.n_sketches >= 1
        assert abs(m.est_raw - exact[k]) <= 0.10 * exact[k]


def test_stats_agg_matches_numpy(spark):
    """The power-sum corr/var must agree with numpy's reference
    implementation to float tolerance (the oracle proves cross-engine
    bit-parity; this proves the STATISTIC is right)."""
    import numpy as np
    from mapreduce_rust_spark.operators.analytic import stats_agg_lineitem
    from mapreduce_rust_spark.tables import load_table
    got = {r.l_returnflag: r for r in
           stats_agg_lineitem(spark, SF_CORRECT).collect()}
    pdf = (load_table(spark, SF_CORRECT, "lineitem")
           .select("l_returnflag", "l_quantity", "l_discount").toPandas())
    for flag, grp in pdf.groupby("l_returnflag"):
        x, y = grp.l_quantity.values, grp.l_discount.values
        assert abs(got[flag].var_qty - np.var(x, ddof=1)) < 1e-6
        assert abs(got[flag].covar_qty_disc
                   - np.cov(x, y, ddof=1)[0, 1]) < 1e-9
        assert abs(got[flag].corr_qty_disc - np.corrcoef(x, y)[0, 1]) < 1e-9


def test_knn_quantized_recall_vs_float(spark):
    """int8 quantization must preserve most of the exact float top-5
    neighbor sets (recall >= 0.8 on the fixture)."""
    from collections import defaultdict
    from mapreduce_rust_spark.llm.similarity import (
        knn_bruteforce, knn_quantized)
    exact = defaultdict(set)
    for r in knn_bruteforce(spark, SF_CORRECT).collect():
        exact[r.query_id].add(r.neighbor_id)
    quant = defaultdict(set)
    for r in knn_quantized(spark, SF_CORRECT).collect():
        quant[r.query_id].add(r.neighbor_id)
    assert set(exact) == set(quant)
    hits = sum(len(exact[q] & quant[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.8, f"quantized recall {hits}/{total}"


def test_observe_metrics_on_pipeline(spark):
    """df.observe collects pipeline health metrics (row counts, sums)
    as a side channel of the SAME action — no second scan. The
    ops-monitoring hook a production curation job attaches to every
    stage."""
    from pyspark.sql import Observation
    from mapreduce_rust_spark.tables import load_table
    obs = Observation("curation_metrics")
    docs = load_table(spark, SF_CORRECT, "documents")
    gated = (docs.observe(obs,
                          F.count(F.lit(1)).alias("rows_in"),
                          F.sum(F.length("text")).alias("chars_in"))
                 .filter(F.length("text") >= 100))
    n_out = gated.count()
    m = obs.get
    assert m["rows_in"] == 500
    assert m["chars_in"] > 0
    assert n_out <= m["rows_in"]


def test_merge_upsert_property(spark):
    """merge_upsert vs a dict-based merge simulator on generated
    (key, value) tables with overlapping/disjoint keys and NULL
    values — the update-wins / insert / keep semantics hold row-for-
    row. (NULL source values fall back to target per COALESCE —
    documented MERGE SET * semantics under partial-null sources.)"""
    from pyspark.sql import Row
    from mapreduce_rust_spark.operators.merge import merge_upsert

    target = [(k, f"t{k}", float(k)) for k in range(50)]
    # updates for 0..24 (every other one carrying a NULL attr),
    # inserts for 100..109
    source = [(k, None if k % 2 else f"s{k}", 1000.0 + k)
              for k in range(0, 25)] + \
             [(k, f"s{k}", float(k)) for k in range(100, 110)]
    tdf = spark.createDataFrame([Row(k=k, name=n, v=v) for k, n, v in target])
    sdf = spark.createDataFrame(
        [Row(k=k, name=n, v=v) for k, n, v in source],
        schema=tdf.schema)
    got = {(r.k): (r.name, r.v)
           for r in merge_upsert(tdf, sdf, "k").collect()}

    want = {k: (n, v) for k, n, v in target}
    for k, n, v in source:
        old = want.get(k, (None, None))
        want[k] = (n if n is not None else old[0],
                   v if v is not None else old[1])
    assert got == want
