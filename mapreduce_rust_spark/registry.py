"""Central query registry: name -> (spark_fn, oracle_sql | None).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this. Every operator the engine claims is registered here so the
driver's DuckDB comparison covers it; ops that aren't ANSI-SQL
expressible register ``None`` (driver falls back to rows-only).

ORDER MATTERS: the driver verifies only the FIRST 50 registrations
per round, so ``DRIVER_WINDOW`` below pins which 50 get this round's
CORRECTNESS rows. Queries proven green in a prior round's artifact
rotate out to make room for never-verified ones; COVERAGE.md is the
ledger of which artifact proved what, so rotation accumulates
evidence instead of churning it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_rust_spark.operators import wordcount

QueryFn = Callable[[SparkSession, str], DataFrame]

_STAGED: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    if name in _STAGED:
        raise ValueError(f"duplicate query name {name!r}")
    _STAGED[name] = (fn, oracle)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _ordered().items()}


def oracles() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _ordered().items() if sql is not None}


# The 50 queries the driver verifies this round (see module docstring).
# Round-5 window (the round-4 window went 50/50 green — see COVERAGE.md):
# the 30 oracled queries that have NEVER carried a driver row (the whole
# round-4 operator crop plus the three old deferrals), the tumbling
# streaming twin PAIR so the artifact shows batch and stream passing the
# SAME oracle (trend/zscore twins are in the crop already), and 18 slots
# re-proving the r1-proven relational core whose newest driver evidence
# is three rounds stale.
DRIVER_WINDOW = [
    # --- round-4 crop: substring spans, chunking, PPJoin, bloom ops ---
    "dup_span_docs", "chunk_stride_docs", "ppjoin_jaccard_pairs",
    "bloom_semijoin_revenue", "bloom_crawl_dedup",
    # incremental view maintenance
    "incremental_mv_orders",
    # monitoring family + streaming twins (twin and batch op both in
    # window: the twins pass the SAME DuckDB oracle as their batch op)
    "zscore_anomaly_events", "stream_zscore_anomaly",
    "trend_ols_events", "stream_trend_ols",
    "cusum_changepoint_events", "tv_drift_sources", "interevent_gap_stats",
    "tumbling_event_counts", "stream_tumbling_counts",
    # mixture balancing / curriculum / quality classifier
    "domain_mix_sample", "domain_upsample_docs", "quality_classifier_score",
    "curriculum_phase_docs",
    # similarity + multimodal remainder
    "allknn_within_label", "multimodal_resize", "multimodal_dedup_payload",
    # text analysis remainder
    "normalize_text_docs", "dedup_normalized_docs", "event_trigrams",
    "domain_keywords_docs", "boolean_search_docs", "bucket_pad_stats_docs",
    # OLAP remainder
    "funnel_timebound_events",
    # old deferrals
    "fuzzy_match_parts", "explode_outer_rare_tokens", "bpe_pair_counts",
    # --- r1 relational core re-proof (newest evidence r2; 3 rounds stale) ---
    "word_count", "word_count_sorted", "mr_word_count",
    "filter_project", "q1_pricing_summary",
    "join_revenue_by_nation", "join_left_order_counts", "join_semi_customers",
    "join_anti_customers", "join_theta_qty_gt_size", "join_full_outer_nations",
    "set_union_counts", "set_intersect_nations", "set_except_customers",
    "window_topk_orders", "window_running_total", "window_lag_delta",
    "window_rank_parts",
]


def _ordered() -> dict[str, tuple[QueryFn, str | None]]:
    """DRIVER_WINDOW first (driver checks the first 50), then the rest
    in registration order. Raises on a window name that doesn't exist —
    a rename must break loudly here, not silently shrink the window."""
    missing = [n for n in DRIVER_WINDOW if n not in _STAGED]
    if missing:
        raise KeyError(f"DRIVER_WINDOW names not registered: {missing}")
    out = {name: _STAGED[name] for name in DRIVER_WINDOW}
    out.update((n, v) for n, v in _STAGED.items() if n not in out)
    return out


# --- registrations -----------------------------------------------------

register("word_count", wordcount.word_count, wordcount.WORD_COUNT_ORACLE)
register("word_count_sorted", wordcount.word_count_sorted,
         wordcount.WORD_COUNT_SORTED_ORACLE)

from mapreduce_rust_spark.operators import mapreduce_compat  # noqa: E402
from mapreduce_rust_spark.operators import analytic, bloom, dataquality, graph, merge, olap, relational, skew, temporal, tpch, udaf  # noqa: E402

register("mr_word_count", mapreduce_compat.mr_word_count,
         mapreduce_compat.MR_WORD_COUNT_ORACLE)
register("mr_sessionize_secondary_sort",
         mapreduce_compat.mr_sessionize_secondary_sort,
         mapreduce_compat.MR_SESSIONIZE_ORACLE)

for _name, _fn, _oracle in relational.REGISTRATIONS:
    register(_name, _fn, _oracle)

for _name, _fn, _oracle in analytic.REGISTRATIONS:
    register(_name, _fn, _oracle)

for _name, _fn, _oracle in olap.REGISTRATIONS:
    register(_name, _fn, _oracle)

for _name, _fn, _oracle in tpch.REGISTRATIONS:
    register(_name, _fn, _oracle)

for _name, _fn, _oracle in merge.REGISTRATIONS:
    register(_name, _fn, _oracle)

for _name, _fn, _oracle in dataquality.REGISTRATIONS:
    register(_name, _fn, _oracle)

for _name, _fn, _oracle in temporal.REGISTRATIONS:
    register(_name, _fn, _oracle)

for _name, _fn, _oracle in skew.REGISTRATIONS:
    register(_name, _fn, _oracle)

for _name, _fn, _oracle in bloom.REGISTRATIONS:
    register(_name, _fn, _oracle)

for _name, _fn, _oracle in udaf.REGISTRATIONS:
    register(_name, _fn, _oracle)

for _name, _fn, _oracle in graph.REGISTRATIONS:
    register(_name, _fn, _oracle)

from mapreduce_rust_spark.llm import bpe, dedup, evaluation, multimodal, pipeline, quality, sharding, similarity, spans, textanalysis  # noqa: E402
from mapreduce_rust_spark.operators import experiment, monitoring  # noqa: E402
from mapreduce_rust_spark.streaming import stateful, windows  # noqa: E402

for _mod in (dedup, similarity, textanalysis, multimodal, pipeline,
             quality, sharding, spans, bpe, monitoring, experiment,
             evaluation,
             windows, stateful):
    for _name, _fn, _oracle in _mod.REGISTRATIONS:
        register(_name, _fn, _oracle)
