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
# Round-7 window (the round-6 window went 50/50 green — see COVERAGE.md):
# ALL 49 oracled queries that have never carried a driver row — the 12
# round-5 deferrals plus the 37-query oracled round-6 crop — plus one
# staleness re-proof slot (TPC-H q3, whose newest driver row is r2).
# Every streaming kappa twin is scheduled WITH its batch op
# (mannwhitney / event_pattern / fano / strat / two_proportion pairs)
# so the artifact shows batch and stream passing the SAME DuckDB
# oracle. After a green r7 artifact, every oracled query in the
# registry carries a driver row; round 8 rotates to the r2/r3 stale
# re-proof queue written in COVERAGE.md.
DRIVER_WINDOW = [
    # --- round-5 deferrals (12) ---
    "equidepth_hist_totalprice", "session_path_counts", "ttr_docs",
    "bigram_lm_docs", "copurchase_degree_hist", "auc_quality_docs",
    "calibration_bins_docs", "retrieval_eval_bm25", "key_skew_stats",
    "l_diversity_orders", "readability_docs", "funnel_time_to_convert",
    # --- round-6 crop: graph wing ---
    "pagerank_exact_parts", "ppr_seeded_parts", "kcore_parts",
    "assortativity_copurchase", "linkpred_common_neighbors",
    # --- round-6 crop: experimentation + streaming kappa twins ---
    "mannwhitney_events", "stream_mannwhitney",
    "event_pattern_funnel", "stream_event_pattern",
    "fano_burstiness_events", "stream_fano_burstiness",
    "strat_effect_events", "stream_strat_effect",
    "two_proportion_test_events", "stream_two_proportion",
    "ks_drift_sources",
    # --- round-6 crop: temporal / time-series ---
    "ewma_user_value_chunked", "holt_user_value_chunked",
    "stl_lite_events", "record_high_orders",
    # --- round-6 crop: recsys / OLAP / ops analytics ---
    "item_cf_neighbors", "recsys_eval_hitrate", "lift_table_docs",
    "xyz_variability_parts", "open_lines_backlog_daily",
    "bounce_rate_daily", "corr_matrix_lineitem", "cdc_apply_orders",
    # --- round-6 crop: text / IR ---
    "phrase_search_docs", "source_trigram_cosine", "heaps_curve_docs",
    "editdist1_name_pairs", "longest_run_docs",
    # --- round-6 crop: LLM curation + multimodal ---
    "dedup_multiplicity_hist", "token_budget_epochs",
    "knn_label_consensus", "multimodal_png_roundtrip",
    # --- staleness re-proof (oldest driver evidence: r2) ---
    "q3_shipping_priority",
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
