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
# Round-6 window (the round-5 window went 50/50 green — see COVERAGE.md):
# 50 of the 62 oracled queries registered during round 5 that have NEVER
# carried a driver row. Every order-sensitive streaming twin is scheduled
# WITH its batch op (dow/chisq/ewma/markov/attribution/active-users/holt
# pairs) so the artifact shows batch and stream passing the SAME DuckDB
# oracle. The 12 deferrals (standalone, categories already driver-proven)
# are queued for round 7 alongside the next-oldest stale re-proofs —
# see COVERAGE.md "Queued for the round-7 window".
DRIVER_WINDOW = [
    # --- seasonality / chi-square twins ---
    "dow_seasonality_events", "stream_dow_profile",
    "chisq_cells_events", "stream_chisq_cells",
    # --- Markov transition twins + time-series surface ---
    "markov_transitions_events", "stream_markov_transitions",
    "interp_gapfill_events", "rolling_median_orders",
    "seasonal_outlier_events", "lagged_corr_events",
    "forecast_backtest_events", "conformal_interval_events",
    "theil_sen_trend_events",
    # --- order-sensitive recurrence twins (EWMA / Holt) ---
    "ewma_user_value", "stream_ewma_user_value",
    "holt_user_value", "stream_holt_user_value",
    # --- attribution / activity twins ---
    "attribution_last_touch", "stream_attribution",
    "active_users_7d", "stream_active_users_7d", "active_streaks_users",
    # --- data-quality / integrity ---
    "benford_orders", "table_checksum_orders", "k_anonymity_orders",
    # --- IR / text wing ---
    "bm25_search_docs", "collocations_pmi_docs", "simpson_diversity_sources",
    "source_vocab_overlap", "kwic_snippets_docs",
    # --- dedup wing ---
    "winnow_pairs_docs", "containment_pairs_docs", "semantic_dedup_embeddings",
    "dedup_eval_lsh",
    # --- quality / mixture ---
    "quantile_normalize_docs", "temperature_mix_docs",
    # --- OLAP / retail analytics ---
    "assoc_rules_parts", "abc_pareto_parts", "rfm_segments",
    "skyline_parts", "cumulative_distinct_users", "weighted_median_price",
    "life_table_reorders",
    # --- experimentation ---
    "did_estimate_events", "cuped_adjusted_events",
    # --- graph ---
    "labelprop_components", "clustering_coeff_parts",
    # --- embeddings ---
    "embedding_covariance", "hard_negatives", "cluster_keywords_embeddings",
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
