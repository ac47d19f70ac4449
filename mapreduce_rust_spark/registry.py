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
# Round-12 window (the round-11 window went 50/50 green — see
# COVERAGE.md): the 38-query round-11 crop first (every query whose
# only green so far is the round-11 judge mirror — the experiment
# rank/effect-size family with its kappa twins scheduled together,
# the monitoring χ²/trend/outlier ops + twins, the
# Lorenz/CR/GMD concentration trio, burstiness/encoding/HOF text
# ops, Matryoshka recall, µ-law + aHash multimodal, GROUPING_ID,
# k-anon ladder, the two watermark-semantics streams, and the
# Kendall τ-b pair), then Tier D's tail (2 r5-proven displacements)
# and the r4-mass head (10 TPC-H rows, 8 rounds stale). The r4-mass
# tail rolls to the round-13 queue written in COVERAGE.md. Ledger
# invariant: after a green round-N artifact, every query oracled
# BEFORE round N carries a hash-verified driver row; queries oracled
# DURING round N are judge-mirror green and queued for round N+1.
DRIVER_WINDOW = [
    # --- round-11 crop: experiment rank/effect sizes + kappa twins ---
    "cohens_d_events", "stream_cohens_d",
    "mcnemar_events", "stream_mcnemar",
    "jonckheere_events", "stream_jonckheere",
    "odds_ratio_events", "stream_odds_ratio",
    "friedman_events", "stream_friedman",
    "kendall_tau_events", "stream_kendall_tau",
    "stream_hodges_lehmann",
    # --- round-11 crop: monitoring + kappa twins ---
    "mood_median_k_events", "stream_mood_median_k",
    "cramers_v_events", "stream_cramers_v",
    "bartels_rank_events", "stream_bartels_rank",
    "cox_stuart_events", "stream_cox_stuart",
    "hampel_outliers_events", "stream_hampel",
    # --- round-11 crop: concentration / OLAP ---
    "lorenz_curve_nations", "cr_concentration_suppliers",
    "gini_mean_difference_orders", "stream_gmd",
    # --- round-11 crop: text / similarity / multimodal ---
    "token_burstiness_docs", "encoding_quality_docs",
    "hof_funcs_docs", "knn_prefix_dim_recall",
    "multimodal_audio_ulaw_stats", "stream_audio_ulaw_stats",
    "image_ahash_neardup",
    # --- round-11 crop: relational / privacy / watermark streams ---
    "grouping_id_rollup_qty", "k_anon_generalize_orders",
    "stream_interval_join_left", "stream_tumbling_append",
    # --- staleness Tier D tail (r5-proven displacements) ---
    "pps_sample_docs", "snapshot_diff_orders",
    # --- r4-mass head (newest row r4, 8 rounds stale) ---
    "q2_min_cost_supplier", "q11_important_parts",
    "q12_priority_lines", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_diversity", "q17_small_qty_revenue",
    "q19_disjunctive_revenue", "q20_excess_stock",
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
