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
# Round-11 window (the round-10 window went 50/50 green — see
# COVERAGE.md): the 20-query round-10 crop first (the knn_ivf
# rows-only→oracled conversion, IMA ADPCM decode + its kappa twin,
# the MinHash Jaccard-estimator audit, the rank-statistics batch ops
# with their four kappa twins scheduled together, Palma / Kish /
# capture–recapture / lang-id-kappa / label-centroid-distances), then
# staleness Tier B's tail (12 r3-proven TPC-H + relational rows),
# Tier C (the 15 r3-proven LLM-flagship rows), and Tier D's head
# (3 of the 5 r5-proven displacements). D's tail
# (pps_sample_docs, snapshot_diff_orders) rolls with the r4-proven
# mass into the round-12 queue written in COVERAGE.md. Ledger
# invariant: after a green round-N artifact, every query oracled
# BEFORE round N carries a hash-verified driver row; queries oracled
# DURING round N are judge-mirror green and queued for round N+1.
DRIVER_WINDOW = [
    # --- round-10 crop: similarity / dedup ---
    "knn_ivf", "dedup_minhash_jaccard_est",
    # --- round-10 crop: multimodal (ADPCM decode + its kappa twin) ---
    "multimodal_audio_adpcm_stats", "stream_audio_adpcm_stats",
    # --- round-10 crop: rank statistics + kappa twins (scheduled together) ---
    "rank_biserial_events", "stream_rank_biserial",
    "qte_events", "stream_qte",
    "runs_test_events", "stream_runs_test",
    "page_hinkley_events", "stream_page_hinkley",
    "tukey_fences_orders", "stream_tukey_fences",
    "hodges_lehmann_events",
    # --- round-10 crop: OLAP / sources / text ---
    "palma_ratio_nations", "label_centroid_distances",
    "lang_id_kappa_docs", "capture_recapture_sources",
    "kish_ess_sources",
    # --- staleness Tier B tail (newest row r3) ---
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q18_large_volume", "q21_waiting_supplier",
    "grouping_sets_revenue", "map_funcs_events", "rollup_merge_events",
    "window_range_hour_events", "winsorize_prices",
    "dq_check_orders_lineitem", "stateful_session_flush",
    # --- staleness Tier C (r3-proven LLM flagship) ---
    "exact_dedup_docs", "segment_dedup_docs", "minhash_lsh_pairs",
    "ngram_jaccard_pairs", "simhash_docs", "embedding_neardup_pairs",
    "knn_bruteforce", "token_stats_docs", "build_vocab", "tf_df_docs",
    "lang_id_docs", "quality_score_docs", "gopher_rules_docs",
    "contamination_docs", "pack_sequences_docs",
    # --- staleness Tier D head (r5-proven displacements) ---
    "interevent_gap_stats", "fuzzy_match_parts", "tv_drift_sources",
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
