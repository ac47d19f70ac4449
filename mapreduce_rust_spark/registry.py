"""Central query registry: name -> (spark_fn, oracle_sql | None).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this. Every operator the engine claims is registered here so the
driver's DuckDB comparison covers it; ops that aren't ANSI-SQL
expressible register ``None`` (driver falls back to rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_rust_spark.operators import wordcount

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    _REGISTRY[name] = (fn, oracle)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# --- registrations -----------------------------------------------------

register("word_count", wordcount.word_count, wordcount.WORD_COUNT_ORACLE)
register("word_count_sorted", wordcount.word_count_sorted,
         wordcount.WORD_COUNT_SORTED_ORACLE)

from mapreduce_rust_spark.operators import mapreduce_compat  # noqa: E402
from mapreduce_rust_spark.operators import analytic, dataquality, merge, olap, relational, skew, temporal, tpch, udaf  # noqa: E402

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

for _name, _fn, _oracle in udaf.REGISTRATIONS:
    register(_name, _fn, _oracle)

from mapreduce_rust_spark.llm import dedup, multimodal, pipeline, quality, sharding, similarity, textanalysis  # noqa: E402
from mapreduce_rust_spark.streaming import stateful, windows  # noqa: E402

for _mod in (dedup, similarity, textanalysis, multimodal, pipeline,
             quality, sharding, windows, stateful):
    for _name, _fn, _oracle in _mod.REGISTRATIONS:
        register(_name, _fn, _oracle)
