"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship word-count query at sf0.001 (smoke).
``queries()`` / ``oracle_sql()`` — the engine's full operator
registry; see ``mapreduce_rust_spark/registry.py``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from mapreduce_rust_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: word count over documents at sf0.001 — the
    reference's bundled application (wc.rs) re-expressed Spark-first."""
    from mapreduce_rust_spark.operators.wordcount import word_count_sorted
    return word_count_sorted(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracles()
