"""Custom stateful streaming — ``applyInPandasWithState``.

Per-user cumulative event counter: the state store keeps one (count,
sum) pair per user; each micro-batch folds its Arrow batches into the
state and emits the updated totals. This is the operator shape for
anything Spark's built-in aggregations can't express (per-key custom
accumulators, decaying counters, online sketches) — state is
partitioned by the group key, so it scales with keys, not events.

Emission is per-batch cumulative; the registry query folds the sink
with a final max() so the result is batch-count-independent (and
therefore deterministic under any AvailableNow batching).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mapreduce_rust_spark.streaming.windows import _run_to_table, read_events_stream

OUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, v double"


def _update_user_state(key, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "total_value": [v]})


def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user totals via custom state. Output: final
    cumulative row per user (max over per-batch emissions)."""
    from mapreduce_rust_spark.core.runner import _ensure_self_shipping
    _ensure_self_shipping()
    ev = read_events_stream(spark, sf_dir).select("user_id", "value")
    updated = (ev.groupBy("user_id")
                 .applyInPandasWithState(
                     _update_user_state, OUT_SCHEMA, STATE_SCHEMA,
                     "update", GroupStateTimeout.NoTimeout))
    out = _run_to_table(updated, "stream_stateful", "update")
    return (out.groupBy("user_id")
               .agg(F.max("n_events").alias("n_events")))


# value totals are float-accumulated in Python state (order-dependent),
# so only the count is oracle-checked; totals are covered in pytest.
STATEFUL_ORACLE = """
SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
"""


REGISTRATIONS = [
    ("stateful_user_totals", stateful_user_totals, STATEFUL_ORACLE),
]
