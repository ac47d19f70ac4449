"""Scalable ranking — global / few-partition row numbering without a
global window.

A plain ``row_number() OVER (ORDER BY ...)`` (or one partitioned by a
low-cardinality key such as language) funnels the whole input through
as many Spark partitions as there are window keys — one, for a global
rank. The decomposition here is the same two-phase shape proven for
sessionize_events_scalable and cusum_changepoint_events, applied to
ranking: rows sub-shard on an ORDER-PRESERVING bucket (any monotone
function of the leading sort key), within-bucket ``row_number`` runs
in (part, bucket) partitions, and the carry-in offset per bucket
comes from a window over BUCKET COUNTS only (≤ a few thousand rows,
broadcast back). ``rank = local row_number + offset`` is exactly the
single-window rank, provable by hash-matching an oracle that uses the
naive window (curriculum_phase_docs, equidepth_hist_totalprice).

Reference scope: the reference's only ordering machinery is the
per-partition sort + global merge-sort of MapReduce output
(src/mr/worker.rs sort step, SURVEY §2a O6/O10); this module is how
the same "global order" semantics survive a 100 TB input on Spark.

NTILE over the scalable rank is closed-form integer arithmetic — see
``ntile_expr``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def scalable_rank(df: DataFrame, bucket: Column,
                  order_cols: Sequence, part_cols: Sequence[str] = (),
                  rank_col: str = "r") -> DataFrame:
    """Append ``rank_col`` = row_number over (part_cols ORDER BY
    order_cols) computed WITHOUT a per-part global window.

    ``bucket`` must be order-preserving w.r.t. ``order_cols``: for
    rows a, b in the same part, a before b implies bucket(a) <=
    bucket(b) (e.g. floor of the leading numeric sort key). The
    caller should materialize (localCheckpoint) ``df`` first if its
    lineage is expensive — this function consumes it twice (bucket
    counts + the rank join)."""
    part = list(part_cols)
    b = df.withColumn("_sb", bucket)
    counts = b.groupBy(*part, "_sb").agg(F.count("*").alias("_bn"))
    # window over bucket COUNTS only: |parts| x |buckets| rows, not data
    wb = (W.partitionBy(*part) if part else W.partitionBy()).orderBy("_sb")
    offs = counts.select(
        *part, "_sb", (F.sum("_bn").over(wb) - F.col("_bn")).alias("_off"))
    wl = W.partitionBy(*part, "_sb").orderBy(*order_cols)
    return (b.join(F.broadcast(offs), part + ["_sb"])
             .withColumn(rank_col, F.row_number().over(wl) + F.col("_off"))
             .drop("_sb", "_off"))


def ntile_expr(k: int, rank: str = "r", n: str = "n") -> Column:
    """NTILE(k) as pure integer arithmetic on (rank, total count) —
    the closed form of the SQL spec: the first n % k tiles take
    n DIV k + 1 rows, the rest n DIV k. All-integer DIV ceilings;
    when n DIV k = 0 every row satisfies the first branch, so the
    zero-divisor branch is never selected (and Spark non-ANSI would
    yield NULL, not error)."""
    return F.expr(f"""
        CASE WHEN {rank} <= ({n} DIV {k} + 1) * ({n} % {k})
             THEN ({rank} + {n} DIV {k}) DIV ({n} DIV {k} + 1)
             ELSE {n} % {k} + ({rank} - ({n} DIV {k} + 1) * ({n} % {k})
                               + {n} DIV {k} - 1) DIV ({n} DIV {k})
        END""").cast("long")
