"""Classifier / retrieval evaluation metrics — the readout side of
model-based data curation. A quality filter (fastText-style classifier,
`quality.quality_classifier_score` here) is only trustworthy with an
evaluation harness next to it: ranking power (AUC) and probability
calibration (reliability bins) against a reference label. These run at
corpus scale on the SAME engine as the filter, so the eval is one more
DataFrame plan, not an offline notebook.

Reference scope: the reference (Freebirdgo/MapReduce_Rust, src/mr/*.rs)
has no evaluation surface; these extend the mandated LLM-pipeline
operator family (quality classifier, mixture balancing) with the
metrics that gate deploying such a filter.

Exactness discipline (house rules, see stats_agg_lineitem): every
metric is computed from integer sufficient statistics — rank/tie
counts for AUC, bin counts for calibration — with ONE fixed IEEE
division at the end, so DuckDB oracle hashes match bit-for-bit.

The reference label is ``lang = 'en'`` — deterministic, independent of
the score's token hashing, and the shape a real pipeline has (labels
from a held-out human-rated or LM-judged set, broadcast-joined on
doc_id; swapping the label source does not change any plan below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_rust_spark.llm.quality import (
    quality_score_exprs,
    quality_score_from,
)
from mapreduce_rust_spark.tables import load_table


def _scored_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, score (exact int÷int double), pos (reference label)."""
    docs = load_table(spark, sf_dir, "documents")
    n_toks, w_sum = quality_score_exprs()
    d = docs.select("doc_id", (F.col("lang") == "en").alias("pos"),
                    n_toks.alias("n_toks"), w_sum.alias("w_sum"))
    return d.select("doc_id", "pos",
                    quality_score_from(F.col("n_toks"),
                                       F.col("w_sum")).alias("score"))


def auc_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney AUC of the quality-classifier score against
    the ``lang='en'`` reference label, in scalable two-phase form.

    AUC = P(score_pos > score_neg) + ½·P(=) over all pos×neg pairs.
    Never the O(n²) pair join: collapse to the DISTINCT-SCORE relation
    (score → n_pos, n_neg — the sufficient statistic), then
    AUC·2·N_pos·N_neg = Σ_s n_pos(s)·(2·cumneg_before(s) + n_neg(s)),
    all integers; ONE double division at the end.

    The prefix sum cumneg_before is where a naive plan dies at 100 TB:
    ``SUM() OVER (ORDER BY score)`` is a single-partition window. Here
    it is the proven two-phase decomposition (ranking.scalable_rank,
    cusum_changepoint_events): scores sub-shard on the order-preserving
    integer bucket floor(score) ∈ [-1000, 1000] (the classifier's own
    weight range), per-bucket negative totals (≤2001 rows) carry the
    cross-bucket offset through a broadcast window, and the in-bucket
    prefix runs in (bucket) partitions. The DuckDB oracle uses the
    naive single window — hash equality IS the decomposition proof.

    Scale bounds: the distinct-score relation is ≤ |docs| rows but
    typically far smaller (scores live on the w_sum/n_toks grid); the
    pair-count 2·N_pos·N_neg overflows int64 past ~2.1e9 docs per
    class — swap the num2/denominator sums to DECIMAL(38,0) there
    (stats_agg_lineitem discipline); the division is unchanged."""
    return auc_from_scores(_scored_labeled(spark, sf_dir))


def auc_from_scores(d: DataFrame) -> DataFrame:
    """Core AUC over any (score double, pos boolean) relation — see
    auc_quality_docs for the derivation; split out so tests can prove
    the prefix decomposition equals the brute-force pair count on
    arbitrary inputs, and so a different scorer/label pair reuses the
    plan unchanged."""
    g = (d.groupBy("score")
          .agg(F.sum(F.when(F.col("pos"), 1).otherwise(0))
                .cast("long").alias("np"),
               F.sum(F.when(F.col("pos"), 0).otherwise(1))
                .cast("long").alias("nn")))
    g = g.withColumn("_b", F.floor("score").cast("long"))
    # phase 1: per-bucket negative totals; cross-bucket carry-in from a
    # window over BUCKET TOTALS only (≤2001 rows, broadcast back)
    bt = g.groupBy("_b").agg(F.sum("nn").alias("_bn"))
    wb = W.partitionBy().orderBy("_b")
    offs = bt.select("_b",
                     (F.sum("_bn").over(wb) - F.col("_bn")).alias("_off"))
    # phase 2: in-bucket prefix of nn over distinct scores
    wl = (W.partitionBy("_b").orderBy("score")
           .rowsBetween(W.unboundedPreceding, -1))
    scored = (g.join(F.broadcast(offs), "_b")
               .withColumn(
                   "cumneg",
                   F.coalesce(F.sum("nn").over(wl), F.lit(0))
                   + F.col("_off")))
    tot = scored.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum(F.col("np") * (2 * F.col("cumneg") + F.col("nn")))
         .alias("auc_num2"))
    return tot.select(
        "n_pos", "n_neg", "auc_num2",
        (F.col("auc_num2").cast("double")
         / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"))
        .alias("auc"))


# naive single-window form — hash equality proves the decomposition
AUC_QUALITY_ORACLE = """
WITH d AS (
  SELECT doc_id, lang = 'en' AS pos,
         list_transform(
           list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''),
           t -> CAST('0x' || substr(md5(t), 1, 12) AS BIGINT) % 2001 - 1000
         ) AS ws
  FROM documents
),
s AS (
  SELECT doc_id, pos,
         CASE WHEN len(ws) = 0 THEN 0.0
              ELSE CAST(COALESCE(list_sum(ws), 0) AS DOUBLE) / len(ws)
         END AS score
  FROM d
),
g AS (
  SELECT score,
         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
         CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
  FROM s GROUP BY score
),
c AS (
  SELECT np, nn,
         COALESCE(SUM(nn) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
  FROM g
)
SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
       CAST(SUM(nn) AS BIGINT) AS n_neg,
       CAST(SUM(np * (2 * cumneg + nn)) AS BIGINT) AS auc_num2,
       CAST(SUM(np * (2 * cumneg + nn)) AS DOUBLE)
         / CAST(2 * SUM(np) * SUM(nn) AS DOUBLE) AS auc
FROM c
"""


CALIBRATION_BIN_W = 100  # score units per bin; score ∈ [-1000, 1000]


def calibration_bins_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the quality classifier: fixed-width
    score bins × (count, positives, positive rate) — the calibration
    readout paired with the AUC above (AUC says the ranking separates;
    this says what a score of x actually MEANS as a probability).

    Pure partial+final aggregate to ≤21 rows — zero windows, zero
    joins; at 100 TB it is one map-side-combined pass, the cheapest
    shape the engine has. Bin id floor(score/w) is computed from the
    identical exact double on both engines, so binning is portable;
    counts are integers and pos_rate is ONE int÷int division.

    Fixed-WIDTH bins (not equi-depth quantile bins) are deliberate at
    scale: no global rank needed, bins are stable release-to-release,
    and empty bins are visible (a calibration hole, not a resized
    bin). For equi-depth instead, compose scalable_rank + ntile_expr
    (equidepth_hist_totalprice is that operator)."""
    d = _scored_labeled(spark, sf_dir)
    b = F.floor(F.col("score") / CALIBRATION_BIN_W).cast("long")
    out = (d.groupBy(b.alias("bin"))
            .agg(F.count("*").alias("n"),
                 F.sum(F.when(F.col("pos"), 1).otherwise(0))
                  .cast("long").alias("n_pos")))
    return out.select(
        "bin", (F.col("bin") * CALIBRATION_BIN_W).alias("score_lo"),
        "n", "n_pos",
        (F.col("n_pos").cast("double") / F.col("n").cast("double"))
        .alias("pos_rate")).orderBy("bin")


CALIBRATION_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang = 'en' AS pos,
         list_transform(
           list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''),
           t -> CAST('0x' || substr(md5(t), 1, 12) AS BIGINT) % 2001 - 1000
         ) AS ws
  FROM documents
),
s AS (
  SELECT doc_id, pos,
         CASE WHEN len(ws) = 0 THEN 0.0
              ELSE CAST(COALESCE(list_sum(ws), 0) AS DOUBLE) / len(ws)
         END AS score
  FROM d
)
SELECT CAST(FLOOR(score / {CALIBRATION_BIN_W}) AS BIGINT) AS bin,
       CAST(FLOOR(score / {CALIBRATION_BIN_W}) AS BIGINT)
         * {CALIBRATION_BIN_W} AS score_lo,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS pos_rate
FROM s
GROUP BY 1
ORDER BY bin
"""


REGISTRATIONS = [
    ("auc_quality_docs", auc_quality_docs, AUC_QUALITY_ORACLE),
    ("calibration_bins_docs", calibration_bins_docs, CALIBRATION_ORACLE),
]
