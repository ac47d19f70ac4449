"""Iterative BPE tokenizer training — the full merge-learning loop.

``textanalysis.bpe_pair_counts`` computes ONE training iteration's
candidate table; this module runs the actual algorithm (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units"): repeatedly count adjacent symbol pairs over the
frequency-weighted vocabulary, merge the argmax pair everywhere, and
record the merge — the iterative algorithm family (k-means, PageRank
in ``llm/pipeline.py``) applied to tokenizer construction, the step a
training-data pipeline runs between corpus curation and tokenization.

Scale shape: the corpus collapses ONCE to the (word, freq) vocabulary
— after that every iteration is one map-side-combinable aggregation
plus one JVM higher-order-function rewrite over vocabulary rows,
never the raw text. Per-iteration driver traffic is exactly one row
(the argmax pair — the k-means-centroid pattern, bounded by
n_merges). Lineage is truncated per iteration with localCheckpoint,
so the plan does not grow with merge count. At 100 TB the vocabulary
is ~10⁸ rows and each iteration is a single agg + map over it.

The greedy left-to-right non-overlapping merge semantics (standard
BPE: "aaaa" + (a,a) → [aa, aa]) falls out of a single ``F.aggregate``
fold: append the symbol, unless the accumulator tail equals the merge
left AND the symbol equals the merge right — then replace the tail
with the merged symbol. The fold is JVM whole-stage codegen, not a
Python UDF. Greedy/overlap/tiebreak semantics are pinned against a
pure-Python reference implementation in tests (no SQL oracle — an
argmax-per-iteration recursion is not reasonably SQL-expressible, so
the driver records a rows-only check; the local property test is the
evidence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_MERGES = 8


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_rust_spark.llm.textanalysis import _tok_table
    return (_tok_table(spark, sf_dir)
            .groupBy(F.col("tok").alias("w"))
            .agg(F.count("*").alias("freq")))


def bpe_train(words: DataFrame, n_merges: int) -> list[tuple]:
    """Learn ``n_merges`` BPE merges from a (w, freq) vocabulary.
    Returns [(step, left, right, merged, pair_count), ...].
    Deterministic: argmax ties break on (left, right) ascending."""
    spark = words.sparkSession
    # split each word into single-character symbols; the lookahead
    # split emits a trailing "" (the pattern matches at end-of-string),
    # which would otherwise become a phantom symbol
    vocab = (words.select(
                F.col("freq"),
                F.filter(F.split(F.col("w"), "(?!^)"),
                         lambda x: x != "").alias("syms"))
                  .filter(F.size("syms") >= 1)
                  .localCheckpoint(eager=True))
    merges: list[tuple] = []
    for step in range(1, n_merges + 1):
        pairs = (vocab
                 .filter(F.size("syms") >= 2)
                 .select("freq", F.explode(F.arrays_zip(
                     F.slice("syms", 1, F.size("syms") - 1).alias("l"),
                     F.slice("syms", 2, F.size("syms") - 1).alias("r")))
                     .alias("p"))
                 .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                 .agg(F.sum("freq").alias("c")))
        top = (pairs.orderBy(F.col("c").desc(), "l", "r").limit(1)
                    .collect())  # 1-row driver collect per iteration
        if not top:
            break
        left, right, count = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merged = left + right
        lit_l, lit_r, lit_m = F.lit(left), F.lit(right), F.lit(merged)
        # greedy left-to-right fold (module docstring); the merged tail
        # symbol never re-matches `left` within this pass unless the
        # data genuinely contains it — exactly standard BPE semantics
        vocab = (vocab.select(
            "freq",
            F.aggregate(
                "syms",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == lit_l) & (x == lit_r),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1),
                             F.array(lit_m)))
                 .otherwise(F.concat(acc, F.array(x)))).alias("syms"))
            .localCheckpoint(eager=True))
        merges.append((step, left, right, merged, count))
    return merges


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table over ``documents`` (N_MERGES rows:
    step, left, right, merged, pair_count)."""
    merges = bpe_train(_word_freqs(spark, sf_dir), N_MERGES)
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, "
                "pair_count long")


REGISTRATIONS = [
    ("bpe_train_merges", bpe_train_merges, None),
]
