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


def _apply_merges(syms_expr, merges: list[tuple]) -> F.Column:
    """Compose the greedy merge fold for each learned merge, in
    training order, over a symbol-array expression — the same
    left-to-right semantics as training (module docstring), chained
    as N_MERGES nested JVM folds (expression depth = merge count,
    evaluated once per token)."""
    def one_merge(lit_l, lit_r, lit_m):
        # closure factory: PySpark inspects HOF lambda arity, so the
        # merge literals must be captured, not default args
        def fold(acc, x):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == lit_l) & (x == lit_r),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lit_m))) \
                .otherwise(F.concat(acc, F.array(x)))
        return fold

    for _step, left, right, merged, _c in merges:
        syms_expr = F.aggregate(
            syms_expr, F.array().cast("array<string>"),
            one_merge(F.lit(left), F.lit(right), F.lit(merged)))
    return syms_expr


def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode every document with the merge
    table ``bpe_train`` just learned — the deploy half of the
    tokenizer story (train on the corpus, then tokenize the corpus
    with the result). Reports per-doc whitespace-token count, subword
    count after the merges, and the exact compression ratio.

    Scale shape: the merge table is tiny (N_MERGES rows, already
    driver-side from training — a real deployment broadcasts a stored
    ~10⁴-row table the same way) and is baked into the plan as
    literals; encoding is then a ZERO-shuffle scan — per token, one
    char split + N_MERGES chained JVM folds, no explode, no Python.
    Per-doc totals come from an in-row sum, so nothing moves between
    executors. Rows-only for the driver (the merge table is learned
    by a recursion SQL can't express); the encode itself is pinned
    against a pure-Python greedy-merge reference in
    tests/test_graph_bpe.py."""
    from mapreduce_rust_spark.functions.text import WS_RE
    merges = bpe_train(_word_freqs(spark, sf_dir), N_MERGES)
    from mapreduce_rust_spark.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", WS_RE), lambda t: t != F.lit(""))

    def encode_token(t):
        syms = F.filter(F.split(t, "(?!^)"), lambda x: x != "")
        return F.size(_apply_merges(syms, merges))

    subword_counts = F.transform(toks, encode_token)
    n_sub = F.aggregate(subword_counts, F.lit(0).cast("long"),
                        lambda acc, x: acc + x)
    d = docs.select("doc_id", F.size(toks).cast("long").alias("n_tokens"),
                    n_sub.alias("n_subwords"))
    # fertility = subwords emitted per whitespace token (≥ 1; lower =
    # better merge coverage), the standard tokenizer-quality metric
    return d.select(
        "doc_id", "n_tokens", "n_subwords",
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
         .otherwise(F.col("n_subwords").cast("double") / F.col("n_tokens"))
         .alias("fertility"))


REGISTRATIONS = [
    ("bpe_train_merges", bpe_train_merges, None),
    ("bpe_encode_docs", bpe_encode_docs, None),
]
