"""Similarity search over the ``embeddings`` table.

- ``knn_bruteforce`` — exact cosine top-k for a small query set:
  broadcast the queries against the corpus (the corpus is never
  shuffled; work is a single scan × |Q|), rank per query with a
  deterministic tiebreak. This is the oracle-checkable baseline.
- ``knn_lsh`` — the scale path: sign-random-projection bucketing
  (deterministic md5-derived hyperplanes), candidates only within
  the query's bucket. Sub-linear candidate sets; recall measured in
  tests against the brute-force baseline. At 100 TB the bucket id
  becomes the shuffle/partition key and each bucket fits an executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_rust_spark.functions.vector import cosine, dot, to_double, unit
from mapreduce_rust_spark.tables import load_table

K = 5
N_QUERIES = 10   # vec_id < 10 are the probe set
N_PLANES = 4     # LSH sign bits → 16 buckets


def _emb(spark, sf_dir) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double(F.col("embedding")).alias("e"))


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k neighbors (cosine) for each query vector.
    Output: (query_id, neighbor_id, rank) — similarity itself is
    excluded from the checked output because cross-engine cosine
    differs in final ulps; ranking is stable on this data.

    NOTE on the oracle's float path: Spark ranks by dot(unit(a),
    unit(b)) (vectors normalized once, then a single dot fold) while
    the DuckDB oracle ranks by list_cosine_similarity — a different
    IEEE evaluation order with per-element normalization rounding.
    Rank parity therefore relies on similarity gaps exceeding
    accumulated ulp divergence (asserted on the fixture by
    tests/test_llm_ops.py::test_knn_rank_adjacent_gap). A future rank
    flip here should be triaged as a near-tie between neighbors, not
    as a logic bug."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", unit(F.col("e")).alias("en"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("en").alias("qe"))
    # unit-normalized once per vector; per (query, candidate) pair the
    # similarity is a single dot fold (see allknn_within_label)
    cand = (F.broadcast(q).crossJoin(emb.select(F.col("vec_id").alias("neighbor_id"),
                                                F.col("en").alias("ne")))
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("sim", dot(F.col("qe"), F.col("ne"))))
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= K)
                .select("query_id", "neighbor_id",
                        F.col("rank").cast("long").alias("rank")))


KNN_BRUTEFORCE_ORACLE = f"""
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                           n.embedding::DOUBLE[]) DESC,
                    n.vec_id) AS rank
  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
WHERE rank <= {K}
"""


MAX_DIM = 512    # hyperplane weights precomputed up to this embedding dim


def _plane_weights(p: int, max_dim: int = MAX_DIM) -> list[float]:
    """±1 weights of hyperplane ``p``: +1 iff md5("p:d")'s first hex
    nibble is even. Computed ONCE driver-side with hashlib — the
    weights depend only on (p, d), so paying dims×planes md5 calls
    per ROW (the previous in-plan form) was pure waste. Same parity
    rule as before → identical buckets and recall."""
    import hashlib
    return [1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0 for d in range(max_dim)]


def _bucket(e_col) -> F.Column:
    """Sign-random-projection bucket id: bit p = sign(<e, w_p>) with
    the hyperplane weight matrix baked into the plan as literal arrays
    (N_PLANES × MAX_DIM floats, sliced to the vector's length). Pure
    JVM column expressions; zero hashing at runtime."""
    bits = []
    for p in range(N_PLANES):
        w_lit = F.array(*[F.lit(w) for w in _plane_weights(p)])
        proj = F.aggregate(
            F.zip_with(e_col, F.slice(w_lit, F.lit(1), F.size(e_col)),
                       lambda x, w: x * w),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k with multi-probe: each query probes its own
    bucket plus every Hamming-1 neighbor bucket (near vectors most
    often differ in exactly one sign bit). Candidates stay sub-linear:
    (1+N_PLANES)/2^N_PLANES of the corpus per query. No oracle
    (approximation is implementation-defined); tests measure recall
    against ``knn_bruteforce``."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _bucket(F.col("e")))
    probes = F.array(F.col("bucket"),
                     *[F.col("bucket").bitwiseXOR(F.lit(1 << p))
                       for p in range(N_PLANES)])
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
            .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
                    F.explode(probes).alias("qb")))
    cand = (F.broadcast(q)
            .join(emb.select(F.col("vec_id").alias("neighbor_id"),
                             F.col("e").alias("ne"), F.col("bucket")),
                  F.col("qb") == F.col("bucket"))
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("sim", cosine(F.col("qe"), F.col("ne"))))
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= K)
                .select("query_id", "neighbor_id",
                        F.col("rank").cast("long").alias("rank")))


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: a trained coarse quantizer (the per-label
    centroids — at scale: k-means cells) assigns every vector to its
    nearest centroid cell; queries probe their own cell plus the
    runner-up (nprobe=2). Candidates per query ≈ 2/n_cells of the
    corpus. The centroid table is tiny and broadcast; assignment is
    one scan. No oracle (approximate); recall-tested vs brute force."""
    from mapreduce_rust_spark.llm.pipeline import label_centroids
    emb = _emb(spark, sf_dir)

    cents = (label_centroids(spark, sf_dir)
             .groupBy("label")
             .agg(F.array_sort(F.collect_list(F.struct("dim", "centroid")))
                   .alias("cs"))
             .select(F.col("label").alias("cell"),
                     F.transform("cs", lambda x: x["centroid"]).alias("ce")))

    assigned = (emb.crossJoin(F.broadcast(cents))
                .withColumn("sim_c", cosine(F.col("e"), F.col("ce"))))
    w_assign = W.partitionBy("vec_id").orderBy(F.col("sim_c").desc(), F.col("cell"))
    cells = (assigned.withColumn("r", F.row_number().over(w_assign))
             .filter(F.col("r") <= 2)  # nprobe=2 for queries; rank 1 = home cell
             .select("vec_id", "label", "e", "cell", "r"))
    home = cells.filter(F.col("r") == 1).select("vec_id", "e", "cell")

    q = (cells.filter(F.col("vec_id") < N_QUERIES)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("e").alias("qe"), F.col("cell").alias("qc")))
    cand = (F.broadcast(q)
            .join(home.select(F.col("vec_id").alias("neighbor_id"),
                              F.col("e").alias("ne"), F.col("cell")),
                  F.col("qc") == F.col("cell"))
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("sim", cosine(F.col("qe"), F.col("ne"))))
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= K)
                .select("query_id", "neighbor_id",
                        F.col("rank").cast("long").alias("rank")))


def knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k search over INT8-QUANTIZED vectors — the serving-side
    form of ANN: 4x less memory/IO than float32 and integer dot
    products. Built on ``embedding_normalize_quantize``; scoring is
    an exact integer sum (64 dims × 127² ≈ 10⁶ per pair, far inside
    int64/2^53), so unlike float cosine this top-k is FULLY
    oracle-checkable including the score itself. Same broadcast-probe
    shape as knn_bruteforce: the corpus is never shuffled — only
    grouped once to assemble arrays. Quantization recall vs the exact
    float ranking is measured in tests."""
    # Quantize ARRAY-NATIVE (identical grid/arithmetic to
    # embedding_normalize_quantize: per-dim v² on the 1e-12 HALF_EVEN
    # grid, exact long sum, one sqrt, per-dim HALF_EVEN int8) — but as
    # pure JVM array expressions: zero shuffles, where the long-format
    # route paid explode + window + collect_list reassembly just to
    # get back the array this computes in place.
    emb = load_table(spark, sf_dir, "embeddings")
    vd = F.transform("embedding", lambda x: x.cast("double"))
    sumsq = F.aggregate(
        "vd", F.lit(0).cast("long"),
        lambda acc, x: acc + F.bround(x * x * F.lit(1e12), 0).cast("long"))
    arr = (emb.select("vec_id", vd.alias("vd"))
           .withColumn("norm", F.sqrt(sumsq.cast("double") / F.lit(1e12)))
           .select("vec_id", F.when(
               F.col("norm") > 0,
               F.transform("vd", lambda x: F.bround(
                   F.lit(127.0) * x / F.col("norm"), 0).cast("long")))
               .otherwise(F.transform("vd", lambda x: F.lit(0).cast("long")))
               .alias("qv")))
    probes = arr.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("pa"))
    corpus = arr.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("qv").alias("na"))
    iscore = F.aggregate(
        F.zip_with(F.col("pa"), F.col("na"), lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    cand = (F.broadcast(probes).crossJoin(corpus)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("iscore", iscore))
    w = W.partitionBy("query_id").orderBy(F.col("iscore").desc(),
                                          F.col("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= K)
                .select("query_id", "neighbor_id", "iscore",
                        F.col("rank").cast("long").alias("rank")))


from mapreduce_rust_spark.llm.sharding import EMB_QUANTIZE_ORACLE  # noqa: E402

KNN_QUANTIZED_ORACLE = f"""
WITH q8 AS ({EMB_QUANTIZE_ORACLE}),
arr AS (SELECT vec_id, list(q ORDER BY dim) AS qv FROM q8 GROUP BY vec_id)
SELECT query_id, neighbor_id, iscore, rank FROM (
  SELECT p.vec_id AS query_id, n.vec_id AS neighbor_id,
         CAST(list_dot_product(p.qv::DOUBLE[], n.qv::DOUBLE[]) AS BIGINT)
           AS iscore,
         ROW_NUMBER() OVER (
           PARTITION BY p.vec_id
           ORDER BY list_dot_product(p.qv::DOUBLE[], n.qv::DOUBLE[]) DESC,
                    n.vec_id) AS rank
  FROM arr p JOIN arr n ON p.vec_id <> n.vec_id
  WHERE p.vec_id < {N_QUERIES}
)
WHERE rank <= {K}
"""


def allknn_within_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-kNN, k=1: EVERY vector's single nearest neighbor (cosine)
    within its label block — the edge set an embedding-dedup /
    clustering pass starts from (each doc linked to its closest
    peer), vs ``knn_bruteforce``'s small broadcast probe set.

    Shape: block-local self-join (one shuffle on the block key, then
    Σ|block|² similarity work per block — never corpus²) + per-vector
    rank-1 window. The block key is ``label`` here; at 100 TB it is
    the IVF cell id (``pipeline.label_centroids`` trains them), which
    bounds |block| by construction — the same blocked discipline as
    ``embedding_neardup_pairs``, but argmax instead of thresholded.
    Output ranks only (similarity floats excluded: cross-engine
    cosine differs in final ulps; ranking is stable on this data —
    the knn_bruteforce convention)."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", unit(F.col("e")).alias("en"))
    a = emb.select("label", F.col("vec_id").alias("vec_id"),
                   F.col("en").alias("ae"))
    b = emb.select("label", F.col("vec_id").alias("nn_id"),
                   F.col("en").alias("be"))
    # pre-unit-normalized vectors: per pair, similarity is ONE dot
    # fold (cosine() would re-fold both norms for every pair — 3x the
    # work on the |block|^2 hot path). Ranks are unchanged: cosine
    # and normalized-dot are the same ordering.
    cand = (a.join(b, "label")
             .filter(F.col("vec_id") != F.col("nn_id"))
             .withColumn("sim", dot(F.col("ae"), F.col("be"))))
    w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("nn_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") == 1)
                .select("vec_id", "label", "nn_id"))


ALLKNN_ORACLE = """
SELECT vec_id, label, nn_id FROM (
  SELECT a.vec_id, a.label, b.vec_id AS nn_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]) DESC,
                    b.vec_id) AS rank
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id <> b.vec_id
)
WHERE rank = 1
"""


CLUSTER_KW_TOP = 3
CLUSTER_KW_MIN = 3    # min in-cluster occurrences


def cluster_keywords_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster labeling: for each embedding cluster (``label`` — at
    scale the k-means/IVF cell), the ``CLUSTER_KW_TOP`` most
    DISTINCTIVE tokens of its member documents by frequency lift —
    the human-readable "what is this cluster about" summary every
    clustering/SemDeDup pass needs, and the engine's cross-modal
    join: embeddings (vec_id) ⋈ documents (doc_id) is the 1:1
    id-correspondence the fixture guarantees.

    Same exact-arithmetic shape as domain_keywords_docs (integer
    counts, two correctly-rounded double divisions, no log-idf);
    the (label, tok) aggregate is materialized once for its three
    consumer branches; the per-label top-k window input is
    min-support-thinned."""
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id",
                    F.explode(F.filter(F.split("text", r"\s+"),
                                       lambda t: t != F.lit("")))
                     .alias("tok")))
    lab = (load_table(spark, sf_dir, "embeddings")
           .select(F.col("vec_id").alias("doc_id"), "label"))
    lt = (docs.join(lab, "doc_id")
              .groupBy("label", "tok").agg(F.count("*").alias("c_lt"))
              .localCheckpoint(eager=True))
    per_tok = lt.groupBy("tok").agg(F.sum("c_lt").alias("c_t"))
    per_lab = lt.groupBy("label").agg(F.sum("c_lt").alias("n_l"))
    total = per_tok.agg(F.sum("c_t").alias("n"))
    lift = ((F.col("c_lt").cast("double") / F.col("n_l"))
            / (F.col("c_t").cast("double") / F.col("n")))
    cand = (lt.filter(F.col("c_lt") >= CLUSTER_KW_MIN)
              .join(per_tok, "tok")
              .join(F.broadcast(per_lab), "label")
              .crossJoin(F.broadcast(total))
              .withColumn("lift", lift))
    w = W.partitionBy("label").orderBy(F.col("lift").desc(), "tok")
    return (cand.withColumn("rank", F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= CLUSTER_KW_TOP)
                .select("label", "rank", "tok",
                        F.col("c_lt").cast("long").alias("c_lt"), "lift"))


CLUSTER_KEYWORDS_ORACLE = f"""
WITH tok AS (
  SELECT e.label, t.tok
  FROM documents d
  JOIN embeddings e ON e.vec_id = d.doc_id,
       UNNEST(regexp_split_to_array(d.text, '\\s+')) AS t(tok)
  WHERE t.tok <> ''
),
lt AS (SELECT label, tok, COUNT(*) AS c_lt FROM tok GROUP BY 1, 2),
pt AS (SELECT tok, SUM(c_lt) AS c_t FROM lt GROUP BY 1),
pl AS (SELECT label, SUM(c_lt) AS n_l FROM lt GROUP BY 1),
tot AS (SELECT SUM(c_t) AS n FROM pt),
cand AS (
  SELECT lt.label, lt.tok, lt.c_lt,
         (CAST(lt.c_lt AS DOUBLE) / pl.n_l)
           / (CAST(pt.c_t AS DOUBLE) / tot.n) AS lift
  FROM lt JOIN pt USING (tok) JOIN pl USING (label), tot
  WHERE lt.c_lt >= {CLUSTER_KW_MIN}
)
SELECT label, rank, tok, CAST(c_lt AS BIGINT) AS c_lt, lift
FROM (SELECT *, CAST(ROW_NUMBER() OVER (
          PARTITION BY label ORDER BY lift DESC, tok) AS BIGINT) AS rank
      FROM cand)
WHERE rank <= {CLUSTER_KW_TOP}
"""


REGISTRATIONS = [
    ("knn_bruteforce", knn_bruteforce, KNN_BRUTEFORCE_ORACLE),
    ("cluster_keywords_embeddings", cluster_keywords_embeddings,
     CLUSTER_KEYWORDS_ORACLE),
    ("allknn_within_label", allknn_within_label, ALLKNN_ORACLE),
    ("knn_lsh", knn_lsh, None),  # approximate — recall-tested, rows-only check
    ("knn_ivf", knn_ivf, None),  # approximate — recall-tested, rows-only check
    ("knn_quantized", knn_quantized, KNN_QUANTIZED_ORACLE),
]
