"""Round-12 optimization pins: the numpy kernels that replaced the
interpreted HOF folds must be BIT-identical to the expressions they
retired (the oracles already re-check every query end-to-end in
test_oracle_parity; these pin the kernel/HOF equivalence directly so
a future kernel edit that drifts by an ulp fails here, with a
pointed message, not in a downstream hash)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


def test_lsh_bucket_kernel_matches_hof(spark):
    """Kernel bucket ids == the retired ``_bucket`` HOF column."""
    from mapreduce_rust_spark.llm.similarity import (
        _bucket, _emb, _lsh_bucket_batches)
    emb = _emb(spark, SF_CORRECT).select("vec_id", "e")
    hof = {r["vec_id"]: r["b"]
           for r in emb.withColumn("b", _bucket(F.col("e"))).collect()}
    pdf = emb.toPandas()
    out = pd.concat(list(_lsh_bucket_batches(iter([pdf]))))
    ker = dict(zip(out["vec_id"], out["bucket"]))
    assert ker == hof and len(ker) > 0


def test_pair_cosine_kernel_matches_hof(spark):
    """Kernel pair sims == the ``cosine()`` HOF DAG, bit for bit."""
    from mapreduce_rust_spark.functions.vector import cosine
    from mapreduce_rust_spark.llm.similarity import (
        _emb, _pair_cosine_batches)
    emb = _emb(spark, SF_CORRECT).limit(40)
    a = emb.select(F.col("vec_id").alias("query_id"),
                   F.col("e").alias("qe"))
    b = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("e").alias("ne"))
    pairs = a.join(b, F.col("query_id") < F.col("neighbor_id"))
    hof = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in
           pairs.withColumn("sim", cosine(F.col("qe"), F.col("ne")))
                .collect()}
    pdf = pairs.toPandas()
    out = pd.concat(list(_pair_cosine_batches(iter([pdf]))))
    ker = {(q, n): s for q, n, s in
           zip(out["query_id"], out["neighbor_id"], out["sim"])}
    assert len(ker) == len(hof) > 0
    for k, v in hof.items():
        assert ker[k] == v, (k, ker[k], v)   # exact, no tolerance


def test_np_gram_is_fold_exact(spark):
    """_np_gram accumulates dimension-at-a-time: each entry equals the
    explicit sequential left fold (never BLAS pairwise summation)."""
    from mapreduce_rust_spark.llm.similarity import _np_gram
    rng = np.random.RandomState(7)
    A = rng.randn(13, 9)
    B = rng.randn(11, 9)
    G = _np_gram(A, B)
    for i in range(len(A)):
        for j in range(len(B)):
            acc = 0.0
            for d in range(A.shape[1]):
                acc = acc + A[i, d] * B[j, d]
            assert G[i, j] == acc


def test_adpcm_vectorized_decode_matches_scalar_reference():
    """The block-vectorized IMA ADPCM decoder must be sample-exact
    against the scalar spec transliteration, including clamp and
    index-saturation paths, over random blocks and both alignments."""
    import struct
    from mapreduce_rust_spark.llm.multimodal import (
        _ima_adpcm_decode, _ima_adpcm_decode_ref)
    rng = np.random.RandomState(42)
    for block_align in (8, 12):
        blocks = bytearray()
        for b in range(64):
            pred = int(rng.randint(-32768, 32768))
            idx = int(rng.randint(0, 89))
            blocks += struct.pack("<hBB", pred, idx, 0)
            blocks += bytes(rng.randint(0, 256, block_align - 4,
                                        dtype=np.uint8).tolist())
        got = _ima_adpcm_decode(bytes(blocks), block_align)
        want = _ima_adpcm_decode_ref(bytes(blocks), block_align)
        assert got.dtype == want.dtype and (got == want).all()
    # the out-of-range index gate must survive vectorization
    bad = struct.pack("<hBB", 0, 89, 0) + bytes(4)
    for fn in (_ima_adpcm_decode, _ima_adpcm_decode_ref):
        try:
            fn(bad, 8)
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "89" in str(e)


def test_mmr_driver_greedy_matches_relational_semantics(spark):
    """The driver-side greedy emits MMR_K strictly-ranked steps whose
    step-1 row is the relevance argmax of the pool and whose scores
    reproduce λ·rel − (1−λ)·max-pen recomputed independently."""
    import math
    from mapreduce_rust_spark.llm.similarity import (
        MMR_LAMBDA, _mmr_pool, mmr_diverse_topk)
    pool = {r["vec_id"]: (r["v"], r["rel"])
            for r in _mmr_pool(spark, SF_CORRECT).collect()}
    got = mmr_diverse_topk(spark, SF_CORRECT).orderBy("step").collect()
    assert [r["step"] for r in got] == list(range(1, len(got) + 1))
    best = min(pool, key=lambda k: (-pool[k][1], k))
    assert got[0]["vec_id"] == best
    assert got[0]["mmr_score"] == MMR_LAMBDA * pool[best][1]

    def cos(a, b):
        acc = sum_a = sum_b = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        for x in a:
            sum_a = sum_a + x * x
        for y in b:
            sum_b = sum_b + y * y
        return acc / math.sqrt(sum_a * sum_b)

    chosen = []
    for r in got:
        v, rel = pool[r["vec_id"]]
        if chosen:
            pen = max(cos(v, sv) for sv in chosen)
            assert r["mmr_score"] == MMR_LAMBDA * rel - (1 - MMR_LAMBDA) * pen
        chosen.append(v)
