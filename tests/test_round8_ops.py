"""Behavioral tests for the round-8 crop — properties the oracle
mirror cannot see: the LSH sign-margin that makes knn_eval_recall's
cross-engine bucket parity safe, and invariants of later round-8
operators.
"""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_CORRECT


def test_lsh_projection_sign_margin(spark):
    """knn_eval_recall's oracle recomputes the LSH buckets in DuckDB.
    Sign bits are bit-identical by fold-order identity, but this pins
    the defense in depth: on the fixture, every |<e, w_p>| projection
    magnitude dwarfs any conceivable accumulated-rounding divergence
    (64 dims x eps x |e| ~ 1e-13), so even a NON-identical evaluation
    order could not flip a bucket. A failure here after a fixture
    regen means near-orthogonal vectors, not a logic bug."""
    from pyspark.sql import functions as F

    from mapreduce_rust_spark.llm.similarity import (
        MAX_DIM, N_PLANES, _emb, _plane_weights)

    emb = _emb(spark, SF_CORRECT)
    margins = []
    for p in range(N_PLANES):
        w = F.array(*[F.lit(x) for x in _plane_weights(p, MAX_DIM)])
        proj = F.aggregate(
            F.zip_with(F.col("e"),
                       F.slice(w, F.lit(1), F.size(F.col("e"))),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        row = emb.agg(F.min(F.abs(proj)).alias("m")).collect()[0]
        margins.append(row["m"])
    assert min(margins) > 1e-6, margins


def test_knn_eval_recall_consistent_with_set_recall(spark):
    """The registered eval op must agree with the free-standing recall
    computation the old rows-only test did: per-query hits equal the
    intersection of the two top-k sets."""
    from mapreduce_rust_spark.llm.similarity import (
        K, knn_bruteforce, knn_eval_recall, knn_lsh)

    bf = {(r.query_id, r.neighbor_id)
          for r in knn_bruteforce(spark, SF_CORRECT).collect()}
    lsh = {(r.query_id, r.neighbor_id)
           for r in knn_lsh(spark, SF_CORRECT).collect()}
    out = {r.query_id: r for r in knn_eval_recall(spark, SF_CORRECT).collect()}
    for q in {q for q, _ in bf}:
        expect = len({(a, b) for a, b in bf & lsh if a == q})
        assert out[q].hits == expect
        assert out[q].k_eval == K
        assert out[q].recall_bp == expect * 10000 // K


def test_video_container_roundtrip_kernel():
    """Direct kernel check on known text: container packs
    min(CAP, max(1, L DIV 16)) real PNG frames; the parser decodes
    every VIDEO_STRIDE-th frame back to the exact constant grey the
    packer derived from the text."""
    import pandas as pd

    from mapreduce_rust_spark.llm.multimodal import (
        VIDEO_FRAME_SIDE, VIDEO_FRAMES_CAP, VIDEO_SRC_STEP, VIDEO_STRIDE,
        _video_frame_batches)

    text = "The quick brown fox jumps over the lazy dog. " * 40  # L=1800
    pdf = pd.DataFrame({"doc_id": [1], "payload": [text.encode()]})
    out = pd.concat(list(_video_frame_batches(iter([pdf]))))
    L = len(text)
    n = min(VIDEO_FRAMES_CAP, max(1, L // VIDEO_FRAME_SIDE))
    assert list(out["frame_idx"]) == list(range(0, n, VIDEO_STRIDE))
    for _, r in out.iterrows():
        g = ord(text[(r.frame_idx * VIDEO_SRC_STEP) % L]) % 256
        assert (r.width, r.height) == (VIDEO_FRAME_SIDE, VIDEO_FRAME_SIDE)
        assert r.gray == g
        assert r.ink == g * VIDEO_FRAME_SIDE ** 2


def test_video_container_cap_bounds_giant_doc():
    """A megabyte-scale doc still packs only VIDEO_FRAMES_CAP frames —
    the in-row work bound that holds at 100 TB."""
    import pandas as pd

    from mapreduce_rust_spark.llm.multimodal import (
        VIDEO_FRAMES_CAP, VIDEO_STRIDE, _video_frame_batches)

    pdf = pd.DataFrame({"doc_id": [7], "payload": [b"x" * 1_000_000]})
    out = pd.concat(list(_video_frame_batches(iter([pdf]))))
    assert len(out) == len(range(0, VIDEO_FRAMES_CAP, VIDEO_STRIDE))
