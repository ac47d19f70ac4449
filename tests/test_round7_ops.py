"""Behavioral tests for the round-7 crop — properties the oracle
mirror cannot see: the JPEG codec's exactness class and lossy error
bounds, its scope boundaries (color/progressive/truncated must raise,
not mis-decode), Huffman/magnitude coding bijections, and byte
stuffing on planted worst cases.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE


def _block_constant(vals: np.ndarray) -> np.ndarray:
    """64 block values -> 64x64 image, block (r, c) = vals[r*8+c]."""
    return np.repeat(np.repeat(vals.reshape(8, 8), 8, 0), 8, 1)


def test_jpeg_exact_roundtrip_block_constant():
    """The exactness class: block-constant pixels + flat quant table
    round-trip bit-exactly through the full encode->decode pipeline,
    across the whole value range including 0 and 255."""
    from mapreduce_rust_spark.llm.jpegcodec import (
        QUANT_FLAT, decode_jpeg_gray, encode_jpeg_gray)
    rng = np.random.default_rng(7)
    for vals in (rng.integers(0, 256, 64, dtype=np.uint8),
                 np.arange(64, dtype=np.uint8),
                 np.arange(192, 256, dtype=np.uint8),
                 np.zeros(64, dtype=np.uint8),
                 np.full(64, 255, dtype=np.uint8)):
        img = _block_constant(vals)
        jpg = encode_jpeg_gray(img.tobytes(), 64, 64, QUANT_FLAT)
        w, h, px = decode_jpeg_gray(jpg)
        assert (w, h) == (64, 64)
        assert px == img.tobytes()


def test_jpeg_byte_stuffing_worst_case():
    """A scan engineered to emit many 0xFF bytes (all-255 blocks give
    maximal DC codes) must stuff FF->FF00 and still decode exactly —
    the classic baseline-JPEG implementation bug."""
    from mapreduce_rust_spark.llm.jpegcodec import (
        QUANT_FLAT, decode_jpeg_gray, encode_jpeg_gray)
    # a period-3 extreme pattern lands repeated 0xFF bytes in the
    # scan (alternating max-magnitude DC diffs alone pad to FE/FD —
    # found by search; pinned here so the unstuffing path stays hot)
    vals = np.resize(np.array([255, 0, 128], dtype=np.uint8), 64)
    img = _block_constant(vals)
    jpg = encode_jpeg_gray(img.tobytes(), 64, 64, QUANT_FLAT)
    assert jpg.count(b"\xff\x00") > 0, "stuffing path not exercised"
    assert decode_jpeg_gray(jpg)[2] == img.tobytes()


def test_jpeg_fill_bytes_before_marker_tolerated():
    """T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes.
    Inject fill runs before DQT and SOS in a conforming stream and the
    decode must be unchanged; a stream that ENDS in fill bytes must
    raise ValueError, not misparse."""
    import pytest

    from mapreduce_rust_spark.llm.jpegcodec import (
        QUANT_FLAT, decode_jpeg_gray, encode_jpeg_gray)
    vals = np.arange(64, dtype=np.uint8)
    img = _block_constant(vals)
    jpg = encode_jpeg_gray(img.tobytes(), 64, 64, QUANT_FLAT)
    # fill before the first tables segment (right after SOI) and
    # before SOS (0xFFDA appears once in our single-scan streams)
    sos = jpg.index(b"\xff\xda")
    padded = (jpg[:2] + b"\xff\xff\xff" + jpg[2:sos]
              + b"\xff" + jpg[sos:])
    assert decode_jpeg_gray(padded)[2] == img.tobytes()
    with pytest.raises(ValueError):
        decode_jpeg_gray(jpg[:2] + b"\xff\xff\xff\xff")
    # fill run, then a REAL marker, then a truncated segment header:
    # must be the documented ValueError, never struct.error (r8 advice)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_gray(b"\xff\xd8\xff\xff\xdb\x00")


def test_jpeg_lossy_error_bounded_on_smooth_image():
    """Annex K tables on a smooth gradient: decoded error stays within
    a few grey levels (JPEG's design case). Noise is the worst case
    and only gets a sanity decode (no crash, right geometry)."""
    from mapreduce_rust_spark.llm.jpegcodec import (
        QUANT_LUMA, decode_jpeg_gray, encode_jpeg_gray)
    grad = np.fromfunction(lambda y, x: x + y, (64, 64)).astype(np.uint8)
    _, _, px = decode_jpeg_gray(
        encode_jpeg_gray(grad.tobytes(), 64, 64, QUANT_LUMA))
    err = np.abs(np.frombuffer(px, np.uint8).astype(int)
                 - grad.reshape(-1).astype(int))
    assert err.max() <= 8, err.max()
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    w, h, px2 = decode_jpeg_gray(
        encode_jpeg_gray(noise.tobytes(), 64, 64, QUANT_LUMA))
    assert (w, h, len(px2)) == (64, 64, 64 * 64)


def test_jpeg_scope_boundaries_raise():
    """Out-of-scope streams must raise ValueError, never mis-decode:
    non-JPEG bytes, progressive SOF2, truncated stream, bad
    dimensions on encode."""
    from mapreduce_rust_spark.llm.jpegcodec import (
        QUANT_FLAT, decode_jpeg_gray, encode_jpeg_gray)
    img = _block_constant(np.arange(64, dtype=np.uint8))
    jpg = encode_jpeg_gray(img.tobytes(), 64, 64, QUANT_FLAT)
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x89PNG not a jpeg")
    # flip SOF0 (FFC0) to SOF2 (FFC2): progressive must be refused
    with pytest.raises(ValueError):
        decode_jpeg_gray(jpg.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg_gray(jpg[:40])
    with pytest.raises(ValueError):
        encode_jpeg_gray(b"\x00" * 100, 10, 10, QUANT_FLAT)


def test_jpeg_magnitude_extend_inverse():
    """_extend is the exact inverse of _magnitude over the full
    baseline coefficient range."""
    from mapreduce_rust_spark.llm.jpegcodec import _extend, _magnitude
    for v in range(-1024, 1025):
        size, bits = _magnitude(v)
        assert _extend(bits, size) == v, v


def test_jpeg_huffman_tables_bijective():
    """Canonical encoder and decoder tables are inverse bijections for
    both Annex K tables (every symbol decodes back to itself)."""
    from mapreduce_rust_spark.llm.jpegcodec import (
        AC_BITS, AC_VALS, DC_BITS, DC_VALS, _build_decoder,
        _build_huffman)
    for bits, vals in ((DC_BITS, DC_VALS), (AC_BITS, AC_VALS)):
        enc = _build_huffman(bits, vals)
        dec = _build_decoder(bits, vals)
        assert len(enc) == len(vals)
        for val, (code, length) in enc.items():
            assert dec[(length, code)] == val


def test_decode_image_stub_routes_jpeg():
    """The real-decode entry point routes JPEG payloads to the codec
    and still raises for genuinely unsupported media."""
    from mapreduce_rust_spark.llm.jpegcodec import (
        QUANT_FLAT, encode_jpeg_gray)
    from mapreduce_rust_spark.llm.multimodal import decode_image_stub
    img = _block_constant(np.arange(64, dtype=np.uint8))
    jpg = encode_jpeg_gray(img.tobytes(), 64, 64, QUANT_FLAT)
    w, h, ch, px = decode_image_stub(jpg)
    assert (w, h, ch) == (64, 64, 1) and px == img.tobytes()
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"RIFF....WAVEfmt ")


def test_jpeg_roundtrip_query_planted(spark):
    """The registered query on planted docs: a 64-byte ASCII doc maps
    to the expected expansion hash; short and non-ASCII docs are
    excluded (mirroring the oracle's WHERE)."""
    import hashlib
    from mapreduce_rust_spark.llm import multimodal as M

    text64 = "".join(chr(33 + (i * 7) % 90) for i in range(64))
    docs = spark.createDataFrame(
        [(0, text64), (1, "short"), (2, "é" * 64)],
        "doc_id long, text string")
    orig = M.load_table
    try:
        M.load_table = lambda s, d, n: docs
        got = {r.doc_id: r for r in
               M.jpeg_gray_roundtrip(spark, SF_SMOKE).collect()}
    finally:
        M.load_table = orig
    assert set(got) == {0}
    vals = np.frombuffer(text64.encode(), dtype=np.uint8)
    expect = hashlib.sha256(_block_constant(vals).tobytes()).hexdigest()
    r = got[0]
    assert (r.width, r.height, r.n_blocks) == (64, 64, 64)
    assert r.pixel_sha == expect


def test_retention_triangle_planted(spark):
    """Two customers, known month histories: cohorts, ages and counts
    must match by hand; a single-month customer contributes only the
    age-0 cell."""
    from mapreduce_rust_spark.operators import olap

    rows = [(1, "2024-01-05"), (1, "2024-03-20"), (1, "2024-03-21"),
            (2, "2024-02-10"), (2, "2024-04-01"), (3, "2024-02-28")]
    orders = spark.createDataFrame(
        [(c, f"{d} 00:00:00") for c, d in rows],
        "o_custkey long, o_orderdate string").selectExpr(
        "o_custkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate")
    got = {(r.cohort_month, r.age_months): r.n_customers for r in
           olap.retention_closed_form(
               olap.retention_cells(orders)).collect()}
    assert got == {("2024-01", 0): 1, ("2024-01", 2): 1,
                   ("2024-02", 0): 2, ("2024-02", 2): 1}


def test_winsorized_delta_clips_whale(spark):
    """A single whale value in the treatment arm must be clipped to
    the P95 bound: the winsorized delta stays near the true effect
    while the raw delta is dragged by the whale."""
    from mapreduce_rust_spark.operators import experiment as E

    # 100 control values 100..199, 100 treatment 110..209, one whale
    rows = ([(False, v) for v in range(100, 200)]
            + [(True, v) for v in range(110, 210)]
            + [(True, 1_000_000)])
    cnt = E.mw_value_counts(
        spark.createDataFrame(rows, "treat boolean, vc long"))
    r = E.winsorized_closed_form(cnt).collect()[0]
    assert r.hi_c < 1_000_000          # whale clipped
    raw_delta = (sum(range(110, 210)) + 1_000_000) / 101 \
        - sum(range(100, 200)) / 100
    assert abs(r.delta_w) < 40 < raw_delta
    assert r.n_treat == 101 and r.n_ctrl == 100


def test_propensity_strata_within_stratum_balance(spark):
    """Planted confound: treated users have 3x the activity. Pooled
    means differ hugely; within any single stratum the treated and
    control users have near-identical activity so the per-stratum
    effect must be near zero (outcome = activity here)."""
    from mapreduce_rust_spark.operators import experiment as E

    rows = []
    for u in range(1, 201):
        n = 30 if u % 2 == 1 else 10       # treated = odd = 3x events
        rows += [(u, float(n)) for _ in range(n)]
    ev = spark.createDataFrame(rows, "user_id long, value double")
    orig = E.load_table
    try:
        E.load_table = lambda s, d, t: ev
        out = {r.stratum: r for r in
               E.propensity_strata_events(spark, "ignored").collect()}
    finally:
        E.load_table = orig
    # activity is perfectly bimodal -> low strata all-control, high
    # strata all-treated; NO stratum mixes arms, so every effect is
    # NULL (the honest answer: off-support, nothing comparable)
    assert all(r.effect is None for r in out.values())
    assert sum(r.n_treat for r in out.values()) == 100
    assert sum(r.n_ctrl for r in out.values()) == 100


def test_ngram_novelty_python_reference(spark):
    """Novelty counts equal a pure-python recomputation with the same
    md5 split on a planted corpus."""
    import hashlib
    from mapreduce_rust_spark.llm import textanalysis as T

    texts = [f"alpha beta gamma delta {i} epsilon" for i in range(30)]
    docs = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string")
    orig = T.load_table
    try:
        T.load_table = lambda s, d, n: docs
        got = T.ngram_novelty_docs(spark, "ignored").collect()
    finally:
        T.load_table = orig

    def bucket(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:12], 16) % 100

    def bigrams(t: str) -> list[str]:
        w = t.split()
        return [f"{a} {b}" for a, b in zip(w, w[1:])]

    train = {g for t in texts if bucket(t) < 80 for g in bigrams(t)}
    ev = [g for t in texts if bucket(t) >= 80 for g in bigrams(t)]
    assert ev, "fixture must hold out at least one doc"
    novel = sum(1 for g in ev if g not in train)
    assert len(got) == 1
    assert (got[0].n_eval_bigrams, got[0].n_novel) == (len(ev), novel)


def test_isotonic_equals_sequential_pav(spark, duck):
    """The minimax relational form must equal the textbook sequential
    pool-adjacent-violators fit on the fixture bins, and be monotone."""
    import numpy as np
    from mapreduce_rust_spark.llm.evaluation import (
        isotonic_calibration_docs)
    from tests.conftest import SF_CORRECT

    g = (isotonic_calibration_docs(spark, SF_CORRECT)
         .orderBy("bin").toPandas())
    fit = g["fit_rate"].values
    assert np.all(np.diff(fit) >= -1e-15)
    n = g["n"].values.astype(float)
    y = g["n_pos"].values / n
    lvl: list[list[float]] = []
    for i in range(len(y)):
        lvl.append([y[i], n[i]])
        while len(lvl) > 1 and lvl[-2][0] >= lvl[-1][0]:
            a, b = lvl.pop(), lvl.pop()
            lvl.append([(a[0] * a[1] + b[0] * b[1]) / (a[1] + b[1]),
                        a[1] + b[1]])
    ref: list[float] = []
    idx = 0
    for v, w in lvl:
        s = 0.0
        while s < w - 1e-9:
            s += n[idx]
            idx += 1
            ref.append(v)
    assert np.abs(np.array(ref) - fit).max() < 1e-12


def test_mmr_prefers_diverse_over_redundant(spark):
    """Planted pool: v1 ≈ query, v2 = near-copy of v1, v3 orthogonal-ish.
    Plain top-2 would take (v1, v2); MMR must take v1 then v3."""
    from mapreduce_rust_spark.llm import similarity as S

    rows = [(0, [1.0, 0.0, 0.0], 0),      # query (min vec_id)
            (1, [0.99, 0.14, 0.0], 0),    # most relevant
            (2, [0.98, 0.17, 0.0], 0),    # near-duplicate of 1
            (3, [0.6, 0.0, 0.8], 0)]      # diverse
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int")
    orig = S.load_table
    try:
        S.load_table = lambda s, d, n: emb
        got = sorted((r.step, r.vec_id) for r in
                     S.mmr_diverse_topk(spark, "ignored").collect())
    finally:
        S.load_table = orig
    assert got[0] == (1, 1)
    assert got[1] == (2, 3), got   # diversity beats the near-copy
    assert got[2] == (3, 2)


def test_rasterize_glyph_ink_matches_md5_bits(spark):
    """The decoded-pixel ink count equals the md5-derived bit count
    computed in pure python — certifying raster -> PNG -> decode ->
    measure end to end on a planted doc."""
    import hashlib
    from mapreduce_rust_spark.llm import multimodal as M

    text = "abcdefghij012345"   # exactly 16 ASCII chars
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    orig = M.load_table
    try:
        M.load_table = lambda s, d, n: docs
        r = M.rasterize_glyph_metrics(spark, "ignored").collect()[0]
    finally:
        M.load_table = orig
    expect = sum(
        bin(int(hashlib.md5(ch.encode()).hexdigest()[:12], 16)).count("1")
        for ch in text)
    assert (r.doc_id, r.n_glyphs, r.ink_pixels) == (7, 16, expect)
    assert abs(r.ink_ratio - expect / 768.0) < 1e-15


def test_dupfree_epoch_plan_planted(spark):
    """3 copies of a 4-token doc + 1 unique 2-token doc: epoch 1
    serves 14 tokens, epochs 2+ serve 6, cumulative checks out."""
    from mapreduce_rust_spark.llm import quality as Q

    docs = spark.createDataFrame(
        [(i, "a b c d", "s") for i in range(3)]
        + [(3, "x y", "s")],
        "doc_id long, text string, source string")
    orig = Q.load_table
    try:
        Q.load_table = lambda s, d, n: docs
        got = {r.epoch: r for r in
               Q.dupfree_epoch_plan(spark, "ignored").collect()}
    finally:
        Q.load_table = orig
    assert got[1].tokens_served == 14 and got[1].cum_tokens == 14
    assert got[2].tokens_served == 6 and got[2].cum_tokens == 20
    assert got[4].cum_tokens == 14 + 3 * 6


def test_shuffle_quality_stats_python_reference(spark):
    """Shard stats equal a pure-python recomputation of the md5 shard
    assignment on a planted corpus."""
    import hashlib
    from collections import Counter, defaultdict
    from mapreduce_rust_spark.llm import sharding as Sh

    docs = [(i, f"doc number {i} text", f"src{i % 3}")
            for i in range(200)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, source string")
    orig = Sh.load_table
    try:
        Sh.load_table = lambda s, d, n: df
        got = {r.shard: r for r in
               Sh.shuffle_quality_stats(spark, "ignored").collect()}
    finally:
        Sh.load_table = orig
    per = defaultdict(Counter)
    ntok = Counter()
    for i, t, src in docs:
        sh = int(hashlib.md5((t + str(i)).encode()).hexdigest()[:12],
                 16) % Sh.N_SHARDS
        per[sh][src] += 1
        ntok[sh] += len(t.split())
    assert set(got) == set(per)
    for sh, c in per.items():
        r = got[sh]
        assert r.n_docs == sum(c.values())
        assert r.n_tokens == ntok[sh]
        assert r.n_sources == len(c)
        top = min(sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:1])
        assert (r.top_source, abs(r.top_share * r.n_docs - top[1]) < 1e-9) \
            == (top[0], True)


def test_attribution_position_based_planted(spark):
    """One session: touches A,B,C,D then purchase → U-shape 40/40,
    middle 20% split over B,C (1000 each, remainder 0); a 1-touch
    session gives its touch 10000; a 2-touch session splits 50/50."""
    from mapreduce_rust_spark.operators import olap

    def ev(uid, i, typ):
        return (uid, i, typ, f"2024-01-01 10:{i:02d}:00")

    rows = ([ev(1, i, t) for i, t in
             enumerate(["A", "B", "C", "D", "purchase"])]
            + [ev(2, 1, "E"), ev(2, 2, "purchase")]
            + [ev(3, 1, "A"), ev(3, 2, "B"), ev(3, 3, "purchase")])
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, t string"
    ).selectExpr("user_id", "event_id", "event_type",
                 "CAST(t AS TIMESTAMP) AS ts")
    orig = olap.load_table
    try:
        olap.load_table = lambda s, d, n: df
        got = {r.touch_type: (r.credit_bp, r.n_touches) for r in
               olap.attribution_position_based(spark, "x").collect()}
    finally:
        olap.load_table = orig
    # user1: A first=4000, D last=4000, B,C middle 1000 each;
    # user2: E alone = 10000; user3: A,B split 5000/5000
    assert got == {"A": (4000 + 5000, 2), "B": (1000 + 5000, 2),
                   "C": (1000, 1), "D": (4000, 1), "E": (10000, 1)}


def test_sla_business_days_planted(spark):
    """Friday→Monday spans a weekend: 1 business day. Monday→Friday
    same week: 4. Same day: 0. Weekend order dates count from the
    following Monday (f() is constant across Sat/Sun)."""
    from mapreduce_rust_spark.operators import olap

    cases = [  # (orderdate, shipdate, expected business days)
        (1, "2024-01-05", "2024-01-08", 1),   # Fri -> Mon
        (2, "2024-01-01", "2024-01-05", 4),   # Mon -> Fri
        (3, "2024-01-03", "2024-01-03", 0),   # same day
        (4, "2024-01-06", "2024-01-08", 0),   # Sat -> Mon
        (5, "2024-01-01", "2024-01-15", 10),  # two full weeks
    ]
    orders = spark.createDataFrame(
        [(k, f"{o} 00:00:00") for k, o, _, _ in cases],
        "o_orderkey long, o_orderdate string").selectExpr(
        "o_orderkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate")
    li = spark.createDataFrame(
        [(k, f"{s} 00:00:00") for k, _, s, _ in cases],
        "l_orderkey long, l_shipdate string").selectExpr(
        "l_orderkey", "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate")
    orig = olap.load_table
    try:
        olap.load_table = (lambda s, d, n:
                           li if n == "lineitem" else orders)
        got = sorted((r.bdays, r.n_lines) for r in
                     olap.sla_business_days_lineitem(spark, "x")
                     .collect())
    finally:
        olap.load_table = orig
    from collections import Counter
    want = Counter(e for *_, e in cases)
    assert got == sorted((b, n) for b, n in want.items())


def test_cosine_hist_planted(spark):
    """Planted vectors with hand-computable cosines land in the right
    buckets (with ≤ TARGET vectors the adaptive mod is 1, so every
    pair participates): identical pair → 20, orthogonal → 0,
    opposite → -20, 45° → 14 and its negative → -15 (floor)."""
    from mapreduce_rust_spark.llm import similarity as S

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (4, [1.0, 0.0], 0),
         (8, [0.0, 1.0], 0), (12, [-1.0, 0.0], 0),
         (1, [9.0, 9.0], 0)],
        "vec_id long, embedding array<float>, label int")
    orig = S.load_table
    try:
        S.load_table = lambda s, d, n: emb
        got = {r.bucket: r.n_pairs for r in
               S.cosine_hist_embeddings(spark, "x").collect()}
    finally:
        S.load_table = orig
    # (0,4)=1.0→20; (0,8),(4,8),(8,12)=0→0; (0,12),(4,12)=-1→-20;
    # (0,1),(1,4),(1,8)=cos45°→14; (1,12)=-cos45°→-15
    assert got == {20: 1, 0: 3, -20: 2, 14: 3, -15: 1}


def test_abc_xyz_matrix_consistency(spark, duck):
    """The matrix must be the exact contingency of the two class
    queries: per-cell counts re-derived from the individual outputs,
    and totals conserved."""
    from mapreduce_rust_spark.operators import olap
    from tests.conftest import SF_CORRECT

    abc = {r.l_partkey: r.abc_class for r in
           olap.abc_pareto_parts(spark, SF_CORRECT).collect()}
    xyz = {r.part: (r.xyz, r.total_qty) for r in
           olap.xyz_variability_parts(spark, SF_CORRECT).collect()}
    got = {(r.abc_class, r.xyz): (r.n_parts, r.total_qty) for r in
           olap.abc_xyz_matrix_parts(spark, SF_CORRECT).collect()}
    from collections import defaultdict
    want_n = defaultdict(int)
    want_q = defaultdict(int)
    for part, a in abc.items():
        x, q = xyz[part]
        want_n[(a, x)] += 1
        want_q[(a, x)] += q
    assert got == {k: (want_n[k], want_q[k]) for k in want_n}
    assert sum(n for n, _ in got.values()) == len(abc)


def test_dup_payment_screen_planted(spark):
    """Planted double submissions: same customer, amounts in one
    $1000 band, 3 days apart → flagged; same amounts 60 days apart or
    different customers → not; a degenerate block (9 same-band orders
    on one day) is capped at DUP_PAY_CAP partners per order."""
    from mapreduce_rust_spark.operators import olap

    rows = [
        (1, 1, 1500.00, "2024-01-01"), (2, 1, 1500.10, "2024-01-04"),
        (3, 1, 1500.20, "2024-03-04"),   # same band, 60d: outside window
        (4, 2, 1500.00, "2024-01-04"),   # other customer
        (5, 3, 2500.00, "2024-01-01"), (6, 3, 3500.00, "2024-01-02"),
    ] + [(100 + i, 9, 9100.0 + i, "2024-02-01") for i in range(10)]
    orders = spark.createDataFrame(
        [(k, c, p, f"{d} 00:00:00") for k, c, p, d in rows],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate string").selectExpr(
        "o_orderkey", "o_custkey", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate")
    orig = olap.load_table
    try:
        olap.load_table = lambda s, d, n: orders
        got = [(r.key_a, r.key_b, r.gap_days) for r in
               olap.dup_payment_screen_orders(spark, "x").collect()]
    finally:
        olap.load_table = orig
    flagged = {(a, b) for a, b, _ in got}
    assert (1, 2) in flagged and dict(
        ((a, b), g) for a, b, g in got)[(1, 2)] == 3
    assert (1, 3) not in flagged and (2, 3) not in flagged
    assert (1, 4) not in flagged and (5, 6) not in flagged
    # degenerate block: order 100 keeps at most CAP partners
    partners_100 = [b for a, b, _ in got if a == 100]
    assert len(partners_100) == olap.DUP_PAY_CAP
    assert f"rk <= {olap.DUP_PAY_CAP}" in olap.DUP_PAY_ORACLE


def test_mase_baseline_planted(spark):
    """A pure weekly-periodic series has lag-7 MAE exactly 0; adding
    one spike day contributes |spike| twice (as x_t once, as x_{t+7}
    once) over the same term count."""
    from mapreduce_rust_spark.operators import olap

    rows = []
    for d in range(28):   # 4 exact weekly cycles, value = weekday
        rows.append(("a", f"2024-01-{d+1:02d} 12:00:00",
                     float(d % 7 + 1)))
    rows.append(("b", "2024-01-10 12:00:00", 5.0))  # one spike for b
    ev = spark.createDataFrame(
        rows, "event_type string, t string, value double"
    ).selectExpr("event_type", "CAST(t AS TIMESTAMP) AS ts", "value")
    orig = olap.load_table
    try:
        olap.load_table = lambda s, d, n: ev
        got = {r.event_type: r for r in
               olap.mase_baseline_events(spark, "x").collect()}
    finally:
        olap.load_table = orig
    assert got["a"].sae_cents == 0 and got["a"].mase_denom == 0.0
    # b: zero-filled grid over the 28-day span; x has one 500-cent
    # day, so |x - x7| = 500 at t=spike and t=spike+7
    assert got["b"].sae_cents == 1000
    assert got["b"].n_terms == got["a"].n_terms == 21


def test_kmeans_exact_matches_numpy_integer_lloyds(spark):
    """The relational integer Lloyd's must equal a pure-numpy run of
    the same algorithm (quantize, k smallest vec_ids as init, argmin
    with (d2, cid) tiebreak, truncating-division centroid update) on
    the sf0.001 fixture — pinning the SEMANTICS, not just
    cross-engine agreement."""
    import numpy as np
    from mapreduce_rust_spark.llm import pipeline as P
    from mapreduce_rust_spark.tables import load_table

    rows = (load_table(spark, SF_SMOKE, "embeddings")
            .orderBy("vec_id").collect())
    ids = np.array([r.vec_id for r in rows])
    # numpy rint is HALF_EVEN, matching bround/round_even
    Q = np.rint(np.array([[np.float64(x) for x in r.embedding]
                          for r in rows]) * P.KM_EXACT_GRID).astype(np.int64)
    cents = Q[np.argsort(ids)[:P.KM_EXACT_K]].copy()
    for _ in range(P.KM_EXACT_ITERS):
        d2 = ((Q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cid = d2.argmin(axis=1)          # ties -> lowest cid (argmin)
        best = d2[np.arange(len(Q)), cid]
        for c in range(P.KM_EXACT_K):
            m = cid == c
            if m.any():
                s = Q[m].sum(axis=0)
                n = int(m.sum())
                # truncating division toward zero (Spark DIV/DuckDB //)
                cents[c] = np.sign(s) * (np.abs(s) // n)
    want = {c: (int((cid == c).sum()), int(best[cid == c].sum()),
                int((cents[c] * (np.arange(cents.shape[1]) + 1)).sum()))
            for c in range(P.KM_EXACT_K)}
    got = {r.cid: (r.n_vecs, r.inertia_q, r.centroid_checksum) for r in
           P.kmeans_exact_embeddings(spark, SF_SMOKE).collect()}
    assert got == want


def test_harmonic_centrality_planted(spark):
    """Planted star+path graph: seed 0 in a 4-star whose leaves chain
    to two extra nodes → n1 = 4 direct, n2 = 2 at distance 2,
    harmonic = 4 + 2/2 = 5.0 exactly."""
    from mapreduce_rust_spark.operators import graph as G

    # orders define the co-purchase edges: {0,a} baskets make the
    # star; {a, x} baskets add the 2-hop tail
    baskets = [(1, [0, 10]), (2, [0, 11]), (3, [0, 12]), (4, [0, 13]),
               (5, [10, 20]), (6, [11, 21])]
    rows = [(o, p) for o, ps in baskets for p in ps]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    orig = G.load_table
    try:
        G.load_table = lambda s, d, n: li
        got = {r.seed: r for r in
               G.harmonic_centrality_seeds(spark, "x").collect()}
    finally:
        G.load_table = orig
    r = got[0]
    assert (r.n1, r.n2, r.h2, r.harmonic) == (4, 2, 10, 5.0)
    # seeds 1 and 2 have no edges in this graph: absent (left join
    # starts from n1, i.e. seeds WITH at least one neighbor)
    assert set(got) == {0}
