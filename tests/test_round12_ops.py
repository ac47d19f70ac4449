"""Behavioral tests for the round-12 crop — planted extremes and
independent-path parity the fixture-driven oracle mirror cannot see."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd


def _duck_on(tmp_path, *tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')")
    return con


def _docs(tmp_path, texts, sources=None, langs=None):
    pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
        "lang": langs or ["en"] * len(texts),
        "source": sources or ["s0"] * len(texts),
        "n_chars": [len(t) for t in texts]}).to_parquet(
        tmp_path / "documents.parquet")


def _alaw2linear_reference(code: int) -> int:
    """Independent per-byte A-law expansion, transcribed directly
    from ITU-T G.711's segmented companding table (the classic
    alaw2linear): NOT the vectorized production path."""
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def test_alaw_decode_full_codebook():
    """The vectorized ``_alaw_decode`` must match the scalar ITU
    reference on every one of the 256 code bytes (spot values: the
    two ±8 codes 0x55/0xD5, the ±5504 codes 0x00/0x80, and the
    maxima ±32256 at 0x2A/0xAA)."""
    from mapreduce_rust_spark.llm.multimodal import _alaw_decode
    got = _alaw_decode(bytes(range(256)))
    want = [_alaw2linear_reference(c) for c in range(256)]
    assert got.tolist() == want
    assert _alaw2linear_reference(0x55) == -8
    assert _alaw2linear_reference(0xD5) == 8
    assert _alaw2linear_reference(0x00) == -5504
    assert max(want) == 32256 and min(want) == -32256


def test_alaw_decode_hand_computed_window(spark, tmp_path):
    """One-char doc 'a' (code 97): a = 97^0x55 = 52 → m = 64,
    seg = 3, t = (64+264)·4 = 1312, sign bit clear → −1312; the
    single window must read sum_sq = 1312², peak = 1312."""
    _docs(tmp_path, ["a"])
    from mapreduce_rust_spark.llm.multimodal import (
        multimodal_audio_alaw_stats)
    r = multimodal_audio_alaw_stats(spark, str(tmp_path)).collect()[0]
    assert (r.n_samples, r.sum_sq, r.peak) == (1, 1312 * 1312, 1312)
    # 1312² = 1721344 is under the 2e6 mean-square threshold
    assert r.silence


def test_alaw_oracle_matches_on_planted_corpus(spark, tmp_path):
    """Multi-window doc + exact-duplicate collapse: the Spark decode
    and the SQL expansion must agree row-for-row (including the
    duplicate doc's fan-out rows)."""
    text = "".join(chr(32 + (i * 7) % 95) for i in range(500))
    _docs(tmp_path, [text, "quiet", text])
    from mapreduce_rust_spark.llm.multimodal import (
        AUDIO_ALAW_ORACLE, multimodal_audio_alaw_stats)
    got = sorted(map(tuple,
                     multimodal_audio_alaw_stats(
                         spark, str(tmp_path)).collect()))
    con = _duck_on(tmp_path, "documents")
    want = sorted(map(tuple, con.execute(AUDIO_ALAW_ORACLE).fetchall()))
    assert got == want and len(got) > 3
    # docs 0 and 2 are byte-identical → identical stats per window
    d0 = [g[1:] for g in got if g[0] == 0]
    d2 = [g[1:] for g in got if g[0] == 2]
    assert d0 == d2


def test_audio_gate_still_honest():
    """Format codes without a codec (MP3-in-WAV 0x55, 16-bit float)
    must still raise NotImplementedError; A-law (6) and 32-bit IEEE
    float (3) must not — the two round-12 gate narrowings."""
    import struct
    import pytest
    from mapreduce_rust_spark.llm.multimodal import decode_wav_pcm

    def wav(code, bits, data, channels=1):
        fmt = struct.pack("<HHIIHH", code, channels, 8000, 8000, 1, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rate, ch, s = decode_wav_pcm(wav(6, 8, b"\x55\xd5"))
    assert (rate, ch, s.tolist()) == (8000, 1, [-8, 8])
    rate, ch, s = decode_wav_pcm(
        wav(3, 32, struct.pack("<ff", 0.25, -1.5)))
    assert (rate, ch, s.tolist()) == (8000, 1, [0.25, -1.5])
    with pytest.raises(NotImplementedError):
        decode_wav_pcm(wav(3, 16, b"\x00" * 8))     # half-float width
    with pytest.raises(NotImplementedError):
        decode_wav_pcm(wav(3, 32, b"\x00" * 8, channels=2))
    with pytest.raises(NotImplementedError):
        decode_wav_pcm(wav(0x55, 0, b""))


def test_float_pcm_q16_exact_all_bytes():
    """Every byte's float32 sample must quantize back to EXACTLY
    (b−128)·256 + b — the dyadic-exactness claim underpinning the
    oracle — via the real pack → RIFF-parse → IEEE-decode path."""
    from mapreduce_rust_spark.llm.multimodal import (
        _pack_wav_float, decode_wav_pcm)
    text = "".join(chr(b) for b in range(256))
    rate, ch, samples = decode_wav_pcm(_pack_wav_float(text))
    assert (rate, ch, samples.dtype.str) == (8000, 1, "<f4")
    q = np.rint(samples.astype(np.float64) * 65536.0).astype(np.int64)
    want = [(b - 128) * 256 + b for b in range(256)]
    assert q.tolist() == want
    # re-scaled values really are exact dyadics: no rounding happened
    assert np.array_equal(samples.astype(np.float64) * 65536.0,
                          q.astype(np.float64))


def test_float_pcm_oracle_matches_on_planted_corpus(spark, tmp_path):
    """Spark kernel vs the integer-arithmetic oracle on a planted
    corpus: extremes (0x00 → −32768), multi-window docs, dup docs
    (digest collapse), and a short tail window."""
    from mapreduce_rust_spark.llm.multimodal import (
        AUDIO_FLOAT_ORACLE, multimodal_audio_float_stats)
    texts = ["\x00\x7fALL extremes \xff" * 20,
             "quiet " * 60,                      # multi-window
             "quiet " * 60,                      # exact dup
             "x"]                                # single-sample tail
    _docs(tmp_path, texts)
    got = sorted(map(tuple, multimodal_audio_float_stats(
        spark, str(tmp_path)).toPandas().astype(str).values.tolist()))
    con = _duck_on(tmp_path, "documents")
    want = sorted(map(tuple, con.execute(
        AUDIO_FLOAT_ORACLE).fetchdf().astype(str).values.tolist()))
    assert got == want and len(got) >= 5


def _hll_mix_reference(k: int) -> int:
    """Independent murmur3-fmix32 transcription (shift/xor/multiply
    on Python ints), NOT the SQL-templated production path."""
    h = k % (1 << 32)
    h ^= h >> 16
    h = h * 0x85EBCA6B % (1 << 32)
    h ^= h >> 13
    h = h * 0xC2B2AE35 % (1 << 32)
    h ^= h >> 16
    return h


def test_hll_registers_match_python_reference(spark, tmp_path):
    """The deterministic HLL's sufficient statistics must equal a
    from-scratch Python HLL over the same keys (hash, bucketing, rho
    ladder, integer-scaled harmonic sum, raw-estimate DAG)."""
    keys = list(range(1, 301)) + [7, 7, 7]   # dups must not matter
    pd.DataFrame({
        "l_orderkey": range(len(keys)),
        "l_partkey": keys,
        "l_suppkey": 1, "l_linenumber": 1, "l_quantity": 1.0,
        "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
        "l_returnflag": "A", "l_linestatus": "O",
        "l_shipdate": pd.Timestamp("2024-01-01"),
        "l_commitdate": pd.Timestamp("2024-01-01"),
        "l_receiptdate": pd.Timestamp("2024-01-01"),
        "l_shipinstruct": "x", "l_shipmode": "MAIL",
        "l_comment": "c"}).to_parquet(tmp_path / "lineitem.parquet")
    from mapreduce_rust_spark.operators.relational import (
        HLL_EST_NUM, HLL_M, HLL_W, SKETCH_DISTINCT_ORACLE,
        sketch_distinct_parts)
    regs: dict[int, int] = {}
    for k in keys:
        h = _hll_mix_reference(k)
        b, w = h >> HLL_W, h % (1 << HLL_W)
        rho = (HLL_W + 1) if w == 0 else (HLL_W - w.bit_length() + 1)
        regs[b] = max(regs.get(b, 0), rho)
    zero = HLL_M - len(regs)
    sum_scaled = zero * (1 << 32) + sum(1 << (32 - v)
                                       for v in regs.values())
    r = sketch_distinct_parts(spark, str(tmp_path)).collect()[0]
    assert (r.n_rows, r.m, r.seen_buckets, r.zero_regs) == \
        (len(keys), HLL_M, len(regs), zero)
    assert r.sum_scaled == sum_scaled
    assert r.reg_sum == sum(regs.values())
    assert r.est_raw == HLL_EST_NUM / float(sum_scaled)
    con = _duck_on(tmp_path, "lineitem")
    want = con.execute(SKETCH_DISTINCT_ORACLE).fetchone()
    assert tuple(want) == tuple(r)


# --- color JPEG (round 12: 4:2:0 YCbCr baseline) ---------------------------

def _mcu_constant_gray_rgb(vals: np.ndarray, side_mcus: int = 4) -> np.ndarray:
    """(16·side)² RGB image, constant within each 16×16 MCU, R=G=B —
    the color codec's provable exactness class."""
    g = np.repeat(np.repeat(vals.reshape(side_mcus, side_mcus), 16, 0), 16, 1)
    return np.stack([g] * 3, axis=-1).astype(np.uint8)


def test_jpeg_color_exact_roundtrip_mcu_constant_gray():
    """Gray-valued (R=G=B) MCU-constant images + flat tables must
    round-trip bit-exactly through subsample → interleave →
    entropy-code → decode → upsample → color transform, across the
    full value range including 0 and 255."""
    from mapreduce_rust_spark.llm.jpegcodec import (
        QUANT_FLAT, decode_jpeg_color, encode_jpeg_color)
    rng = np.random.default_rng(12)
    for vals in (rng.integers(0, 256, 16, dtype=np.uint8),
                 np.arange(16, dtype=np.uint8),
                 np.arange(240, 256, dtype=np.uint8),
                 np.zeros(16, dtype=np.uint8),
                 np.full(16, 255, dtype=np.uint8)):
        img = _mcu_constant_gray_rgb(vals)
        jpg = encode_jpeg_color(img.tobytes(), 64, 64,
                                QUANT_FLAT, QUANT_FLAT)
        w, h, px = decode_jpeg_color(jpg)
        assert (w, h) == (64, 64)
        assert px == img.tobytes()


def test_jpeg_color_near_exact_on_mcu_constant_color():
    """Arbitrary-COLOR MCU-constant images (Cb/Cr far from 128) are
    not in the provable identity class (the float color transform
    rounds), but under flat tables every channel must land within
    ±1 of the source — the rounding bound the docstring claims."""
    from mapreduce_rust_spark.llm.jpegcodec import (
        QUANT_FLAT, decode_jpeg_color, encode_jpeg_color)
    rng = np.random.default_rng(34)
    rgbm = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(rgbm, 16, 0), 16, 1)
    jpg = encode_jpeg_color(img.tobytes(), 64, 64, QUANT_FLAT, QUANT_FLAT)
    _, _, px = decode_jpeg_color(jpg)
    err = np.abs(np.frombuffer(px, np.uint8).astype(int)
                 - img.reshape(-1).astype(int))
    assert err.max() <= 1, err.max()


def test_jpeg_color_lossy_error_bounded_on_smooth_image():
    """Annex K luma+chroma tables on a smooth color gradient: decoded
    error stays within a few levels per channel (JPEG's design case);
    random noise gets a sanity decode (right geometry, no crash)."""
    from mapreduce_rust_spark.llm.jpegcodec import (
        decode_jpeg_color, encode_jpeg_color)
    y, x = np.mgrid[0:64, 0:64]
    img = np.stack([x + y, 2 * x, 255 - (x + y)], axis=-1) \
        .astype(np.uint8)
    _, _, px = decode_jpeg_color(encode_jpeg_color(img.tobytes(), 64, 64))
    err = np.abs(np.frombuffer(px, np.uint8).astype(int)
                 - img.reshape(-1).astype(int))
    assert err.max() <= 16, err.max()
    rng = np.random.default_rng(56)
    noise = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    w, h, px2 = decode_jpeg_color(encode_jpeg_color(noise.tobytes(), 64, 64))
    assert (w, h, len(px2)) == (64, 64, 64 * 64 * 3)


def test_jpeg_color_interop_with_gray_decoder():
    """Component-count routing: the color decoder refuses 1-component
    streams, the gray decoder refuses 3-component streams, and both
    refuse each other's out-of-scope subformats loudly."""
    import pytest

    from mapreduce_rust_spark.llm.jpegcodec import (
        QUANT_FLAT, decode_jpeg_color, decode_jpeg_gray,
        encode_jpeg_color, encode_jpeg_gray)
    gray = np.repeat(np.repeat(
        np.arange(64, dtype=np.uint8).reshape(8, 8), 8, 0), 8, 1)
    gjpg = encode_jpeg_gray(gray.tobytes(), 64, 64, QUANT_FLAT)
    cjpg = encode_jpeg_color(
        _mcu_constant_gray_rgb(np.arange(16, dtype=np.uint8)).tobytes(),
        64, 64, QUANT_FLAT, QUANT_FLAT)
    with pytest.raises(ValueError):
        decode_jpeg_color(gjpg)
    with pytest.raises(ValueError):
        decode_jpeg_gray(cjpg)
    with pytest.raises(ValueError):
        decode_jpeg_color(b"\x89PNG not a jpeg")
    # progressive SOF2 refused on the color path too
    with pytest.raises(ValueError):
        decode_jpeg_color(cjpg.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError):
        encode_jpeg_color(b"\x00" * (24 * 24 * 3), 24, 24)


def test_jpeg_color_byte_stuffing_exercised():
    """Extreme alternating MCU values land 0xFF bytes in the color
    scan; stuffing must round-trip exactly (same classic bug class as
    the grayscale pin)."""
    from mapreduce_rust_spark.llm.jpegcodec import (
        QUANT_FLAT, decode_jpeg_color, encode_jpeg_color)
    vals = np.resize(np.array([255, 0, 128], dtype=np.uint8), 16)
    img = _mcu_constant_gray_rgb(vals)
    jpg = encode_jpeg_color(img.tobytes(), 64, 64, QUANT_FLAT, QUANT_FLAT)
    assert jpg.count(b"\xff\x00") > 0, "stuffing path not exercised"
    assert decode_jpeg_color(jpg)[2] == img.tobytes()


def test_jpeg_color_roundtrip_kernel_hand_computed():
    """The registered query's kernel sha must equal the sha of the
    hand-expanded image for a known 16-byte payload — the same
    expansion the DuckDB oracle performs in SQL."""
    import hashlib

    import pandas as pd

    from mapreduce_rust_spark.llm.multimodal import (
        _jpeg_color_roundtrip_batches)
    s = "abcdefghijklmnop"
    [out] = list(_jpeg_color_roundtrip_batches(iter([pd.DataFrame(
        {"s16": [s], "payload": [s.encode()]})])))
    vals = np.frombuffer(s.encode(), dtype=np.uint8)
    img = _mcu_constant_gray_rgb(vals)
    assert out.loc[0, "pixel_sha"] == hashlib.sha256(
        img.tobytes()).hexdigest()
    assert (int(out.loc[0, "width"]), int(out.loc[0, "height"]),
            int(out.loc[0, "n_mcus"])) == (64, 64, 16)


def test_grid_median_within_half_bucket_of_exact(spark):
    """The grid-median monitor must land within GRIDQ_WIDTH/2 cents
    of the exact per-type lower median, with exact rank bracketing —
    the proven bound of the fixed-boundary design."""
    from mapreduce_rust_spark.operators.analytic import (
        GRIDQ_WIDTH, grid_median_event_value)
    from tests.conftest import SF_CORRECT
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    exact = {}
    for r in ev.select("event_type", "value").collect():
        exact.setdefault(r.event_type, []).append(
            int(round(r.value * 100)))
    rows = grid_median_event_value(spark, SF_CORRECT).collect()
    assert len(rows) == len(exact)
    for r in rows:
        vals = sorted(exact[r.event_type])
        med = vals[(len(vals) + 1) // 2 - 1]
        assert (r.n_rows, r.med_rank) == (len(vals), (len(vals) + 1) // 2)
        assert r.bucket == med // GRIDQ_WIDTH
        assert abs(r.approx_med * 100 - med) <= GRIDQ_WIDTH / 2


def test_stream_grid_median_equals_batch(spark):
    """Kappa pair 51: the streaming grid-median must be row-identical
    to the batch op — the cell table is order-independent, so
    micro-batching cannot change it."""
    from mapreduce_rust_spark.operators.analytic import (
        grid_median_event_value)
    from mapreduce_rust_spark.streaming.windows import stream_grid_median
    from tests.conftest import SF_CORRECT
    got = sorted(map(tuple, stream_grid_median(spark, SF_CORRECT)
                     .toPandas().astype(str).values.tolist()))
    want = sorted(map(tuple, grid_median_event_value(spark, SF_CORRECT)
                      .toPandas().astype(str).values.tolist()))
    assert got == want and len(got) >= 3


def test_pq_codebook_vectors_self_assign(spark):
    """Every codebook vector (vec_id < PQ_KC) must assign with
    squared error 0 — its own subvector is in the codebook — and to
    a code ≤ its own id (smaller only when an earlier codeword's
    subvector is identical, per the (dist, code) tie-break)."""
    from mapreduce_rust_spark.llm.similarity import (
        PQ_KC, PQ_M, pq_assign_embeddings)
    from tests.conftest import SF_CORRECT
    rows = [r for r in pq_assign_embeddings(spark, SF_CORRECT).collect()
            if r.vec_id < PQ_KC]
    assert len(rows) >= PQ_M      # fixture may hold < PQ_KC vectors
    assert len(rows) % PQ_M == 0
    for r in rows:
        assert r.dist == 0 and r.code <= r.vec_id, r


def test_pq_adc_recall_vs_exact_quantized(spark):
    """ADC over PQ codes must retrieve a sane fraction of the exact
    int8 top-K (the PQ paper's headline trade: 64x less memory for
    bounded recall loss). The floor is intentionally loose — the
    sampled 16-codeword codebook is the recall-limiting factor, and
    a k-means codebook would only raise it."""
    from mapreduce_rust_spark.llm.similarity import (
        K, knn_pq_adc, knn_quantized)
    from tests.conftest import SF_CORRECT
    exact = {}
    for r in knn_quantized(spark, SF_CORRECT).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in knn_pq_adc(spark, SF_CORRECT).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got) == set(exact) and all(len(v) == K for v in got.values())
    recall = (sum(len(got[q] & exact[q]) for q in exact)
              / sum(len(exact[q]) for q in exact))
    print(f"PQ-ADC recall@{K} vs exact int8: {recall:.2f}")
    assert recall >= 0.6, recall
