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


def test_alaw_gate_still_honest():
    """Format codes without a codec (float PCM 3, MP3 0x55) must
    still raise NotImplementedError; A-law (6) must not."""
    import struct
    import pytest
    from mapreduce_rust_spark.llm.multimodal import decode_wav_pcm

    def wav(code, bits, data):
        fmt = struct.pack("<HHIIHH", code, 1, 8000, 8000, 1, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rate, ch, s = decode_wav_pcm(wav(6, 8, b"\x55\xd5"))
    assert (rate, ch, s.tolist()) == (8000, 1, [-8, 8])
    with pytest.raises(NotImplementedError):
        decode_wav_pcm(wav(3, 32, b"\x00" * 8))
    with pytest.raises(NotImplementedError):
        decode_wav_pcm(wav(0x55, 0, b""))


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
