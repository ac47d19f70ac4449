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
