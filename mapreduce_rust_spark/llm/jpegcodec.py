"""Pure stdlib+numpy baseline JPEG codec (grayscale, sequential DCT).

The container ships no PIL/libjpeg, but baseline JPEG needs neither:
the format is public knowledge (ITU-T T.81) — 8×8 DCT, uniform scalar
quantization, zigzag + run-length coding, canonical Huffman tables.
This module implements a real encoder/decoder for SINGLE-COMPONENT
(grayscale) BASELINE SEQUENTIAL JPEG — enough to decode real-world
grayscale scans/thumbnails — and closes the one honest multimodal
decode gate the PNG codec (``imagecodec.py``) left open (VERDICT r6
item 5). Color/progressive/restart-interval streams raise ValueError
(the documented scope boundary); video/audio stay gated.

Exactness class (what makes an end-to-end DuckDB oracle possible for
a LOSSY format): for images whose pixels are CONSTANT within every
8×8 block, the DCT has a single DC coefficient 8·(v−128) (exactly
representable: |8c| ≤ 1024, float64 error ≪ 0.5 through the cosine
matrix products), so with a flat all-ones quantization table the
whole pipeline — DCT → quantize → zigzag → DC-differential → Huffman
bitstream (with 0xFF byte stuffing) → Huffman decode → dequantize →
IDCT → level shift — is provably the IDENTITY. The registered query
(``multimodal.jpeg_gray_roundtrip``) exercises exactly that class;
pytest additionally bounds the error of the DEFAULT (Annex K table)
lossy path on arbitrary images.

Tables: the quantization and Huffman tables below are the standard
ones from ITU-T T.81 Annex K (public spec constants).

Reference scope note: the reference engine (Freebirdgo/MapReduce_Rust,
src/mr/worker.rs) has no media surface; this exists for the 100 TB
training-pipeline extension mandate. Decoding runs inside
Arrow-batched ``mapInPandas`` kernels — bytes never shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# --- T.81 Annex K constants (public spec) -------------------------------

# K.1 luminance quantization table, natural (row-major) order
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

QUANT_FLAT = np.ones((8, 8), dtype=np.int32)  # the exactness-class table

# K.3.1 luminance DC: BITS (codes per length 1..16) and HUFFVAL
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# K.3.2 luminance AC
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# zigzag scan: ZIGZAG[k] = natural index of the k-th zigzag coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# orthonormal DCT-II matrix: M[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_M = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) * 0.5
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)])


def _build_huffman(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman per T.81 C.2: value -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _build_huffman(DC_BITS, DC_VALS)
_AC_ENC = _build_huffman(AC_BITS, AC_VALS)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (size category, amplitude bits).
    Negative values use the one's-complement convention (F.1.2.1)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


class _BitWriter:
    """MSB-first bit packer with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _blocks(pixels: np.ndarray) -> np.ndarray:
    """(h, w) image -> (n_blocks, 8, 8) in MCU raster order."""
    h, w = pixels.shape
    return (pixels.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def encode_jpeg_gray(pixels: bytes, width: int, height: int,
                     quant: np.ndarray = QUANT_LUMA) -> bytes:
    """Encode raw 8-bit grayscale pixels (len = w·h, w and h multiples
    of 8) as a baseline sequential JPEG with the given quantization
    table (natural order) and the Annex K Huffman tables."""
    if width % 8 or height % 8:
        raise ValueError("width/height must be multiples of 8 "
                         "(pad before encoding)")
    if len(pixels) != width * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}")
    img = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    img = img.reshape(height, width) - 128.0
    blocks = _blocks(img)
    # batched 2D DCT: S = M B Mᵀ (two broadcast matmuls — einsum's
    # generic path costs ~4x on small (n,8,8) operands)
    coef = _M @ blocks @ _M.T
    q = np.rint(coef / quant.astype(np.float64)).astype(np.int64)
    zz = q.reshape(-1, 64)[:, ZIGZAG]          # (n_blocks, 64) zigzag

    w = _BitWriter()
    prev_dc = 0
    # vectorized last-nonzero index per block (the EOB position scan
    # is the hot part of the per-block loop on EOB-heavy images)
    ac_nz = zz[:, 1:] != 0
    lasts = np.where(ac_nz.any(axis=1),
                     63 - np.argmax(ac_nz[:, ::-1], axis=1), 0)
    for blk, last in zip(zz, lasts):
        dc = int(blk[0])
        size, bits = _magnitude(dc - prev_dc)
        prev_dc = dc
        code, length = _DC_ENC[size]
        w.write(code, length)
        if size:
            w.write(bits, size)
        run = 0
        for k in range(1, int(last) + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = _AC_ENC[0xF0]   # ZRL
                w.write(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = _AC_ENC[(run << 4) | size]
            w.write(code, length)
            w.write(bits, size)
            run = 0
        if last < 63:
            code, length = _AC_ENC[0x00]       # EOB
            w.write(code, length)
    scan = w.flush()

    qz = quant.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    dqt = struct.pack(">HB", 2 + 1 + 64, 0x00) + qz
    sof = struct.pack(">HBHHB", 2 + 6 + 3, 8, height, width, 1) \
        + bytes([1, 0x11, 0])
    dht_dc = struct.pack(">HB", 2 + 1 + 16 + len(DC_VALS), 0x00) \
        + bytes(DC_BITS) + bytes(DC_VALS)
    dht_ac = struct.pack(">HB", 2 + 1 + 16 + len(AC_VALS), 0x10) \
        + bytes(AC_BITS) + bytes(AC_VALS)
    sos = struct.pack(">HB", 2 + 1 + 2 + 3, 1) + bytes([1, 0x00]) \
        + bytes([0, 63, 0])
    return (b"\xFF\xD8"
            + b"\xFF\xDB" + dqt
            + b"\xFF\xC0" + sof
            + b"\xFF\xC4" + dht_dc
            + b"\xFF\xC4" + dht_ac
            + b"\xFF\xDA" + sos
            + scan
            + b"\xFF\xD9")


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for MSB-first sequential decode."""
    enc = _build_huffman(bits, vals)
    return {(length, code): val for val, (code, length) in enc.items()}


# 16-bit peek tables, cached per Huffman table: entry at index p (the
# next 16 bits of the stream) packs (value << 5) | code_length, so one
# integer peek replaces up to 16 read(1)+dict-probe rounds. Keyed by
# the table definition — for standard streams (Annex K) each worker
# builds the two tables once.
_PEEK_CACHE: dict[tuple, np.ndarray] = {}


def _peek_table(bits: list[int], vals: list[int]) -> np.ndarray:
    key = (tuple(bits), tuple(vals))
    tab = _PEEK_CACHE.get(key)
    if tab is None:
        tab = np.zeros(1 << 16, dtype=np.int32)   # 0 = invalid code
        for val, (code, length) in _build_huffman(bits, vals).items():
            lo = code << (16 - length)
            tab[lo:lo + (1 << (16 - length))] = (val << 5) | length
        _PEEK_CACHE[key] = tab
    return tab


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-stuffing marker (the scan's final
    byte is 1-padded per spec, so reads past the last code — which
    only happen inside that byte — see pad bits)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG: scan ended mid-code")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) \
                else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker: virtual 1-padding (decode stops after
                # the declared block count, so these bits are never
                # attributed to data)
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read(self, length: int) -> int:
        while self.n < length:
            self._fill()
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huffman(self, peek: np.ndarray) -> int:
        """One 16-bit peek + table hit instead of bit-by-bit walking —
        the decode hot path."""
        while self.n < 16:
            self._fill()
        entry = int(peek[(self.acc >> (self.n - 16)) & 0xFFFF])
        if entry == 0:
            raise ValueError("corrupt JPEG: no Huffman code within 16 bits")
        length = entry & 31
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return entry >> 5


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode a single-component baseline sequential JPEG. Returns
    (width, height, raw 8-bit pixel bytes). Raises ValueError on
    non-JPEG bytes and on subformats out of scope (color, progressive,
    restart intervals, 12-bit)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_tables: dict[int, np.ndarray] = {}
    ac_tables: dict[int, np.ndarray] = {}
    width = height = -1
    qid = dc_id = ac_id = 0
    scan_at = -1
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        # T.81 B.1.1.2 allows optional 0xFF fill bytes before any marker
        while data[pos + 1] == 0xFF and pos + 4 <= len(data):
            pos += 1
        marker = data[pos + 1]
        if marker == 0xFF:
            raise ValueError("truncated JPEG: trailing fill bytes")
        if marker == 0xD9:
            break
        # the fill loop can advance pos to within 4 bytes of the end
        # when a real marker follows a fill run in a truncated stream —
        # re-check before reading the length or unpack_from raises
        # struct.error instead of this module's documented ValueError
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG: segment header past end")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:                      # DQT (maybe several)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[off + 1:off + 65], dtype=np.uint8)
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                quant[tq] = nat.reshape(8, 8)
                off += 65
        elif marker == 0xC0:                    # SOF0 baseline
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError("only single-component (grayscale) "
                                 "JPEG supported")
            if body[7] != 0x11:                 # comp: id/sampling/tq
                raise ValueError("subsampled grayscale is malformed")
            qid = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xC4:                    # DHT (maybe several)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1:off + 17])
                nv = sum(bits)
                vals = list(body[off + 17:off + 17 + nv])
                tab = _peek_table(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = tab
                off += 17 + nv
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:                    # SOS — scan follows
            if body[0] != 1:
                raise ValueError("multi-component scan unsupported")
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            scan_at = pos
            break
        # APPn/COM/etc: skipped via seglen
    if scan_at < 0 or width < 0:
        raise ValueError("truncated JPEG: missing SOF/SOS")
    if width % 8 or height % 8:
        # general JPEG pads to MCU boundary; scope: exact multiples
        raise ValueError("non-multiple-of-8 dimensions unsupported")
    q = quant[qid].astype(np.float64)
    dct, act = dc_tables[dc_id], ac_tables[ac_id]
    n_blocks = (width // 8) * (height // 8)
    zz = np.zeros((n_blocks, 64), dtype=np.int64)
    r = _BitReader(data, scan_at)
    prev_dc = 0
    for b in range(n_blocks):
        size = r.huffman(dct)
        prev_dc += _extend(r.read(size), size)
        zz[b, 0] = prev_dc
        k = 1
        while k < 64:
            rs = r.huffman(act)
            run, size = rs >> 4, rs & 0x0F
            if rs == 0x00:                      # EOB
                break
            if rs == 0xF0:                      # ZRL
                k += 16
                continue
            k += run
            if k > 63:
                raise ValueError("corrupt JPEG: coefficient overrun")
            zz[b, k] = _extend(r.read(size), size)
            k += 1
    coef = np.zeros((n_blocks, 64), dtype=np.float64)
    coef[:, ZIGZAG] = zz
    coef = coef.reshape(-1, 8, 8) * q
    # batched inverse DCT: B = Mᵀ S M (broadcast matmuls, see encode)
    blocks = _M.T @ coef @ _M
    img = (blocks.reshape(height // 8, width // 8, 8, 8)
           .transpose(0, 2, 1, 3).reshape(height, width))
    out = np.clip(np.rint(img + 128.0), 0, 255).astype(np.uint8)
    return width, height, out.tobytes()


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xFF\xD8"


# --- color (YCbCr 4:2:0) baseline JPEG — round 12 --------------------------
# The color half of the codec: 3-component interleaved baseline
# sequential per T.81 with the JFIF/T.871 color transform and 2×2
# chroma subsampling (the layout virtually every camera/web color
# JPEG uses). Same exactness story as grayscale, one level up: for
# images CONSTANT within every 16×16 MCU whose R=G=B (gray-valued
# color), Y is the pixel value ±ulp, Cb/Cr are 128±ulp, every block
# is DC-only under a flat quant table, and the full interleaved
# pipeline is provably the identity — which is what the registered
# query's oracle checks. Arbitrary-color accuracy is bounded in
# pytest (the lossy Annex K path).

# K.2 chrominance quantization table, natural order
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

# K.3.3 chrominance DC
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))

# K.3.4 chrominance AC
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

_DC_ENC_C = _build_huffman(DC_BITS_C, DC_VALS_C)
_AC_ENC_C = _build_huffman(AC_BITS_C, AC_VALS_C)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) float64 RGB → YCbCr per JFIF/ITU-T T.871."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """(h, w, 3) float64 YCbCr → RGB per JFIF/ITU-T T.871."""
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _encode_blocks_zz(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(h, w) level-shifted plane → (n_blocks, 64) quantized zigzag
    coefficients in raster block order (shared DCT front half)."""
    coef = _M @ _blocks(plane) @ _M.T
    q = np.rint(coef / quant.astype(np.float64)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _write_block(w: _BitWriter, blk: np.ndarray, prev_dc: int,
                 dc_enc: dict, ac_enc: dict) -> int:
    """Entropy-code one zigzag block; returns the new DC predictor
    (the grayscale encoder's inner loop, shared by both paths)."""
    dc = int(blk[0])
    size, bits = _magnitude(dc - prev_dc)
    code, length = dc_enc[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    nz = np.nonzero(blk[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    run = 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]
            w.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_enc[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last < 63:
        code, length = ac_enc[0x00]
        w.write(code, length)
    return dc


def encode_jpeg_color(pixels: bytes, width: int, height: int,
                      quant_luma: np.ndarray = QUANT_LUMA,
                      quant_chroma: np.ndarray = QUANT_CHROMA) -> bytes:
    """Encode raw interleaved 8-bit RGB pixels (len = w·h·3, w and h
    multiples of 16) as a baseline sequential YCbCr 4:2:0 JPEG with
    the given quantization tables and the Annex K Huffman tables."""
    if width % 16 or height % 16:
        raise ValueError("width/height must be multiples of 16 "
                         "(4:2:0 MCU; pad before encoding)")
    if len(pixels) != width * height * 3:
        raise ValueError(f"pixel buffer {len(pixels)} != "
                         f"{width}x{height}x3")
    rgb = (np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
           .reshape(height, width, 3))
    ycc = rgb_to_ycbcr(rgb)
    yp = ycc[..., 0] - 128.0
    # 2x2 mean subsample, then level shift
    cb = ycc[..., 1].reshape(height // 2, 2, width // 2, 2) \
                    .mean(axis=(1, 3)) - 128.0
    cr = ycc[..., 2].reshape(height // 2, 2, width // 2, 2) \
                    .mean(axis=(1, 3)) - 128.0
    zz_y = _encode_blocks_zz(yp, quant_luma)
    zz_cb = _encode_blocks_zz(cb, quant_chroma)
    zz_cr = _encode_blocks_zz(cr, quant_chroma)

    bw = width // 8              # luma blocks per row
    mx, my = width // 16, height // 16
    w = _BitWriter()
    pdc = [0, 0, 0]              # per-component DC predictors
    for i in range(my):
        for j in range(mx):
            for (bi, bj) in ((2 * i, 2 * j), (2 * i, 2 * j + 1),
                             (2 * i + 1, 2 * j), (2 * i + 1, 2 * j + 1)):
                pdc[0] = _write_block(w, zz_y[bi * bw + bj], pdc[0],
                                      _DC_ENC, _AC_ENC)
            cidx = i * (width // 16) + j
            pdc[1] = _write_block(w, zz_cb[cidx], pdc[1],
                                  _DC_ENC_C, _AC_ENC_C)
            pdc[2] = _write_block(w, zz_cr[cidx], pdc[2],
                                  _DC_ENC_C, _AC_ENC_C)
    scan = w.flush()

    def dqt(tq: int, q: np.ndarray) -> bytes:
        qz = q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        return b"\xFF\xDB" + struct.pack(">HB", 2 + 1 + 64, tq) + qz

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return (b"\xFF\xC4"
                + struct.pack(">HB", 2 + 1 + 16 + len(vals), tc_th)
                + bytes(bits) + bytes(vals))

    sof = struct.pack(">HBHHB", 2 + 6 + 9, 8, height, width, 3) \
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    sos = struct.pack(">HB", 2 + 1 + 6 + 3, 3) \
        + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    return (b"\xFF\xD8"
            + dqt(0, quant_luma) + dqt(1, quant_chroma)
            + b"\xFF\xC0" + sof
            + dht(0x00, DC_BITS, DC_VALS) + dht(0x10, AC_BITS, AC_VALS)
            + dht(0x01, DC_BITS_C, DC_VALS_C)
            + dht(0x11, AC_BITS_C, AC_VALS_C)
            + b"\xFF\xDA" + sos
            + scan
            + b"\xFF\xD9")


def decode_jpeg_color(data: bytes) -> tuple[int, int, bytes]:
    """Decode a 3-component baseline sequential YCbCr 4:2:0 JPEG.
    Returns (width, height, raw interleaved 8-bit RGB bytes). Raises
    ValueError on non-JPEG bytes and on subformats out of scope
    (grayscale — use ``decode_jpeg_gray`` — 4:4:4/4:2:2 sampling,
    progressive, restart intervals, 12-bit)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_tables: dict[int, np.ndarray] = {}
    ac_tables: dict[int, np.ndarray] = {}
    width = height = -1
    comp_tq: dict[int, int] = {}
    scan_ids: list[tuple[int, int, int]] = []   # (comp id, dc, ac)
    scan_at = -1
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        while data[pos + 1] == 0xFF and pos + 4 <= len(data):
            pos += 1
        marker = data[pos + 1]
        if marker == 0xFF:
            raise ValueError("truncated JPEG: trailing fill bytes")
        if marker == 0xD9:
            break
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG: segment header past end")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zzq = np.frombuffer(body[off + 1:off + 65], dtype=np.uint8)
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = zzq
                quant[tq] = nat.reshape(8, 8)
                off += 65
        elif marker == 0xC0:
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 3:
                raise ValueError("decode_jpeg_color handles 3-component "
                                 "streams (grayscale: decode_jpeg_gray)")
            if [body[7 + 3 * c] for c in range(3)] != [0x22, 0x11, 0x11]:
                raise ValueError("only 4:2:0 sampling (0x22/0x11/0x11) "
                                 "supported")
            comp_tq = {body[6 + 3 * c]: body[8 + 3 * c]
                       for c in range(3)}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1:off + 17])
                nv = sum(bits)
                vals = list(body[off + 17:off + 17 + nv])
                tab = _peek_table(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = tab
                off += 17 + nv
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:
            if body[0] != 3:
                raise ValueError("expected a 3-component interleaved scan")
            for c in range(3):
                cid = body[1 + 2 * c]
                tbl = body[2 + 2 * c]
                scan_ids.append((cid, tbl >> 4, tbl & 0x0F))
            scan_at = pos
            break
    if scan_at < 0 or width < 0:
        raise ValueError("truncated JPEG: missing SOF/SOS")
    if width % 16 or height % 16:
        raise ValueError("non-multiple-of-16 dimensions unsupported "
                         "(4:2:0 MCU scope)")
    mx, my = width // 16, height // 16
    bw = width // 8
    n_y = bw * (height // 8)
    n_c = mx * my
    zz_y = np.zeros((n_y, 64), dtype=np.int64)
    zz_cb = np.zeros((n_c, 64), dtype=np.int64)
    zz_cr = np.zeros((n_c, 64), dtype=np.int64)
    r = _BitReader(data, scan_at)

    def read_block(out: np.ndarray, idx: int, dct: np.ndarray,
                   act: np.ndarray, prev: int) -> int:
        size = r.huffman(dct)
        prev += _extend(r.read(size), size)
        out[idx, 0] = prev
        k = 1
        while k < 64:
            rs = r.huffman(act)
            if rs == 0x00:
                break
            if rs == 0xF0:
                k += 16
                continue
            k += rs >> 4
            if k > 63:
                raise ValueError("corrupt JPEG: coefficient overrun")
            out[idx, k] = _extend(r.read(rs & 0x0F), rs & 0x0F)
            k += 1
        return prev

    tabs = {cid: (dc_tables[d], ac_tables[a]) for cid, d, a in scan_ids}
    pdc = {cid: 0 for cid, _, _ in scan_ids}
    y_id, cb_id, cr_id = (scan_ids[0][0], scan_ids[1][0], scan_ids[2][0])
    for i in range(my):
        for j in range(mx):
            for (bi, bj) in ((2 * i, 2 * j), (2 * i, 2 * j + 1),
                             (2 * i + 1, 2 * j), (2 * i + 1, 2 * j + 1)):
                pdc[y_id] = read_block(zz_y, bi * bw + bj,
                                       *tabs[y_id], pdc[y_id])
            cidx = i * mx + j
            pdc[cb_id] = read_block(zz_cb, cidx, *tabs[cb_id], pdc[cb_id])
            pdc[cr_id] = read_block(zz_cr, cidx, *tabs[cr_id], pdc[cr_id])

    def idct_plane(zz: np.ndarray, tq: int, h: int, w_: int) -> np.ndarray:
        coef = np.zeros((zz.shape[0], 64), dtype=np.float64)
        coef[:, ZIGZAG] = zz
        coef = coef.reshape(-1, 8, 8) * quant[tq].astype(np.float64)
        blocks = _M.T @ coef @ _M
        plane = (blocks.reshape(h // 8, w_ // 8, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(h, w_))
        return np.clip(np.rint(plane + 128.0), 0, 255)

    yplane = idct_plane(zz_y, comp_tq[y_id], height, width)
    cbp = idct_plane(zz_cb, comp_tq[cb_id], height // 2, width // 2)
    crp = idct_plane(zz_cr, comp_tq[cr_id], height // 2, width // 2)
    # nearest-neighbor 2x upsample (inverts the 2x2 mean exactly on
    # the MCU-constant class)
    cbu = np.repeat(np.repeat(cbp, 2, axis=0), 2, axis=1)
    cru = np.repeat(np.repeat(crp, 2, axis=0), 2, axis=1)
    rgb = ycbcr_to_rgb(np.stack([yplane, cbu, cru], axis=-1))
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return width, height, out.tobytes()
