"""Pure-stdlib PNG codec — the real decode path behind the multimodal
surface.

The container ships no PIL/ffmpeg, so the multimodal operators'
*corpus* path fabricates payloads (``multimodal.with_payload``). But
"decode" itself needs no native library for PNG: the format is
zlib-compressed filtered scanlines (stdlib ``zlib`` + ``struct``).
This module implements a real encoder/decoder for 8-bit greyscale /
RGB / RGBA non-interlaced PNGs — enough to decode actual screenshots
and dataset thumbnails — and ``multimodal.decode_image_stub`` now
routes PNG payloads here, raising only for formats that genuinely
need codecs this container lacks (JPEG/video/audio).

Reference scope note: the reference engine (Freebirdgo/MapReduce_Rust,
src/mr/worker.rs) has no media surface at all; this exists for the
100 TB-training-pipeline extension mandate. Decoding runs inside
Arrow-batched ``mapInPandas`` kernels, so rows never leave the
executor and the bytes column is never shuffled.
"""

from __future__ import annotations

import struct
import zlib

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color_type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _PNG_MAGIC


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(pixels: bytes, width: int, height: int,
               channels: int = 3) -> bytes:
    """Encode raw 8-bit interleaved pixels (len = w*h*channels) as a
    valid PNG (filter 0 rows, one IDAT). channels ∈ {1, 3, 4}."""
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    if len(pixels) != width * height * channels:
        raise ValueError(f"pixel buffer {len(pixels)} != "
                         f"{width}x{height}x{channels}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(b"\x00" + pixels[y * stride:(y + 1) * stride]
                   for y in range(height))
    return (_PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode an 8-bit greyscale/RGB/RGBA non-interlaced PNG.
    Returns (width, height, channels, raw interleaved pixel bytes).
    Raises ValueError on non-PNG bytes or unsupported subformats."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    width, height, depth, color_type, comp, filt, interlace = meta
    if depth != 8 or color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG: depth={depth} color={color_type}")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG: non-default comp/filter/interlace")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("corrupt PNG: scanline size mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 1:    # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"corrupt PNG: filter type {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = bytes(line)
    return width, height, ch, bytes(out)


def nearest_resize(pixels: bytes, width: int, height: int, channels: int,
                   new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resize of a raw interleaved pixel buffer —
    the decode-side companion of ``multimodal.multimodal_resize``'s
    metadata arithmetic (floor sampling grid, matching its DIV-based
    target-dim convention)."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * height // new_h
        row = sy * width * channels
        orow = y * new_w * channels
        for x in range(new_w):
            sx = x * width // new_w
            out[orow + x * channels:orow + (x + 1) * channels] = \
                pixels[row + sx * channels:row + (sx + 1) * channels]
    return bytes(out)
