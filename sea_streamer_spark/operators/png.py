"""Pure-stdlib PNG codec (zlib + numpy) for the multimodal operators.

This container has no PIL/libav, but PNG's critical path needs nothing
beyond ``zlib`` (stdlib) and byte arithmetic: signature → chunk walk →
IHDR → inflate concatenated IDAT → per-scanline unfilter. Supporting the
common subset — 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha)
and 6 (RGBA), non-interlaced — turns ``multimodal_features``/``decode`` on
real image containers from a declared stub into a real decode, while
anything outside the subset (16-bit, palette, Adam7) still falls through to
the honest stub branch (return ``None``, never raise: a malformed payload
must not fail a 100 TB ``mapInPandas`` batch).

Scale note: decode is embarrassingly parallel per payload inside Arrow
batches; the codec allocates O(image) only.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per pixel for the supported color types
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def parse_png_header(data: bytes) -> tuple[int, int, int, int] | None:
    """(width, height, bit_depth, color_type) from the IHDR chunk, or None
    if ``data`` is not a PNG this codec can size up. Cheap — reads 33 bytes,
    no inflate — so ``decode_media`` can classify without decompressing."""
    if len(data) < 33 or data[:8] != PNG_SIG:
        return None
    length, ctype = struct.unpack(">I4s", data[8:16])
    if ctype != b"IHDR" or length != 13:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data[16:29])
    if w <= 0 or h <= 0 or comp != 0 or filt != 0:
        return None
    return (w, h, depth, color)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes):
    """Decode a PNG into ``(width, height, channels, pixels)`` where
    ``pixels`` is a ``numpy.uint8`` array of shape (h, w, channels) — or
    ``None`` for anything outside the supported subset or malformed
    (truncated chunks, bad inflate, wrong scanline volume).

    Unfiltering: Up/None rows vectorize; Sub/Average/Paeth recurse on the
    previous pixel so they run per-byte within the row — fine for the
    metadata/feature path (images are resized small); swap in PIL for bulk
    pixel work in production.
    """
    import numpy as np

    hdr = parse_png_header(data)
    if hdr is None:
        return None
    w, h, depth, color = hdr
    if depth != 8 or color not in _CHANNELS:
        return None
    if data[28] != 0:  # interlace (Adam7) unsupported
        return None
    ch = _CHANNELS[color]

    # chunk walk: concatenate IDAT payloads
    idat = bytearray()
    i = 8
    n = len(data)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        if i + 12 + length > n:
            return None  # truncated chunk
        if ctype == b"IDAT":
            idat += data[i + 8 : i + 8 + length]
        i += 12 + length
        if ctype == b"IEND":
            break
    if not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) != h * (1 + stride):
        return None

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 1:  # Sub
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            return None
        out[y] = row
        prev = out[y]
    return (w, h, ch, out.reshape(h, w, ch))


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal deterministic PNG writer: 8-bit, filter 0 on every scanline,
    one IDAT, zlib level 6. ``pixels`` is ``height*width*channels`` raw
    bytes. Deterministic for fixed input (zlib is), so golden oracles can
    pin derived metadata."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )
