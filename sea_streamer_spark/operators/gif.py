"""Pure-Python GIF87a/89a codec (LZW) for the multimodal operators — the
animated-image format alongside PPM/PNG/JPEG/WAV.

Decode path: header → logical screen descriptor → global color table →
block walk (graphic-control extensions for transparency/disposal, image
descriptors with optional local color tables and interlacing) → variable-
width LZW decode (clear/end codes, 4096-entry dictionary) → palette map →
frame compositing onto the canvas (disposal 1 "leave" and 2 "restore
background" supported; transparent pixels keep the underlying canvas).
Anything malformed or out of subset returns ``None`` — the honest-stub
contract shared by every codec here.

Encode path (for self-contained round-trips): paletted frames in, standard
LZW with dictionary reset on overflow, optional animation (NETSCAPE loop
extension + per-frame graphic control). Deterministic for fixed input.

Scale note: like the other codecs, embarrassingly parallel per payload
inside Arrow batches; LZW is byte-at-a-time Python — the metadata/feature
path, not bulk pixel production.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def parse_gif_header(data: bytes):
    """(width, height, n_frames) from the logical screen descriptor plus an
    image-descriptor count, or None if not a GIF. Counts frames by walking
    block lengths only — no LZW work."""
    if len(data) < 13 or data[:6] not in GIF_MAGICS:
        return None
    w, h = struct.unpack("<HH", data[6:10])
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < n and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > n:
                return None
            ipacked = data[pos + 9]
            pos += 10
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW minimum code size
            while pos < n and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            n_frames += 1
        else:
            return None  # unknown block: malformed
    if w == 0 or h == 0 or n_frames == 0:
        return None
    return (int(w), int(h), n_frames)


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int):
    """Variable-width LZW (GIF flavor): returns the index stream or None."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                return bytes(out) if prev is not None or out else None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        if len(out) > max_pixels:
            return None  # over-long stream: malformed
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes):
    """Decode into ``(width, height, frames)`` where ``frames`` is a list of
    (h, w, 3) uint8 arrays (composited canvas states) — or None."""
    try:
        return _decode_gif_strict(data)
    except Exception:  # noqa: BLE001 — malformed payloads yield None
        return None


def _decode_gif_strict(data: bytes):
    if len(data) < 13 or data[:6] not in GIF_MAGICS:
        return None
    w, h = struct.unpack("<HH", data[6:10])
    packed, bg_idx = data[10], data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, 3 * size, pos).reshape(size, 3)
        pos += 3 * size
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            label = data[pos + 1]
            pos += 2
            blocks = []
            while pos < n and data[pos] != 0:
                blocks.append(data[pos + 1 : pos + 1 + data[pos]])
                pos += 1 + data[pos]
            pos += 1
            if label == 0xF9 and blocks:  # graphic control
                flags = blocks[0][0]
                disposal = (flags >> 2) & 0x07
                transparent = blocks[0][3] if flags & 0x01 else None
        elif b == 0x2C:
            left, top, iw, ih = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            ipacked = data[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                size = 2 << (ipacked & 0x07)
                ct = np.frombuffer(data, np.uint8, 3 * size, pos).reshape(size, 3)
                pos += 3 * size
            if ct is None:
                return None
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < n and data[pos] != 0:
                lzw += data[pos + 1 : pos + 1 + data[pos]]
                pos += 1 + data[pos]
            pos += 1
            idx = _lzw_decode(min_code, bytes(lzw), iw * ih)
            if idx is None or len(idx) < iw * ih:
                return None
            grid = np.frombuffer(idx[: iw * ih], np.uint8).reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: reorder rows (4 passes)
                de = np.zeros_like(grid)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for y in range(start, ih, step):
                        de[y] = grid[src]
                        src += 1
                grid = de
            if int(grid.max()) >= len(ct):
                return None
            # the pre-draw canvas is only needed for disposal 3 (and the
            # GCE precedes the descriptor, so disposal is already known)
            before = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + ih, left : left + iw]
            rgb = ct[grid]
            if transparent is not None:
                mask = grid != transparent
                region[mask] = rgb[mask]
            else:
                region[:, :] = rgb
            frames.append(canvas.copy())
            if disposal == 2:
                # restore background: bg_idx refers to the GLOBAL color
                # table per spec, not a frame's local table
                canvas[top : top + ih, left : left + iw] = (
                    gct[bg_idx] if gct is not None and bg_idx < len(gct) else 0
                )
            elif disposal == 3:  # restore previous
                canvas = before
            transparent = None
            disposal = 0
        else:
            return None
    if not frames:
        return None
    return (int(w), int(h), frames)


# ----------------------------------------------------------------- encoder


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    prev = b""
    for byte in indices:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], code_size)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        prev = bytes([byte])
    if prev:
        emit(table[prev], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray],
    palette: list[tuple[int, int, int]],
    delay_cs: int = 10,
) -> bytes:
    """Animated GIF89a from paletted frames (uint8 index arrays of one
    (h, w) shape) and a palette of ≤256 RGB triples. Deterministic."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    bits = max(2, (len(palette) - 1).bit_length())
    size_field = bits - 1
    table_len = 1 << bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | size_field, 0, 0])
    for i in range(table_len):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes([r, g, b])
    if len(frames) > 1:  # NETSCAPE loop extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for frame in frames:
        if frame.shape != (h, w):
            raise ValueError("all frames must share one shape")
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        min_code = max(2, bits)
        out += bytes([min_code])
        lzw = _lzw_encode(min_code, frame.astype(np.uint8).tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
