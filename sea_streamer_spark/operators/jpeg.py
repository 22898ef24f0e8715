"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT) for the
multimodal operators.

No PIL/libjpeg in this container, but baseline JPEG needs nothing beyond
byte arithmetic and an 8×8 DCT: marker walk → DQT/SOF0/DHT/SOS → Huffman
entropy decode (run/size symbols, DC prediction, byte de-stuffing, restart
markers) → dequantize → inverse zigzag → IDCT → upsample → YCbCr→RGB.
The encoder emits spec-standard streams: Annex K quantization tables (IJG
quality scaling) and Annex K Huffman tables, 4:4:4 (no subsampling) or
grayscale, interleaved single scan.

Supported decode subset: baseline sequential (SOF0), 8-bit, 1 or 3
components, any sampling whose factors divide the max (4:4:4, 4:2:0, 4:2:2
all fit the generic MCU walk), optional restart intervals. Progressive
(SOF2), arithmetic coding, 12-bit, and CMYK fall through to ``None`` — the
honest-stub contract: a malformed or out-of-subset payload must never fail
a 100 TB ``mapInPandas`` batch.

Scale note: codec work is embarrassingly parallel per payload inside Arrow
batches; the entropy loop is pure Python per 8×8 block — fine for the
metadata/feature path over thumbnails, swap in libjpeg-turbo for bulk
pixel production.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

#: zigzag scan: position k in the scan → raster index in the 8×8 block
ZIGZAG = []
for _s in range(15):
    _rs = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in (_rs if _s % 2 == 1 else reversed(list(_rs))):
        ZIGZAG.append(_r * 8 + (_s - _r))
ZIGZAG = np.array(ZIGZAG, dtype=np.int64)

#: Annex K (K.1/K.2) quantization tables, raster order
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.int64,
)

#: Annex K Huffman table specs: (bits[1..16], values)
DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

#: orthonormal 8×8 DCT-II matrix: F = D @ f @ D.T, f = D.T @ F @ D
_D = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    for _n in range(8):
        _c = (1 / np.sqrt(2)) if _k == 0 else 1.0
        _D[_k, _n] = 0.5 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _huff_codes(spec) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol → (length, code)."""
    bits, values = spec
    out: dict[int, tuple[int, int]] = {}
    code, idx = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[idx]] = (length, code)
            code += 1
            idx += 1
        code <<= 1
    return out


def _huff_decode_map(spec) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, the decoder's inverse of :func:`_huff_codes`."""
    return {lc: sym for sym, lc in _huff_codes(spec).items()}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (libjpeg jcparam.c rule —
    public, implemented from the published formula)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


# ----------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(w: _BitWriter, coeffs: np.ndarray, pred: int, dc_tab, ac_tab) -> int:
    """Huffman-encode one zigzagged, quantized 8×8 block; returns new DC pred."""
    dc = int(coeffs[0])
    size, bits = _magnitude(dc - pred)
    length, code = dc_tab[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(coeffs)[0])) if np.any(coeffs[1:]) else 0
    for k in range(1, 64):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            length, code = ac_tab[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        length, code = ac_tab[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        length, code = ac_tab[0x00]  # EOB
        w.write(code, length)
    return dc


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Plane (multiple-of-8 dims) → per-block zigzagged quantized coeffs,
    shape (blocks_y, blocks_x, 64)."""
    h, w = plane.shape
    shifted = plane.astype(np.float64) - 128.0
    blocks = shifted.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    F = np.einsum("kn,bcnm,lm->bckl", _D, blocks, _D)
    q = np.round(F / qt.reshape(8, 8)).astype(np.int64)
    return q.reshape(h // 8, w // 8, 64)[:, :, ZIGZAG]


def _pad_to8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JPEG: grayscale for (h, w) / (h, w, 1) input,
    YCbCr for (h, w, 3) RGB input — ``subsampling="444"`` (one block per
    component per MCU) or ``"420"`` (2×2 luma blocks + box-averaged chroma,
    the dominant real-world layout). Deterministic for fixed input (pure
    integer/float64 arithmetic, fixed tables)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 3 and pixels.shape[2] == 1:
        pixels = pixels[:, :, 0]
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444|420, got {subsampling!r}")
    sub420 = (not gray) and subsampling == "420"
    qt_l, qt_c = _quality_tables(quality)

    if gray:
        samplings = [(1, 1)]
        planes = [_pad_to8(pixels)]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub420:
            samplings = [(2, 2), (1, 1), (1, 1)]
            # pad luma to the 16-px MCU grid; box-average chroma 2x2
            ypad = np.pad(y, ((0, (-h) % 16), (0, (-w) % 16)), mode="edge")
            cbcr = []
            for p in (cb, cr):
                p2 = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                d = (p2[0::2, 0::2] + p2[1::2, 0::2] + p2[0::2, 1::2] + p2[1::2, 1::2]) / 4.0
                cbcr.append(np.pad(d, ((0, (-d.shape[0]) % 8), (0, (-d.shape[1]) % 8)), mode="edge"))
            raw_planes = [ypad] + cbcr
        else:
            samplings = [(1, 1), (1, 1), (1, 1)]
            raw_planes = [_pad_to8(p) for p in (y, cb, cr)]
        planes = [
            np.clip(np.round(p), 0, 255).astype(np.uint8) for p in raw_planes
        ]

    coeffs = [
        _fdct_quant(p, qt_l if i == 0 else qt_c) for i, p in enumerate(planes)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (table 0 = luma; table 1 = chroma when color)
    for tid, qt in ([(0, qt_l)] if gray else [(0, qt_l), (1, qt_c)]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(qt[z]) for z in ZIGZAG
        )
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samplings[ci]
        out += struct.pack("BBB", ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1)
    # DHT
    specs = [(0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC)]
    if not gray:
        specs += [(0x01, DC_CHROMA_SPEC), (0x11, AC_CHROMA_SPEC)]
    for tc_th, (bits, values) in specs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    # DRI (optional)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3f\x00"

    dc_l, ac_l = _huff_codes(DC_LUMA_SPEC), _huff_codes(AC_LUMA_SPEC)
    dc_c, ac_c = _huff_codes(DC_CHROMA_SPEC), _huff_codes(AC_CHROMA_SPEC)
    writer = _BitWriter()
    preds = [0] * ncomp
    vmax = max(v for _, v in samplings)
    hmax = max(hh for hh, _ in samplings)
    mcus_y = planes[0].shape[0] // (8 * vmax)
    mcus_x = planes[0].shape[1] // (8 * hmax)
    for m in range(mcus_y * mcus_x):
        if restart_interval and m and m % restart_interval == 0:
            out += writer.flush()  # byte-align (1-padded), then RSTn
            out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            writer = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci in range(ncomp):
            hs, vs = samplings[ci]
            dc_tab, ac_tab = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            for by in range(vs):
                for bx in range(hs):
                    preds[ci] = _encode_block(
                        writer,
                        coeffs[ci][my * vs + by, mx * hs + bx],
                        preds[ci],
                        dc_tab,
                        ac_tab,
                    )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------- decoder


def parse_jpeg_header(data: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_components) from the SOF0/SOF1 marker, or None if
    not a baseline JPEG this codec can size up. Cheap marker walk — no
    entropy decode — so ``decode_media`` can classify without decoding."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xFF:  # spec-legal fill byte before a marker
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            return None
        (seg_len,) = struct.unpack(">H", data[i + 2 : i + 4])
        if marker in (0xC0, 0xC1):  # baseline / extended sequential
            if i + 2 + seg_len > n or seg_len < 8:
                return None
            prec, h, w, nc = struct.unpack(">BHHB", data[i + 4 : i + 10])
            if prec != 8 or h == 0 or w == 0:
                return None
            return (w, h, nc)
        if marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical: out of subset
        i += 2 + seg_len
    return None


class _BitReader:
    def __init__(self, segment: bytes) -> None:
        self.data = segment
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise EOFError
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _read_huff_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _decode_block(r: _BitReader, dc_tab, ac_tab, pred: int, qt: np.ndarray):
    coeffs = np.zeros(64, dtype=np.int64)
    size = _read_huff_symbol(r, dc_tab)
    diff = _extend(r.read_bits(size), size) if size else 0
    dc = pred + diff
    coeffs[0] = dc
    k = 1
    while k < 64:
        sym = _read_huff_symbol(r, ac_tab)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError("bad AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC run overflow")
        coeffs[k] = _extend(r.read_bits(size), size)
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[ZIGZAG] = coeffs * qt.astype(np.float64)[ZIGZAG]
    pix = _D.T @ block.reshape(8, 8) @ _D + 128.0
    return pix, dc


def _split_scan(data: bytes, start: int):
    """De-stuff the entropy-coded data starting at ``start``; returns
    (segments split at restart markers, index of the terminating marker)."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = start, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(data: bytes):
    """Decode a baseline JPEG into ``(width, height, channels, pixels)``
    with ``pixels`` a ``numpy.uint8`` array of shape (h, w, channels) —
    or ``None`` for anything outside the supported subset or malformed."""
    try:
        return _decode_jpeg_strict(data)
    except Exception:  # noqa: BLE001 — malformed payloads yield None, never raise
        return None


def _decode_jpeg_strict(data: bytes):
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    restart_interval = 0
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        (seg_len,) = struct.unpack(">H", data[i + 2 : i + 4])
        seg = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables out of subset
                zz = np.frombuffer(seg, dtype=np.uint8, count=64, offset=j + 1)
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = zz.astype(np.int64)
                qts[tq] = table
                j += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                values = list(seg[j + 17 : j + 17 + nv])
                tab = _huff_decode_map((bits, values))
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan_tabs = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tabs[cid] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                data, i + 2 + seg_len, frame, scan_tabs, qts, dc_tabs, ac_tabs,
                restart_interval,
            )
        i += 2 + seg_len
    return None


def _decode_scan(data, start, frame, scan_tabs, qts, dc_tabs, ac_tabs, restart):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax == 0 or vmax == 0 or any(
        hmax % c[1] or vmax % c[2] for c in comps
    ):
        return None
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    planes = []
    for cid, hs, vs, tq in comps:
        planes.append(np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64))

    segments, _end = _split_scan(data, start)
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = {cid: 0 for cid, _, _, _ in comps}
    for m in range(mcus_y * mcus_x):
        if restart and m and m % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                return None
            reader = _BitReader(segments[seg_idx])
            preds = {cid: 0 for cid, _, _, _ in comps}
        my, mx = divmod(m, mcus_x)
        for pi, (cid, hs, vs, tq) in enumerate(comps):
            dt, at = scan_tabs[cid]
            for by in range(vs):
                for bx in range(hs):
                    pix, preds[cid] = _decode_block(
                        reader, dc_tabs[dt], ac_tabs[at], preds[cid], qts[tq]
                    )
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[pi][y0 : y0 + 8, x0 : x0 + 8] = pix

    full = []
    for pi, (cid, hs, vs, tq) in enumerate(comps):
        p = np.repeat(np.repeat(planes[pi], vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return (w, h, 1, out[:, :, None])
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return (w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8))


def split_mjpeg(data: bytes) -> list[bytes]:
    """Split a raw MJPEG stream (concatenated baseline JPEGs — the common
    wire format of motion-JPEG cameras/muxers) into per-frame byte ranges.

    This is a marker-aware walk, NOT a naive ``find(FF D9)``: a bare
    ``FF D9`` can legitimately occur *inside marker segment payloads*
    (e.g. an EXIF APP1 whose embedded thumbnail is itself a JPEG ending in
    EOI, or as a byte pair in DQT/DHT tables), so segments are skipped by
    their declared lengths and only *entropy-coded data* is scanned — where
    every 0xFF is stuffed (``FF 00``) or RST0-7, making the next real
    marker unambiguous. Frames that never close (truncated tail) or are
    structurally broken are dropped — the honest contract for a torn
    stream."""
    frames: list[bytes] = []
    i, n = 0, len(data)
    while True:
        start = data.find(b"\xff\xd8", i)
        if start < 0:
            break
        pos = start + 2
        end = None
        while pos + 1 < n:
            if data[pos] != 0xFF:
                break  # structure violated: abandon this frame
            while pos + 1 < n and data[pos + 1] == 0xFF:
                pos += 1  # spec-legal FF fill bytes before a marker
            if pos + 1 >= n:
                break
            marker = data[pos + 1]
            if marker == 0xD9:  # EOI before any scan (header-only frame)
                end = pos + 2
                break
            if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if pos + 4 > n:
                break
            (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            pos += 2 + seg_len
            if marker != 0xDA:
                continue
            # entropy-coded data: skip stuffed FFs and RSTn until a marker
            while pos + 1 < n:
                if data[pos] != 0xFF:
                    pos += 1
                    continue
                nxt = data[pos + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    pos += 2
                    continue
                break
            if pos + 1 < n and data[pos] == 0xFF and data[pos + 1] == 0xD9:
                end = pos + 2
            break  # single-scan baseline: scan ends the frame either way
        if end is None:
            # torn/garbled frame: resynchronize at the next SOI
            nxt_soi = data.find(b"\xff\xd8", start + 2)
            if nxt_soi < 0:
                break
            i = nxt_soi
            continue
        frames.append(data[start:end])
        i = end
    return frames
