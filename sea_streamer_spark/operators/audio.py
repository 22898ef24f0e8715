"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal operators — the
audio analog of operators/png.py and operators/jpeg.py.

WAV's critical path is a RIFF chunk walk plus little-endian PCM samples:
``RIFF`` header → ``fmt `` (audio format, channels, sample rate, bit
depth) → ``data`` (interleaved samples). Supported subset: PCM
(format 1), 16-bit. Anything else — float WAV, ADPCM, truncated chunks —
returns ``None``, the honest-stub contract (a malformed payload must not
fail a 100 TB ``mapInPandas`` batch).

Feature extraction (duration, RMS, zero-crossings, peak) is integer/
fixed-point so driver oracles recompute it bit-exactly.
"""

from __future__ import annotations

import struct

import numpy as np


def parse_wav_header(data: bytes):
    """(n_channels, sample_rate, bits_per_sample, n_frames, data_offset)
    from the RIFF header, or None when not a PCM-16 WAV this codec can
    size up. Cheap — chunk walk only, no sample decode."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, n = 12, len(data)
    fmt = None
    while pos + 8 <= n:
        cid, clen = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = pos + 8
        if body + clen > n:
            return None  # truncated chunk
        if cid == b"fmt ":
            if clen < 16:
                return None
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[body : body + 16]
            )
            if audio_fmt != 1 or bits != 16 or channels == 0 or rate == 0:
                return None  # non-PCM / non-16-bit / zero-rate out of subset
            fmt = (channels, rate, bits)
        elif cid == b"data":
            if fmt is None:
                return None  # data before fmt: out of spec
            channels, rate, bits = fmt
            bytes_per_frame = channels * (bits // 8)
            if clen % bytes_per_frame:
                return None
            return (channels, rate, bits, clen // bytes_per_frame, body)
        pos = body + clen + (clen & 1)  # RIFF chunks are word-aligned
    return None


def decode_wav(data: bytes):
    """(sample_rate, channels, samples) with ``samples`` an int16 ndarray of
    shape (n_frames, channels) — or None outside the subset/malformed."""
    hdr = parse_wav_header(data)
    if hdr is None:
        return None
    channels, rate, _bits, n_frames, off = hdr
    raw = np.frombuffer(data, dtype="<i2", count=n_frames * channels, offset=off)
    return (rate, channels, raw.reshape(n_frames, channels))


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Minimal deterministic PCM-16 writer. ``samples``: (n_frames,) mono
    or (n_frames, channels) int16."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, channels = samples.shape
    payload = samples.tobytes()
    byte_rate = rate * channels * 2
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(payload)),
            b"WAVE",
            b"fmt ",
            struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate, channels * 2, 16),
            b"data",
            struct.pack("<I", len(payload)),
            payload,
        ]
    )


def wav_features(data: bytes):
    """Integer audio features of a PCM-16 WAV, or None outside the subset:
    (sample_rate, n_frames, duration_ms, peak, rms_floor, zero_crossings).

    All integers, so a SQL oracle reproduces them exactly: duration is
    floor(frames*1000/rate); peak = max |sample| over all channels;
    rms_floor = floor(sqrt(sum(s^2)/count)) (the inner sum is exact integer
    arithmetic, the final sqrt is correctly-rounded IEEE — engine-stable);
    zero_crossings counts strict sign flips (zero samples carry the
    previous sign) on channel 0.
    """
    dec = decode_wav(data)
    if dec is None:
        return None
    rate, _channels, samples = dec
    s = samples.astype(np.int64)
    n = s.shape[0]
    peak = int(np.abs(s).max()) if n else 0
    total = int((s * s).sum())
    rms_floor = int(np.sqrt(total / s.size)) if n else 0
    ch0 = s[:, 0]
    signs = np.where(ch0 > 0, 1, np.where(ch0 < 0, -1, 0))
    nz = signs[signs != 0]  # zero samples inherit the previous sign
    flips = int((nz[1:] != nz[:-1]).sum()) if nz.size else 0
    return (int(rate), int(n), n * 1000 // int(rate), peak, rms_floor, flips)
