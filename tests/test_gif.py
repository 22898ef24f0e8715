"""GIF87a/89a codec (operators/gif.py): LZW roundtrips, animation
compositing, transparency, interlacing, malformed-payload contract."""

from __future__ import annotations

import numpy as np
import pytest

from sea_streamer_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    parse_gif_header,
)

PALETTE4 = [(60 * c + 10, 60 * c + 20, 60 * c + 30) for c in range(4)]


def pal(p):
    return np.array(p, dtype=np.uint8)


class TestLzw:
    def test_roundtrip_small(self):
        data = bytes([0, 1, 2, 3, 0, 0, 1, 1, 2, 2, 3, 3] * 10)
        assert _lzw_decode(2, _lzw_encode(2, data), len(data)) == data

    def test_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=60, deadline=None)
        @given(st.binary(min_size=1, max_size=2000), st.sampled_from([2, 4, 8]))
        def roundtrip(raw, bits):
            idx = bytes(b % (1 << bits) for b in raw)
            assert _lzw_decode(bits, _lzw_encode(bits, idx), len(idx)) == idx

        roundtrip()

    def test_dictionary_reset_on_overflow(self):
        # long low-entropy stream forces codes past 4096 → clear + rebuild
        idx = bytes((i * 7 + i // 3) % 4 for i in range(60_000))
        assert _lzw_decode(2, _lzw_encode(2, idx), len(idx)) == idx


class TestGifContainer:
    def test_animated_roundtrip_exact(self):
        h, w = 11, 13
        y, x = np.mgrid[0:h, 0:w]
        frames = [((x + y + f) % 4).astype(np.uint8) for f in range(3)]
        data = encode_gif(frames, PALETTE4)
        assert parse_gif_header(data) == (w, h, 3)
        dw, dh, out = decode_gif(data)
        assert (dw, dh, len(out)) == (w, h, 3)
        for f in range(3):
            assert (out[f] == pal(PALETTE4)[frames[f]]).all()

    def test_256_colors_and_12bit_codes(self):
        rng = np.random.default_rng(5)
        pal256 = [(i, 255 - i, i // 2) for i in range(256)]
        noise = rng.integers(0, 256, (80, 120), dtype=np.uint8)
        _, _, out = decode_gif(encode_gif([noise], pal256))
        assert (out[0] == pal(pal256)[noise]).all()

    def test_transparency_keeps_underlying_canvas(self):
        """Patch frame 2's graphic control to transparent-index 0: its
        index-0 pixels must show frame 1's colors (GIF89a compositing)."""
        h = w = 8
        f1 = np.full((h, w), 3, dtype=np.uint8)
        f2 = np.zeros((h, w), dtype=np.uint8)
        f2[:4] = 1  # top half colored, bottom half index 0 (→ transparent)
        data = bytearray(encode_gif([f1, f2], PALETTE4))
        second_gce = data.index(b"\x21\xf9\x04", data.index(b"\x21\xf9\x04") + 1)
        data[second_gce + 3] = 0x05  # transparent flag + disposal "leave"
        data[second_gce + 6] = 0  # transparent index = 0
        _, _, out = decode_gif(bytes(data))
        assert (out[1][:4] == pal(PALETTE4)[1]).all()  # painted
        assert (out[1][4:] == pal(PALETTE4)[3]).all()  # shows frame 1

    def test_interlaced_frame(self):
        """Set the interlace flag and store rows in 4-pass order: decode
        must de-interlace back to raster order."""
        h, w = 16, 9
        y, _ = np.mgrid[0:h, 0:w]
        frame = (y % 4).astype(np.uint8)
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        permuted = frame[order]
        data = bytearray(encode_gif([permuted], PALETTE4))
        desc = data.index(b"\x2c")
        data[desc + 9] |= 0x40  # interlace flag in the image descriptor
        _, _, out = decode_gif(bytes(data))
        assert (out[0] == pal(PALETTE4)[frame]).all()

    def test_malformed_is_none(self):
        assert decode_gif(b"") is None
        assert decode_gif(b"GIF89a" + b"\x00" * 4) is None
        assert parse_gif_header(b"\x89PNG") is None
        good = encode_gif([np.zeros((8, 8), dtype=np.uint8)], PALETTE4)
        for cut in (8, 20, len(good) // 2):
            assert decode_gif(good[:cut]) is None

    def test_header_counts_frames_without_decoding(self):
        frames = [np.zeros((5, 7), dtype=np.uint8)] * 4
        assert parse_gif_header(encode_gif(frames, PALETTE4)) == (7, 5, 4)
