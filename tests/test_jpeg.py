"""Baseline JPEG codec (operators/jpeg.py): spec structure, roundtrip
bounds, restart markers, subsampling, malformed-payload contract."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from sea_streamer_spark.operators.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    parse_jpeg_header,
)


def gradient_rgb(h: int, w: int, base: int = 100) -> np.ndarray:
    xs = np.linspace(0.0, 255.0, w)
    ys = np.linspace(0.0, 255.0, h)
    return np.stack(
        [np.tile(xs, (h, 1)), np.tile(ys[:, None], (1, w)), np.full((h, w), float(base))],
        axis=2,
    ).astype(np.uint8)


def mae(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.abs(a.astype(np.float64) - b.astype(np.float64)).mean())


class TestStructure:
    def test_zigzag_is_the_spec_table(self):
        assert ZIGZAG[:16].tolist() == [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5
        ]
        assert sorted(ZIGZAG.tolist()) == list(range(64))
        assert ZIGZAG[-4:].tolist() == [47, 55, 62, 63]

    def test_markers_and_header(self):
        img = gradient_rgb(24, 40)
        data = encode_jpeg(img, quality=80)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        assert parse_jpeg_header(data) == (40, 24, 3)
        g = encode_jpeg(img[:, :, 0], quality=80)
        assert parse_jpeg_header(g) == (40, 24, 1)

    def test_determinism(self):
        img = gradient_rgb(17, 31, base=42)
        assert encode_jpeg(img, 85, "420") == encode_jpeg(img, 85, "420")


class TestRoundtrip:
    @pytest.mark.parametrize("dims", [(8, 8), (16, 24), (17, 23), (29, 37)])
    def test_rgb_444_bound(self, dims):
        h, w = dims
        img = gradient_rgb(h, w)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert dec is not None and dec[:3] == (w, h, 3)
        assert mae(dec[3], img) < 2.0

    @pytest.mark.parametrize("dims", [(16, 16), (29, 37), (15, 21)])
    def test_rgb_420_bound(self, dims):
        h, w = dims
        img = gradient_rgb(h, w, base=200)
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
        assert dec is not None and dec[:3] == (w, h, 3)
        # steep 255-range gradients over few pixels are the chroma-subsample
        # worst case; real imagery sits far below this bound
        assert mae(dec[3], img) < 6.0

    def test_grayscale(self):
        g = gradient_rgb(21, 33)[:, :, 0]
        dec = decode_jpeg(encode_jpeg(g, quality=90))
        assert dec is not None and dec[:3] == (33, 21, 1)
        assert mae(dec[3][:, :, 0], g) < 2.0

    def test_uniform_color_is_exact(self):
        u = np.full((16, 24, 3), 77, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(u, quality=75))
        assert int(np.abs(dec[3].astype(int) - 77).max()) == 0

    def test_quality_monotone(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        errs = [
            mae(decode_jpeg(encode_jpeg(img, quality=q))[3], img)
            for q in (30, 60, 95)
        ]
        assert errs[0] > errs[1] > errs[2]

    @pytest.mark.parametrize("sub", ["444", "420"])
    def test_restart_markers_decode_identically(self, sub):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg(img, 92, sub))
        restarted = decode_jpeg(encode_jpeg(img, 92, sub, restart_interval=3))
        assert (plain[3] == restarted[3]).all()

    def test_golden_pinned(self):
        """Self-golden: fixed input → pinned encode digest + decode digest,
        so any codec change that alters the byte stream or pixels is loud."""
        img = gradient_rgb(16, 24, base=50)
        data = encode_jpeg(img, quality=80, subsampling="420", restart_interval=2)
        enc_md5 = hashlib.md5(data).hexdigest()
        dec = decode_jpeg(data)
        dec_md5 = hashlib.md5(dec[3].tobytes()).hexdigest()
        golden = ("072c2655d2fc48cc98319006fce816b1", "a64d5f6737c2cab679b47281391d7c09")
        if (enc_md5, dec_md5) != golden:
            pytest.fail(
                f"golden changed: ({enc_md5!r}, {dec_md5!r}) — if intentional, "
                "update the pinned pair"
            )


class TestMalformed:
    def test_none_on_garbage(self):
        assert decode_jpeg(b"") is None
        assert decode_jpeg(b"\xff\xd8hello world") is None
        assert parse_jpeg_header(b"\x89PNG\r\n\x1a\n") is None

    def test_none_on_truncation(self):
        data = encode_jpeg(gradient_rgb(16, 16), quality=80)
        for cut in (4, 20, len(data) // 2, len(data) - 3):
            assert decode_jpeg(data[:cut]) is None or cut >= len(data) - 3

    def test_none_on_progressive_sof(self):
        data = bytearray(encode_jpeg(gradient_rgb(16, 16), quality=80))
        i = bytes(data).find(b"\xff\xc0")
        data[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
        assert decode_jpeg(bytes(data)) is None
        assert parse_jpeg_header(bytes(data)) is None
