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


class TestEntropyCoderProperty:
    """Coefficient-level Huffman roundtrip: random legal quantized blocks
    through _encode_block → bit stream → _decode_block must reproduce the
    coefficients and the DC predictor chain exactly. This pins the entropy
    layer (categories, run-lengths, ZRL, EOB, byte stuffing, DC diffs)
    independently of the DCT math."""

    def test_random_blocks_roundtrip(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from sea_streamer_spark.operators.jpeg import (
            AC_LUMA_SPEC,
            DC_LUMA_SPEC,
            _BitReader,
            _BitWriter,
            _decode_block,
            _encode_block,
            _huff_codes,
            _huff_decode_map,
            _split_scan,
            ZIGZAG,
        )

        dc_enc, ac_enc = _huff_codes(DC_LUMA_SPEC), _huff_codes(AC_LUMA_SPEC)
        dc_dec, ac_dec = _huff_decode_map(DC_LUMA_SPEC), _huff_decode_map(AC_LUMA_SPEC)
        unit_qt = np.ones(64, dtype=np.int64)

        # sparse blocks: a few nonzero coefficients at random zigzag slots
        # (DC magnitude ≤ 2047 = category 11, the table's ceiling for
        # baseline; AC ≤ 1023 = category 10)
        block_strategy = st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=63),
                st.integers(min_value=-1023, max_value=1023),
            ),
            min_size=0,
            max_size=20,
        )

        @settings(max_examples=200, deadline=None)
        @given(st.lists(block_strategy, min_size=1, max_size=4))
        def roundtrip(blocks_spec):
            blocks = []
            for spec in blocks_spec:
                b = np.zeros(64, dtype=np.int64)
                for k, v in spec:
                    b[k] = v
                blocks.append(b)
            w = _BitWriter()
            pred = 0
            for b in blocks:
                pred = _encode_block(w, b, pred, dc_enc, ac_enc)
            # the writer stuffs 0x00 after 0xFF (F.1.2.3); the scan-layer
            # de-stuffing (_split_scan) is part of the path under test
            r = _BitReader(_split_scan(w.flush(), 0)[0][0])
            pred2 = 0
            for b in blocks:
                pix, pred2 = _decode_block(r, dc_dec, ac_dec, pred2, unit_qt)
                # invert the IDCT+shift to recover the raw coefficients
                import numpy as _np
                from sea_streamer_spark.operators.jpeg import _D

                F = _D @ (pix - 128.0) @ _D.T
                got = _np.round(F).astype(_np.int64).reshape(64)
                want = _np.zeros(64, dtype=_np.int64)
                want[ZIGZAG] = b
                assert (got == want).all()
            assert pred2 == pred

        roundtrip()
