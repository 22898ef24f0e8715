"""WAV (RIFF/PCM-16) codec + integer feature extraction + MJPEG demux."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sea_streamer_spark.operators.audio import (
    decode_wav,
    encode_wav,
    parse_wav_header,
    wav_features,
)


class TestWavCodec:
    def test_roundtrip_mono(self):
        s = (np.arange(1000, dtype=np.int64) * 77 % 65536 - 32768).astype("<i2")
        data = encode_wav(s, rate=16_000)
        assert parse_wav_header(data) == (1, 16_000, 16, 1000, 44)
        rate, ch, out = decode_wav(data)
        assert (rate, ch) == (16_000, 1)
        assert (out[:, 0] == s).all()

    def test_roundtrip_stereo(self):
        s = np.stack([np.arange(500), -np.arange(500)], axis=1).astype("<i2")
        rate, ch, out = decode_wav(encode_wav(s, rate=44_100))
        assert (rate, ch) == (44_100, 2)
        assert (out == s).all()

    def test_features_known_signal(self):
        # alternating +1000/-1000: 999 flips, peak 1000, rms 1000
        s = np.tile([1000, -1000], 500).astype("<i2")
        rate, n, dur, peak, rms, flips = wav_features(encode_wav(s, rate=8_000))
        assert (rate, n, dur) == (8_000, 1000, 125)
        assert (peak, rms, flips) == (1000, 1000, 999)

    def test_zero_samples_inherit_sign(self):
        # +5, 0, 0, -5, 0, +5 → flips at (+ → -) and (- → +) = 2
        s = np.array([5, 0, 0, -5, 0, 5], dtype="<i2")
        *_rest, flips = wav_features(encode_wav(s))
        assert flips == 2

    def test_malformed_is_none(self):
        assert parse_wav_header(b"") is None
        assert parse_wav_header(b"RIFFxxxxWAVE") is None
        assert decode_wav(b"not a wav at all" * 10) is None
        good = encode_wav(np.zeros(100, dtype="<i2"))
        assert decode_wav(good[:50]) is None  # truncated data chunk

    def test_non_pcm_rejected(self):
        data = bytearray(encode_wav(np.zeros(10, dtype="<i2")))
        # audio format field lives at offset 20 (fmt body start)
        struct.pack_into("<H", data, 20, 3)  # IEEE float
        assert parse_wav_header(bytes(data)) is None

    def test_odd_chunk_padding_walk(self):
        """A word-aligned odd-length chunk before fmt/data must be skipped
        correctly (RIFF pads odd chunks with one byte)."""
        body = encode_wav(np.ones(10, dtype="<i2"))
        extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
        data = body[:12] + extra + body[12:]
        data = data[:4] + struct.pack("<I", len(data) - 8) + data[8:]
        assert parse_wav_header(data) == (1, 16_000, 16, 10, 44 + len(extra))


class TestMjpegSplit:
    def test_split_and_decode(self):
        from sea_streamer_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
            split_mjpeg,
        )

        frames = [
            np.full((16, 24, 3), 30 * i + 15, dtype=np.uint8) for i in range(4)
        ]
        stream = b"".join(encode_jpeg(f, 85) for f in frames)
        parts = split_mjpeg(stream)
        assert len(parts) == 4
        for i, p in enumerate(parts):
            dec = decode_jpeg(p)
            assert dec[:3] == (24, 16, 3)
            assert abs(int(dec[3][0, 0, 0]) - (30 * i + 15)) <= 2

    def test_torn_tail_dropped(self):
        from sea_streamer_spark.operators.jpeg import encode_jpeg, split_mjpeg

        img = np.full((8, 8, 3), 99, dtype=np.uint8)
        stream = encode_jpeg(img) + encode_jpeg(img)[: -3]
        assert len(split_mjpeg(stream)) == 1
        assert split_mjpeg(b"junk no markers") == []


class TestCodecProperties:
    def test_wav_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=60, deadline=None)
        @given(
            st.lists(st.integers(min_value=-32768, max_value=32767),
                     min_size=1, max_size=400),
            st.sampled_from([8_000, 16_000, 44_100]),
            st.integers(min_value=1, max_value=3),
        )
        def roundtrip(vals, rate, channels):
            frames = len(vals) // channels
            if frames == 0:
                return
            s = np.array(vals[: frames * channels], dtype="<i2").reshape(
                frames, channels
            )
            r, ch, out = decode_wav(encode_wav(s, rate=rate))
            assert (r, ch) == (rate, channels)
            assert (out == s).all()

        roundtrip()

    def test_png_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from sea_streamer_spark.operators.png import decode_png, encode_png

        @settings(max_examples=40, deadline=None)
        @given(
            st.integers(min_value=1, max_value=24),
            st.integers(min_value=1, max_value=24),
            st.sampled_from([1, 2, 3, 4]),
            st.randoms(use_true_random=False),
        )
        def roundtrip(w, h, channels, rnd):
            pixels = bytes(rnd.randrange(256) for _ in range(w * h * channels))
            dec = decode_png(encode_png(w, h, pixels, channels=channels))
            assert dec is not None
            dw, dh, dch, img = dec
            assert (dw, dh, dch) == (w, h, channels)
            assert img.tobytes() == pixels  # PNG is lossless

        roundtrip()
