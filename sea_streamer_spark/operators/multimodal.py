"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct, exactly like the reference's opaque payloads
(types/src/message.rs:20-31). Decode/feature-extraction runs as Arrow-batched
``mapInPandas`` — the real Spark plumbing (schema contract, batch shape,
partition parallelism) is implemented and tested here; the *codec* itself is
stubbed deterministically because media libraries are not available in this
container (swap ``_decode_batch``'s body for PIL/ffmpeg in production).

Scale notes: mapInPandas streams Arrow batches (no row-at-a-time pickling);
decode is embarrassingly parallel, so throughput scales with partitions —
which is why every Python stage enters through :func:`_fan`: a decode's
parallelism must not be pinned to the scan's split count (a small parquet
arrives as ONE task, serializing the whole Python chain), and at production
scale the guard no-ops because the scan already has more splits than cores.
``repartition`` explicitly before decoding if upstream partitioning is
skewed by payload size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _fan(df: DataFrame) -> DataFrame:
    """Entry gate for every mapInPandas stage: decouple the Python chain's
    parallelism from the scan's split count (scale.fan_out — an explicit
    partition count, so AQE's bytes-based coalescing cannot fold the small
    pre-decode relation back to one task). Chained stages pay it once: after
    the first fan-out the partition count already meets the target and the
    guard no-ops."""
    from .scale import fan_out

    return fan_out(df, key="doc_id")


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_len", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a multimodal row: binary payload + metadata struct."""
    return df.select(
        "doc_id",
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.length(text_col).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("content_type"),
        ).alias("meta"),
    )


def parse_ppm_header(data: bytes) -> tuple[int, int, int, int] | None:
    """Parse a binary PPM (P6) header: returns (width, height, maxval,
    pixel_data_offset) or None if ``data`` is not P6. Handles arbitrary
    whitespace and ``#`` comments per the netpbm spec — pure byte parsing,
    no image library."""
    if data[:2] != b"P6":
        return None
    # netpbm requires a whitespace (or comment) separator right after the
    # magic — without this check b"P6123 45 255\n..." would parse width=123
    # and a non-PPM binary could be misclassified.
    if not (data[2:3].isspace() or data[2:3] == b"#"):
        return None
    fields: list[int] = []
    i = 2
    n = len(data)
    while len(fields) < 3 and i < n:
        c = data[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < n and data[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and data[j : j + 1].isdigit():
                j += 1
            fields.append(int(data[i:j]))
            i = j
        else:
            return None
    if len(fields) < 3 or i >= n or not data[i : i + 1].isspace():
        return None
    w, h, maxval = fields
    off = i + 1  # exactly one whitespace after maxval
    # Reject malformed/truncated containers here so every consumer
    # (decode/resize) falls through to its non-PPM branch instead of
    # crashing mid-batch: zero/negative dims, wide-pixel maxval (>255 means
    # 2 bytes/sample — unsupported), or fewer pixel bytes than the header
    # promises (np.frombuffer(count=w*h*3) would raise inside mapInPandas
    # and fail the whole job).
    if w <= 0 or h <= 0 or not (0 < maxval <= 255) or len(data) < off + w * h * 3:
        return None
    return (w, h, maxval, off)


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode of a multimodal DataFrame (doc_id, payload, meta).

    The batch function is a local closure so cloudpickle ships it *by value* —
    executors don't need this package importable (the engine also ships a
    package zip via ``session.prepare``, but UDF hot paths shouldn't depend
    on it).

    REAL codecs for binary PPM (``P6`` magic — netpbm spec, parseable with
    pure bytes), PNG (signature + IHDR + zlib-inflated IDAT — see
    operators/png.py; 8-bit gray/RGB/RGBA, non-interlaced), and baseline
    JPEG (marker walk + SOF0 — see operators/jpeg.py; full Huffman/DCT
    decode available via :func:`jpeg_roundtrip`): actual width/height from
    the container. Every other payload falls to the deterministic STUB path
    (synthetic dimensions from payload length) — video needs libav, which
    this container lacks; swap the stub branch for it in production. The
    Spark-side contract (Arrow batches, schema, partition parallelism) is
    identical for all branches.
    """

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        from .audio import parse_wav_header
        from .gif import parse_gif_header
        from .jpeg import parse_jpeg_header
        from .png import parse_png_header

        def one(doc_id, payload):
            data = bytes(payload)
            hdr = parse_ppm_header(data)
            if hdr is not None:
                w, h, _maxval, _off = hdr
                return (doc_id, len(data), "image/x-portable-pixmap", w, h)
            png = parse_png_header(data)
            if png is not None:
                w, h, _depth, _color = png
                return (doc_id, len(data), "image/png", w, h)
            jpg = parse_jpeg_header(data)
            if jpg is not None:
                w, h, _nc = jpg
                return (doc_id, len(data), "image/jpeg", w, h)
            wav = parse_wav_header(data)
            if wav is not None:  # audio: width=frames, height=channels
                channels, _rate, _bits, n_frames, _off = wav
                return (doc_id, len(data), "audio/wav", n_frames, channels)
            gif = parse_gif_header(data)
            if gif is not None:
                w, h, _nf = gif
                return (doc_id, len(data), "image/gif", w, h)
            n = len(data)
            return (doc_id, n, "image/stub", 16 + n % 64, 16 + (n * 7) % 64)

        for pdf in batches:
            rows = [one(d, p) for d, p in zip(pdf["doc_id"], pdf["payload"])]
            yield _pd.DataFrame(
                rows, columns=["doc_id", "payload_len", "media_type", "width", "height"]
            )

    return _fan(df.select("doc_id", "payload")).mapInPandas(decode_batch, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_ppm(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for binary PPM payloads: decode the P6
    header, reshape the pixel buffer with numpy, index-sample to the target
    grid, re-emit valid P6 bytes. Non-PPM payloads pass through unchanged
    (width/height null) so mixed-media batches don't fail mid-pipeline.
    Vectorized per image inside Arrow batches; embarrassingly parallel."""

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def one(doc_id, payload):
            data = bytes(payload)
            hdr = parse_ppm_header(data)
            if hdr is None:
                return (doc_id, data, None, None)
            w, h, maxval, off = hdr
            px = _np.frombuffer(data, dtype=_np.uint8, count=w * h * 3, offset=off)
            img = px.reshape(h, w, 3)
            ys = (_np.arange(height) * h) // height
            xs = (_np.arange(width) * w) // width
            out = img[ys][:, xs]
            header = f"P6\n{width} {height}\n{maxval}\n".encode()
            return (doc_id, header + out.tobytes(), width, height)

        for pdf in batches:
            rows = [one(d, p) for d, p in zip(pdf["doc_id"], pdf["payload"])]
            yield _pd.DataFrame(rows, columns=["doc_id", "payload", "width", "height"])

    return _fan(df.select("doc_id", "payload")).mapInPandas(resize_batch, RESIZED_SCHEMA)


def synthesize_png(
    df: DataFrame, width: int, height: int, text_col: str = "text"
) -> DataFrame:
    """Deterministic PNG payload per row: RGB pixels cycled from the UTF-8
    bytes of ``text_col`` (empty text → a 1-byte seed), encoded with the
    pure-stdlib writer. Runs in mapInPandas because PNG needs zlib — a
    column expression can't express the deflate — but stays Arrow-batched
    and embarrassingly parallel like every codec here."""

    def synth_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        from .png import encode_png

        need = width * height * 3

        def one(doc_id, text):
            seed = (text or "x").encode("utf-8") or b"x"
            reps = -(-need // len(seed))  # ceil
            return (doc_id, encode_png(width, height, (seed * reps)[:need]))

        for pdf in batches:
            rows = [one(d, t) for d, t in zip(pdf["doc_id"], pdf[text_col])]
            yield _pd.DataFrame(rows, columns=["doc_id", "payload"])

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return _fan(df.select("doc_id", text_col)).mapInPandas(synth_batch, schema)


def resize_png(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for PNG payloads: full decode
    (operators/png.py — inflate + unfilter), numpy index-sample to the
    target grid, deterministic re-encode (filter 0, fixed zlib level).
    Non-PNG / unsupported-subset payloads pass through unchanged
    (width/height null), mirroring :func:`resize_ppm`'s mixed-media
    contract."""

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        from .png import decode_png, encode_png

        def one(doc_id, payload):
            data = bytes(payload)
            dec = decode_png(data)
            if dec is None:
                return (doc_id, data, None, None)
            w, h, ch, img = dec
            ys = (_np.arange(height) * h) // height
            xs = (_np.arange(width) * w) // width
            out = img[ys][:, xs]
            return (
                doc_id,
                encode_png(width, height, out.tobytes(), channels=ch),
                width,
                height,
            )

        for pdf in batches:
            rows = [one(d, p) for d, p in zip(pdf["doc_id"], pdf["payload"])]
            yield _pd.DataFrame(rows, columns=["doc_id", "payload", "width", "height"])

    return _fan(df.select("doc_id", "payload")).mapInPandas(resize_batch, RESIZED_SCHEMA)


JPEG_ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("ok", BooleanType()),
    ]
)


def jpeg_roundtrip(
    df: DataFrame,
    quality: int = 90,
    subsampling: str = "420",
    restart_interval: int = 2,
    max_err: int = 24,
    text_col: str = "text",
) -> DataFrame:
    """Full baseline-JPEG codec loop per row (operators/jpeg.py — pure
    numpy, ITU-T T.81): synthesize a smooth deterministic RGB image from
    the row's text (gradients + a text-derived base color; per-doc
    dimensions ``16 + (len%3)*8`` × ``16 + (len%5)*8`` so the MCU geometry
    varies), encode (Annex K tables, 4:2:0 subsampling, restart markers),
    decode (Huffman → dequant → IDCT → chroma upsample → YCbCr→RGB), and
    report the container-classified media type + dimensions and whether the
    decoded pixels are within ``max_err`` of the source — the lossy-codec
    contract a byte-exact check can't express. One Arrow-batched
    mapInPandas, embarrassingly parallel, zero shuffles."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        from .jpeg import decode_jpeg, encode_jpeg, parse_jpeg_header

        def one(doc_id, text):
            text = text or ""
            w = 16 + (len(text) % 3) * 8
            h = 16 + (len(text) % 5) * 8
            base = sum(text.encode("utf-8")) % 256
            xs = _np.linspace(0.0, 255.0, w)
            ys = _np.linspace(0.0, 255.0, h)
            img = _np.stack(
                [
                    _np.tile(xs, (h, 1)),
                    _np.tile(ys[:, None], (1, w)),
                    _np.full((h, w), float(base)),
                ],
                axis=2,
            ).astype(_np.uint8)
            data = encode_jpeg(
                img, quality=quality, subsampling=subsampling,
                restart_interval=restart_interval,
            )
            hdr = parse_jpeg_header(data)
            dec = decode_jpeg(data)
            ok = (
                hdr == (w, h, 3)
                and dec is not None
                and dec[:3] == (w, h, 3)
                and int(
                    _np.abs(dec[3].astype(_np.int64) - img.astype(_np.int64)).max()
                ) <= max_err
            )
            return (doc_id, "image/jpeg" if hdr else "invalid", w, h, bool(ok))

        for pdf in batches:
            rows = [one(d, t) for d, t in zip(pdf["doc_id"], pdf[text_col])]
            yield _pd.DataFrame(
                rows, columns=["doc_id", "media_type", "width", "height", "ok"]
            )

    return _fan(df.select("doc_id", text_col)).mapInPandas(batch, JPEG_ROUNDTRIP_SCHEMA)


WAV_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("peak", LongType()),
        StructField("rms_floor", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def wav_roundtrip_features(df: DataFrame, rate: int = 16_000) -> DataFrame:
    """Audio modality e2e (operators/audio.py — pure-stdlib RIFF/PCM-16):
    per row, synthesize a deterministic mono PCM signal from ``doc_id``
    (``n = 800 + (doc_id%5)*160`` frames, sample_i =
    ``((doc_id*7919 + i*104729) % 65536) - 32768``), encode a real WAV,
    decode it back, and emit integer features (duration, peak, floor-RMS,
    strict zero-crossings) — every one SQL-recomputable from the synthesis
    rule, so a defect anywhere in the RIFF layout, chunk walk, PCM
    (de)serialization, or the feature math flips a driver row. One
    Arrow-batched mapInPandas; embarrassingly parallel."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        from .audio import encode_wav, wav_features

        def one(doc_id):
            doc_id = int(doc_id)
            n = 800 + (doc_id % 5) * 160
            i = _np.arange(n, dtype=_np.int64)
            samples = ((doc_id * 7919 + i * 104729) % 65536 - 32768).astype("<i2")
            feats = wav_features(encode_wav(samples, rate=rate))
            assert feats is not None  # our own writer must parse
            return (doc_id, *feats)

        for pdf in batches:
            rows = [one(d) for d in pdf["doc_id"]]
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_frames", "duration_ms",
                    "peak", "rms_floor", "zero_crossings",
                ],
            )

    return _fan(df.select("doc_id")).mapInPandas(batch, WAV_FEATURES_SCHEMA)


MJPEG_FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("ok", BooleanType()),
    ]
)


def mjpeg_frame_extract(df: DataFrame, quality: int = 85) -> DataFrame:
    """Video-stream path with a REAL codec: per row, synthesize an MJPEG
    stream (``2 + doc_id%3`` concatenated baseline JPEGs — the raw wire
    format of motion-JPEG sources; frame f is a uniform
    ``(40f+10, 40f+20, 40f+30)`` RGB card of text-derived width), split it
    back into frames (operators/jpeg.py:split_mjpeg — sound because bare
    FFD9 cannot occur inside entropy-coded data), decode every frame, and
    emit per-frame rows with dims + a lossy-bound pixel check (uniform
    frames round-trip near-exactly). This upgrades frame sampling from the
    synthetic-stub path to a real demux+decode; sampling every-k-th frame
    is a trivial ``filter(frame_idx % k == 0)`` on the result."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        from .jpeg import decode_jpeg, encode_jpeg, split_mjpeg

        def one(doc_id, text):
            doc_id = int(doc_id)
            w = 16 + (len(text or "") % 2) * 8
            h = 16
            n_frames = 2 + doc_id % 3
            frames = []
            for f in range(n_frames):
                img = _np.zeros((h, w, 3), dtype=_np.uint8)
                img[:, :] = (40 * f + 10, 40 * f + 20, 40 * f + 30)
                frames.append(img)
            stream = b"".join(encode_jpeg(im, quality=quality) for im in frames)
            rows = []
            for idx, frame_bytes in enumerate(split_mjpeg(stream)):
                dec = decode_jpeg(frame_bytes)
                ok = (
                    dec is not None
                    and dec[:3] == (w, h, 3)
                    and int(
                        _np.abs(
                            dec[3].astype(_np.int64) - frames[idx].astype(_np.int64)
                        ).max()
                    ) <= 4
                )
                rows.append((doc_id, idx, w, h, bool(ok)))
            return rows

        for pdf in batches:
            out = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                out.extend(one(d, t))
            yield _pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "width", "height", "ok"]
            )

    return _fan(df.select("doc_id", "text")).mapInPandas(batch, MJPEG_FRAMES_SCHEMA)


GIF_FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("checksum", LongType()),
    ]
)

#: 4-color palette for the GIF roundtrip: per-pixel RGB sum = 180c + 60.
_GIF_PALETTE = [(60 * c + 10, 60 * c + 20, 60 * c + 30) for c in range(4)]


def gif_frame_extract(df: DataFrame) -> DataFrame:
    """Animated-GIF path through the real LZW codec (operators/gif.py):
    per row, synthesize ``2 + doc_id%2`` paletted frames (pixel index =
    ``(x+y+f) % 4`` on a ``(13 + doc_id%3) × 11`` grid), encode an animated
    GIF89a (global color table, NETSCAPE loop, graphic-control blocks),
    decode through the full block-walk + LZW path, and emit per-frame
    pixel checksums — each SQL-recomputable from the synthesis rule, so a
    defect anywhere in the container layout, code widths, dictionary
    growth/reset, or palette mapping flips a driver row."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        from .gif import decode_gif, encode_gif, parse_gif_header

        def one(doc_id):
            doc_id = int(doc_id)
            w = 13 + doc_id % 3
            h = 11
            nf = 2 + doc_id % 2
            y, x = _np.mgrid[0:h, 0:w]
            frames = [((x + y + f) % 4).astype(_np.uint8) for f in range(nf)]
            data = encode_gif(frames, _GIF_PALETTE)
            assert parse_gif_header(data) == (w, h, nf)
            dec = decode_gif(data)
            assert dec is not None and (dec[0], dec[1]) == (w, h)
            return [
                (doc_id, f, w, h, int(img.astype(_np.int64).sum()))
                for f, img in enumerate(dec[2])
            ]

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                rows.extend(one(d))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "width", "height", "checksum"]
            )

    return _fan(df.select("doc_id")).mapInPandas(batch, GIF_FRAMES_SCHEMA)


DECODED_HASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("pixel_hash", LongType()),
    ]
)


def decode_png_hashed(df: DataFrame) -> DataFrame:
    """Decode PNG payloads and emit a polynomial fold hash of the raw
    decoded pixel bytes (``h = fold(h*31 + byte) % (1e9+7)`` — the same
    engine-portable fold as operators/text.py), so a DuckDB oracle that can
    derive the expected pixels can value-check DECODED IMAGE CONTENT, not
    just dimensions. Non-decodable payloads → 'image/stub' with null
    dims/hash (mixed-media batches never fail)."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        from .png import decode_png
        from .text import BASE, MOD

        def one(doc_id, payload):
            dec = decode_png(bytes(payload))
            if dec is None:
                return (doc_id, "image/stub", None, None, None)
            w, h, _ch, img = dec
            acc = 0
            for b in img.tobytes():
                acc = (acc * BASE + b) % MOD
            return (doc_id, "image/png", w, h, acc)

        for pdf in batches:
            rows = [one(d, p) for d, p in zip(pdf["doc_id"], pdf["payload"])]
            yield _pd.DataFrame(
                rows, columns=["doc_id", "media_type", "width", "height", "pixel_hash"]
            )

    return _fan(df.select("doc_id", "payload")).mapInPandas(batch, DECODED_HASH_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
        StructField("frame_len", LongType()),
    ]
)


FEATURES_INT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_len", LongType()),
        StructField("features", ArrayType(LongType())),
    ]
)


def extract_features(df: DataFrame, n_bins: int = 16, normalize: bool = True) -> DataFrame:
    """REAL (not stubbed) feature extraction: byte histogram per payload — a
    content signature computable without media codecs, vectorized with numpy
    inside Arrow batches. ``normalize=True`` (default) emits the fraction per
    bin (feeds the similarity operators); ``normalize=False`` emits raw
    integer counts plus ``payload_len`` — exact-integer output, so the DuckDB
    driver oracle can recompute it engine-independently (the bin of a byte is
    its high nibble when ``n_bins`` is 16, i.e. a hex-digit histogram)."""

    def feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            feats = []
            lens = []
            for payload in pdf["payload"]:
                arr = _np.frombuffer(bytes(payload), dtype=_np.uint8)
                lens.append(len(arr))
                if len(arr) == 0:
                    feats.append([0.0] * n_bins if normalize else [0] * n_bins)
                    continue
                hist = _np.bincount(arr // (256 // n_bins), minlength=n_bins)[:n_bins]
                feats.append((hist / len(arr)).tolist() if normalize else hist.tolist())
            if normalize:
                yield _pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})
            else:
                yield _pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "payload_len": lens, "features": feats}
                )

    out_schema = FEATURES_SCHEMA if normalize else FEATURES_INT_SCHEMA
    return _fan(df.select("doc_id", "payload")).mapInPandas(feat_batch, out_schema)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: emit n_frames equal-split
    chunks per payload (row multiplication inside the Arrow batch — the
    explode happens executor-side, no shuffle). A real deployment replaces
    the splitter with keyframe extraction; the (1 row -> N frames) plumbing,
    schema and ordering contract are the tested part."""

    def frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids, idxs, frames, lens = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                step = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    chunk = data[i * step : (i + 1) * step] if i < n_frames - 1 else data[i * step :]
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(chunk)
                    lens.append(len(chunk))
            yield _pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames, "frame_len": lens}
            )

    return _fan(df.select("doc_id", "payload")).mapInPandas(frames_batch, FRAMES_SCHEMA)


def resize_media(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize: gated on a real image library; without one, a deterministic
    stub re-derives metadata for the target dimensions so the pipeline shape
    (schema, batch flow) is exercised end-to-end.

    Raises NotImplementedError only at *execution* if strict=True semantics
    are ever needed; the default keeps the deterministic fake (documented
    stub per the container's no-media-libs constraint)."""
    try:  # pragma: no cover - PIL not in this container
        import PIL  # noqa: F401

        raise NotImplementedError("real PIL resize path not wired in this container")
    except ImportError:
        pass

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            lens = pdf["payload"].map(len)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_len": lens.map(lambda n: min(n, width * height)),
                    "media_type": "image/stub-resized",
                    "width": width,
                    "height": height,
                }
            )

    return _fan(df.select("doc_id", "payload")).mapInPandas(resize_batch, DECODED_SCHEMA)


DHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("dhash", LongType())]
)

#: dHash geometry: decode to (DHASH_W+1) x DHASH_H grayscale, one bit per
#: horizontally-adjacent comparison -> DHASH_W*DHASH_H = 56 bits (< 63, so
#: the hash is always a non-negative BIGINT on every engine).
DHASH_W = 8
DHASH_H = 7


def dhash_png(df: DataFrame) -> DataFrame:
    """Perceptual gradient hash (dHash) of PNG payloads through the REAL
    codec: decode (inflate + unfilter), integer luma
    ``(299R + 587G + 114B) // 1000``, bit ``r*8+c`` set iff
    ``gray[r][c] > gray[r][c+1]``. All-integer after decode, so an oracle
    that can derive the expected pixels (our synthesized images are
    positional samples of the text bytes) replays the hash exactly.
    Non-decodable payloads -> null hash (mixed-media contract)."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        from .png import decode_png

        def one(doc_id, payload):
            dec = decode_png(bytes(payload))
            if dec is None:
                return (doc_id, None)
            w, h, ch, img = dec
            if w != DHASH_W + 1 or h != DHASH_H or ch < 3:
                return (doc_id, None)
            px = _np.asarray(img, dtype=_np.int64).reshape(h, w, ch)
            gray = (
                299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
            ) // 1000
            bits = gray[:, :-1] > gray[:, 1:]
            acc = 0
            for r in range(DHASH_H):
                for c in range(DHASH_W):
                    if bits[r, c]:
                        acc |= 1 << (r * DHASH_W + c)
            return (doc_id, acc)

        for pdf in batches:
            rows = [one(d, p) for d, p in zip(pdf["doc_id"], pdf["payload"])]
            yield _pd.DataFrame(rows, columns=["doc_id", "dhash"])

    return _fan(df.select("doc_id", "payload")).mapInPandas(batch, DHASH_SCHEMA)


def dhash_synth_resized(
    df: DataFrame,
    synth_width: int,
    synth_height: int,
    width: int,
    height: int,
    text_col: str = "text",
) -> DataFrame:
    """Fused synthesize_png → resize_png → dhash_png in ONE mapInPandas
    stage (guide §4: the three chained stages each paid a full JVM↔Python
    Arrow round-trip — encode, ship back, decode+resize+re-encode, ship
    back, decode+hash — while the per-image Python work is ~0.14 ms/doc;
    the measured cost was almost entirely boundary machinery). The fused
    body calls the SAME codec functions in the same order with the same
    bytes, so the emitted (doc_id, dhash) rows are bit-identical to the
    chained operators (pinned by tests/test_dhash.py's fused-vs-chained
    test); the individual operators stay for the roundtrip queries."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        from .png import decode_png, encode_png

        need = synth_width * synth_height * 3

        def one(doc_id, text):
            seed = (text or "x").encode("utf-8") or b"x"
            reps = -(-need // len(seed))
            payload = encode_png(synth_width, synth_height, (seed * reps)[:need])
            dec = decode_png(payload)
            if dec is None:
                return (doc_id, None)
            w, h, ch, img = dec
            ys = (_np.arange(height) * h) // height
            xs = (_np.arange(width) * w) // width
            small = encode_png(width, height, img[ys][:, xs].tobytes(), channels=ch)
            dec2 = decode_png(small)
            if dec2 is None:
                return (doc_id, None)
            w2, h2, ch2, img2 = dec2
            if w2 != DHASH_W + 1 or h2 != DHASH_H or ch2 < 3:
                return (doc_id, None)
            px = _np.asarray(img2, dtype=_np.int64).reshape(h2, w2, ch2)
            gray = (
                299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
            ) // 1000
            bits = gray[:, :-1] > gray[:, 1:]
            acc = 0
            for r in range(DHASH_H):
                for c in range(DHASH_W):
                    if bits[r, c]:
                        acc |= 1 << (r * DHASH_W + c)
            return (doc_id, acc)

        for pdf in batches:
            rows = [one(d, t) for d, t in zip(pdf["doc_id"], pdf[text_col])]
            yield _pd.DataFrame(rows, columns=["doc_id", "dhash"])

    return _fan(df.select("doc_id", text_col)).mapInPandas(batch, DHASH_SCHEMA)


def hamming_block_pairs(
    hashes: DataFrame,
    hash_col: str,
    max_hamming: int,
    n_blocks: int,
    bits_per_block: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Generic pigeonhole hamming-pair search over an integer hash column:
    the hash splits into ``n_blocks`` blocks of ``bits_per_block`` bits;
    hamming ≤ ``n_blocks - 1`` implies at least one block matches exactly,
    so candidates come from per-block equi-joins — never all pairs — and
    the XOR+bit_count verification runs on candidates only. Shared engine
    for the image dHash and audio fingerprint near-dup (same shape as the
    SimHash pigeonhole search, operators/dedup.simhash_near_dup). At
    larger corpora widen blocks / raise n_blocks so per-block collision
    volume stays bounded (block width should track log2(n_docs))."""
    if max_hamming >= n_blocks:
        raise ValueError("pigeonhole needs max_hamming < n_blocks")
    mask = (1 << bits_per_block) - 1
    h = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("_hid"), F.col(hash_col).alias("_h")
    )
    blocks = h.select(
        "_hid",
        "_h",
        F.explode(
            F.array(*[F.lit(b) for b in range(n_blocks)])
        ).alias("blk"),
    ).withColumn(
        # SQL shiftright: the Python F.shiftright only takes a literal
        # shift, but the shift here is the exploded block index
        "blk_val",
        F.expr(f"shiftright(_h, blk * {bits_per_block}) & {mask}"),
    )
    a = blocks.select(
        F.col("_hid").alias("doc_a"), F.col("_h").alias("ha"), "blk", "blk_val"
    )
    b = blocks.select(
        F.col("_hid").alias("doc_b"), F.col("_h").alias("hb"), "blk", "blk_val"
    )
    cand = (
        a.join(b, ["blk", "blk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def dhash_near_dup(
    hashes: DataFrame, max_hamming: int = 6, n_blocks: int = 7
) -> DataFrame:
    """Near-duplicate image pairs by dHash hamming distance: the 56 hash
    bits through :func:`hamming_block_pairs` with 8-bit blocks."""
    return hamming_block_pairs(
        hashes, "dhash", max_hamming, n_blocks, bits_per_block=8
    )


WAV_FP_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("afp", LongType())]
)

#: audio fingerprint geometry: the PCM stream framed into AFP_FRAMES
#: windows, one bit per adjacent-frame energy comparison -> 31 bits.
AFP_FRAMES = 32


def wav_fingerprint(df: DataFrame, rate: int = 16_000) -> DataFrame:
    """Audio perceptual fingerprint through the REAL WAV codec: the same
    deterministic per-doc PCM synthesis as :func:`wav_roundtrip_features`
    (n = 800 + doc_id%5*160 samples — always divisible by AFP_FRAMES),
    encoded to RIFF/PCM-16 and decoded back, then the energy-envelope
    gradient: frame f's energy = Σ|sample| (exact integer), bit f set iff
    energy[f] > energy[f+1] — the audio analog of the image dHash, and
    like it fully SQL-replayable from the synthesis rule. A defect in the
    RIFF layout, chunk walk, or PCM (de)serialization flips bits."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        from .audio import decode_wav, encode_wav

        def one(doc_id):
            n = 800 + (doc_id % 5) * 160
            i = _np.arange(n, dtype=_np.int64)
            samples = ((doc_id * 7919 + i * 104729) % 65536 - 32768).astype("<i2")
            dec = decode_wav(encode_wav(samples, rate))
            if dec is None:
                return (doc_id, None)
            _rate, _ch, pcm = dec
            v = _np.abs(pcm.astype(_np.int64))
            fr = v.reshape(AFP_FRAMES, n // AFP_FRAMES).sum(axis=1)
            acc = 0
            for f in range(AFP_FRAMES - 1):
                if fr[f] > fr[f + 1]:
                    acc |= 1 << f
            return (doc_id, acc)

        for pdf in batches:
            rows = [one(int(d)) for d in pdf["doc_id"]]
            yield _pd.DataFrame(rows, columns=["doc_id", "afp"])

    return _fan(df.select("doc_id")).mapInPandas(batch, WAV_FP_SCHEMA)


def audio_near_dup(
    fps: DataFrame, max_hamming: int = 5, n_blocks: int = 6
) -> DataFrame:
    """Near-duplicate audio pairs by fingerprint hamming distance: the 31
    bits through :func:`hamming_block_pairs` with 6-bit blocks."""
    return hamming_block_pairs(
        fps, "afp", max_hamming, n_blocks, bits_per_block=6
    )
