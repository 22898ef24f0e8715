"""Perceptual dHash + pigeonhole near-dup (operators/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sea_streamer_spark.operators import multimodal as M
from sea_streamer_spark.operators.png import decode_png, encode_png

SF_DIR = "/root/testdata/sf0.001"


def dhash_py(payload: bytes) -> int | None:
    """Pure-python reference of M.dhash_png's per-row computation."""
    dec = decode_png(payload)
    if dec is None:
        return None
    w, h, ch, img = dec
    if w != M.DHASH_W + 1 or h != M.DHASH_H or ch < 3:
        return None
    import numpy as np

    px = np.asarray(img, dtype=np.int64).reshape(h, w, ch)
    gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    acc = 0
    for r in range(M.DHASH_H):
        for c in range(M.DHASH_W):
            if gray[r, c] > gray[r, c + 1]:
                acc |= 1 << (r * M.DHASH_W + c)
    return acc


def _img(seed: bytes, w=9, h=7) -> bytes:
    need = w * h * 3
    reps = -(-need // len(seed))
    return encode_png(w, h, (seed * reps)[:need])


@pytest.fixture(scope="module")
def spark():
    from sea_streamer_spark.session import get_spark

    return get_spark(app_name="test-dhash")


class TestDhash:
    def test_spark_matches_python_reference(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
        png = M.synthesize_png(docs, width=18, height=14)
        small = M.resize_png(png, width=9, height=7).select("doc_id", "payload")
        got = {r["doc_id"]: r["dhash"] for r in M.dhash_png(small).collect()}
        for r in small.collect():
            assert got[r["doc_id"]] == dhash_py(bytes(r["payload"])), r["doc_id"]

    def test_hash_fits_nonneg_bigint(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
        png = M.synthesize_png(docs, width=18, height=14)
        small = M.resize_png(png, width=9, height=7).select("doc_id", "payload")
        vals = [r["dhash"] for r in M.dhash_png(small).collect()]
        assert all(v is not None and 0 <= v < 1 << 56 for v in vals)

    def test_non_png_payload_yields_null(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, payload=bytearray(b"not a png"))]
        )
        out = M.dhash_png(df).collect()
        assert out[0]["dhash"] is None
        # and null hashes never reach the pair search
        assert M.dhash_near_dup(M.dhash_png(df)).count() == 0

    def test_pigeonhole_matches_brute_force(self, spark):
        """Bucketed pair search finds EXACTLY the brute-force hamming<=d
        set — pigeonhole blocks guarantee recall, the verify step
        precision."""
        import itertools

        seeds = [bytes([40 + i, 90, 160 + (i % 5)]) * 3 for i in range(12)]
        payloads = [_img(s) for s in seeds]
        hashes_py = {i: dhash_py(p) for i, p in enumerate(payloads)}
        brute = {
            (a, b, bin(hashes_py[a] ^ hashes_py[b]).count("1"))
            for a, b in itertools.combinations(range(len(seeds)), 2)
            if bin(hashes_py[a] ^ hashes_py[b]).count("1") <= 6
        }
        df = spark.createDataFrame(
            [Row(doc_id=i, payload=bytearray(p)) for i, p in enumerate(payloads)]
        )
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in M.dhash_near_dup(M.dhash_png(df)).collect()
        }
        assert got == brute
        assert brute, "engineered set must actually contain near-dup pairs"

    def test_identical_images_hamming_zero(self, spark):
        p = _img(b"\x10\x80\x30")
        df = spark.createDataFrame(
            [Row(doc_id=0, payload=bytearray(p)), Row(doc_id=1, payload=bytearray(p))]
        )
        out = M.dhash_near_dup(M.dhash_png(df)).collect()
        assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in out] == [(0, 1, 0)]

    def test_guard_rejects_bad_pigeonhole_config(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(b"x"))])
        with pytest.raises(ValueError):
            M.dhash_near_dup(M.dhash_png(df), max_hamming=7, n_blocks=7)

    def test_registered_query_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "multimodal_dhash_neardup", SF_DIR) > 0

    def test_fused_matches_chained(self, spark):
        """r13: dhash_synth_resized (one Python stage) must emit exactly
        the rows of the synthesize_png → resize_png → dhash_png chain —
        the fused body calls the same codec functions on the same bytes,
        and this pin keeps that true (incl. empty text and unicode)."""
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="hello world " * 20),
                Row(doc_id=2, text=""),
                Row(doc_id=3, text="ünïcode 😀 bytes " * 9),
                Row(doc_id=4, text="x"),
            ]
        )
        chained = M.dhash_png(
            M.resize_png(
                M.synthesize_png(docs, width=18, height=14), width=9, height=7
            ).select("doc_id", "payload")
        ).collect()
        fused = M.dhash_synth_resized(
            docs, synth_width=18, synth_height=14, width=9, height=7
        ).collect()
        assert sorted(map(tuple, fused)) == sorted(map(tuple, chained))


def afp_py(doc_id: int) -> int:
    """Pure-python reference of M.wav_fingerprint's per-row computation."""
    import numpy as np

    n = 800 + (doc_id % 5) * 160
    i = np.arange(n, dtype=np.int64)
    s = (doc_id * 7919 + i * 104729) % 65536 - 32768
    fr = np.abs(s).reshape(M.AFP_FRAMES, n // M.AFP_FRAMES).sum(axis=1)
    return sum(1 << f for f in range(M.AFP_FRAMES - 1) if fr[f] > fr[f + 1])


class TestAudioFingerprint:
    def test_spark_matches_python_reference(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
        got = {r["doc_id"]: r["afp"] for r in M.wav_fingerprint(docs).collect()}
        for d in got:
            assert got[d] == afp_py(d), d
        assert all(v is not None and 0 <= v < 1 << 31 for v in got.values())

    def test_pigeonhole_matches_brute_force(self, spark):
        import itertools

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
            F.col("doc_id") < 60
        )
        ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
        brute = {
            (a, b, bin(afp_py(a) ^ afp_py(b)).count("1"))
            for a, b in itertools.combinations(sorted(ids), 2)
            if bin(afp_py(a) ^ afp_py(b)).count("1") <= 5
        }
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in M.audio_near_dup(M.wav_fingerprint(docs)).collect()
        }
        assert got == brute
        assert brute  # the synthesis rule genuinely produces near-dups

    def test_registered_query_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "multimodal_audio_neardup", SF_DIR) > 0


class TestCrossModalAgreement:
    def test_no_text_only_rows_and_engineered_both(self, spark):
        """Identical text must surface as 'both' (identical synthesized
        images => hamming 0); 'text_only' is impossible by construction."""
        from sea_streamer_spark.plans.queries import QUERIES

        out = QUERIES["dedup_crossmodal_agreement"].fn(spark, SF_DIR).collect()
        kinds = {r["agreement"] for r in out}
        assert "text_only" not in kinds, out
        # engineered: two docs with identical text -> 'both'
        import pandas as pd  # noqa: F401 (parity of environment)

        from sea_streamer_spark.operators import multimodal as M2
        from pyspark.sql import functions as F2

        docs = spark.createDataFrame(
            [(1, "same text body here"), (2, "same text body here"),
             (3, "a completely different document")],
            ["doc_id", "text"],
        )
        fp = docs.select("doc_id", F2.md5("text").alias("fp"))
        txt = (
            fp.alias("a").join(fp.alias("b"), "fp")
            .filter(F2.col("a.doc_id") < F2.col("b.doc_id"))
            .select(
                F2.col("a.doc_id").alias("doc_a"),
                F2.col("b.doc_id").alias("doc_b"),
            )
        )
        png = M2.synthesize_png(docs, width=18, height=14)
        small = M2.resize_png(png, width=9, height=7).select("doc_id", "payload")
        img = M2.dhash_near_dup(M2.dhash_png(small))
        t_pairs = {(r["doc_a"], r["doc_b"]) for r in txt.collect()}
        i_pairs = {(r["doc_a"], r["doc_b"]) for r in img.collect()}
        assert (1, 2) in t_pairs
        assert t_pairs <= i_pairs  # every text dup is an image dup

    def test_registered_crossmodal_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "dedup_crossmodal_agreement", SF_DIR) > 0
