"""Mergeable moment statistics (operators/stats.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sea_streamer_spark.operators.stats import (
    derive_stats,
    merge_moments,
    moment_stats,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from sea_streamer_spark.session import get_spark

    return get_spark(app_name="test-stats")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestMergeableMoments:
    def test_merge_equals_direct(self, docs):
        direct = moment_stats(docs, "n_chars", ["source"])
        parts = [
            moment_stats(docs.filter(F.col("doc_id") % 3 == i), "n_chars", ["source"])
            for i in range(3)
        ]
        merged = merge_moments(*parts, group_cols=["source"])
        assert _rows(merged) == _rows(direct)

    def test_merge_is_order_insensitive(self, docs):
        a = moment_stats(docs.filter(F.col("doc_id") % 2 == 0), "n_chars", ["source"])
        b = moment_stats(docs.filter(F.col("doc_id") % 2 == 1), "n_chars", ["source"])
        assert _rows(merge_moments(a, b, group_cols=["source"])) == _rows(
            merge_moments(b, a, group_cols=["source"])
        )

    def test_derived_match_python(self, docs):
        import collections

        vals = collections.defaultdict(list)
        for r in docs.collect():
            vals[r["source"]].append(r["n_chars"])
        got = {
            r["source"]: (r["n"], r["s1"], r["s2"], r["mn"], r["mx"],
                          r["mean_micro"], r["var_micro"])
            for r in derive_stats(
                moment_stats(docs, "n_chars", ["source"])
            ).collect()
        }
        for src, vs in vals.items():
            n, s1, s2 = len(vs), sum(vs), sum(v * v for v in vs)
            expect = (
                n, s1, s2, min(vs), max(vs),
                (s1 * 1_000_000) // n,
                ((n * s2 - s1 * s1) * 1_000_000) // (n * n),
            )
            assert got[src] == expect, src

    def test_registered_query_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "profile_incremental_merge", SF_DIR) > 0


class TestEventsValueTrend:
    def test_slope_matches_numpy_ols(self, spark):
        """The exact-sum slope equals numpy's least-squares fit on the
        same fixed-point inputs."""
        import numpy as np

        from sea_streamer_spark.plans.queries import QUERIES

        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        got = {
            r["event_type"]: (r["n"], r["slope_milli_per_hour"])
            for r in QUERIES["events_value_trend"].fn(spark, SF_DIR).collect()
        }
        rows = ev.select("event_type", "ts", "value").collect()
        import collections

        by_type = collections.defaultdict(list)
        for r in rows:
            us = int(r["ts"].timestamp() * 1_000_000)
            by_type[r["event_type"]].append(
                (us // 3_600_000_000, int(r["value"] * 1000))
            )
        for ty, pts in by_type.items():
            h0 = min(h for h, _ in pts)
            x = np.array([h - h0 for h, _ in pts], dtype=float)
            y = np.array([ym for _, ym in pts], dtype=float)
            slope = np.polyfit(x, y, 1)[0]
            n, got_slope = got[ty]
            assert n == len(pts)
            assert abs(slope - got_slope) < 1e-6 * max(1.0, abs(slope)), ty

    def test_registered_query_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "events_value_trend", SF_DIR) > 0


class TestSq8Quantization:
    def test_codes_match_python_reference(self, spark):
        import numpy as np
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        from sea_streamer_spark.operators.embedding import sq8_encode, sq8_fit_np

        path = f"{SF_DIR}/embeddings.parquet"
        mins, scales = sq8_fit_np(path)
        emb = spark.read.parquet(path).limit(60)
        got = {
            r["vec_id"]: r["c"]
            for r in emb.select(
                "vec_id", sq8_encode(emb, mins, scales).alias("c")
            ).collect()
        }
        tab = pq.read_table(path).to_pandas().set_index("vec_id")
        for v, codes in got.items():
            x = np.asarray(tab.loc[v, "embedding"], dtype=np.float64)
            expect = np.clip(
                np.floor((x - mins) * scales + 1e-9), 0, 255
            ).astype(int)
            assert list(codes) == list(expect), v

    def test_fit_properties(self):
        import numpy as np

        from sea_streamer_spark.operators.embedding import sq8_fit_np

        mins, scales = sq8_fit_np(f"{SF_DIR}/embeddings.parquet")
        assert mins.shape == scales.shape == (64,)
        assert (scales >= 0).all()
        # the fit max of every dim must land exactly in bucket 255
        import pyarrow.parquet as pq

        emb = np.asarray(
            pq.read_table(f"{SF_DIR}/embeddings.parquet")
            .column("embedding").to_pylist(), dtype=np.float64,
        )
        top = np.floor((emb.max(axis=0) - mins) * scales + 1e-9)
        assert (top[scales > 0] == 255).all()

    def test_out_of_range_values_clamp(self, spark):
        from pyspark.sql import Row
        import numpy as np

        from sea_streamer_spark.operators.embedding import sq8_encode

        mins = np.zeros(4)
        scales = np.full(4, 255.0)  # range [0, 1]
        df = spark.createDataFrame(
            [Row(vec_id=1, embedding=[-5.0, 0.0, 0.5, 99.0])]
        )
        codes = df.select(sq8_encode(df, mins, scales).alias("c")).collect()[0]["c"]
        assert codes == [0, 0, 127, 255]

    def test_registered_query_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "embedding_quantize_sq8", SF_DIR) > 0
