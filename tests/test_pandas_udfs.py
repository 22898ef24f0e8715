"""pandas_udf SCALAR + GROUPED_AGG shapes (functions/pandas_aggs.py):
the remaining §2.7 extension-surface rows, pinned against SQL equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from sea_streamer_spark.session import get_spark

    return get_spark(app_name="test-pandas-udfs")


class TestPandasUdfSurface:
    def test_grouped_agg_median_equals_sql_percentile(self, spark):
        from sea_streamer_spark.functions.pandas_aggs import exact_median_agg

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        got = {
            r["source"]: r["m"]
            for r in docs.groupBy("source")
            .agg(exact_median_agg(F.col("n_chars").cast("double")).alias("m"))
            .collect()
        }
        want = {
            r["source"]: r["m"]
            for r in docs.groupBy("source")
            .agg(F.expr("percentile(n_chars, 0.5)").alias("m"))
            .collect()
        }
        assert got == want

    def test_scalar_udf_is_vectorized_and_correct(self, spark):
        from sea_streamer_spark.functions.pandas_aggs import mad_from

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
        mad = mad_from(300.0)
        got = {
            r["doc_id"]: r["d"]
            for r in docs.select(
                "doc_id", mad(F.col("n_chars").cast("double")).alias("d")
            ).collect()
        }
        for r in docs.collect():
            assert got[r["doc_id"]] == abs(float(r["n_chars"]) - 300.0)

    def test_composed_plan(self, spark):
        from sea_streamer_spark.functions.pandas_aggs import group_median_mad

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = group_median_mad(docs, "source", "n_chars").collect()
        assert len(out) == docs.select("source").distinct().count()
        assert all(r["mad_from_global"] > 0 for r in out)
