"""Portable bottom-k quantile sample (operators/sketch.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sea_streamer_spark.operators.sketch import (
    QSK_QS,
    bottomk_value_sample,
    quantiles_from_sample,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from sea_streamer_spark.session import get_spark

    return get_spark(app_name="test-sketch-quantile")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )


def _sample_rows(df, k=None):
    kwargs = {} if k is None else {"k": k}
    return {
        (r["source"], r["h"], r["v"])
        for r in bottomk_value_sample(df, "doc_id", "n_chars", "source", **kwargs).collect()
    }


class TestBottomKSample:
    def test_geometry_bounded(self, docs):
        sample = bottomk_value_sample(docs, "doc_id", "n_chars", "source", k=16)
        per_group = sample.groupBy("source").count().collect()
        assert all(r["count"] <= 16 for r in per_group)

    def test_merge_equals_rebuild(self, docs):
        """bottom-k(A ∪ B) == re-ranked truncation of bottom-k(A) ∪
        bottom-k(B) — the accumulator contract."""
        from pyspark.sql import Window

        a = docs.filter(F.col("doc_id") % 2 == 0)
        b = docs.filter(F.col("doc_id") % 2 == 1)
        k = 32
        sa = bottomk_value_sample(a, "doc_id", "n_chars", "source", k=k)
        sb = bottomk_value_sample(b, "doc_id", "n_chars", "source", k=k)
        w = Window.partitionBy("source").orderBy("h", "v")
        merged = {
            (r["source"], r["h"], r["v"])
            for r in sa.unionByName(sb)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("source", "h", "v")
            .collect()
        }
        rebuilt = _sample_rows(docs, k=k)
        assert merged == rebuilt

    def test_small_group_quantiles_are_exact(self, spark):
        """A group smaller than k samples itself fully, so the estimates
        equal the exact ceil-rank percentiles."""
        rows = [(i, "g", v) for i, v in enumerate([10, 20, 30, 40, 50, 60, 70, 80, 90, 100])]
        df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
        out = quantiles_from_sample(
            bottomk_value_sample(df, "doc_id", "n_chars", "source"), "source"
        ).collect()[0]
        assert out["k_used"] == 10
        import math

        vals = sorted(v for _, _, v in rows)
        for q in QSK_QS:
            assert out[f"p{q}"] == vals[math.ceil(10 * q / 100) - 1], q

    def test_accuracy_vs_exact_percentile(self, docs):
        """Rank-space error bound: the empirical CDF of each estimate in
        the FULL group stays within 4σ = 4·sqrt(q(1-q)/k) of q (plus the
        discrete atom at the estimate's value — ties count as hits)."""
        import math

        full = {
            r["source"]: sorted(v["n_chars"] for v in docs.filter(F.col("source") == r["source"]).collect())
            for r in docs.select("source").distinct().collect()
        }
        ests = quantiles_from_sample(
            bottomk_value_sample(docs, "doc_id", "n_chars", "source"), "source"
        ).collect()
        for row in ests:
            vals = full[row["source"]]
            n = len(vals)
            for q in QSK_QS:
                est = row[f"p{q}"]
                lo = sum(1 for v in vals if v < est) / n
                hi = sum(1 for v in vals if v <= est) / n
                tol = 4 * math.sqrt(q / 100 * (1 - q / 100) / min(row["k_used"], n))
                assert lo - tol <= q / 100 <= hi + tol, (
                    row["source"], q, est, lo, hi, tol
                )

    def test_registered_query_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "sketch_quantile_bottomk", SF_DIR) > 0
