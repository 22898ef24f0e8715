"""Snapshot diff / apply (operators/versioning.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sea_streamer_spark.operators.versioning import (
    apply_diff,
    snapshot_diff,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from sea_streamer_spark.session import get_spark

    return get_spark(app_name="test-versioning")


def _snap(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, a=a, b=b) for k, a, b in rows], "k long, a string, b long"
    )


class TestSnapshotDiff:
    def test_add_remove_change_unchanged(self, spark):
        old = _snap(spark, [(1, "x", 1), (2, "y", 2), (3, "z", 3)])
        new = _snap(spark, [(2, "y", 2), (3, "Z", 3), (4, "w", 4)])
        got = {(r["k"], r["change"]) for r in snapshot_diff(old, new, ["k"]).collect()}
        assert got == {(1, "removed"), (3, "changed"), (4, "added")}

    def test_self_diff_is_empty(self, spark):
        s = _snap(spark, [(1, "x", 1), (2, None, 2)])
        assert snapshot_diff(s, s, ["k"]).count() == 0

    def test_null_vs_value_is_a_change(self, spark):
        old = _snap(spark, [(1, None, 1)])
        new = _snap(spark, [(1, "x", 1)])
        got = snapshot_diff(old, new, ["k"]).collect()
        assert [(r["k"], r["change"]) for r in got] == [(1, "changed")]

    def test_compare_cols_subset(self, spark):
        old = _snap(spark, [(1, "x", 1)])
        new = _snap(spark, [(1, "x", 99)])
        assert snapshot_diff(old, new, ["k"], compare_cols=["a"]).count() == 0
        assert snapshot_diff(old, new, ["k"], compare_cols=["b"]).count() == 1

    def test_apply_diff_round_trip(self, spark):
        old = _snap(
            spark,
            [(1, "x", 1), (2, "y", 2), (3, "z", 3), (5, "q", 5)],
        )
        new = _snap(
            spark,
            [(2, "y", 2), (3, "Z", 3), (4, "w", 4), (5, "q", 5)],
        )
        diff = snapshot_diff(old, new, ["k"])
        rebuilt = apply_diff(old, diff, new, ["k"])
        assert sorted(tuple(r) for r in rebuilt.collect()) == sorted(
            tuple(r) for r in new.collect()
        )

    def test_corpus_round_trip(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "source", "text"
        )
        old = docs.filter(F.col("doc_id") % 5 != 0)
        new = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 11 == 0, F.concat("text", F.lit(" !"))
            ).otherwise(F.col("text")),
        )
        diff = snapshot_diff(old, new, ["doc_id"])
        rebuilt = apply_diff(old, diff, new, ["doc_id"])
        assert sorted(tuple(r) for r in rebuilt.collect()) == sorted(
            tuple(r) for r in new.collect()
        )

    def test_registered_query_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "dataset_snapshot_diff", SF_DIR) > 0
