"""Portable HLL (operators/sketch.py): estimate accuracy against exact
cardinalities, merge==rebuild (the streaming-accumulator contract), and
the geometry-bounded register table."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestHllAccuracy:
    def test_per_source_estimates_within_tolerance(self, spark, sf_dir):
        from sea_streamer_spark.operators.sketch import hll_estimate
        from sea_streamer_spark.plans.queries import QUERIES

        rows = QUERIES["sketch_hll_per_source"].fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            est = hll_estimate(r.denom_q32, r.zero_registers)
            rel = abs(est - r.n_exact) / max(r.n_exact, 1)
            # m=256 → stderr ≈ 6.5%; 4σ guard band
            assert rel < 0.26, (r.source, est, r.n_exact, rel)

    def test_large_cardinality_synthetic(self, spark):
        from sea_streamer_spark.operators.sketch import (
            hll_estimate,
            hll_registers,
            hll_summary,
        )

        n = 60_000
        df = spark.range(n).select(
            F.concat(F.lit("key_"), F.col("id").cast("string")).alias("k")
        )
        s = hll_summary(hll_registers(df, "k")).collect()[0]
        est = hll_estimate(s.denom_q32, s.zero_registers)
        assert abs(est - n) / n < 0.2, (est, n)

    def test_small_cardinality_uses_linear_counting(self, spark):
        from sea_streamer_spark.operators.sketch import (
            hll_estimate,
            hll_registers,
            hll_summary,
        )

        n = 40
        df = spark.range(n).select(
            F.concat(F.lit("x"), F.col("id").cast("string")).alias("k")
        )
        s = hll_summary(hll_registers(df, "k")).collect()[0]
        est = hll_estimate(s.denom_q32, s.zero_registers)
        assert abs(est - n) / n < 0.2, (est, n)


class TestHllMerge:
    def test_register_max_merge_equals_rebuild(self, spark):
        """max over per-part register tables == registers of the union —
        what makes the sketch a valid streaming accumulator."""
        from sea_streamer_spark.operators.sketch import hll_registers

        a = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
        b = spark.range(2000, 5000).select(F.col("id").cast("string").alias("k"))
        whole = {
            (r.bucket, r.r)
            for r in hll_registers(a.union(b), "k").collect()
        }
        ra = hll_registers(a, "k")
        rb = hll_registers(b, "k")
        merged = {
            (r.bucket, r.r)
            for r in ra.union(rb).groupBy("bucket").agg(F.max("r").alias("r")).collect()
        }
        assert merged == whole

    def test_register_table_is_geometry_bounded(self, spark):
        from sea_streamer_spark.operators.sketch import HLL_M, hll_registers

        df = spark.range(200_000).select(F.col("id").cast("string").alias("k"))
        assert hll_registers(df, "k").count() <= HLL_M
