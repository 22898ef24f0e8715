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


class TestKmvJaccard:
    def test_estimator_accuracy_on_known_overlap(self, spark):
        """Two synthetic vocabularies with engineered overlap: the KMV
        estimate shared_in_topk/k_used must sit within the 1/sqrt(k)
        error band of the true Jaccard."""
        from pyspark.sql import functions as F

        from sea_streamer_spark.operators.sketch import (
            kmv_pair_overlap,
            kmv_sketch,
        )

        # |A|=6000, |B|=6000, |A∩B|=2000 → J = 2000/10000 = 0.2
        a = spark.range(0, 6000).select(
            F.lit("A").alias("g"), F.col("id").cast("string").alias("k")
        )
        b = spark.range(4000, 10000).select(
            F.lit("B").alias("g"), F.col("id").cast("string").alias("k")
        )
        kmv = kmv_sketch(a.union(b), "k", "g")
        r = kmv_pair_overlap(kmv, "g").collect()[0]
        est = r.shared_in_topk / r.k_used
        assert abs(est - 0.2) < 0.08, (est, r.k_used, r.shared_in_topk)

    def test_disjoint_and_identical_sets(self, spark):
        from pyspark.sql import functions as F

        from sea_streamer_spark.operators.sketch import (
            kmv_pair_overlap,
            kmv_sketch,
        )

        a = spark.range(0, 3000).select(
            F.lit("A").alias("g"), F.col("id").cast("string").alias("k")
        )
        c = spark.range(5000, 8000).select(
            F.lit("C").alias("g"), F.col("id").cast("string").alias("k")
        )
        d = spark.range(0, 3000).select(
            F.lit("D").alias("g"), F.col("id").cast("string").alias("k")
        )
        kmv = kmv_sketch(a.union(c).union(d), "k", "g")
        rows = {(r.ga, r.gb): r for r in kmv_pair_overlap(kmv, "g").collect()}
        assert rows[("A", "C")].shared_in_topk == 0
        r = rows[("A", "D")]
        assert r.shared_in_topk == r.k_used  # identical sets → J = 1

    def test_sketch_is_geometry_bounded(self, spark):
        from pyspark.sql import functions as F

        from sea_streamer_spark.operators.sketch import KMV_K, kmv_sketch

        df = spark.range(100_000).select(
            (F.col("id") % 3).cast("string").alias("g"),
            F.col("id").cast("string").alias("k"),
        )
        counts = kmv_sketch(df, "k", "g").groupBy("g").count().collect()
        assert all(r["count"] == KMV_K for r in counts)
