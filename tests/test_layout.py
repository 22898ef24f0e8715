"""Z-order layout (operators/layout.py): expression correctness against a
pure-python Morton reference, plan shape (map-only, no global window), and
the measured row-group pruning win over a linear layout — the property the
operator exists for."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def py_bucket(x, bs):
    return sum(1 for b in bs if x >= b)


def py_zval(bx, by, bits=8):
    z = 0
    for i in range(bits):
        z += ((bx >> i) & 1) << (2 * i)
        z += ((by >> i) & 1) << (2 * i + 1)
    return z


class TestZvalueExpr:
    def test_matches_python_reference(self, spark):
        from sea_streamer_spark.operators import layout as L

        rows = [(i, i * 37 % 101, i * 13 % 997) for i in range(200)]
        df = spark.createDataFrame(rows, ["id", "x", "y"])
        bx = [10, 30, 60, 90]
        by = [100, 400, 800]
        got = {
            r.id: (r.bx, r.by, r.z)
            for r in df.select(
                "id",
                L.bucket_expr("x", bx).alias("bx"),
                L.bucket_expr("y", by).alias("by"),
                L.zvalue_expr(
                    L.bucket_expr("x", bx), L.bucket_expr("y", by)
                ).alias("z"),
            ).collect()
        }
        want = {
            i: (py_bucket(x, bx), py_bucket(y, by), py_zval(py_bucket(x, bx), py_bucket(y, by)))
            for i, x, y in rows
        }
        assert got == want

    def test_zvalue_is_map_only(self, spark, sf_dir):
        """The whole point of boundary-literal bucketing: NO window, NO
        shuffle, NO Python in the z-value projection."""
        from sea_streamer_spark.operators import layout as L
        from sea_streamer_spark.sources.tables import load_tables

        ev = load_tables(spark, sf_dir, "events").events
        bs = list(range(0, 150, 10))
        df = ev.select(
            "event_id",
            L.zvalue_expr(
                L.bucket_expr("user_id", bs),
                L.bucket_expr(F.unix_micros(F.col("ts")), [0, 1, 2]),
            ).alias("z"),
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==", 1)[0]
        assert "Exchange" not in plan, plan
        assert "Window" not in plan
        assert "PythonEval" not in plan


class TestZorderPruning:
    def test_worst_case_dimension_pruning_beats_linear(self, spark, sf_dir, tmp_path):
        """Write the SAME events twice — ts-sorted (the default layout) vs
        z-ordered on (user_id, ts) — with identical file/row-group budgets,
        then evaluate BOTH single-dimension decile predicates against
        parquet row-group min/max stats. A linear layout is perfect on its
        sort dimension and prunes NOTHING on the other; z-order's guarantee
        is a bounded kept-fraction on EVERY dimension. Assert exactly that:
        the worst case over {user-range, time-range} queries keeps
        strictly fewer row groups under z-order. This is the 100 TB
        property — row groups whose stat-boxes miss the query box are
        never read, whichever dimension the query constrains."""
        import pyarrow.parquet as pq

        from sea_streamer_spark.operators import layout as L
        from sea_streamer_spark.sources.tables import load_tables

        ev = load_tables(spark, sf_dir, "events").events.withColumn(
            "ts_us", F.unix_micros(F.col("ts"))
        ).select("event_id", "user_id", "ts_us")
        n = ev.count()
        rows_per_group = max(n // 64, 1)

        lin_dir, z_dir = str(tmp_path / "linear"), str(tmp_path / "zorder")
        (
            ev.repartitionByRange(16, "ts_us")
            .sortWithinPartitions("ts_us")
            .write.mode("overwrite")
            .option("parquet.block.size", 16 * 1024)
            .option("maxRecordsPerFile", rows_per_group)
            .parquet(lin_dir)
        )
        bu = L.quantile_boundaries(ev, "user_id")
        bt = L.quantile_boundaries(ev, "ts_us")
        (
            L.zorder_by(ev, [("user_id", bu), ("ts_us", bt)], n_files=16)
            .write.mode("overwrite")
            .option("parquet.block.size", 16 * 1024)
            .option("maxRecordsPerFile", rows_per_group)
            .parquet(z_dir)
        )

        # one user decile and one time decile, queried independently
        u_lo, u_hi = ev.approxQuantile("user_id", [0.4, 0.5], 0.0)
        t_lo, t_hi = ev.approxQuantile("ts_us", [0.4, 0.5], 0.0)

        def survival(d: str, col: str, lo, hi) -> tuple[int, int]:
            total = kept = 0
            for f in os.listdir(d):
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(d, f)).metadata
                idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(idx[col]).statistics
                    total += 1
                    if st.min <= hi and st.max >= lo:
                        kept += 1
            return total, kept

        def worst(d: str) -> float:
            tot_u, kept_u = survival(d, "user_id", u_lo, u_hi)
            tot_t, kept_t = survival(d, "ts_us", t_lo, t_hi)
            assert tot_u > 30, "need granularity to measure pruning"
            return max(kept_u / tot_u, kept_t / tot_t)

        w_lin, w_z = worst(lin_dir), worst(z_dir)
        # the linear layout cannot prune the non-sort dimension at all
        assert w_lin > 0.9, w_lin
        # z-order bounds the kept fraction on BOTH dimensions
        assert w_z < 0.5, w_z

        # and the data is intact: a box result matches between layouts
        pred = (
            (F.col("user_id") >= u_lo) & (F.col("user_id") <= u_hi)
            & (F.col("ts_us") >= t_lo) & (F.col("ts_us") <= t_hi)
        )
        a = spark.read.parquet(lin_dir).filter(pred).count()
        b = spark.read.parquet(z_dir).filter(pred).count()
        assert a == b and a > 0


class TestZvalueKDims:
    def test_three_dims_match_python(self, spark):
        from sea_streamer_spark.operators import layout as L

        def py_z(bs, bits=8):
            k = len(bs)
            z = 0
            for i in range(bits):
                for d, b in enumerate(bs):
                    z += ((b >> i) & 1) << (i * k + d)
            return z

        rows = [(i, i % 7, (i * 3) % 11, (i * 5) % 13) for i in range(150)]
        df = spark.createDataFrame(rows, ["id", "a", "b", "c"])
        ba, bb, bc = [2, 4], [3, 6, 9], [1, 5, 8, 12]
        got = {
            r.id: r.z
            for r in df.select(
                "id",
                L.zvalue_expr(
                    L.bucket_expr("a", ba),
                    L.bucket_expr("b", bb),
                    L.bucket_expr("c", bc),
                ).alias("z"),
            ).collect()
        }
        want = {
            i: py_z([py_bucket(a, ba), py_bucket(b, bb), py_bucket(c, bc)])
            for i, a, b, c in rows
        }
        assert got == want

    def test_overflow_guard(self, spark):
        import pytest

        from sea_streamer_spark.operators import layout as L

        with pytest.raises(ValueError):
            L.zvalue_expr(*[F.lit(1)] * 8, bits=8)
