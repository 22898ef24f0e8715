"""Distributed parquet-footer manifest (operators/manifest.py): stats must
match a driver-side pyarrow crawl exactly, pruning decisions must be sound
(never skip a row group that holds matching rows) and effective on a
z-ordered layout, and the scan must stay executor-side."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _driver_crawl(d: str, cols: list[str]):
    import pyarrow.parquet as pq

    rows = set()
    for f in sorted(os.listdir(d)):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(d, f)
        md = pq.ParquetFile(p).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for c in cols:
                st = rg.column(idx[c]).statistics
                rows.add((p, g, rg.num_rows, c, str(st.min), str(st.max), st.null_count))
    return rows


class TestFileManifest:
    def test_matches_driver_side_pyarrow(self, spark, sf_dir, tmp_path):
        from sea_streamer_spark.operators.manifest import file_manifest
        from sea_streamer_spark.sources.tables import load_tables

        d = str(tmp_path / "t")
        ev = load_tables(spark, sf_dir, "events").events.withColumn(
            "ts_us", F.unix_micros(F.col("ts"))
        ).select("event_id", "user_id", "ts_us")
        ev.repartition(4).write.mode("overwrite").option(
            "maxRecordsPerFile", 100
        ).parquet(d)

        got = {
            (r.file, r.row_group, r.n_rows, r.column, r.min_val, r.max_val, r.n_nulls)
            for r in file_manifest(spark, d, ["user_id", "ts_us"]).collect()
        }
        assert got == _driver_crawl(d, ["user_id", "ts_us"])
        assert len(got) > 8  # several files x 2 columns

    def test_pruning_is_sound_and_effective_on_zorder(self, spark, sf_dir, tmp_path):
        """Soundness: every row group containing matching rows survives
        pruning (verified row-by-row). Effectiveness: on a z-ordered
        layout the box query prunes a meaningful fraction."""
        from sea_streamer_spark.operators import layout as L
        from sea_streamer_spark.operators.manifest import file_manifest, pruned_files
        from sea_streamer_spark.sources.tables import load_tables

        d = str(tmp_path / "z")
        ev = load_tables(spark, sf_dir, "events").events.withColumn(
            "ts_us", F.unix_micros(F.col("ts"))
        ).select("event_id", "user_id", "ts_us")
        bu = L.quantile_boundaries(ev, "user_id")
        bt = L.quantile_boundaries(ev, "ts_us")
        n = ev.count()
        (
            L.zorder_by(ev, [("user_id", bu), ("ts_us", bt)], n_files=16)
            .write.mode("overwrite")
            .option("parquet.block.size", 16 * 1024)
            .option("maxRecordsPerFile", max(n // 64, 1))
            .parquet(d)
        )
        u_lo, u_hi = ev.approxQuantile("user_id", [0.4, 0.5], 0.0)
        t_lo, t_hi = ev.approxQuantile("ts_us", [0.4, 0.5], 0.0)

        man = file_manifest(spark, d, ["user_id", "ts_us"]).cache()
        kept = {
            (r.file, r.row_group)
            for r in pruned_files(
                man, {"user_id": (u_lo, u_hi), "ts_us": (t_lo, t_hi)}
            ).collect()
        }
        total = man.select("file", "row_group").distinct().count()
        assert 0 < len(kept) < total, (len(kept), total)

        # soundness: recompute which groups ACTUALLY hold matching rows
        import pyarrow.parquet as pq

        must_keep = set()
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(d, f)
            pf = pq.ParquetFile(p)
            for g in range(pf.metadata.num_row_groups):
                t = pf.read_row_group(g, columns=["user_id", "ts_us"]).to_pandas()
                hit = (
                    (t.user_id >= u_lo) & (t.user_id <= u_hi)
                    & (t.ts_us >= t_lo) & (t.ts_us <= t_hi)
                ).any()
                if hit:
                    must_keep.add((p, g))
        assert must_keep <= kept, must_keep - kept
        man.unpersist()

    def test_scan_is_executor_side(self, spark, sf_dir, tmp_path):
        """The footer parse runs inside mapInPandas (ArrowEvalPython /
        MapInPandas node), not as a driver loop — the plan proves it."""
        from sea_streamer_spark.operators.manifest import file_manifest
        from sea_streamer_spark.sources.tables import load_tables

        d = str(tmp_path / "p")
        load_tables(spark, sf_dir, "events").events.select("event_id").limit(
            100
        ).write.mode("overwrite").parquet(d)
        df = file_manifest(spark, d, ["event_id"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan, plan


class TestManifestSoundnessEdges:
    def test_statless_row_groups_are_always_kept(self, spark, tmp_path):
        """Files written WITHOUT column statistics cannot be pruned — the
        manifest must keep them for every range (the soundness contract),
        with NULL min/max rather than bogus canonical strings."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sea_streamer_spark.operators.manifest import file_manifest, pruned_files

        d = str(tmp_path / "nostats")
        os.makedirs(d)
        t = pa.table({"x": list(range(100)), "y": [float(i) for i in range(100)]})
        pq.write_table(t, os.path.join(d, "a.parquet"), write_statistics=False)
        pq.write_table(t, os.path.join(d, "b.parquet"))  # stats on

        man = file_manifest(spark, d, ["x"]).cache()
        rows = {r.file: r for r in man.collect()}
        a = [r for f, r in rows.items() if f.endswith("a.parquet")][0]
        b = [r for f, r in rows.items() if f.endswith("b.parquet")][0]
        assert a.min_val is None and a.max_val is None
        assert b.min_val == "0" and b.max_val == "99"

        # a disjoint range prunes ONLY the stats-bearing file
        kept = {
            r.file for r in pruned_files(man, {"x": (1000, 2000)}).collect()
        }
        assert any(f.endswith("a.parquet") for f in kept)
        assert not any(f.endswith("b.parquet") for f in kept)
        man.unpersist()

    def test_all_null_group_reports_null_bounds(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sea_streamer_spark.operators.manifest import file_manifest

        d = str(tmp_path / "allnull")
        os.makedirs(d)
        t = pa.table({"x": pa.array([None, None, None], type=pa.int64())})
        pq.write_table(t, os.path.join(d, "n.parquet"))
        r = file_manifest(spark, d, ["x"]).collect()[0]
        assert r.min_val is None and r.max_val is None
        assert r.n_nulls == 3
