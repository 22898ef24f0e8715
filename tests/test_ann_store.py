"""Persisted IVF-partitioned ANN store (operators/ann_store.py): results
must equal the on-the-fly IVF operator exactly, and the scan plan must
prove directory-level partition pruning — the property that makes nprobe/
n_cells the I/O bound at any table size."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestAnnStore:
    def _setup(self, spark, sf_dir, tmp_path):
        from sea_streamer_spark.operators import ann_store as ST
        from sea_streamer_spark.operators import similarity as S
        from sea_streamer_spark.sources.tables import load_tables

        emb = load_tables(spark, sf_dir, "embeddings").embeddings
        cents = S.ivf_centroids(emb, n_cells=8)
        d = str(tmp_path / "ivf_store")
        ST.write_ivf_store(emb, d, cents)
        return emb, cents, d

    def test_matches_on_the_fly_ivf_exactly(self, spark, sf_dir, tmp_path):
        from sea_streamer_spark.operators import ann_store as ST
        from sea_streamer_spark.operators import similarity as S
        from sea_streamer_spark.sources.tables import load_tables

        emb, cents, d = self._setup(spark, sf_dir, tmp_path)
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        ]
        got = [
            (r.vec_id, round(r.cosine_sim, 12))
            for r in ST.ann_store_topk(
                spark, d, qvec, cents, k=10, nprobe=3, exclude_id=0
            ).collect()
        ]
        want = [
            (r.vec_id, round(r.cosine_sim, 12))
            for r in S.ann_ivf_topk(
                emb, query_id=0, k=10, n_cells=8, nprobe=3, centroids=cents
            ).collect()
        ]
        assert got == want and len(got) == 10

    def test_scan_prunes_partitions(self, spark, sf_dir, tmp_path):
        """The point of the layout: the scan's PartitionFilters carry the
        cell predicate, and the number of scanned files is a strict subset
        of the store."""
        import os

        from sea_streamer_spark.operators import ann_store as ST

        emb, cents, d = self._setup(spark, sf_dir, tmp_path)
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        ]
        df = ST.ann_store_topk(spark, d, qvec, cents, k=5, nprobe=2)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==", 1)[0]
        assert "PartitionFilters" in plan and "ivf_cell" in plan.split(
            "PartitionFilters", 1
        )[1].split("]", 1)[0], plan

        cells_on_disk = {
            e for e in os.listdir(d) if e.startswith("ivf_cell=")
        }
        assert len(cells_on_disk) > 2  # several cells materialized
        # PartitionFilters drive FileSourceScanExec's directory listing:
        # the IN-list must name exactly nprobe cells, strictly fewer than
        # the store holds — the I/O bound, asserted from the plan itself
        # (loud failure if the rendering ever changes)
        import re

        m = re.search(r"PartitionFilters: \[ivf_cell#\d+ IN \(([^)]*)\)\]", plan)
        assert m, f"no ivf_cell IN PartitionFilters in scan plan:\n{plan}"
        probed = {c.strip() for c in m.group(1).split(",")}
        assert len(probed) == 2, probed  # nprobe=2 in this test
        assert len(probed) < len(cells_on_disk), (probed, cells_on_disk)

    def test_all_cells_present_round_trip(self, spark, sf_dir, tmp_path):
        """No vectors lost in the partitioned rewrite."""
        emb, cents, d = self._setup(spark, sf_dir, tmp_path)
        assert spark.read.parquet(d).count() == emb.count()
