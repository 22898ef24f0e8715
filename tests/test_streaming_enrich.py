"""Stream-static enrichment (streaming/enrich.py): per-batch dimension
refresh semantics — micro-batch N sees the dimension as of its own
processing time, proven by swapping the dim between two availableNow runs
over one checkpointed query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sea_streamer_spark.streaming.enrich import enriching_foreach_batch


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "dim": str(tmp_path / "dim"),
        "out": str(tmp_path / "out"),
        "ck": str(tmp_path / "ck"),
    }


def _write_dim(spark, path, version: str):
    spark.createDataFrame(
        [(i, f"{version}-user{i}") for i in range(10)], "user_id long, tag string"
    ).write.mode("overwrite").parquet(path)


def _write_events(spark, path, ids, mode="append"):
    spark.createDataFrame(
        [(i, i % 10) for i in ids], "event_id long, user_id long"
    ).write.mode(mode).parquet(path)


class TestStreamStaticEnrichment:
    def test_dim_updates_visible_to_later_batches(self, spark, dirs):
        _write_events(spark, dirs["src"], range(20), mode="overwrite")
        _write_dim(spark, dirs["dim"], "v1")

        sink = enriching_foreach_batch(
            lambda s: s.read.parquet(dirs["dim"]),
            "user_id",
            lambda df, bid: df.withColumn("batch", F.lit(bid))
            .write.mode("append")
            .parquet(dirs["out"]),
        )

        def run():
            q = (
                spark.readStream.schema("event_id long, user_id long")
                .parquet(dirs["src"])
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", dirs["ck"])
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run()
        out1 = spark.read.parquet(dirs["out"])
        assert out1.count() == 20
        assert {r["tag"][:2] for r in out1.collect()} == {"v1"}

        # atomic-ish dim swap between runs + new source data
        _write_dim(spark, dirs["dim"], "v2")
        _write_events(spark, dirs["src"], range(20, 30))
        run()
        out2 = spark.read.parquet(dirs["out"])
        assert out2.count() == 30
        new_rows = out2.filter(F.col("event_id") >= 20).collect()
        assert new_rows and all(r["tag"].startswith("v2") for r in new_rows)
        # first batch's rows are untouched history (still v1)
        old_rows = out2.filter(F.col("event_id") < 20).collect()
        assert all(r["tag"].startswith("v1") for r in old_rows)

    def test_left_join_keeps_unmatched_stream_rows(self, spark, dirs):
        _write_events(spark, dirs["src"], range(5), mode="overwrite")
        # dim covers only user_id 0-2
        spark.createDataFrame(
            [(i, f"u{i}") for i in range(3)], "user_id long, tag string"
        ).write.parquet(dirs["dim"])

        sink = enriching_foreach_batch(
            lambda s: s.read.parquet(dirs["dim"]),
            "user_id",
            lambda df, bid: df.write.mode("append").parquet(dirs["out"]),
        )
        q = (
            spark.readStream.schema("event_id long, user_id long")
            .parquet(dirs["src"])
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", dirs["ck"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.read.parquet(dirs["out"]).collect()
        assert len(out) == 5
        tags = {r["user_id"]: r["tag"] for r in out}
        assert tags[0] == "u0" and tags[3] is None and tags[4] is None

    def test_per_batch_join_broadcasts_dim(self, spark, dirs):
        # the enriched batch's plan must carry a broadcast join, not an SMJ
        _write_events(spark, dirs["src"], range(5), mode="overwrite")
        _write_dim(spark, dirs["dim"], "v1")
        plans: list[str] = []

        sink = enriching_foreach_batch(
            lambda s: s.read.parquet(dirs["dim"]),
            "user_id",
            lambda df, bid: plans.append(
                df._jdf.queryExecution().executedPlan().toString()
            ),
        )
        q = (
            spark.readStream.schema("event_id long, user_id long")
            .parquet(dirs["src"])
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", dirs["ck"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert plans and "BroadcastHashJoin" in plans[0], plans[0][:2000]
        assert "SortMergeJoin" not in plans[0]
