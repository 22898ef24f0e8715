"""Streaming trailing z-score (streaming/anomaly.py,
transformWithStateInPandas): row-for-row parity with the oracle-checked
batch query, INCLUDING across a checkpointed stop/restart — the state
(last 24 hourly counts per key) must survive and keep producing the exact
batch-equal scores for the second phase."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _hourly(spark, sf_dir):
    from sea_streamer_spark.sources.tables import load_tables

    ev = load_tables(spark, sf_dir, "events").events
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("wd"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select("event_type", F.col("wd.start").alias("window_start"), "c")
    )


def _batch_reference(spark, sf_dir):
    from sea_streamer_spark.plans.queries import QUERIES

    return {
        (r.event_type, r.window_start): (r.c, r.z_micro)
        for r in QUERIES["events_anomaly_zscore"].fn(spark, sf_dir).collect()
    }


class TestStreamingZscore:
    def test_matches_batch_query_across_restart(self, spark, sf_dir, tmp_path):
        from sea_streamer_spark.streaming.anomaly import (
            streaming_zscore,
            streaming_zscore_legacy,
            transform_with_state_available,
        )

        use_modern = transform_with_state_available()
        wire = streaming_zscore if use_modern else streaming_zscore_legacy

        hourly = _hourly(spark, sf_dir).cache()
        # split point: 70% of distinct hours go to phase 1
        hours = sorted(
            r.window_start
            for r in hourly.select("window_start").distinct().collect()
        )
        split = hours[int(len(hours) * 0.7)]

        in_dir, ckpt, out = (
            str(tmp_path / "in"),
            str(tmp_path / "ck"),
            str(tmp_path / "out"),
        )
        hourly.filter(F.col("window_start") < split).coalesce(1).write.mode(
            "overwrite"
        ).parquet(in_dir)

        old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        if use_modern:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
        try:
            schema = hourly.schema

            def run(out_dir):
                src = spark.readStream.schema(schema).parquet(in_dir)
                q = (
                    wire(src)
                    .writeStream.format("parquet")
                    .option("path", out_dir)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(300)

            run(out)
            # phase 2: append the remaining hours as a NEW file, restart
            # from the same checkpoint — state must carry over (same output
            # dir: the file sink's metadata log is per-path and continuous)
            hourly.filter(F.col("window_start") >= split).coalesce(1).write.mode(
                "append"
            ).parquet(in_dir)
            run(out)
        finally:
            if use_modern:
                if old is None:
                    spark.conf.unset(
                        "spark.sql.streaming.stateStore.providerClass"
                    )
                else:
                    spark.conf.set(
                        "spark.sql.streaming.stateStore.providerClass", old
                    )

        got = {
            (r.event_type, r.window_start): (r.c, r.z_micro)
            for r in spark.read.parquet(out).collect()
        }

        want = _batch_reference(spark, sf_dir)
        assert want, "batch reference must be non-empty"
        assert got == want
        # the restart phase specifically must have produced rows from
        # carried-over state (phase-2 hours scored against phase-1 history)
        phase2 = {k for k in got if k[1] >= split}
        assert phase2, "no phase-2 emissions — state did not survive restart"
        hourly.unpersist()

    def test_modern_api_guard_is_honest(self, spark):
        """Where google.protobuf is absent, the transformWithStateInPandas
        wrapper must raise a clear ImportError pointing at the fallback —
        not crash mid-query in the state server."""
        from sea_streamer_spark.streaming import anomaly as A

        if A.transform_with_state_available():
            pytest.skip("protobuf present — modern path exercised elsewhere")
        src = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .selectExpr(
                "'t' AS event_type", "timestamp AS window_start", "value AS c"
            )
        )
        with pytest.raises(ImportError, match="streaming_zscore_legacy"):
            A.streaming_zscore(src)
