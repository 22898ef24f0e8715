"""Streaming ordered funnel (streaming/funnel.py): the deepest stage each
user reaches must equal the oracle-checked batch query
``events_funnel_stages`` — including across a checkpointed stop/restart
(the per-user 3-timestamp state must survive and keep settling stages)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _events(spark, sf_dir):
    from sea_streamer_spark.sources.tables import load_tables

    return load_tables(spark, sf_dir, "events").events.select(
        "user_id", "event_type", "ts"
    )


def _batch_reference(spark, sf_dir):
    from sea_streamer_spark.plans.queries import QUERIES

    return {
        r.user_id: r.funnel_stage
        for r in QUERIES["events_funnel_stages"].fn(spark, sf_dir).collect()
    }


class TestStreamingFunnel:
    def test_matches_batch_query_across_restart(self, spark, sf_dir, tmp_path):
        from sea_streamer_spark.streaming.funnel import streaming_funnel

        ev = _events(spark, sf_dir).cache()
        # event-time split: phase 1 gets the first 60% of time — the
        # in-order-per-user input contract holds across the phases
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        split = lo + (hi - lo) * 6 // 10

        in_dir, ckpt, out = (
            str(tmp_path / "in"),
            str(tmp_path / "ck"),
            str(tmp_path / "out"),
        )
        ev.filter(F.col("ts") < split).coalesce(1).write.mode("overwrite").parquet(
            in_dir
        )
        schema = ev.schema

        def run():
            src = spark.readStream.schema(schema).parquet(in_dir)
            q = (
                streaming_funnel(src)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

        run()
        ev.filter(F.col("ts") >= split).coalesce(1).write.mode("append").parquet(
            in_dir
        )
        run()

        got_rows = spark.read.parquet(out).collect()
        # deepest stage per user from the emitted advances
        deepest: dict[int, int] = {}
        for r in got_rows:
            deepest[r.user_id] = max(deepest.get(r.user_id, 0), r.funnel_stage)
        want = _batch_reference(spark, sf_dir)
        want_nonzero = {u: s for u, s in want.items() if s > 0}
        assert deepest == want_nonzero
        # stage advances are strictly increasing per user (1,2,3 at most once)
        from collections import Counter

        per_user = Counter((r.user_id, r.funnel_stage) for r in got_rows)
        assert all(c == 1 for c in per_user.values())

    def test_engineered_order_semantics(self, spark, tmp_path):
        """purchase before click must NOT advance; later purchase must."""
        import datetime as dt

        from sea_streamer_spark.streaming.funnel import streaming_funnel

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, "view", 0), (1, "purchase", 2), (1, "click", 4), (1, "purchase", 6),
            (2, "click", 0), (2, "purchase", 1),  # never views -> no emits
        ]
        df = spark.createDataFrame(
            [
                (u, ty, t0 + dt.timedelta(minutes=m))
                for u, ty, m in rows
            ],
            "user_id long, event_type string, ts timestamp",
        )
        in_dir, ckpt, out = (
            str(tmp_path / "in"),
            str(tmp_path / "ck"),
            str(tmp_path / "out"),
        )
        df.coalesce(1).write.parquet(in_dir)
        src = spark.readStream.schema(df.schema).parquet(in_dir)
        q = (
            streaming_funnel(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = sorted(
            (r.user_id, r.funnel_stage) for r in spark.read.parquet(out).collect()
        )
        assert got == [(1, 1), (1, 2), (1, 3)]
