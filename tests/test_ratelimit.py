"""Streaming token-bucket rate limiter (streaming/ratelimit.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sea_streamer_spark.streaming.ratelimit import rate_limit_py, streaming_rate_limit


class TestRateLimitReference:
    def test_burst_then_throttle(self):
        # 15 events in the same second, burst 10, 60/h
        us = [i for i in range(15)]
        got = rate_limit_py(us, rate_per_hour=60, burst=10)
        assert got == [True] * 10 + [False] * 5

    def test_refill_after_a_minute(self):
        # drain the burst, wait one minute (60/h = 1/min), one more admits
        us = [0] * 10 + [60 * 1_000_000 * 60]
        got = rate_limit_py(us, rate_per_hour=60, burst=10)
        assert got == [True] * 10 + [True]

    def test_sustained_rate_respected(self):
        # one event every 30s at 60/h: every second event rejected once
        # the burst is spent
        us = [i * 30_000_000 for i in range(40)]
        got = rate_limit_py(us, rate_per_hour=60, burst=1)
        admitted = sum(got)
        # 40 events over 19.5 min at 60/h -> ~20 admits (+1 initial burst)
        assert 19 <= admitted <= 21


class TestStreamingRateLimit:
    def _run(self, spark, df, tmp_path, **kw):
        in_dir, ckpt, out = (
            str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out"),
        )
        df.coalesce(1).write.mode("append").parquet(in_dir)
        src = spark.readStream.schema(df.schema).parquet(in_dir)
        q = (
            streaming_rate_limit(src, "source", **kw)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(out)

    def test_matches_python_reference_per_key(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for k, n, step_s in (("a", 30, 10), ("b", 20, 120)):
            rows += [
                (k, t0 + dt.timedelta(seconds=i * step_s)) for i in range(n)
            ]
        df = spark.createDataFrame(rows, "source string, ts timestamp")
        out = self._run(spark, df, tmp_path, rate_per_hour=60, burst=5)
        got = {
            k: [r.admitted for r in sorted(rs, key=lambda r: r.ts)]
            for k, rs in (
                ("a", [r for r in out.collect() if r.key == "a"]),
                ("b", [r for r in out.collect() if r.key == "b"]),
            )
        }
        for k, n, step_s in (("a", 30, 10), ("b", 20, 120)):
            us = [
                int((t0 + dt.timedelta(seconds=i * step_s)).timestamp() * 1e6)
                for i in range(n)
            ]
            assert got[k] == rate_limit_py(us, 60, 5), k

    def test_state_survives_restart(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1)
        phase1 = spark.createDataFrame(
            [("a", t0 + dt.timedelta(seconds=i)) for i in range(8)],
            "source string, ts timestamp",
        )
        out = self._run(spark, phase1, tmp_path, rate_per_hour=60, burst=5)
        assert sum(1 for r in out.collect() if r.admitted) == 5
        # phase 2 right after: bucket still (nearly) empty — zero admits
        phase2 = spark.createDataFrame(
            [("a", t0 + dt.timedelta(seconds=8 + i)) for i in range(3)],
            "source string, ts timestamp",
        )
        out = self._run(spark, phase2, tmp_path, rate_per_hour=60, burst=5)
        admitted = [r for r in out.collect() if r.admitted]
        assert len(admitted) == 5  # no new admits across the restart
