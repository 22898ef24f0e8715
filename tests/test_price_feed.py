"""S20 price-feed example (examples/price-feed/src/main.rs analog): Kraken
wire-format parsing as declarative from_json, heartbeat/ack filtering, and a
live socket-source e2e against an in-process TCP feed."""

from __future__ import annotations

import importlib.util
import os

import pytest


def _mod():
    spec = importlib.util.spec_from_file_location(
        "price_feed",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "examples", "price_feed.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


WIRE = [
    '{"event":"heartbeat"}',
    '[340,["1.25010","1.25040","1700000001.123456","500.0","700.5"],"spread","GBP/USD"]',
    '{"event":"systemStatus","status":"online"}',
    '[340,["1.25020","1.25050","1700000002.5","100.0","50.0"],"spread","GBP/USD"]',
    '[341,["0.92010","0.92040","1700000003.0","10.0","20.0"],"spread","EUR/USD"]',
    'garbage that is not json',
    '[340,"malformed"]',
]


class TestParse:
    def test_parses_spreads_filters_noise(self, spark):
        mod = _mod()
        lines = spark.createDataFrame([(s,) for s in WIRE], "value string")
        rows = mod.parse_spread_lines(lines).orderBy("timestamp").collect()
        assert len(rows) == 3
        assert [r.pair for r in rows] == ["GBP/USD", "GBP/USD", "EUR/USD"]
        assert str(rows[0].bid) == "1.25010000" and str(rows[0].ask) == "1.25040000"
        # micro-precision event time from the wire seconds
        assert rows[0].timestamp.microsecond == 123456
        assert float(rows[1].bid_vol) == 100.0

    def test_envelope_projection(self, spark):
        mod = _mod()
        lines = spark.createDataFrame([(s,) for s in WIRE], "value string")
        env = mod.to_envelope(mod.parse_spread_lines(lines)).collect()
        assert {r.stream_key for r in env} == {"GBP_USD", "EUR_USD"}
        gbp = sorted((r for r in env if r.stream_key == "GBP_USD"), key=lambda r: r.sequence)
        assert [r.sequence for r in gbp] == [1, 2]
        import json

        payload = json.loads(bytes(gbp[0].payload))
        assert payload["bid"] == 1.2501 and payload["ask"] == 1.2504


class TestLiveSocketFeed:
    def test_socket_source_end_to_end(self, spark, tmp_path):
        """The real S20 shape: a live TCP text feed -> socket source ->
        declarative parse -> parquet sink. The feed is an in-process server
        (the loopback role the reference gives stdio)."""
        import socket
        import threading
        import time

        mod = _mod()
        server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        server.bind(("127.0.0.1", 0))
        port = server.getsockname()[1]
        server.listen(1)

        def serve():
            conn, _ = server.accept()
            with conn:
                for line in WIRE:
                    conn.sendall((line + "\n").encode())
                time.sleep(8)  # keep the socket open while the batch drains

        t = threading.Thread(target=serve, daemon=True)
        t.start()

        lines = (
            spark.readStream.format("socket")
            .option("host", "127.0.0.1")
            .option("port", port)
            .load()
        )
        out = str(tmp_path / "spread")
        q = (
            mod.parse_spread_lines(lines)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 30
            n = 0
            while time.time() < deadline:
                try:
                    n = spark.read.parquet(out).count()
                except Exception:
                    n = 0
                if n >= 3:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
            server.close()
        assert n == 3
        got = spark.read.parquet(out)
        assert {r.pair for r in got.collect()} == {"GBP/USD", "EUR/USD"}
