#!/usr/bin/env python3
"""Cross-backend pipeline over a REAL socket: RESP server → redis:// source
→ `.ss` container sink → pure-python decode.

Demonstrates the round-3 wire layer end-to-end without redis-py or a Redis
install: a RESP2 TCP listener (streaming/resp_server.py) fronts the broker
model, the pipelined sink XADDs an envelope batch over the socket from
executors, the registered ``sea_redis`` DataSource reads it back with
host/port options (each task opens its own connection through the in-repo
RESP client — the identical path a redis:// deployment without redis-py
runs), and the result lands in a seekable `.ss` container that the
stdlib-only decoder prints. Swap host/port for a real Redis and nothing
changes — RESP2 is the real protocol.

    python examples/redis_wire_pipeline.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from sea_streamer_spark.model import envelope_from_events
    from sea_streamer_spark.session import get_spark
    from sea_streamer_spark.sources.redis_datasource import SeaRedisDataSource
    from sea_streamer_spark.sources.ss import read_ss, write_ss_dir
    from sea_streamer_spark.sources.tables import load_tables
    from sea_streamer_spark.streaming.fake_redis import FakeRedis
    from sea_streamer_spark.streaming.redis import redis_sink_foreach_batch
    from sea_streamer_spark.streaming.resp_server import RespServer
    from sea_streamer_spark.uri import StreamUrl

    spark = get_spark(app_name="redis-wire-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    srv = RespServer(FakeRedis())
    host, port = srv.serve_background()
    print(f"RESP listener on {host}:{port}")

    # 1) produce: executor-side pipelined XADDs over TCP
    env = envelope_from_events(
        load_tables(spark, "/root/testdata/sf0.001", "events").events
    ).filter(F.col("stream_key") == "purchase")
    n = env.count()
    write = redis_sink_foreach_batch(url=StreamUrl.parse(f"redis://{host}:{port}/purchase"))
    write(env, 0)
    print(f"produced {n} messages over the wire")

    # 2) consume via the registered DataSource (one socket per task) and
    #    land in a seekable .ss container directory
    spark.dataSource.register(SeaRedisDataSource)
    got = (
        spark.read.format("sea_redis")
        .option("stream_key", "purchase")
        .option("host", host)
        .option("port", str(port))
        .load()
    )
    out = os.path.join(tempfile.mkdtemp(prefix="wire_pipeline_"), "purchase_ss")
    write_ss_dir(got, out, num_files=2)
    back = read_ss(spark, out)
    m = back.count()
    print(f"relayed {m} messages redis://{host}:{port} -> {out}")
    assert m == n, (m, n)

    # 3) peek with the pure-python decoder path (first container file)
    sample = back.orderBy("sequence").limit(3).collect()
    for r in sample:
        print(f"  [{r.timestamp} | {r.stream_key} | {r.sequence} | {r.shard_id}]")

    shutil.rmtree(os.path.dirname(out), ignore_errors=True)
    srv.shutdown()
    print("wire pipeline OK")


if __name__ == "__main__":
    main()
