#!/usr/bin/env python
"""price-feed — live market-data feed → stream producer
(examples/price-feed/src/main.rs analog, S20).

    python examples/price_feed.py --source host:port --out file:///tmp/spread/

The reference connects to Kraken's websocket spread feed and produces each
`SpreadMessage` to a stream. The Spark-first shape: a live text feed arrives
over a socket (`readStream.format("socket")` — the idiomatic stand-in for a
websocket client, which is a driver-side I/O concern Spark deliberately does
not own), the Kraken wire format is parsed *declaratively* with ``from_json``
(JVM-side, no Python in the hot path), and the envelope is produced to any
stream URI. Heartbeats and subscription acks are filtered exactly like the
reference's match arms (main.rs:80-101).

Kraken wire format (one JSON text per line):

    [channel_id, ["bid","ask","ts","bid_vol","ask_vol"], "spread", "GBP/USD"]
    {"event":"heartbeat"}
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sea_streamer_spark import get_spark

#: SpreadMessage (main.rs:17-35): decimals kept exact, ts at micro precision.
SPREAD_COLUMNS = ("pair", "bid", "ask", "timestamp", "bid_vol", "ask_vol")


def parse_spread_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Kraken spread frames → typed rows; non-data frames (heartbeats, acks,
    anything without the 4-element array shape) are dropped. Pure JVM-side
    ``from_json`` projections — this is the whole "deserialize" stage."""
    return (
        lines.select(F.from_json(F.col(value_col), "array<string>").alias("arr"))
        .select("arr", F.from_json(F.col("arr")[1], "array<string>").alias("sp"))
        .filter(
            (F.size("arr") == 4)
            & (F.col("arr")[2] == "spread")
            & F.col("sp").isNotNull()
            & (F.size("sp") == 5)
        )
        .select(
            F.col("arr")[3].alias("pair"),
            F.col("sp")[0].cast("decimal(18,8)").alias("bid"),
            F.col("sp")[1].cast("decimal(18,8)").alias("ask"),
            F.timestamp_seconds(F.col("sp")[2].cast("double")).alias("timestamp"),
            F.col("sp")[3].cast("decimal(18,8)").alias("bid_vol"),
            F.col("sp")[4].cast("decimal(18,8)").alias("ask_vol"),
        )
    )


def to_envelope(spread: DataFrame) -> DataFrame:
    """SpreadMessage rows → the canonical envelope (batch/replay path):
    stream_key = pair with '/' → '_' (the reference produces to `GBP_USD`,
    main.rs:75-77), per-pair sequence in event-time order, payload =
    canonical JSON of the spread struct."""
    w = Window.partitionBy("pair").orderBy("timestamp")
    return spread.select(
        F.regexp_replace("pair", "/", "_").alias("stream_key"),
        F.lit(0).cast("long").alias("shard_id"),
        F.row_number().over(w).cast("long").alias("sequence"),
        F.col("timestamp"),
        F.encode(
            F.to_json(F.struct("bid", "ask", "timestamp", "bid_vol", "ask_vol")), "utf-8"
        ).alias("payload"),
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help="host:port of the live text feed")
    ap.add_argument("--out", required=True, help="output stream URI (e.g. file:///dir/)")
    args = ap.parse_args()
    spark = get_spark(app_name="price-feed")
    host, _, port = args.source.partition(":")
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", int(port or 9999))
        .load()
    )
    spread = parse_spread_lines(lines)
    from sea_streamer_spark.uri import StreamUrl

    out_dir = StreamUrl.parse(args.out).streamer.nodes[0]
    q = (
        spread.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir.rstrip("/") + "_ck")
        .start()
    )
    q.awaitTermination()


if __name__ == "__main__":
    main()
