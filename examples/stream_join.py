#!/usr/bin/env python
"""fuse StreamJoin (sea-streamer-fuse analog): merge N keyed streams in
event-time order, with align-gating — a slow stream holds back fast ones.

Batch replay uses the windowed merge; the stateful streaming variant
(`stream_join_stateful`) runs the same gate incrementally per micro-batch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from pyspark.sql import functions as F

from sea_streamer_spark import envelope_from_events, get_spark
from sea_streamer_spark.operators.fuse import mux, stream_join
from sea_streamer_spark.sources.tables import load_tables


def main() -> None:
    spark = get_spark(app_name="stream-join-example")
    env = envelope_from_events(load_tables(spark, "/root/testdata/sf0.001", "events").events)
    streams = [env.filter(F.col("stream_key") == k) for k in ("click", "view", "error")]
    # default scope="sharded": per-shard merge order, fully parallel — the
    # 100 TB path; pass scope="global" to serialize into one total order.
    merged = stream_join(mux(*streams), align=["click", "view"])
    merged.select("emit_index", "timestamp", "stream_key", "sequence").show(10)
    print(f"merged {merged.count()} messages in event-time order (gated on click+view)")
    spark.stop()


if __name__ == "__main__":
    main()
