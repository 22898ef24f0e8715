#!/usr/bin/env python
"""Resumable consumer (examples/src/bin/resumable.rs analog): a consumer
group that picks up exactly where it left off across restarts.

The reference implements this with Redis XGROUP commits / Kafka offsets; on
Spark the checkpoint directory IS the consumer group (D2): run this script
twice — the second run consumes only messages produced after the first.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import tempfile

from sea_streamer_spark import (
    ConsumerMode,
    ConsumerOptions,
    create_consumer,
    create_producer,
    envelope_from_events,
    get_spark,
)
from sea_streamer_spark.sources.tables import load_tables


def main() -> None:
    spark = get_spark(app_name="resumable-example")
    work = tempfile.mkdtemp(prefix="resumable_")
    stream, sink, ckpt = f"{work}/stream", f"{work}/sink", f"{work}/ckpt"

    env = envelope_from_events(load_tables(spark, "/root/testdata/sf0.001", "events").events)
    producer = create_producer(spark, f"file://{stream}/")

    # first run: 300 messages
    producer.send_batch(env.limit(300))
    consumer = create_consumer(
        spark,
        f"file://{stream}/",
        ConsumerOptions(mode=ConsumerMode.Resumable, checkpoint_dir=ckpt),
    )
    consumer.start_to_parquet(sink)
    n1 = spark.read.parquet(sink).count()

    # "restart": same group (checkpoint); 200 more messages arrive
    producer.send_batch(env.limit(500).subtract(env.limit(300)))
    consumer.start_to_parquet(sink)
    n2 = spark.read.parquet(sink).count()

    print(f"first run consumed {n1}; after resume total {n2} (no redelivery)")
    assert n2 == 500, n2
    spark.stop()


if __name__ == "__main__":
    main()
