#!/usr/bin/env python
"""The canonical processor loop (examples/src/bin/processor.rs analog):
consume from a stream URI, transform each message, produce to another URI.

In the reference this is `consumer.next() -> process() -> producer.send()`;
on Spark the loop IS the micro-batch engine — declare the transform once and
the engine applies it per batch with checkpointed progress.

    python examples/processor.py [input_dir] [output_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

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
    spark = get_spark(app_name="processor-example")
    work = tempfile.mkdtemp(prefix="processor_")
    src = sys.argv[1] if len(sys.argv) > 1 else f"{work}/in"
    dst = sys.argv[2] if len(sys.argv) > 2 else f"{work}/out"

    # seed the input stream from the events table (stands in for a live broker)
    env = envelope_from_events(load_tables(spark, "/root/testdata/sf0.001", "events").events)
    create_producer(spark, f"file://{src}/").send_batch(env.limit(500))

    consumer = create_consumer(
        spark, f"file://{src}/", ConsumerOptions(mode=ConsumerMode.RealTime)
    )
    # process(): uppercase the payload, tag the processing time
    processed = consumer.dataframe().withColumn(
        "payload", F.upper(F.col("payload").cast("string")).cast("binary")
    )
    producer = create_producer(spark, f"file://{dst}/")
    q = producer.send_stream(processed, checkpoint_dir=f"{work}/ckpt")
    q.awaitTermination()
    print(f"processed {spark.read.parquet(dst).count()} messages -> {dst}")
    spark.stop()


if __name__ == "__main__":
    main()
