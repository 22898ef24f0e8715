#!/usr/bin/env python
"""relay — copy a stream from one URI to another (socket/src/bin/relay.rs
analog; usage socket/src/lib.rs:14-50).

    python examples/relay.py <input-uri> <output-uri> [--offset start|end|<ISO-ts>]

e.g.  python examples/relay.py file:///tmp/in/ file:///tmp/out/ --offset start
"""

import argparse
import os
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sea_streamer_spark import (
    ConsumerOptions,
    create_consumer,
    create_producer,
    get_spark,
)
from sea_streamer_spark.streaming.consumer import Beginning, End


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--offset", default="start", help="start | end | ISO timestamp")
    args = ap.parse_args()

    spark = get_spark(app_name="relay")
    consumer = create_consumer(spark, args.input, ConsumerOptions())
    if args.offset == "start":
        consumer = consumer.rewind(Beginning)
    elif args.offset == "end":
        consumer = consumer.rewind(End)
    else:
        consumer = consumer.seek(datetime.fromisoformat(args.offset))

    producer = create_producer(spark, args.output)
    ckpt = tempfile.mkdtemp(prefix="relay_ckpt_")
    q = producer.send_stream(consumer.dataframe(), checkpoint_dir=ckpt)
    q.awaitTermination()
    print(f"relayed {args.input} -> {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
