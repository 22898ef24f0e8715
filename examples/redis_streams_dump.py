#!/usr/bin/env python
"""redis-streams-dump — dump a Redis stream to a `.ss` container file
(sea-streamer-redis/redis-streams-dump/src/main.rs analog).

    python examples/redis_streams_dump.py --stream redis://localhost/hello \
        --output /tmp/hello.ss [--since "2024-01-01 00:00:00"] \
        [--until "2024-02-01 00:00:00"] [--format ss|parquet]

Spark-first shape: the bounded scan runs through the registered ``sea_redis``
batch DataSource (one task per shard), the ``since``/``until`` bounds are
*pushed into the XRANGE itself* as packed-MessageId min/max (the reference
instead seeks then polls until a too-late message arrives), and the `.ss`
container write reuses the S9 sink. ``redis+fake:///dir/stream`` runs the
identical path against the file-backed loopback broker.

Bound semantics match the reference: ``since`` is timestamp-exclusive (it
calls ``consumer.seek(since)``, T1), ``until`` inclusive (it breaks on the
first message strictly later).
"""

import argparse
import os
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sea_streamer_spark import get_spark
from sea_streamer_spark.streaming.redis import MAX_SEQ16, pack_message_id
from sea_streamer_spark.uri import StreamUrl, reader_config


def parse_timestamp(s: str) -> datetime:
    """types/src/stream.rs:13-14 display format: 'YYYY-mm-dd HH:MM:SS[.fff]'."""
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S"):
        try:
            return datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    raise ValueError(f"unparseable timestamp: {s!r}")


def dump(spark, stream: str, output: str, since: str | None = None,
         until: str | None = None, fmt: str = "ss") -> int:
    from sea_streamer_spark.sources.redis_datasource import SeaRedisDataSource

    spark.dataSource.register(SeaRedisDataSource)
    url = StreamUrl.parse(stream)
    source_fmt, opts = reader_config(url)
    reader = spark.read.format(source_fmt)
    for k, v in opts.items():
        reader = reader.option(k, v)
    if since is not None:
        ms = int(parse_timestamp(since).timestamp() * 1000)
        # ts-exclusive (T1): strictly after the given millisecond
        reader = reader.option("min_seq", str(pack_message_id(ms + 1, 0)))
    if until is not None:
        ms = int(parse_timestamp(until).timestamp() * 1000)
        reader = reader.option("max_seq", str(pack_message_id(ms, MAX_SEQ16)))
    df = reader.load()
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(output)
        return spark.read.parquet(output).count()
    from sea_streamer_spark.sources.ss import write_ss

    return write_ss(df, output)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stream", required=True, help="streamer URI with stream key")
    ap.add_argument("--output", required=True, help="output file (overwritten)")
    ap.add_argument("--since", help="timestamp start of range (exclusive)")
    ap.add_argument("--until", help="timestamp end of range (inclusive)")
    ap.add_argument("--format", choices=("ss", "parquet"), default="ss")
    args = ap.parse_args()
    spark = get_spark(app_name="redis-streams-dump")
    n = dump(spark, args.stream, args.output, args.since, args.until, args.format)
    print(f"Written {n} messages to {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
