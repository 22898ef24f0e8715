#!/usr/bin/env python
"""ss-decode — decode a `.ss` file to log lines or ndjson
(sea-streamer-file/src/bin/decoder.rs:1-157 analog).

    python examples/ss_decode.py <file.ss> [--format log|ndjson] [--limit N]

Pure-python path (no Spark needed) — the same codec the Spark reader uses.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sea_streamer_spark.sources.ss import iter_messages


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("file")
    ap.add_argument("--format", choices=["log", "ndjson"], default="log")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    data = open(args.file, "rb").read()
    for i, m in enumerate(iter_messages(data)):
        if args.limit is not None and i >= args.limit:
            break
        payload = m.payload.decode("utf-8", "replace")
        if args.format == "ndjson":
            print(json.dumps({
                "stream_key": m.stream_key, "shard_id": m.shard_id,
                "sequence": m.sequence, "timestamp_ms": m.timestamp_ms,
                "payload": payload,
            }))
        else:
            print(f"[{m.timestamp_ms} | {m.stream_key} | {m.sequence} | {m.shard_id}] {payload}")


if __name__ == "__main__":
    main()
