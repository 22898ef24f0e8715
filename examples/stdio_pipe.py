#!/usr/bin/env python
"""stdio pipe processor — read the line protocol from stdin, process, write
it to stdout (the S12/S13 stdio backend as a real pipe; clap/stdio relay
pattern from the reference's stdio crate).

    printf '[2024-01-01T00:00:00 | ticker | 1] hello\\n' | python examples/stdio_pipe.py --upper
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sea_streamer_spark.sources.stdio import format_line, parse_line


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--upper", action="store_true", help="uppercase payloads")
    args = ap.parse_args()

    out_seq: dict[str, int] = {}
    for raw in sys.stdin:
        raw = raw.rstrip("\n")
        if not raw:
            continue
        msg = parse_line(raw)
        payload = msg.payload.upper() if args.upper else msg.payload
        key = msg.stream_key or "broadcast"
        seq = out_seq.get(key, 0)  # per-stream seq assignment (producer.rs:43-151)
        out_seq[key] = seq + 1
        sys.stdout.write(
            format_line(
                payload,
                timestamp=msg.timestamp,
                stream_key=key,
                sequence=seq,
                shard_id=msg.shard_id or 0,
            )
            + "\n"
        )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
