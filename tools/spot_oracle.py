#!/usr/bin/env python
"""Targeted strict oracle spot-check for named queries (the per-edit
protocol of the optimization rounds; the full sweep at round end stays
the authority).

Usage: python tools/spot_oracle.py <query> [query ...] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sea_streamer_spark.plans.queries import QUERIES  # noqa: E402
from sea_streamer_spark.session import get_spark  # noqa: E402
from tests.oracle import check_query  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[-1]):
        sf_dir = args.pop()
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = get_spark(app_name="spot-oracle")
    failed = []
    for name in args:
        t0 = time.perf_counter()
        try:
            rows = check_query(spark, name, sf_dir)
            print(f"PASS {name} rows={rows} ({time.perf_counter()-t0:.2f}s)",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: {exc}", flush=True)
            traceback.print_exc()
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
