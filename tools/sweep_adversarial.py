#!/usr/bin/env python
"""Adversarial-parallelism sweep (the r5 discipline): re-run EVERY
oracle-backed registered query at local[5] with 7 shuffle partitions —
prime counts chosen to misalign with every layout used in development
(tests run local[4]/8, sweeps local[4]/8, the driver local[32]) — and
strict-compare against DuckDB. A query whose result depends on partition
count or intra-partition order hash-mismatches here.

Usage: python tools/sweep_adversarial.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    from pyspark.sql import SparkSession

    from sea_streamer_spark.plans.queries import QUERIES
    from sea_streamer_spark.session import RUNTIME_CONFS, prepare
    from tests.oracle import check_query

    builder = (
        SparkSession.builder.appName("adversarial-sweep")
        .master("local[5]")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = prepare(builder.getOrCreate())

    names = [n for n, qd in QUERIES.items() if qd.oracle is not None]
    failed: list[str] = []
    t_all = time.time()
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            rows = check_query(spark, name, SF_DIR)
            print(f"[{i}/{len(names)}] PASS {name} rows={rows} "
                  f"({time.time() - t0:.2f}s)", flush=True)
        except Exception:
            failed.append(name)
            print(f"[{i}/{len(names)}] FAIL {name}", flush=True)
            traceback.print_exc()
    print(f"TOTAL {len(names)} queries, {len(failed)} failed, "
          f"{time.time() - t_all:.1f}s")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
