#!/usr/bin/env python
"""Dump raw ``.explain('formatted')`` output for the round-13 optimization
targets into plans/r13/<query>_<tag>.txt.

Usage: python tools/explain_r13.py <before|after> <query ...>

Same contract as tools/explain_r12.py (verbatim formatted plans cited by
the optimization journal); queries whose function body runs driver-side
actions still execute them here — their final plan is a LocalTableScan
and the journal records the job-count evidence instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sea_streamer_spark.plans.queries import QUERIES  # noqa: E402
from sea_streamer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-r13")
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered")
            continue
        try:
            df = QUERIES[name].fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
