#!/usr/bin/env python
"""Dump raw ``.explain('formatted')`` output for the round-12 optimization
targets into plans/r12/<query>_<tag>.txt.

Usage: python tools/explain_r12.py <before|after> [query ...]

Unlike tools/dump_plans.py (canonicalized snapshots for churn tracking),
this writes the verbatim formatted plan the optimization journal cites.
Queries whose function body runs driver-side actions (the eval truth
sides) still execute them here; their *final* plan is a LocalTableScan —
for those the interesting evidence is the job count, which the journal
records separately.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sea_streamer_spark.plans.queries import QUERIES  # noqa: E402
from sea_streamer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_TARGETS = [
    "dedup_minhash_lsh",
    "q18_large_orders",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "similarity_cosine_topk",
    "text_fingerprint",
    "text_token_stats",
    "window_tumbling_1h",
    "dedup_semantic_recall_eval",
    "dedup_semantic_recall_planted",
    "dedup_semantic_cell_sweep",
    "dedup_semantic_cluster",
    "dedup_semantic_cluster_scaled",
    "curation_submodular_coverage",
    "graph_pagerank_convergence",
    "curation_e2e_pipeline",
    "curation_dedup_order_sensitivity",
    "dedup_prefix_filter_eval",
    "dedup_winnowing_pairs",
    "dedup_winnowing_recall_eval",
    "sketch_cms_error_eval",
    "dedup_cdc_chunking",
    "graph_adamic_adar_hubcapped",
    "graph_neardup_pagerank",
    "graph_degree_assortativity",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_TARGETS
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-r12")
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
