#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via a count-collect (no driver-side result
transfer beyond the count) after a warm-up of the input file listing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sea_streamer_spark.plans.queries import QUERIES  # noqa: E402
from sea_streamer_spark.session import get_spark  # noqa: E402
from sea_streamer_spark.streaming.relay import benchmark_relay  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline queries (tag 'bench') — the scan/join/agg/window/LLM-ops mix.
BENCH_QUERIES = [name for name, qd in sorted(QUERIES.items()) if "bench" in qd.tags]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = get_spark(app_name="sea-streamer-spark-bench")
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name].fn
        # warm-up once (JIT/codegen/file listing), then best of 2 measured
        # runs (the steady-state number, robust to GC/compaction noise)
        fn(spark, SF_DIR).count()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    # Streaming throughput: the reference's 100k x 256 B produce/relay/consume
    # workload (benchmark/README.md:8-25) over the file backend; its 100k
    # msgs/sec anchor (README.md:266) implies ~1 s per phase.
    import tempfile

    with tempfile.TemporaryDirectory(prefix="ss_relay_warm_") as td:
        benchmark_relay(spark, td, n=2000)  # warm the streaming machinery
    with tempfile.TemporaryDirectory(prefix="ss_relay_bench_") as td:
        for phase, sec in benchmark_relay(spark, td).items():
            timings[phase] = round(sec, 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # non-headline pinned metrics — NOT in the total, so the
                # headline number stays comparable round-over-round
                "scale": scale_dedup_metric(spark),
                "new_ops": new_ops_metric(spark),
            }
        )
    )
    spark.stop()


def scale_dedup_metric(spark) -> dict:
    """Pinned 100k-doc dedup scale run (re-measured every round so the
    linearity claim in PLANS.md stays a measurement, not a memory):
    replicate the SF's documents into token-disjoint namespaces up to
    ~100k docs, run the full MinHash-LSH pipeline, and report wall time
    plus the pairs-per-replica ratio — banding must not produce
    cross-replica candidates, so pairs == base_pairs * k exactly."""
    from pyspark.sql import functions as F

    from sea_streamer_spark.operators.dedup import minhash_lsh_dedup
    from sea_streamer_spark.sources.tables import load_tables

    docs = load_tables(spark, SF_DIR, "documents").documents
    n_base = docs.count()
    k = max(1, 100_000 // max(n_base, 1))
    reps = spark.range(k).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
        F.regexp_replace("text", r"(\S+)", F.concat(F.lit("$1r"), F.col("rep"))).alias(
            "text"
        ),
    )
    base_pairs = minhash_lsh_dedup(docs, threshold=0.5).count()
    t0 = time.perf_counter()
    pairs = minhash_lsh_dedup(big, threshold=0.5).count()
    dt = time.perf_counter() - t0
    return {
        "dedup_minhash_lsh_scale_sec": round(dt, 4),
        "n_docs": n_base * k,
        "replicas": k,
        "pairs": pairs,
        "base_pairs": base_pairs,
        "linear": bool(pairs == base_pairs * k),
    }


def new_ops_metric(spark) -> dict:
    """Non-headline timings for the round-3 late-wave operators (best of 2
    after a warm-up, same protocol as the headline set) — perf visibility
    for the new surface without disturbing the frozen headline total."""
    out: dict[str, float] = {}
    for name in (
        "curation_dsir_select",
        "graph_neardup_pagerank",
        "tokenizer_bpe_counts",
        "curation_leakage_safe_split",
        "layout_zorder_events",
        # round-3 continuation wave
        "text_lang_id_ngram",
        "multimodal_dhash_neardup",
        "dataset_snapshot_diff",
        "sketch_quantile_bottomk",
    ):
        if name not in QUERIES:
            continue
        fn = QUERIES[name].fn
        fn(spark, SF_DIR).count()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    return out


if __name__ == "__main__":
    main()
