#!/usr/bin/env python
"""Incremental corpus ingest: a document firehose deduplicated against ALL
history with bounded state — the steady-state companion to the one-shot
curation_pipeline.py.

    waves of documents --> readStream --> non-empty gate
        --> streaming Bloom dedup (persisted filter + key ledger)
        --> admitted docs appended per batch under out/
        --> live token-frequency CMS (persisted, replay-safe)

Why this shape at 100 TB: the history is never re-read — corpus membership
lives in a ~KBs-to-MBs packed Bloom filter (no false negatives, so
provably-new rows skip the verify join entirely), and the only join each
batch pays is the maybe-dup sliver against the key ledger. Crash-replay is
a no-op end-to-end (batch-id marker + overwrite-by-batch-path + idempotent
bit-OR into the filter).

    python examples/incremental_ingest.py [sf_dir] [work_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sea_streamer_spark import get_spark
from sea_streamer_spark.operators.bloom import load_model, streaming_bloom_dedup_sink
from sea_streamer_spark.functions.statefile import load_json, save_json
from sea_streamer_spark.operators.sketch import (
    HLL_M,
    cms_build,
    cms_merge,
    hll_estimate,
    hll_registers,
    load_cms,
    load_cms_applied,
    save_cms,
)
from sea_streamer_spark.sources.tables import load_tables
from sea_streamer_spark.streaming.sink import idempotent_foreach_batch


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="ingest_")
    spark = get_spark()
    docs = load_tables(spark, sf_dir, "documents").documents

    # Simulate three ingest waves with overlap (wave N re-delivers some of
    # wave N-1's docs — the at-least-once upstream every real feed has).
    src = os.path.join(work, "src")
    shutil.rmtree(src, ignore_errors=True)
    for i, (lo, hi) in enumerate(((0, 200), (150, 350), (300, 500))):
        (
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"wave{i}"))
        )

    out = os.path.join(work, "admitted")
    state = os.path.join(work, "state")
    sink = streaming_bloom_dedup_sink(out, state, key_col="fp")

    cms_path = os.path.join(state, "tokens.cms.json")
    hll_path = os.path.join(state, "tokens.hll.json")

    def gated(batch, batch_id):
        # per-batch fingerprint + cheap quality gate, then the dedup sink
        batch = batch.withColumn("fp", F.md5("text")).filter(F.length("text") > 0)
        sink(batch, batch_id)
        # live token-frequency tracking: per-batch CMS delta summed into
        # the persisted grid (merge == rebuild; geometry-bounded, like the
        # filter). Counter addition is NOT idempotent, so the applied-batch
        # set rides in the SAME atomic file as the grid — a crash-replayed
        # batch is skipped instead of double-counted.
        applied = load_cms_applied(cms_path)
        if batch_id not in applied:
            toks = batch.select(F.explode(F.split("text", r"\s+")).alias("tok"))
            delta = cms_build(toks, "tok", width=1024)
            prev = load_cms(cms_path)
            merged = cms_merge(prev, delta) if prev else delta
            save_cms(merged, cms_path, applied=[*applied, batch_id])
        # live distinct-token tracking: per-batch HLL registers merged by
        # MAX into the persisted table. Unlike the CMS counters, max IS
        # idempotent — a crash-replayed batch merges to a no-op, so no
        # applied-set is needed (the Bloom bit-OR argument).
        regs = {
            (r.bucket, r.r)
            for r in hll_registers(
                batch.select(F.explode(F.split("text", r"\s+")).alias("tok")),
                "tok",
            ).collect()
        }
        prev_regs = load_json(hll_path) or {}
        merged_regs = dict(prev_regs)
        for b, r in regs:
            k = str(b)
            merged_regs[k] = max(merged_regs.get(k, 0), r)
        save_json(hll_path, merged_regs)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")  # one wave per micro-batch
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            idempotent_foreach_batch(gated, os.path.join(work, "markers"))
        )
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    admitted = spark.read.parquet(out)
    model = load_model(os.path.join(state, "bloom.json"))
    delivered = spark.read.parquet(src + "/*").count()
    print(f"waves delivered: {delivered} doc-rows (with cross-wave overlap)")
    print(f"admitted (distinct content, ever): {admitted.count()}")
    print(f"filter occupancy: {model.set_bits}/{model.m_bits} bits, "
          f"expected fp rate {model.fp_rate():.2e}")
    cms = load_cms(cms_path)
    probe = ["the", "data", "spark"]
    ests = {t: cms.estimate(t) for t in probe}
    print(f"live token-frequency sketch (N={cms.total}): {ests}")
    regs = load_json(hll_path) or {}
    denom = sum(1 << (32 - r) for r in regs.values()) + (HLL_M - len(regs)) * (1 << 32)
    est_distinct = hll_estimate(denom, HLL_M - len(regs))
    exact_distinct = (
        admitted.select(F.explode(F.split("text", r"\s+")).alias("t"))
        .distinct()
        .count()
    )
    print(f"live distinct-token HLL estimate: {est_distinct:.0f} "
          f"(exact over admitted: {exact_distinct})")
    print(f"state dir: {state} — re-running this script admits 0 new docs")
    spark.stop()


if __name__ == "__main__":
    main()
