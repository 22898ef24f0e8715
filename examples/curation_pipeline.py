#!/usr/bin/env python
"""End-to-end training-data curation pipeline over the documents table:

    Gopher rules + repetition + PII redaction -> quality filter -> exact
    dedup -> MinHash-LSH near-dedup -> cluster canonicalization -> source
    caps -> deterministic train/val/test split -> sequence packing

Every stage is a distributed DataFrame op (no collect between stages); the
whole pipeline is one lazy plan until the final write/show. At 100 TB the
same code runs unchanged: the filters/splits are zero-shuffle projections,
dedup shuffles on content keys, packing windows per source group.

    python examples/curation_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sea_streamer_spark import get_spark
from sea_streamer_spark.operators.curation import (
    contamination,
    hash_split,
    pack_token_budget,
)
from sea_streamer_spark.operators.dedup import (
    duplicated_span_coverage,
    exact_dedup,
    minhash_lsh_dedup,
)
from sea_streamer_spark.operators.graph import dedup_clusters
from sea_streamer_spark.operators.quality import gopher_quality_flags, pii_redact
from sea_streamer_spark.operators.text import quality_score
from sea_streamer_spark.sources.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    docs = load_tables(spark, sf_dir, "documents").documents

    # 0. rule gates: Gopher-style flags (auditable per rule) + PII scrub.
    #    Both are zero-shuffle projections; redaction rewrites text in place.
    flags = gopher_quality_flags(docs).select("doc_id", "passes")
    docs = docs.join(flags.filter("passes"), "doc_id", "left_semi")
    red = pii_redact(docs).select("doc_id", F.col("redacted").alias("text"))
    docs = docs.drop("text").join(red, "doc_id")

    # 1. quality gate: drop bottom-quality docs (heuristic scorer)
    scored = quality_score(docs).select("doc_id", "quality")
    kept = docs.join(scored, "doc_id").filter(F.col("quality") >= 0.5)

    # 1b. duplicated-span gate (Lee et al. exact-substring metric): drop
    #     docs that are mostly corpus-duplicated text even when no whole-doc
    #     duplicate exists — catches boilerplate the doc-level dedups miss
    cov = duplicated_span_coverage(kept).select("doc_id", "dup_permille")
    kept = kept.join(cov.filter(F.col("dup_permille") <= 800), "doc_id", "left_semi")

    # 2. exact dedup: keep the smallest doc_id per identical text
    winners = exact_dedup(kept).select(F.col("keep_id").alias("doc_id"))
    kept = kept.join(winners, "doc_id", "left_semi")

    # 3. near-dedup: MinHash-LSH candidate pairs -> connected components ->
    #    keep exactly one canonical representative per near-dup CLUSTER
    #    (pairwise drop-the-larger-id under-deletes on chains A~B~C).
    dupes = minhash_lsh_dedup(kept, threshold=0.8).select("doc_a", "doc_b")
    clusters = dedup_clusters(kept, dupes)
    kept = kept.join(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 4. deterministic split + packing + epoch order
    split = hash_split(kept)  # 80/10/10 by portable hash of doc_id
    packed = pack_token_budget(split, budget=512, by="source")

    summary = (
        packed.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.countDistinct("source", "chunk_id").alias("chunks"),
        )
        .orderBy("split")
    )
    leaked = contamination(split).count()  # val docs sharing >=1 3-gram with train
    print(f"input docs: {docs.count()}, after curation: {kept.count()}")
    print(f"decontamination gate: {leaked} val docs share a 3-gram with train")
    summary.show()


if __name__ == "__main__":
    main()
