#!/usr/bin/env python
"""End-to-end training-data curation pipeline over the documents table:

    Gopher rules + repetition + PII redaction -> quality filter -> exact
    dedup -> MinHash-LSH near-dedup -> PageRank-canonical cluster
    representative -> DSIR importance selection -> leakage-safe
    cluster-aware train/val/test split -> sequence packing -> BPE token
    accounting

Every stage is a distributed DataFrame op (the only driver-side state is
geometry-bounded: the m-bucket DSIR grid and the BPE merge list). At
100 TB the same code runs unchanged: the filters/splits are zero-shuffle
projections, dedup shuffles on content keys, the DSIR fit collects m
rows, BPE trains on the word-frequency table, packing windows per source
group.

    python examples/curation_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

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
from sea_streamer_spark.operators.bpe import bpe_token_count, train_bpe
from sea_streamer_spark.operators.graph import dedup_clusters, pagerank_fixed
from sea_streamer_spark.operators.selection import (
    dsir_logratio_grid,
    dsir_score,
    fit_bucket_counts,
)
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

    # 2. exact dedup: keep the smallest doc_id per identical text.
    #    Materialize here — everything below (MinHash, CC rounds, PageRank,
    #    DSIR, BPE) re-drives this frame several times; without the cache
    #    each consumer re-runs the whole quality/span/dedup prefix.
    winners = exact_dedup(kept).select(F.col("keep_id").alias("doc_id"))
    kept = kept.join(winners, "doc_id", "left_semi").cache()

    # 3. near-dedup: MinHash-LSH candidate pairs -> connected components ->
    #    keep exactly one representative per near-dup CLUSTER (pairwise
    #    drop-the-larger-id under-deletes on chains A~B~C). The
    #    representative is the cluster's PageRank-top member (most-connected
    #    = most central copy), not the arbitrary min id.
    dupes = minhash_lsh_dedup(kept, threshold=0.8).select("doc_a", "doc_b")
    clusters = dedup_clusters(kept, dupes)
    pr = pagerank_fixed(kept, dupes)
    best = (
        clusters.join(pr, "doc_id")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.col("score_micro").desc(), F.col("doc_id")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("doc_id", "cluster_id")
    )
    kept = kept.join(best.select("doc_id"), "doc_id", "left_semi").cache()

    # 3b. DSIR importance selection: score every surviving doc against an
    #     English-target hashed-n-gram distribution (grid fit = bounded
    #     m-row collects) and keep the most target-like 90%
    target = kept.filter(F.col("lang") == "en")
    grid = dsir_logratio_grid(fit_bucket_counts(target), fit_bucket_counts(kept))
    scored_w = dsir_score(kept, grid)
    cut = scored_w.approxQuantile("logw_micro", [0.1], 0.001)[0]
    kept = kept.join(
        scored_w.filter(F.col("logw_micro") >= cut).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 4. LEAKAGE-SAFE split + packing: the 80/10/10 hash rule keys on the
    #    dedup-cluster id, so any residual near-dups (threshold gray zone)
    #    can never straddle train/val
    split = hash_split(
        kept.join(clusters, "doc_id"), id_col="cluster_id"
    ).drop("cluster_id").cache()
    packed = pack_token_budget(split, budget=512, by="source")

    # 5. BPE token accounting: train 24 merges on the FINAL train split's
    #    word table (one corpus pass), report real-tokenizer token counts
    merges = train_bpe(split.filter(F.col("split") == "train"), 24)
    bpe_counts = split.select(
        "split", bpe_token_count("text", merges).alias("n_bpe")
    )

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
    bpe_summary = bpe_counts.groupBy("split").agg(
        F.sum("n_bpe").alias("bpe_tokens")
    )
    print(f"BPE merges learned on train: {len(merges)}")
    summary.join(bpe_summary, "split").orderBy("split").show()


if __name__ == "__main__":
    main()
