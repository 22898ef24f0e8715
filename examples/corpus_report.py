#!/usr/bin/env python
"""Corpus quality report: one pass over the documents table producing the
numbers a data-curation team reviews before a training run — language mix,
quality-rule hit rates, repetition profile, dup rate, vocabulary head.

Every section is a distributed DataFrame aggregate over the shared operator
layer; nothing is collected except the final small report frames. At 100 TB
the same code runs unchanged — each section is a projection plus one small
aggregate (see PLANS.md for the per-operator plan audits).

    python examples/corpus_report.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sea_streamer_spark import get_spark
from sea_streamer_spark.operators.dedup import exact_dedup, minhash_lsh_dedup
from sea_streamer_spark.operators.quality import (
    gopher_quality_flags,
    repetition_stats,
)
from sea_streamer_spark.operators.text import language_id, token_stats
from sea_streamer_spark.sources.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    docs = load_tables(spark, sf_dir, "documents").documents.cache()
    n = docs.count()

    print(f"=== corpus report: {sf_dir} ({n} docs) ===")

    print("\n-- language mix (marker heuristic vs labeled) --")
    language_id(docs).join(docs.select("doc_id", "lang"), "doc_id").groupBy(
        "lang", "pred_lang"
    ).count().orderBy("lang", "pred_lang").show()

    print("-- token stats --")
    token_stats(docs).agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 1).alias("avg_tokens_per_doc"),
        F.round(F.avg("avg_token_len"), 2).alias("avg_token_len"),
    ).show()

    print("-- Gopher rule hit-rates (share of docs failing each rule) --")
    gopher_quality_flags(docs).agg(
        *[
            F.round(F.avg((~F.col(c)).cast("double")), 3).alias(f"fail_{c[3:]}")
            for c in ("ok_word_count", "ok_mean_word_len", "ok_stopwords", "ok_symbol_ratio")
        ],
        F.round(F.avg((~F.col("passes")).cast("double")), 3).alias("fail_any"),
    ).show()

    print("-- repetition profile --")
    repetition_stats(docs).agg(
        F.round(F.avg("distinct_token_ratio"), 3).alias("avg_distinct_ratio"),
        F.round(F.avg("top_bigram_frac"), 3).alias("avg_top_bigram_frac"),
        F.round(F.max("top_token_frac"), 3).alias("worst_top_token_frac"),
    ).show()

    print("-- duplication --")
    exact_groups = exact_dedup(docs)
    near_pairs = minhash_lsh_dedup(docs, threshold=0.8).count()
    exact_dups = n - exact_groups.count()
    print(f"exact dup docs: {exact_dups}  near-dup pairs (j>=0.8): {near_pairs}")

    # ---- round-5 additions: the dedup FINISHER view of the same corpus ----
    # (family-size histogram, what the keep-longest cut removes per source in
    # docs AND tokens, and the measured recall of the LSH path vs exact
    # Jaccard — the numbers that turn "we found near-dups" into an actual,
    # auditable corpus reduction. All registered oracle-checked queries.)
    from sea_streamer_spark.plans.queries import QUERIES

    print("\n-- dup family sizes --")
    QUERIES["dedup_cluster_size_histogram"].fn(spark, sf_dir).show()

    print("-- keep-longest cut per source (docs and tokens) --")
    rate = QUERIES["dedup_rate_by_source"].fn(spark, sf_dir).select(
        "source", "n_docs", "n_removed", "dup_permille"
    )
    tok = QUERIES["dedup_token_savings_by_source"].fn(spark, sf_dir).select(
        "source", "removed_tokens", "savings_permille"
    )
    rate.join(tok, "source").orderBy("source").show(5)

    print("-- LSH candidate-path recall vs exact Jaccard --")
    QUERIES["dedup_lsh_recall_eval"].fn(spark, sf_dir).show()

    print("-- containment pairs (subset/quote dups Jaccard misses) --")
    n_cont = QUERIES["text_containment_pairs"].fn(spark, sf_dir).count()
    print(f"containment pairs (c>=0.8 either direction): {n_cont}")

    print("-- length profile by language --")
    QUERIES["profile_length_by_lang"].fn(spark, sf_dir).show()


if __name__ == "__main__":
    main()
