#!/usr/bin/env python
"""Embedding-side pipeline over the embeddings table:

    PCA-whitening fit (one-pass distributed sufficient statistics)
        -> whitened vectors (map-only apply)
        -> spherical k-means quantizer (bounded sample)
        -> persisted IVF-partitioned ANN store (partition-pruned search)
        -> top-k queries against the store
        -> contrastive triples (top positive + hard negatives per anchor)
        -> SemDeDup-style within-cell near-dup drop list

Driver-side state is geometry-bounded throughout: the d×d whitening model,
n_cells centroid literals, and the k query results — never corpus-sized.
At 100 TB the same code runs with the store as the persisted table.

    python examples/vector_pipeline.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sea_streamer_spark import get_spark
from sea_streamer_spark.operators import ann_store as ST
from sea_streamer_spark.operators import similarity as S
from sea_streamer_spark.operators.embedding import fit_whiten, whiten
from sea_streamer_spark.sources.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    emb = load_tables(spark, sf_dir, "embeddings").embeddings

    # 1. decorrelate: one-pass distributed PCA whitening (the cosine/ANN
    #    quality prep) — keep the top 8 directions
    model = fit_whiten(emb, k=8)
    white = (
        whiten(emb, model)
        .select("vec_id", F.col("whitened").alias("embedding"))
        .cache()
    )

    # 2. quantizer + persisted IVF store over the whitened space
    cents = S.ivf_centroids(white, n_cells=8)
    store = tempfile.mkdtemp(prefix="ivf_store_")
    ST.write_ivf_store(white, store, cents)
    cells = [e for e in os.listdir(store) if e.startswith("ivf_cell=")]
    print(f"store: {len(cells)} cell partitions under {store}")

    # 3. partition-pruned top-k for a few probes
    for qid in (0, 7, 42):
        row = white.filter(F.col("vec_id") == qid).collect()
        if not row:
            continue
        qvec = [float(x) for x in row[0]["embedding"]]
        top = ST.ann_store_topk(
            spark, store, qvec, cents, k=3, nprobe=2, exclude_id=qid
        ).collect()
        print(f"q{qid}: " + ", ".join(f"{r.vec_id}@{r.cosine_sim:.3f}" for r in top))

    # 4. contrastive triples on the raw space (training-data mining)
    trip = S.contrastive_triples(emb, n_neg=2)
    print(f"triples: {trip.count()} rows")

    # 5. SemDeDup drop list: same-cell near-dups (smaller id survives).
    #    NOTE the threshold is space-specific: 8-dim whitened vectors
    #    concentrate cosine mass far above the raw-space 0.45 (fewer,
    #    decorrelated dimensions) — recalibrate per space, here 0.9.
    assigned = white.select("vec_id", "embedding", S.ivf_cell_expr(cents).alias("cell"))
    a, b = assigned.alias("a"), assigned.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .filter(S.cosine(F.col("a.embedding"), F.col("b.embedding")) >= 0.9)
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )
    print(f"semantic dedup would drop {dropped.count()} of {emb.count()} vectors")
    white.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
