"""Distributed graph helpers for dedup: connected components over a
near-dup pair list, turning pairwise "A ~ B" edges into canonical clusters
(the keep-one-per-cluster step after MinHash/SimHash candidate generation).

Algorithm: hash-min label propagation — every node starts labelled with its
own id; each round, every node takes the min label among itself and its
neighbors; fixpoint = every node holds the min id of its component. Rounds
needed = graph diameter, which for dedup clusters is tiny (near-dup
relations are dense cliques-ish, diameter 1-3), so the driver loop runs
2-4 distributed rounds of [join, groupBy-min] — each round one shuffle of
|edges| label pairs. Lineage is cut per round with ``localCheckpoint`` so
the plan does not grow with iterations.

At web scale with adversarial long-chain graphs, the log-round alternative
is the large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — same building blocks
(join + min-agg), fewer rounds; the hash-min loop here is the simple,
shuffle-minimal choice for the dedup-cluster regime where diameter is small.
The per-round convergence probe is an aggregate-only action (a LIMIT 1
count over changed labels), not a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns (node, cluster) where cluster = min node id in the component.
    Only nodes appearing in at least one edge are returned — callers join
    back to the full entity table and coalesce singletons to their own id.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "cluster", F.col("node")
    )
    for _ in range(max_iter):
        nbr = sym.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "cluster")
        new_labels = (
            labels.union(nbr).groupBy("node").agg(F.min("cluster").alias("cluster"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster") < F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Canonical cluster assignment for every document: near-dup pair list →
    connected components → (doc, cluster_id), singletons keeping their own
    id. Downstream keep-rule: ``filter(doc_id == cluster_id)`` retains one
    representative per cluster."""
    cc = connected_components(pairs, src, dst)
    return docs.select(id_col).join(
        cc.withColumnRenamed("node", id_col), id_col, "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("cluster"), F.col(id_col)).alias("cluster_id"),
    )
