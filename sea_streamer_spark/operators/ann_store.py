"""Persisted IVF-partitioned ANN store — the at-rest form of the IVF scale
story (`operators/similarity.ann_ivf_topk` computes cell assignments on the
fly; its docstring promises "at 100 TB the assignment is computed once and
persisted with the table (partitionBy cell)" — this module IS that path).

Write once: assign every vector to its nearest-centroid cell (map-side
projection against broadcast centroid literals) and ``partitionBy`` the
cell, so each cell is a parquet DIRECTORY. Query: filter on the cell column
→ Spark plans `PartitionFilters` and the scan never lists, opens, or reads
any non-probed cell — nprobe/n_cells of the table is touched at ANY size,
enforced by the storage layout rather than per-query compute. The probed
subset then follows the brute-force plan (broadcast query vector +
TakeOrdered top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .litexpr import lit_doubles

from .similarity import cos_py, cosine, ivf_cell_expr

__all__ = ["write_ivf_store", "ann_store_topk"]


def write_ivf_store(
    emb: DataFrame,
    path: str,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> None:
    """Materialize the corpus partitioned by IVF cell. The assignment is a
    pure projection; the write shuffles nothing (each input task appends
    into the cell directories it produces). Re-clustering = retrain
    centroids + rewrite — the offline OPTIMIZE job of every vector store."""
    emb.withColumn("ivf_cell", ivf_cell_expr(centroids, vec_col)).write.mode(
        "overwrite"
    ).partitionBy("ivf_cell").parquet(path)


def ann_store_topk(
    spark: SparkSession,
    path: str,
    qvec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Top-k cosine search over the persisted store, touching only the
    query's ``nprobe`` nearest cells — as directory-level partition
    pruning (`PartitionFilters` in the scan; non-probed cells are never
    read). Cell ranking runs driver-side on the centroid list (tiny), the
    in-cell scan is the broadcast-query TakeOrdered plan."""
    probed = [
        c
        for c, _ in sorted(
            centroids, key=lambda cv: (-cos_py(qvec, cv[1]), cv[0])
        )[:nprobe]
    ]
    df = spark.read.parquet(path).filter(F.col("ivf_cell").isin(probed))
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    q = lit_doubles(qvec)
    return (
        df.select(
            id_col,
            F.col("ivf_cell").cast("int").alias("ivf_cell"),
            cosine(F.col(vec_col), q).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )
