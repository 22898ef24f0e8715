"""Small-file compaction — the write-layout maintenance half every long-
lived 100 TB table needs (the OPTIMIZE/rewriteDataFiles analog of Delta/
Iceberg, next to operators/layout.py's Z-ORDER and operators/manifest.py's
data-skipping index).

Streaming sinks and incremental ingest waves leave thousands of tiny
parquet files; scan cost then degrades to file-open overhead and the
manifest bloats. ``compact_files`` sizes the rewrite from FILE METADATA
only (a ``binaryFile`` listing projected to ``length`` — never reads the
data twice), targets a fixed output file size, and optionally range-
clusters on a sort column so row-group min/max stats come out tight
(pruning-friendly, the layout.py contract).

Scale shape: the listing distributes like any scan; the rewrite is ONE
range (or round-robin) shuffle of the data; output file count =
ceil(input_bytes / target) — bounded and predictable. Compression-ratio
drift between input and output is fine: the target governs the ORDER of
file size, not an exact byte count.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_compaction(
    spark: SparkSession, src: str, target_bytes: int = 128 * 1024 * 1024
) -> tuple[int, int, int]:
    """(n_files, total_bytes, n_output_files) from file metadata only."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(src)
        .select("length")
    )
    agg = files.agg(
        F.count(F.lit(1)).alias("n"), F.sum("length").alias("total")
    ).first()
    n_files, total = int(agg["n"]), int(agg["total"] or 0)
    n_out = max(1, math.ceil(total / target_bytes))
    return n_files, total, n_out


def compact_files(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
    order_col: str | None = None,
) -> dict:
    """Rewrite the parquet dataset at ``src`` into ``dst`` with
    ~``target_bytes`` files. With ``order_col``: repartitionByRange +
    sortWithinPartitions, so each output file owns a tight, disjoint
    value range (row-group stats prune like a sorted layout). Returns the
    compaction report."""
    n_files, total, n_out = plan_compaction(spark, src, target_bytes)
    df = spark.read.parquet(src)
    if order_col is not None:
        out = df.repartitionByRange(n_out, F.col(order_col)).sortWithinPartitions(
            order_col
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst)
    return {
        "input_files": n_files,
        "input_bytes": total,
        "output_files_planned": n_out,
    }
