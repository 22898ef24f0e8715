"""Distributed parquet-footer manifest — the read-side half of the layout
story (operators/layout.py is the write side): collect per-row-group
min/max/null statistics for chosen columns into a queryable DataFrame, the
data-skipping index every table format (Delta/Iceberg/Hudi) maintains.

Why distributed: at 100 TB a table has millions of footers; reading them on
the driver is a serial metadata crawl. Here each executor parses the
footers of the files in its partition (``binaryFile`` scan restricted to a
byte-range read of the footer via pyarrow) and emits bounded stat rows —
the manifest's size scales with file count × columns, never with data.

The manifest then answers "which files/row groups can a predicate touch?"
as a plain DataFrame filter — usable for external pruning (building file
lists for a downstream reader), for layout audits (how tight are my
row-group boxes?), and for the z-order win measurement in
tests/test_layout.py without driver-side footer loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["file_manifest", "pruned_files"]

_SCHEMA = StructType(
    [
        StructField("file", StringType(), False),
        StructField("row_group", LongType(), False),
        StructField("n_rows", LongType(), False),
        StructField("column", StringType(), False),
        StructField("min_val", StringType(), True),
        StructField("max_val", StringType(), True),
        StructField("n_nulls", LongType(), True),
    ]
)


def file_manifest(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """Per-(file, row group, column) statistics DataFrame. Values are
    canonicalized to strings (``repr`` for floats — round-trips bits;
    decimal string for ints; raw for strings) so one schema serves any
    column type; cast back at the call site for range arithmetic.

    Plan: ``binaryFile`` listing (Spark distributes the file list) →
    ``mapInPandas`` where each task opens ONLY its own files' footers with
    pyarrow. The payload bytes are never touched — ``pathGlobFilter`` keeps
    non-parquet files out and the reader seeks straight to metadata.
    """
    cols = list(columns)

    def scan(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        # defined inside the closure so the whole UDF pickles BY VALUE —
        # usable from sessions that never called prepare()/addPyFile
        def canon(v):
            if isinstance(v, float):
                return repr(v)
            if isinstance(v, bytes):
                return v.decode("utf-8", "replace")
            return str(v)

        from urllib.parse import unquote, urlparse

        for pdf in batches:
            out: list[dict] = []
            for p in pdf["path"]:
                u = urlparse(p)
                local = unquote(u.path) if u.scheme else p
                md = pq.ParquetFile(local).metadata
                idx = {
                    md.schema.column(i).name: i for i in range(md.num_columns)
                }
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    for c in cols:
                        if c not in idx:
                            continue
                        st = rg.column(idx[c]).statistics
                        # has_min_max guards the all-null / stats-less
                        # cases: a literal "None" string would masquerade
                        # as a real lexicographic bound
                        has_mm = st is not None and st.has_min_max
                        out.append(
                            {
                                "file": local,
                                "row_group": g,
                                "n_rows": rg.num_rows,
                                "column": c,
                                "min_val": canon(st.min) if has_mm else None,
                                "max_val": canon(st.max) if has_mm else None,
                                "n_nulls": None if st is None else st.null_count,
                            }
                        )
            yield pd.DataFrame(out, columns=[f.name for f in _SCHEMA.fields])

    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
        .select("path")
    )
    return listing.mapInPandas(scan, _SCHEMA)


def pruned_files(
    manifest: DataFrame, ranges: dict[str, tuple[float, float]]
) -> DataFrame:
    """Row groups a conjunctive range predicate might touch: for every
    ``col: (lo, hi)`` keep groups whose [min, max] box intersects it —
    the data-skipping decision as a DataFrame filter over the manifest
    (numeric columns; values cast from the canonical strings). Returns
    distinct (file, row_group) — everything absent is provably skippable.
    SOUNDNESS: a group with NO recorded min/max (stats disabled, foreign
    writer, all-null group) can never be proven disjoint, so it is KEPT."""
    m = manifest
    keep = None
    for c, (lo, hi) in ranges.items():
        cond = (F.col("column") == c) & (
            F.col("min_val").isNull()
            | F.col("max_val").isNull()
            | (
                (F.col("min_val").cast("double") <= F.lit(float(hi)))
                & (F.col("max_val").cast("double") >= F.lit(float(lo)))
            )
        )
        hit = m.filter(cond).select("file", "row_group").distinct()
        keep = hit if keep is None else keep.join(hit, ["file", "row_group"])
    if keep is None:
        return m.select("file", "row_group").distinct()
    return keep
