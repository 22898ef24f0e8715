"""JSONL corpus ingestion — the most common wire format for raw training
corpora (one JSON document per line, possibly malformed).

Spark-native path: ``spark.read.json`` with an EXPLICIT schema (never infer
on a 100 TB corpus — inference is a full extra pass) in PERMISSIVE mode with
a corrupt-record column, so one malformed line quarantines instead of
failing the job. The helpers split the result into (clean, quarantine) —
the standard ingest gate before the curation pipeline
(examples/curation_pipeline.py) runs.

Scale notes: json line parsing is per-split parallel (newline-delimited ⇒
splittable even uncompressed; use zstd/bzip2 or many files for compressed
corpora — gzip is NOT splittable and serializes each file to one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: Default document schema (mirrors the driver's documents table).
DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENT_SCHEMA,
) -> DataFrame:
    """Read a JSONL corpus with quarantine capture: returns a frame with the
    document columns plus ``_corrupt_record`` (null for clean rows, the raw
    line for malformed ones)."""
    # build a NEW StructType: StructType.add mutates (and returns) the
    # receiver, which would grow the shared DOCUMENT_SCHEMA on every call
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(
    df: DataFrame, storage_level: str | None = "MEMORY_AND_DISK"
) -> tuple[DataFrame, DataFrame]:
    """(clean_docs, quarantine) from a :func:`read_documents_jsonl` frame.
    Clean rows drop the corrupt column; quarantine rows carry the raw line
    for later inspection/repair. Spark leaves non-corrupt columns null on a
    malformed line, so the corrupt column IS the partition key — a pure
    filter, no shuffle.

    The parse result is persisted first (``storage_level``, default
    MEMORY_AND_DISK): Spark disallows queries that reference only the
    corrupt-record column of a raw file scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both outputs share one parse pass
    this way instead of re-reading the corpus twice.

    At 100 TB a full-corpus cache is a deliberate resource decision, not a
    default you can't escape: pass ``storage_level="DISK_ONLY"`` to keep
    executor memory free, or ``storage_level=None`` if the caller persisted /
    checkpointed ``df`` already (Spark rejects a corrupt-column filter over a
    raw file scan with QUERY_ONLY_CORRUPT_RECORD_COLUMN — verified: even an
    all-columns projection fails, so SOME materialization boundary is
    mandatory; None just means it's yours). Whoever persists should call
    ``df.unpersist()`` on the frame they passed in once both splits are
    materialized — the splits themselves stay valid, they just recompute."""
    if storage_level is not None:
        from pyspark import StorageLevel

        df = df.persist(getattr(StorageLevel, storage_level))
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine
