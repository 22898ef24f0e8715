"""CSV corpus ingestion — the second most common raw wire format after
JSONL (exports from warehouses/spreadsheets), sharing jsonl.py's quarantine
contract: explicit schema (inference = a full extra pass at 100 TB),
PERMISSIVE mode with a corrupt-record column, (clean, quarantine) split.

CSV-specific hazards handled declaratively by the Spark reader (never a
python pre-pass): quoted fields with embedded delimiters/newlines
(``multiLine`` stays OFF by default — embedded newlines break splittability;
enable it only for small quoted corpora and accept one-task-per-file),
escaped quotes, and header rows. A row with the wrong column count or an
unparseable typed field quarantines instead of failing the job.

Scale notes mirror jsonl.py: newline-delimited CSV is split-parallel when
uncompressed or zstd/bzip2-compressed; gzip serializes each file to one
task. The same QUERY_ONLY_CORRUPT_RECORD_COLUMN materialization rule
applies to the split — reuse jsonl.split_quarantine, which owns it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from .jsonl import CORRUPT_COL, DOCUMENT_SCHEMA, split_quarantine  # noqa: F401


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENT_SCHEMA,
    header: bool = True,
    sep: str = ",",
    multi_line: bool = False,
) -> DataFrame:
    """Read a CSV corpus with quarantine capture: document columns plus
    ``_corrupt_record`` (null for clean rows, the raw line for malformed
    ones). Split with :func:`jsonl.split_quarantine`."""
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", str(multi_line).lower())
        .csv(path)
    )
