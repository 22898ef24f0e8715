"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct, exactly like the reference's opaque payloads
(types/src/message.rs:20-31). Decode/feature-extraction runs as Arrow-batched
``mapInPandas`` — the real Spark plumbing (schema contract, batch shape,
partition parallelism) is implemented and tested here; the *codec* itself is
stubbed deterministically because media libraries are not available in this
container (swap ``_decode_batch``'s body for PIL/ffmpeg in production).

Scale notes: mapInPandas streams Arrow batches (no row-at-a-time pickling);
decode is embarrassingly parallel, so throughput scales with partitions.
``repartition`` before decoding if upstream partitioning is skewed by
payload size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_len", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a multimodal row: binary payload + metadata struct."""
    return df.select(
        "doc_id",
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.length(text_col).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("content_type"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode of a multimodal DataFrame (doc_id, payload, meta).

    The batch function is a local closure so cloudpickle ships it *by value* —
    executors don't need this package importable (the engine also ships a
    package zip via ``session.prepare``, but UDF hot paths shouldn't depend
    on it).

    STUB codec: returns synthetic dimensions derived from payload length. A
    real deployment decodes bytes with PIL/libav here; this container has no
    media libs, so the Spark-side contract (Arrow batches, schema, partition
    parallelism) is what's implemented and tested.
    """

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            lens = pdf["payload"].map(len)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_len": lens,
                    "media_type": "image/stub",
                    "width": lens.map(lambda n: 16 + n % 64),
                    "height": lens.map(lambda n: 16 + (n * 7) % 64),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(decode_batch, DECODED_SCHEMA)
