"""Custom sinks via ``foreachBatch`` — the pattern behind the reference's
external-sink examples (S21 sea-orm database sink) and the Redis producer
(S5): Spark hands each micro-batch to user code, and exactly-once falls out
of (checkpoint offset tracking) x (idempotent or transactional writes).

``idempotent_foreach_batch`` adds the replay guard: after a crash between
"sink wrote" and "checkpoint committed", the re-delivered batch id is
detected and skipped — the standard foreachBatch exactly-once recipe, which
subsumes the reference's per-message receipt/dedup machinery (D9).

Receipts (D9): ``receipts_for`` derives the broker-assigned identity
(stream_key, shard_id, sequence, timestamp) per row — the MessageHeader —
from the batch itself; with deterministic ids, replays produce identical
receipts, making downstream dedup trivial.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import ENVELOPE_COLUMNS


def receipts_for(batch: DataFrame) -> DataFrame:
    """D9 delivery receipts: one MessageHeader per sent message."""
    return batch.select(*[c for c in ENVELOPE_COLUMNS if c != "payload"])


def idempotent_foreach_batch(
    write_fn: Callable[[DataFrame, int], None], ledger_dir: str
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch function with a batch-id ledger so re-delivered
    batches (checkpoint replay after failure) are skipped.

    The ledger is a directory of empty marker files — at scale, any
    atomic-rename filesystem (HDFS/S3-with-manifest) gives the same contract.
    The marker is written AFTER ``write_fn`` succeeds: a crash in between
    re-runs the batch, which is why ``write_fn`` itself must be idempotent
    per batch (e.g. overwrite-by-batch-path, or XADD with explicit ids — the
    Redis producer's trick, redis/src/producer.rs explicit-id receipts)."""
    os.makedirs(ledger_dir, exist_ok=True)

    def wrapped(batch: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger_dir, f"batch-{batch_id}.done")
        if os.path.exists(marker):
            return  # replayed batch: already fully written
        write_fn(batch, batch_id)
        with open(marker + ".tmp", "w") as f:
            f.write("done")
        os.replace(marker + ".tmp", marker)  # atomic publish

    return wrapped


def partitioned_parquet_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """A per-batch-path parquet writer: each batch overwrites its own
    directory, so a replayed batch rewrites identical bytes (idempotent even
    without the ledger)."""

    def write(batch: DataFrame, batch_id: int) -> None:
        (
            batch.select(*ENVELOPE_COLUMNS)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    return write
