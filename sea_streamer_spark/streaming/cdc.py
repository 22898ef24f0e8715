"""Streaming CDC apply — continuous changelog ingestion into a keyed
snapshot with exactly-once semantics (the streaming form of the
``cdc_merge_upsert`` registry query; Debezium-topic → lakehouse-table).

Mechanics per micro-batch, inside ``foreachBatch``:

1. **batch-local latest-wins**: a replayed or long batch can carry several
   versions of one key — one key-partitioned ``row_number`` over
   ``seq DESC`` keeps the newest change only (state bounded by the batch's
   version count);
2. **merge**: read the current snapshot, full-outer join on the key, apply
   U/D semantics (update-in-place / insert / delete);
3. **atomic publish**: the merged snapshot is written to a NEW versioned
   directory and a ``_CURRENT`` pointer file is atomically renamed over —
   readers never observe a half-written snapshot, and a crash between
   write and publish leaves the old snapshot current;
4. **idempotent replay**: the pointer records the last applied batch id;
   a replayed batch id is a no-op (checkpoint + ledger, the repo's
   standard EOS recipe — `streaming/sink.py`).

Scale: the join is snapshot ⋈ batch-delta — with the snapshot maintained
bucketed by key the big side never re-shuffles; the rewrite cost is the
classic copy-on-write lakehouse trade (amortize with partitioned
snapshots so only touched partitions rewrite; see operators/compaction
for the file-sizing half)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _pointer_path(root: str) -> str:
    return os.path.join(root, "_CURRENT")


def read_current(spark: SparkSession, root: str) -> DataFrame | None:
    """The published snapshot, or None before the first apply."""
    p = _pointer_path(root)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        meta = json.load(f)
    return spark.read.parquet(os.path.join(root, meta["dir"]))


def current_meta(root: str) -> dict | None:
    p = _pointer_path(root)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def cdc_apply_foreach_batch(root: str, key: str = "doc_id"):
    """Build the ``foreachBatch`` function applying a changelog stream
    (columns: key, seq, op ∈ {'U','D'}, payload columns) to the snapshot
    under ``root``."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        meta = current_meta(root)
        if meta is not None and batch_id <= meta["batch_id"]:
            return  # replayed batch — already applied, atomic no-op
        w = Window.partitionBy(key).orderBy(F.col("seq").desc())
        latest = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "seq")
        )
        cur = read_current(spark, root)
        if cur is None:
            merged = (
                latest.filter(F.col("op") != "D").drop("op")
            )
        else:
            payload_cols = [c for c in latest.columns if c not in (key, "op")]
            # Schema-narrowing guard (r3 ADVICE #4): a snapshot column the
            # changelog batch doesn't carry would previously be DROPPED
            # from the newly published version — silent data loss. Snapshot
            # columns absent from the batch now pass through unchanged;
            # batch columns absent from the snapshot are new (widening,
            # allowed — full-outer rows from cur get NULL for them).
            carry_cols = [
                c for c in cur.columns
                if c != key and c not in payload_cols
            ]
            l = latest.select(
                F.col(key),
                F.col("op"),
                *[F.col(c).alias(f"__new_{c}") for c in payload_cols],
            )
            new_cols = [c for c in payload_cols if c not in cur.columns]
            merged = (
                cur.join(l, key, "full_outer")
                .filter(F.col("op").isNull() | (F.col("op") != "D"))
                .select(
                    F.col(key),
                    *[
                        F.when(
                            F.col("op") == "U", F.col(f"__new_{c}")
                        ).otherwise(
                            F.col(c) if c not in new_cols else F.lit(None)
                        ).alias(c)
                        for c in payload_cols
                    ],
                    *[F.col(c) for c in carry_cols],
                )
            )
        version = 0 if meta is None else meta["version"] + 1
        out_dir = f"v{version:08d}"
        merged.write.mode("overwrite").parquet(os.path.join(root, out_dir))
        tmp = _pointer_path(root) + f".tmp.{batch_id}"
        with open(tmp, "w") as f:
            json.dump({"version": version, "dir": out_dir, "batch_id": batch_id}, f)
        os.replace(tmp, _pointer_path(root))  # atomic publish

    return fn
