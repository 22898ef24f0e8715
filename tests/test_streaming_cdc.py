"""Streaming CDC apply (streaming/cdc.py): continuous changelog → keyed
snapshot with latest-wins, U/D semantics, atomic versioned publish, and
replayed-batch idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sea_streamer_spark.streaming.cdc import (
    cdc_apply_foreach_batch,
    current_meta,
    read_current,
)

SCHEMA = "doc_id long, seq long, op string, text string"


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "changes"),
        "snap": str(tmp_path / "snapshot"),
        "ck": str(tmp_path / "ck"),
    }


def _run(spark, dirs):
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(dirs["src"])
        .writeStream.foreachBatch(cdc_apply_foreach_batch(dirs["snap"]))
        .option("checkpointLocation", dirs["ck"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _snapshot(spark, dirs) -> dict[int, str]:
    df = read_current(spark, dirs["snap"])
    return {r["doc_id"]: r["text"] for r in df.collect()}


class TestStreamingCdcApply:
    def test_upsert_delete_and_latest_wins(self, spark, dirs):
        import os

        os.makedirs(dirs["snap"], exist_ok=True)
        # batch 1: inserts, including two versions of key 1 in ONE batch
        spark.createDataFrame(
            [(1, 1, "U", "one-v1"), (1, 2, "U", "one-v2"), (2, 1, "U", "two")],
            SCHEMA,
        ).write.parquet(dirs["src"])
        _run(spark, dirs)
        assert _snapshot(spark, dirs) == {1: "one-v2", 2: "two"}

        # batch 2: update key 2, delete key 1, insert key 3
        spark.createDataFrame(
            [(2, 3, "U", "two-v2"), (1, 3, "D", None), (3, 1, "U", "three")],
            SCHEMA,
        ).write.mode("append").parquet(dirs["src"])
        _run(spark, dirs)
        assert _snapshot(spark, dirs) == {2: "two-v2", 3: "three"}
        meta = current_meta(dirs["snap"])
        assert meta["version"] == 1

    def test_replayed_batch_is_a_noop(self, spark, dirs):
        import os

        os.makedirs(dirs["snap"], exist_ok=True)
        spark.createDataFrame(
            [(1, 1, "U", "one")], SCHEMA
        ).write.parquet(dirs["src"])
        _run(spark, dirs)
        v0 = current_meta(dirs["snap"])
        # simulate the crash-replay: re-invoke the sink with an old batch id
        fn = cdc_apply_foreach_batch(dirs["snap"])
        batch = spark.createDataFrame([(1, 9, "U", "stale-replay")], SCHEMA)
        fn(batch, v0["batch_id"])  # same id -> must not apply
        assert current_meta(dirs["snap"]) == v0
        assert _snapshot(spark, dirs) == {1: "one"}

    def test_old_versions_remain_readable(self, spark, dirs):
        import os

        os.makedirs(dirs["snap"], exist_ok=True)
        spark.createDataFrame([(1, 1, "U", "a")], SCHEMA).write.parquet(
            dirs["src"]
        )
        _run(spark, dirs)
        spark.createDataFrame(
            [(1, 2, "U", "b")], SCHEMA
        ).write.mode("append").parquet(dirs["src"])
        _run(spark, dirs)
        assert _snapshot(spark, dirs) == {1: "b"}
        # time travel: version 0 still on disk and readable
        old = spark.read.parquet(os.path.join(dirs["snap"], "v00000000"))
        assert {r["doc_id"]: r["text"] for r in old.collect()} == {1: "a"}

    def test_snapshot_only_columns_carry_through(self, spark, dirs):
        """A snapshot column the changelog batch doesn't carry must pass
        through the merge unchanged — not silently vanish from the newly
        published version (r3 ADVICE #4 schema-narrowing guard). New batch
        columns widen the snapshot (NULL for untouched rows)."""
        import os

        os.makedirs(dirs["snap"], exist_ok=True)
        fn = cdc_apply_foreach_batch(dirs["snap"])
        # seed a snapshot with an extra payload column `lang`
        wide = "doc_id long, seq long, op string, text string, lang string"
        fn(
            spark.createDataFrame(
                [(1, 1, "U", "a", "en"), (2, 1, "U", "b", "fr")], wide
            ),
            0,
        )
        # narrow changelog batch (no `lang`): update doc 1's text only
        fn(spark.createDataFrame([(1, 2, "U", "a2")], SCHEMA), 1)
        cur = read_current(spark, dirs["snap"])
        assert set(cur.columns) == {"doc_id", "text", "lang"}
        got = {r["doc_id"]: (r["text"], r["lang"]) for r in cur.collect()}
        assert got == {1: ("a2", "en"), 2: ("b", "fr")}
        # widening batch: new payload column `score` appears mid-stream
        wider = "doc_id long, seq long, op string, text string, score long"
        fn(spark.createDataFrame([(2, 3, "U", "b2", 9)], wider), 2)
        cur = read_current(spark, dirs["snap"])
        assert set(cur.columns) == {"doc_id", "text", "lang", "score"}
        got = {
            r["doc_id"]: (r["text"], r["lang"], r["score"])
            for r in cur.collect()
        }
        assert got == {1: ("a2", "en", None), 2: ("b2", "fr", 9)}
