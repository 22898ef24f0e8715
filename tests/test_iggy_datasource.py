"""S15 through the registered ``sea_iggy`` DataSource, driven against the
file-backed loopback server — the same architecture (and the same e2e bar)
as the sea_redis source: per-partition tasks, checkpointed server offsets,
resume delivers only new messages."""

from __future__ import annotations

import pytest

from sea_streamer_spark.sources.iggy_datasource import SeaIggyDataSource
from sea_streamer_spark.streaming.fake_iggy import FakeIggy


@pytest.fixture()
def server_root(tmp_path):
    return str(tmp_path / "iggy")


def _populate(root: str, topic: str = "events", parts: int = 3, per: int = 25):
    client = FakeIggy(root=root)
    for p in range(parts):
        client.send_messages(
            "sea", topic, p,
            [(1_000_000 + (p * per + i) * 1_000, f"m-{p}-{i}".encode()) for i in range(per)],
        )
    return client


class TestFileBackedServer:
    def test_multiprocess_semantics(self, server_root):
        a = FakeIggy(root=server_root)
        offs = a.send_messages("sea", "t", 0, [(5, b"\x00\xff"), (6, b"y")])
        assert offs == [0, 1]
        b = FakeIggy(root=server_root)  # a second "connection"
        assert b.partition_ids("sea", "t") == [0]
        assert b.end_offset("sea", "t", 0) == 2
        msgs = b.poll_messages("sea", "t", 0, strategy="first")
        assert [(m[0], m[2]) for m in msgs] == [(0, b"\x00\xff"), (1, b"y")]
        # committed offsets persist across connections
        b.store_offset("c1", "sea", "t", 0, 0)
        nxt = FakeIggy(root=server_root).poll_messages(
            "sea", "t", 0, strategy="next", consumer="c1"
        )
        assert [m[0] for m in nxt] == [1]


class TestSeaIggyStreamSource:
    def _run_to_parquet(self, spark, root, out, ck, starting="earliest"):
        q = (
            spark.readStream.format("sea_iggy")
            .option("topic", "events")
            .option("fake_root", root)
            .option("starting_offsets", starting)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    def test_reads_all_partitions_with_envelope(self, spark, server_root, tmp_path):
        _populate(server_root, parts=3, per=25)
        spark.dataSource.register(SeaIggyDataSource)
        got = self._run_to_parquet(
            spark, server_root, str(tmp_path / "out"), str(tmp_path / "ck")
        )
        rows = got.collect()
        assert len(rows) == 75
        assert sorted({r.shard_id for r in rows}) == [0, 1, 2]
        for r in rows:
            assert r.stream_key == "events"
        by_part = {}
        for r in rows:
            by_part.setdefault(r.shard_id, []).append(r.sequence)
        for seqs in by_part.values():
            assert sorted(seqs) == list(range(25))  # server offsets, dense
        assert {bytes(r.payload).decode() for r in rows} == {
            f"m-{p}-{i}" for p in range(3) for i in range(25)
        }

    def test_resume_from_checkpoint(self, spark, server_root, tmp_path):
        client = _populate(server_root, parts=2, per=10)
        spark.dataSource.register(SeaIggyDataSource)
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        assert self._run_to_parquet(spark, server_root, out, ck).count() == 20
        client.send_messages("sea", "events", 1, [(9_999_999, b"late")] * 3)
        total = self._run_to_parquet(spark, server_root, out, ck)
        rows = total.collect()
        assert len(rows) == 23  # 20 + ONLY the 3 new — no redelivery
        assert sum(bytes(r.payload) == b"late" for r in rows) == 3

    def test_latest_skips_existing(self, spark, server_root, tmp_path):
        _populate(server_root, parts=2, per=5)
        spark.dataSource.register(SeaIggyDataSource)
        got = self._run_to_parquet(
            spark, server_root, str(tmp_path / "o2"), str(tmp_path / "c2"), "latest"
        )
        assert got.count() == 0

    def test_create_consumer_uri_dispatch(self, spark, server_root, tmp_path):
        from sea_streamer_spark.streaming.consumer import (
            ConsumerMode,
            ConsumerOptions,
            create_consumer,
        )

        _populate(server_root, parts=2, per=4)
        consumer = create_consumer(
            spark,
            f"iggy+fake://{server_root}/events",
            ConsumerOptions(
                mode=ConsumerMode.Resumable, checkpoint_dir=str(tmp_path / "ck")
            ),
        )
        consumer.start_to_memory("iggy_uri_q")
        assert spark.sql("SELECT COUNT(*) n FROM iggy_uri_q").collect()[0].n == 8


class TestSeaIggyBatchSource:
    def test_bounded_offset_scan(self, spark, server_root):
        _populate(server_root, parts=2, per=30)
        spark.dataSource.register(SeaIggyDataSource)
        df = (
            spark.read.format("sea_iggy")
            .option("topic", "events")
            .option("fake_root", server_root)
            .option("min_offset", "10")
            .option("max_offset", "19")
            .load()
        )
        rows = df.collect()
        assert len(rows) == 20  # 10 offsets x 2 partitions
        assert all(10 <= r.sequence <= 19 for r in rows)
