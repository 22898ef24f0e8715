"""`.ss` format tests: golden-file replay (the reference's own fixture) and
write→read round-trips with beacon splicing."""

import os

import pytest

from sea_streamer_spark.sources.ss import (
    SsMessage,
    SsWriter,
    decode_header,
    iter_messages,
    read_ss,
    write_ss,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "sample-1.ss")


class TestGoldenFile:
    """file/tests/sample.rs:8-30 — stream `event` must yield seq 1..=22, then
    end-of-stream."""

    def test_replay(self):
        with open(GOLDEN, "rb") as f:
            data = f.read()
        # the consumer in sample.rs subscribes to stream `event`
        events = [m for m in iter_messages(data) if m.stream_key == "event"]
        assert [m.sequence for m in events] == list(range(1, 23))

    def test_header(self):
        with open(GOLDEN, "rb") as f:
            header = decode_header(f.read())
        assert header.beacon_interval > 0

    def test_crc_detects_corruption(self):
        with open(GOLDEN, "rb") as f:
            data = bytearray(f.read())
        # flip a byte well into the message area
        data[200] ^= 0xFF
        with pytest.raises(Exception):
            list(iter_messages(bytes(data)))


class TestRoundTrip:
    def _mk(self, n=50, payload_size=40):
        return [
            SsMessage("stream-a" if i % 2 == 0 else "stream-b", i % 3, i, 1700000000000 + i * 1000,
                      bytes([65 + (i + j) % 26 for j in range(payload_size)]))
            for i in range(n)
        ]

    @pytest.mark.parametrize("interval", [128, 200, 1024])
    def test_beacon_splicing(self, interval):
        """Small intervals force messages spliced across beacons."""
        w = SsWriter("t.ss", beacon_interval=interval)
        msgs = self._mk()
        for m in msgs:
            w.write(m)
        data = w.end(eos=True)
        out = list(iter_messages(data))
        assert [(m.stream_key, m.shard_id, m.sequence, m.timestamp_ms, m.payload) for m in out] == [
            (m.stream_key, m.shard_id, m.sequence, m.timestamp_ms, m.payload) for m in msgs
        ]

    def test_beacons_recorded(self):
        w = SsWriter("t.ss", beacon_interval=256)
        for m in self._mk(30):
            w.write(m)
        data = w.end()
        from sea_streamer_spark.sources.ss import _Cursor, decode_header

        h = decode_header(data)
        cur = _Cursor(data, h.beacon_interval)
        list(iter_messages(data))  # drive a full parse independently
        # beacons must appear at every interval multiple within the file
        n_expected = (len(data) - 1) // 256
        msgs_and_beacons = _Cursor(data, h.beacon_interval)
        consumed = list(iter_messages(data))
        assert len(consumed) == 30


class TestSparkSurface:
    def test_read_ss_golden(self, spark):
        df = read_ss(spark, GOLDEN).filter("stream_key = 'event'")
        rows = df.orderBy("sequence").collect()
        assert len(rows) == 22
        assert rows[0].stream_key == "event"
        assert rows[0].sequence == 1
        assert rows[-1].sequence == 22
        assert rows[0].timestamp is not None

    def test_write_read_spark(self, spark, tmp_path):
        from sea_streamer_spark.model import envelope_from_events
        from sea_streamer_spark.sources.tables import load_tables

        env = envelope_from_events(
            load_tables(spark, "/root/testdata/sf0.001", "events").events
        ).limit(100)
        path = str(tmp_path / "events.ss")
        n = write_ss(env, path, beacon_interval=4096)
        assert n == 100
        back = read_ss(spark, path)
        assert back.count() == 100
        orig = {(r.stream_key, r.sequence) for r in env.collect()}
        got = {(r.stream_key, r.sequence) for r in back.collect()}
        assert orig == got


class TestBeaconSeek:
    """Surveyor analog: beacon-index binary search prunes the scan
    (file/src/surveyor.rs:16-122; exactness rules messages.rs:262-279)."""

    def _build(self, n=400, interval=2048):
        w = SsWriter("seek.ss", beacon_interval=interval)
        for i in range(n):
            w.write(
                SsMessage(
                    stream_key="event",
                    shard_id=i % 2,
                    sequence=i,
                    timestamp_ms=1_700_000_000_000 + 100 * i,
                    payload=f"payload-{i:05d}".encode() * 3,
                )
            )
        return w.end(eos=True)

    def test_seek_by_timestamp_prunes_and_is_exact(self):
        from sea_streamer_spark.sources.ss import seek_offset

        data = self._build()
        target = 1_700_000_000_000 + 100 * 250  # mid-file
        off = seek_offset(data, timestamp_ms=target)
        assert off > 128  # actually skipped past the header region
        got = [m.sequence for m in iter_messages(data, start_offset=off)
               if m.timestamp_ms > target]
        full = [m.sequence for m in iter_messages(data) if m.timestamp_ms > target]
        assert got == full == list(range(251, 400))

    def test_seek_by_sequence_inclusive(self):
        from sea_streamer_spark.sources.ss import seek_offset

        data = self._build()
        off = seek_offset(data, sequence=300)
        got = [m.sequence for m in iter_messages(data, start_offset=off) if m.sequence >= 300]
        assert got == list(range(300, 400))

    def test_seek_before_everything_is_full_scan(self):
        from sea_streamer_spark.sources.ss import seek_offset

        data = self._build(n=50)
        assert seek_offset(data, timestamp_ms=0) == 128
        assert len(list(iter_messages(data, start_offset=128))) == 50

    def test_seek_past_everything_yields_nothing(self):
        from sea_streamer_spark.sources.ss import seek_offset

        data = self._build(n=50)
        off = seek_offset(data, timestamp_ms=2_000_000_000_000)
        tail = [m for m in iter_messages(data, start_offset=off) if not m.is_eos]
        # at most the messages after the final beacon remain to scan
        assert len(tail) <= 50
        assert [m for m in tail if m.timestamp_ms > 2_000_000_000_000] == []

    def test_seek_skips_most_of_large_file(self):
        from sea_streamer_spark.sources.ss import seek_offset

        data = self._build(n=2000, interval=2048)
        target = 1_700_000_000_000 + 100 * 1900
        off = seek_offset(data, timestamp_ms=target)
        assert off / len(data) > 0.9  # skipped >90% of the bytes


class TestReadSsSeek:
    def test_distributed_read_with_seek(self, spark, tmp_path):
        from sea_streamer_spark.sources.ss import read_ss

        w = SsWriter("d.ss", beacon_interval=2048)
        for i in range(300):
            w.write(SsMessage("event", 0, i, 1_700_000_000_000 + 1000 * i, b"x" * 40))
        data = w.end(eos=True)
        p = tmp_path / "d.ss"
        p.write_bytes(data)
        target = 1_700_000_000_000 + 1000 * 200
        df = read_ss(spark, str(p), since_timestamp_ms=target)
        seqs = sorted(r.sequence for r in df.collect())
        assert seqs == list(range(201, 300))
        df2 = read_ss(spark, str(p), since_sequence=250)
        assert sorted(r.sequence for r in df2.collect()) == list(range(250, 300))


class TestReadSsMultiFile:
    def test_directory_of_ss_files_parallel_parse(self, spark, tmp_path):
        from sea_streamer_spark.sources.ss import read_ss

        for f in range(3):
            w = SsWriter(f"part{f}.ss", beacon_interval=1024)
            for i in range(50):
                w.write(SsMessage("event", f, f * 1000 + i, 1_700_000_000_000 + i, b"x"))
            (tmp_path / f"part{f}.ss").write_bytes(w.end(eos=True))
        df = read_ss(spark, str(tmp_path))
        assert df.count() == 150
        # one task per file: distinct shard per file preserved
        assert df.select("shard_id").distinct().count() == 3
        assert df.rdd.getNumPartitions() >= 1


class TestSsDataSource:
    """format("ss"): beacon-split parallel read of a single container file."""

    def _write(self, path, n=2000, interval=1024):
        w = SsWriter("big.ss", beacon_interval=interval)
        for i in range(n):
            w.write(
                SsMessage("event", i % 4, i, 1_700_000_000_000 + i, f"payload-{i}".encode())
            )
        path.write_bytes(w.end(eos=True))

    def test_single_file_splits_cover_exactly(self, spark, tmp_path):
        from sea_streamer_spark.sources.ss_datasource import SsDataSource

        p = tmp_path / "big.ss"
        self._write(p)
        spark.dataSource.register(SsDataSource)
        df = spark.read.format("ss").option("splits", 8).load(str(p))
        assert df.rdd.getNumPartitions() > 1  # actually split
        rows = df.collect()
        assert len(rows) == 2000  # every message exactly once
        assert sorted(r.sequence for r in rows) == list(range(2000))
        # payloads survive intact through the split boundaries
        by_seq = {r.sequence: bytes(r.payload) for r in rows}
        assert by_seq[0] == b"payload-0" and by_seq[1999] == b"payload-1999"

    def test_splits_equal_serial_parse(self, spark, tmp_path):
        from sea_streamer_spark.sources.ss import iter_messages
        from sea_streamer_spark.sources.ss_datasource import SsDataSource

        p = tmp_path / "big2.ss"
        self._write(p, n=555, interval=2048)
        spark.dataSource.register(SsDataSource)
        df = spark.read.format("ss").option("splits", 5).load(str(p))
        parallel = {(r.stream_key, r.shard_id, r.sequence) for r in df.collect()}
        serial = {
            (m.stream_key, m.shard_id, m.sequence)
            for m in iter_messages(p.read_bytes())
        }
        assert parallel == serial


class TestSsLiveTail:
    """S10: readStream.format('ss') — live tail with byte-offset progress."""

    def _file_with(self, n, interval=1024):
        w = SsWriter("tail.ss", beacon_interval=interval)
        for i in range(n):
            w.write(SsMessage("event", 0, i, 1_700_000_000_000 + i, f"m{i}".encode()))
        return w.end(eos=False)

    def test_append_only_new_messages_per_batch(self, spark, tmp_path):
        from sea_streamer_spark.sources.ss_datasource import SsDataSource

        p = tmp_path / "tail.ss"
        data30 = self._file_with(30)
        data60 = self._file_with(60)
        assert data60[: len(data30)] == data30  # deterministic append prefix
        p.write_bytes(data30)

        spark.dataSource.register(SsDataSource)

        out = str(tmp_path / "out")

        def drain():
            q = (
                spark.readStream.format("ss")
                .load(str(p))
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", str(tmp_path / "ck"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return sorted(r.sequence for r in spark.read.parquet(out).collect())

        assert drain() == list(range(30))
        p.write_bytes(data60)  # "append" 30 more
        assert drain() == list(range(60))  # exactly the new 30 added

    def test_truncated_tail_is_retried(self, spark, tmp_path):
        from sea_streamer_spark.sources.ss import decode_header, parse_complete

        data = self._file_with(10)
        cut = data[: len(data) - 5]  # last message incomplete
        header = decode_header(cut)
        msgs, resume = parse_complete(cut, header.beacon_interval, 128)
        assert len(msgs) == 9
        # completing the file resumes exactly at the partial message
        msgs2, resume2 = parse_complete(data, header.beacon_interval, resume)
        assert [m.sequence for m in msgs2] == [9]
        assert resume2 == len(data)


class TestSsDataSourcePushdown:
    """Surveyor pushdown at planning time: sequence/timestamp lower bounds
    prune partitions; results stay exact (Spark re-applies the predicate)."""

    def _write(self, path, n=2000, interval=2048):
        w = SsWriter("pd.ss", beacon_interval=interval)
        for i in range(n):
            w.write(SsMessage("event", 0, i, 1_700_000_000_000 + 1000 * i, b"x" * 24))
        path.write_bytes(w.end(eos=True))

    def test_sequence_pushdown_prunes_and_is_exact(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from sea_streamer_spark.sources.ss_datasource import SsDataSource

        p = tmp_path / "pd.ss"
        self._write(p)
        spark.dataSource.register(SsDataSource)
        base = spark.read.format("ss").option("splits", 8).load(str(p))
        filtered = base.filter(F.col("sequence") >= 1800)
        assert sorted(r.sequence for r in filtered.collect()) == list(range(1800, 2000))
        # planning-level check: the pushed bound moves every partition's
        # start past the skippable prefix of the beacon index
        from pyspark.sql.datasource import GreaterThanOrEqual

        from sea_streamer_spark.sources.ss_datasource import SsDataSourceReader

        rd_full = SsDataSourceReader({"path": str(p), "splits": "8"})
        rd_push = SsDataSourceReader({"path": str(p), "splits": "8"})
        rd_push.pushFilters([GreaterThanOrEqual(("sequence",), 1800)])
        lo_full = min(pt.beacon_lo for pt in rd_full.partitions())
        lo_push = min(pt.beacon_lo for pt in rd_push.partitions())
        assert lo_full == 0 and lo_push > 0, (lo_full, lo_push)

    def test_timestamp_pushdown_exact(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from sea_streamer_spark.sources.ss_datasource import SsDataSource

        p = tmp_path / "pd2.ss"
        self._write(p)
        spark.dataSource.register(SsDataSource)
        cut = "2023-11-14"  # between ts range start and end
        import datetime as dt

        target = dt.datetime.fromtimestamp(1_700_000_000 + 1500, dt.timezone.utc)
        got = (
            spark.read.format("ss").load(str(p))
            .filter(F.col("timestamp") > F.lit(target))
            .count()
        )
        assert got == 2000 - 1501  # ts strictly greater


class TestDistributedWrite:
    """S9 at scale: write_ss_dir (per-partition container files, executor-side)
    + SsWriter.append_to recovery (messages.rs:419-515 parity)."""

    def test_write_dir_roundtrip_hash_equal(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from sea_streamer_spark.model import envelope_from_events
        from sea_streamer_spark.sources.ss import read_ss, write_ss_dir
        from sea_streamer_spark.sources.tables import load_tables

        env = envelope_from_events(
            load_tables(spark, "/root/testdata/sf0.001", "events").events
        )
        out = str(tmp_path / "dist_ss")
        summaries = write_ss_dir(env, out, beacon_interval=64 * 1024, num_files=6)
        n_files = len(summaries)
        assert n_files > 1  # genuinely distributed: multiple container files
        assert sum(s.messages for s in summaries) == env.count()

        def digest(df):
            # ms-truncate ts (the container stores millis) and hash everything
            return df.select(
                F.md5(
                    F.concat_ws(
                        "|",
                        "stream_key",
                        "shard_id",
                        "sequence",
                        F.unix_millis("timestamp"),
                        F.md5("payload"),
                    )
                ).alias("h")
            ).agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(30,0)")).alias("s")).collect()[0].s

        back = read_ss(spark, out)
        assert back.count() == env.count()
        env_ms = env.withColumn("timestamp", F.timestamp_millis(F.unix_millis("timestamp")))
        assert digest(env_ms) == digest(back)

    def test_each_partition_file_is_standalone_and_ordered(self, spark, tmp_path):
        from sea_streamer_spark.model import envelope_from_events
        from sea_streamer_spark.sources.ss import iter_messages, write_ss_dir
        from sea_streamer_spark.sources.tables import load_tables

        env = envelope_from_events(
            load_tables(spark, "/root/testdata/sf0.001", "events").events
        ).limit(500)
        out = str(tmp_path / "dist_ss2")
        summaries = write_ss_dir(env, out, beacon_interval=8192, num_files=5)
        seen_groups = {}
        for s in summaries:
            with open(s.path, "rb") as fh:
                msgs = list(iter_messages(fh.read()))
            assert len(msgs) == s.messages
            keys = [(m.timestamp_ms, m.stream_key, m.sequence) for m in msgs]
            assert keys == sorted(keys)  # well-ordered container
            for m in msgs:
                # a (stream, shard) group never straddles two files
                g = (m.stream_key, m.shard_id)
                assert seen_groups.setdefault(g, s.path) == s.path

    def test_append_to_resumes_after_eos_strip(self, tmp_path):
        from sea_streamer_spark.sources.ss import (
            SsMessage,
            SsWriter,
            iter_messages,
        )

        path = str(tmp_path / "a.ss")
        w = SsWriter("a.ss", beacon_interval=512)
        first = [
            SsMessage("s", 0, i, 1_000 + i, bytes([i % 251] * 90)) for i in range(10)
        ]
        for m in first:
            w.write(m)
        with open(path, "wb") as f:
            f.write(w.end(eos=True))  # EOS marker on disk

        w2, prefix = SsWriter.append_to(path)
        assert [(m.stream_key, m.sequence) for m in prefix] == [("s", i) for i in range(10)]
        more = [SsMessage("s", 0, 10 + i, 2_000 + i, b"Z" * 90) for i in range(5)]
        for m in more:
            w2.write(m)
        w2.end(eos=True)

        with open(path, "rb") as fh:
            msgs = list(iter_messages(fh.read()))  # CRC-verified full parse
        assert [(m.sequence, m.timestamp_ms) for m in msgs] == [
            (m.sequence, m.timestamp_ms) for m in first + more
        ]

    def test_torn_tail_recovery_sweep(self, tmp_path):
        """Truncate the container at EVERY byte position; append_to must trim
        to a complete prefix and continue to a file the strict parser accepts
        — beacon boundaries, spliced messages, torn beacons and all."""
        from sea_streamer_spark.sources.ss import (
            HEADER_SIZE,
            SsMessage,
            SsWriter,
            iter_messages,
        )

        w = SsWriter("t.ss", beacon_interval=256)
        msgs = [
            SsMessage("aa" if i % 2 else "bb", i % 2, i, 5_000 + i * 7, bytes([i] * (30 + i)))
            for i in range(16)
        ]
        for m in msgs:
            w.write(m)
        data = w.end(eos=False)
        tail = SsMessage("aa", 1, 99, 9_999, b"tail-msg" * 4)

        for cut in range(HEADER_SIZE, len(data) + 1, 3):
            path = str(tmp_path / f"cut.ss")
            with open(path, "wb") as f:
                f.write(data[:cut])
            w2, prefix = SsWriter.append_to(path)
            # prefix = the longest complete message run, in order
            assert [m.sequence for m in prefix] == list(range(len(prefix)))
            w2.write(tail)
            w2.end(eos=True)
            with open(path, "rb") as fh:
                got = list(iter_messages(fh.read()))
            assert [m.sequence for m in got] == [m.sequence for m in prefix] + [99]
            assert got[-1].payload == tail.payload
