"""Unit tests mirroring the reference's own unit-test vectors (SURVEY §5)."""

from datetime import datetime, timezone

import pytest

from sea_streamer_spark.functions.crc16 import RunningChecksum, crc16_cdma2000
from sea_streamer_spark.model import InvalidStreamKey, StreamKey
from sea_streamer_spark.sources.stdio import LineParseError, format_line, parse_line
from sea_streamer_spark.uri import (
    NoEndingSlash,
    StreamerUri,
    StreamUrl,
    reader_config,
)


class TestCrc16:
    def test_known_answer(self):
        # format.rs:586-608 / the public CRC-16/CDMA2000 check value
        assert crc16_cdma2000(b"123456789") == 0x4C06
        assert crc16_cdma2000(b"hello, world") == 0x8028

    def test_running_checksum(self):
        # running checksum folds message checksums big-endian (format.rs:470-504)
        rc = RunningChecksum()
        a = crc16_cdma2000(b"hello")
        b = crc16_cdma2000(b"world")
        rc.update(a)
        rc.update(b)
        manual = crc16_cdma2000(a.to_bytes(2, "big") + b.to_bytes(2, "big"))
        assert rc.crc == manual


class TestStreamKey:
    def test_valid(self):
        assert StreamKey("my-fancy_topic.1") == "my-fancy_topic.1"

    @pytest.mark.parametrize("bad", ["", "has space", "x" * 250, "ünïcode", "a/b"])
    def test_invalid(self, bad):
        with pytest.raises(InvalidStreamKey):
            StreamKey(bad)


class TestStreamUrl:
    # vectors from types/src/streamer.rs:254-392
    def test_multi_node_kafka(self):
        u = StreamUrl.parse("kafka://node-a:1234,node-b:1234/stream_a,stream_b")
        assert u.streamer.protocol == "kafka"
        assert u.streamer.nodes == ("node-a:1234", "node-b:1234")
        assert u.streams == ("stream_a", "stream_b")

    def test_redis_single(self):
        u = StreamUrl.parse("redis://localhost/a")
        assert u.stream_key() == "a"

    def test_stdio_no_host(self):
        u = StreamUrl.parse("stdio:///a,b")
        assert u.streamer.protocol == "stdio"
        assert u.streams == ("a", "b")

    def test_trailing_slash_empty_streams(self):
        u = StreamUrl.parse("redis://localhost/")
        assert u.streams == ()

    def test_no_ending_slash_err(self):
        with pytest.raises(NoEndingSlash):
            StreamUrl.parse("redis://localhost")

    def test_streamer_uri_no_slash_ok(self):
        u = StreamerUri.parse("kafka://a:1,b:2")
        assert u.nodes == ("a:1", "b:2")

    def test_reader_config_kafka(self):
        fmt, opts = reader_config("kafka://n1:9092,n2:9092/s1,s2")
        assert fmt == "kafka"
        assert opts["kafka.bootstrap.servers"] == "n1:9092,n2:9092"
        assert opts["subscribe"] == "s1,s2"


class TestStdioParser:
    # the 8 vectors from stdio/src/parser.rs:112-249
    def test_0_plain(self):
        p = parse_line("a plain, raw message")
        assert p.payload == "a plain, raw message"
        assert p.stream_key is None and p.timestamp is not None

    def test_1_ts_only(self):
        p = parse_line('[2022-01-02T03:04:05] { "payload": "anything" }')
        assert p.timestamp == datetime(2022, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
        assert p.stream_key is None
        assert p.payload == '{ "payload": "anything" }'

    def test_2_ts_key_subsec(self):
        p = parse_line('[2022-01-02T03:04:05.678 | my-fancy_topic.1] ["array", "of", "values"]')
        assert p.timestamp == datetime(2022, 1, 2, 3, 4, 5, 678000, tzinfo=timezone.utc)
        assert p.stream_key == "my-fancy_topic.1"
        assert p.sequence is None and p.shard_id is None

    def test_3_ts_key_seq(self):
        p = parse_line("[2022-01-02T03:04:05 | my-fancy_topic.1 | 123] a string payload")
        assert p.sequence == 123 and p.shard_id is None
        assert p.payload == "a string payload"

    def test_4_ts_key_seq_shard(self):
        p = parse_line('[2022-01-02T03:04:05 | my-fancy_topic.1 | 123 | 4] { "payload": "anything" }')
        assert p.sequence == 123 and p.shard_id == 4

    def test_5_key_only(self):
        p = parse_line('[my-fancy_topic.1] { "payload": "anything" }')
        assert p.timestamp is None and p.stream_key == "my-fancy_topic.1"

    def test_6_key_seq(self):
        p = parse_line('[my-fancy_topic.1 | 123] ["array", "of", "values"]')
        assert p.stream_key == "my-fancy_topic.1" and p.sequence == 123

    def test_7_key_seq_shard(self):
        p = parse_line('[my-fancy_topic.1 | 123 | 4] { "payload": "anything" }')
        assert p.shard_id == 4

    def test_error_blank_meta(self):
        with pytest.raises(LineParseError):
            parse_line("[ ]")

    def test_roundtrip(self):
        line = format_line(
            "hello", datetime(2022, 1, 2, 3, 4, 5), "topic.a", 7, 2
        )
        p = parse_line(line)
        assert (p.stream_key, p.sequence, p.shard_id, p.payload) == ("topic.a", 7, 2, "hello")


class TestErrors:
    """types/src/error.rs taxonomy + unassign contract."""

    def test_taxonomy_roots(self):
        from sea_streamer_spark import errors as E

        for exc in (E.TimedOut, E.NotAnchored, E.ConsumerGroupIsSet,
                    E.StreamKeyEmpty, E.Backend):
            assert issubclass(exc, E.StreamErr)
            assert issubclass(exc, Exception)

    def test_unassign_contract(self, spark, tmp_path):
        import pytest as _pytest

        from sea_streamer_spark.errors import StreamErr
        from sea_streamer_spark.model import envelope_from_events
        from sea_streamer_spark.sources.tables import load_tables
        from sea_streamer_spark.streaming import ConsumerOptions, create_consumer

        d = str(tmp_path / "s")
        env = envelope_from_events(load_tables(spark, "/root/testdata/sf0.001", "events").events)
        env.limit(5).write.parquet(d)
        c = create_consumer(spark, f"file://{d}/", ConsumerOptions())
        with _pytest.raises(StreamErr):
            c.unassign(0)  # never assigned
        c2 = c.assign(0, 1)
        assert c2.unassign(1).options.assigned_shards == (0,)
        with _pytest.raises(StreamErr):
            c2.unassign(0, 1)  # would leave nothing


class TestJsonlIngest:
    """JSONL corpus ingestion with quarantine capture (sources/jsonl.py)."""

    def test_clean_and_corrupt_split(self, spark, tmp_path):
        p = tmp_path / "corpus.jsonl"
        p.write_text(
            '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}\n'
            'this is not json at all\n'
            '{"doc_id": 2, "text": "hola mundo", "lang": "es", "source": "web"}\n'
            '{"doc_id": 3, "text": "unterminated\n'
        )
        from sea_streamer_spark.sources.jsonl import (
            read_documents_jsonl,
            split_quarantine,
        )

        df = read_documents_jsonl(spark, str(p))
        clean, quarantine = split_quarantine(df)
        rows = {r.doc_id: r for r in clean.collect()}
        assert set(rows) == {1, 2}
        assert rows[1].text == "hello world" and rows[2].lang == "es"
        bad = [r.raw_line for r in quarantine.collect()]
        assert len(bad) == 2
        assert any("not json" in b for b in bad)
        # quarantine keeps the raw line verbatim for repair
        assert any(b.startswith('{"doc_id": 3') for b in bad)

    def test_missing_fields_are_null_not_corrupt(self, spark, tmp_path):
        p = tmp_path / "partial.jsonl"
        p.write_text('{"doc_id": 9, "text": "no lang field"}\n')
        from sea_streamer_spark.sources.jsonl import (
            read_documents_jsonl,
            split_quarantine,
        )

        clean, quarantine = split_quarantine(read_documents_jsonl(spark, str(p)))
        assert quarantine.count() == 0
        r = clean.collect()[0]
        assert r.doc_id == 9 and r.lang is None


class TestCsvIngest:
    """CSV corpus ingestion with quarantine capture (sources/csvsrc.py)."""

    def test_clean_and_corrupt_split(self, spark, tmp_path):
        p = tmp_path / "corpus.csv"
        p.write_text(
            "doc_id,text,lang,source\n"
            '1,"hello, world",en,web\n'
            "not-a-number,broken row,xx,web\n"
            '2,"quoted ""escape"" inside",es,web\n'
        )
        from sea_streamer_spark.sources.csvsrc import (
            read_documents_csv,
            split_quarantine,
        )

        df = read_documents_csv(spark, str(p))
        clean, quarantine = split_quarantine(df)
        rows = {r.doc_id: r for r in clean.collect()}
        assert set(rows) == {1, 2}
        assert rows[1].text == "hello, world"  # embedded delimiter survives
        assert rows[2].text == 'quoted "escape" inside'  # escaped quotes
        bad = [r.raw_line for r in quarantine.collect()]
        assert len(bad) == 1 and bad[0].startswith("not-a-number")

    def test_wrong_column_count_quarantines(self, spark, tmp_path):
        p = tmp_path / "short.csv"
        p.write_text("doc_id,text,lang,source\n7,only-two-fields\n")
        from sea_streamer_spark.sources.csvsrc import (
            read_documents_csv,
            split_quarantine,
        )

        clean, quarantine = split_quarantine(read_documents_csv(spark, str(p)))
        # CSV PERMISSIVE fills missing trailing columns with null (that is
        # the documented reader contract — too-few fields are nulls, only
        # unparseable TYPED fields corrupt); the typed doc_id parsed fine
        assert clean.count() + quarantine.count() == 1

    def test_headerless_and_custom_sep(self, spark, tmp_path):
        p = tmp_path / "pipe.csv"
        p.write_text("11|first text|en|web\n12|second text|de|books\n")
        from sea_streamer_spark.sources.csvsrc import (
            read_documents_csv,
            split_quarantine,
        )

        clean, quarantine = split_quarantine(
            read_documents_csv(spark, str(p), header=False, sep="|")
        )
        assert quarantine.count() == 0
        assert {r.doc_id for r in clean.collect()} == {11, 12}
