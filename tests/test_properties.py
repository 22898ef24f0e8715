"""Property-based tests (hypothesis) for the pure codecs: stdio line
protocol, Redis MessageId packing, CRC16 incremental chaining, StreamKey
validation, and the .ss container round-trip.

These mirror the reference's unit-test layer (SURVEY §5) but sweep the input
space instead of fixed vectors.
"""

from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from sea_streamer_spark.functions.crc16 import crc16_cdma2000, crc16_update
from sea_streamer_spark.model import InvalidStreamKey, StreamKey, is_valid_stream_key
from sea_streamer_spark.sources.stdio import format_line, parse_line
from sea_streamer_spark.streaming.redis import (
    next_after,
    pack_message_id,
    parse_entry_id,
    format_entry_id,
    unpack_message_id,
)

KEY_ALPHABET = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789._-"
keys = st.text(alphabet=KEY_ALPHABET, min_size=1, max_size=40).filter(
    # a purely-numeric "key" is parsed as a sequence number; a key that parses
    # as a timestamp is taken as one — both are protocol ambiguities by design
    lambda s: not s.isdigit() and not s[:1].isdigit()
)
payloads = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="[]\n\r"),
    max_size=120,
).map(str.strip)


class TestStdioLineProtocol:
    @given(
        key=keys,
        seq=st.integers(min_value=0, max_value=2**53),
        shard=st.integers(min_value=0, max_value=2**31),
        payload=payloads,
        ts=st.datetimes(
            min_value=datetime(1971, 1, 1), max_value=datetime(2200, 1, 1)
        ).map(lambda d: d.replace(microsecond=0, tzinfo=timezone.utc)),
    )
    @settings(max_examples=200, deadline=None)
    def test_format_parse_roundtrip(self, key, seq, shard, payload, ts):
        line = format_line(payload, timestamp=ts, stream_key=key, sequence=seq, shard_id=shard)
        got = parse_line(line)
        assert got.stream_key == key
        assert got.sequence == seq
        assert got.shard_id == shard
        assert got.payload == payload
        assert got.timestamp == ts

    @given(payload=payloads.filter(lambda p: p and not p.startswith("[")))
    @settings(max_examples=100, deadline=None)
    def test_bare_payload_gets_now_timestamp(self, payload):
        now = datetime(2024, 5, 1, tzinfo=timezone.utc)
        got = parse_line(payload, now=now)
        assert got.payload == payload and got.timestamp == now and got.stream_key is None


class TestRedisMessageId:
    @given(ms=st.integers(0, (1 << 48) - 1), seq=st.integers(0, 0xFFFF))
    @settings(max_examples=300, deadline=None)
    def test_pack_unpack_roundtrip(self, ms, seq):
        packed = pack_message_id(ms, seq)
        assert unpack_message_id(packed) == (ms, seq)
        assert parse_entry_id(format_entry_id(packed)) == packed

    @given(ms=st.integers(0, (1 << 48) - 2), seq=st.integers(0, 0xFFFF))
    @settings(max_examples=300, deadline=None)
    def test_next_after_is_successor(self, ms, seq):
        packed = pack_message_id(ms, seq)
        assert next_after(packed) == packed + 1  # packing is order-isomorphic

    @given(
        a=st.tuples(st.integers(0, (1 << 48) - 1), st.integers(0, 0xFFFF)),
        b=st.tuples(st.integers(0, (1 << 48) - 1), st.integers(0, 0xFFFF)),
    )
    @settings(max_examples=300, deadline=None)
    def test_order_preserved(self, a, b):
        # (ms, seq) lexicographic order == packed integer order
        assert (a < b) == (pack_message_id(*a) < pack_message_id(*b))


class TestCrc16:
    @given(data=st.binary(max_size=200), split=st.integers(0, 200))
    @settings(max_examples=300, deadline=None)
    def test_incremental_equals_oneshot(self, data, split):
        split = min(split, len(data))
        inc = crc16_update(crc16_update(0xFFFF, data[:split]), data[split:])
        assert inc == crc16_cdma2000(data)


class TestStreamKeyProperty:
    @given(name=st.text(alphabet=KEY_ALPHABET, min_size=1, max_size=249))
    @settings(max_examples=200, deadline=None)
    def test_valid_names_accepted(self, name):
        assert is_valid_stream_key(name)
        assert StreamKey(name) == name

    @given(name=st.text(min_size=1, max_size=30).filter(lambda s: any(c not in KEY_ALPHABET for c in s)))
    @settings(max_examples=200, deadline=None)
    def test_invalid_chars_rejected(self, name):
        assert not is_valid_stream_key(name)
        try:
            StreamKey(name)
            raise AssertionError("expected InvalidStreamKey")
        except InvalidStreamKey:
            pass


class TestSsRoundtripProperty:
    @given(
        msgs=st.lists(
            st.tuples(
                st.sampled_from(["alpha", "beta", "gamma-1"]),
                st.integers(0, 3),
                st.binary(max_size=300),
            ),
            min_size=1,
            max_size=25,
        ),
        beacon_interval=st.sampled_from([128, 512, 1024]),
    )
    @settings(max_examples=25, deadline=None)
    def test_write_read_roundtrip(self, msgs, beacon_interval):
        from sea_streamer_spark.sources.ss import SsMessage, SsWriter, iter_messages

        w = SsWriter("t.ss", beacon_interval=beacon_interval)
        base_ms = 1_700_000_000_000
        for i, (key, shard, payload) in enumerate(msgs):
            w.write(
                SsMessage(
                    stream_key=key,
                    shard_id=shard,
                    sequence=i,
                    timestamp_ms=base_ms + 1000 * i,
                    payload=payload,
                )
            )
        data = w.end(eos=True)
        got = [m for m in iter_messages(data) if not m.is_eos]
        assert len(got) == len(msgs)
        for i, ((key, shard, payload), m) in enumerate(zip(msgs, got)):
            assert (m.stream_key, m.shard_id, m.sequence, m.payload) == (key, shard, i, payload)
