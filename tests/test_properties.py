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


class TestFakeRedisModel:
    """The loopback broker model must obey Redis Streams invariants, since
    the connector's e2e evidence rests on it."""

    @given(
        ids=st.lists(
            st.tuples(st.integers(0, 1 << 20), st.integers(0, 0xFFFF)),
            min_size=1, max_size=40, unique=True,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_xadd_accepts_exactly_strictly_increasing(self, ids):
        from sea_streamer_spark.streaming.fake_redis import FakeRedis, ResponseError

        client = FakeRedis()
        top = None
        accepted = 0
        for ms, seq in ids:
            try:
                client.xadd("s", {"payload": b""}, id=f"{ms}-{seq}")
                ok = True
            except ResponseError:
                ok = False
            should = top is None or (ms, seq) > top
            assert ok == should, ((ms, seq), top)
            if ok:
                top = (ms, seq)
                accepted += 1
        assert client.xlen("s") == accepted

    @given(
        n=st.integers(1, 30),
        lo=st.integers(0, 40),
        hi=st.integers(0, 40),
        count=st.integers(1, 10),
    )
    @settings(max_examples=60, deadline=None)
    def test_xrange_inclusive_bounds_and_count(self, n, lo, hi, count):
        from sea_streamer_spark.streaming.fake_redis import FakeRedis

        client = FakeRedis()
        for i in range(n):
            client.xadd("s", {"payload": b""}, id=f"{i}-0")
        got = client.xrange("s", min=f"{lo}-0", max=f"{hi}-0", count=count)
        expect = [i for i in range(n) if lo <= i <= hi][:count]
        assert [int(e[0].split("-")[0]) for e in got] == expect

    @given(cut=st.integers(0, 30))
    @settings(max_examples=30, deadline=None)
    def test_poll_resume_partition(self, cut):
        """poll_shards from offsets == suffix of a full poll (no gap/overlap)."""
        from sea_streamer_spark.streaming.fake_redis import FakeRedis
        from sea_streamer_spark.streaming.redis import poll_shards

        client = FakeRedis()
        for i in range(30):
            client.xadd("s", {"payload": bytes([i])}, id=f"{i}-0")
        full, _ = poll_shards(client, "s", [0], count=1000)
        head, offsets = poll_shards(client, "s", [0], count=cut or 1)
        tail, _ = poll_shards(client, "s", [0], offsets, count=1000)
        seqs = [r["sequence"] for r in head] + [r["sequence"] for r in tail]
        assert seqs == [r["sequence"] for r in full]


class TestFakeIggyModel:
    @given(
        lengths=st.lists(st.integers(1, 10), min_size=1, max_size=4),
        strategy_off=st.integers(0, 12),
    )
    @settings(max_examples=60, deadline=None)
    def test_offsets_dense_and_offset_poll_is_suffix(self, lengths, strategy_off):
        from sea_streamer_spark.streaming.fake_iggy import FakeIggy

        client = FakeIggy()
        total = 0
        for chunk_len in lengths:
            msgs = [(1000 * (total + i), b"p") for i in range(chunk_len)]
            offs = client.send_messages("s", "t", 0, msgs)
            assert offs == list(range(total, total + chunk_len))
            total += chunk_len
        got = client.poll_messages("s", "t", 0, "offset", value=strategy_off, count=1000)
        assert [m[0] for m in got] == list(range(min(strategy_off, total), total))

    @given(data=st.data())
    @settings(max_examples=40, deadline=None)
    def test_next_is_gapless_under_random_interleaving(self, data):
        """Interleaved produce/poll("next") delivers every message exactly
        once, in order — the Resumable contract the engine builds on."""
        from sea_streamer_spark.streaming.fake_iggy import FakeIggy

        client = FakeIggy()
        produced = 0
        seen = []
        for _ in range(data.draw(st.integers(1, 12))):
            if data.draw(st.booleans()):
                k = data.draw(st.integers(1, 5))
                client.send_messages("s", "t", 0, [(produced + i, b"") for i in range(k)])
                produced += k
            else:
                got = client.poll_messages(
                    "s", "t", 0, "next", count=data.draw(st.integers(1, 7)),
                    consumer="c", auto_commit=True,
                )
                seen.extend(m[0] for m in got)
        rest = client.poll_messages("s", "t", 0, "next", count=10_000, consumer="c")
        seen.extend(m[0] for m in rest)
        assert seen == list(range(produced))
