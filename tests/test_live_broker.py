"""Live-broker integration suite (VERDICT r4 task #3; r3 task #3).

Ports the reference's Redis integration assertions — the tests it runs
against a real broker — onto this repo's wire client and consumer engine:

- realtime.rs:67-98   — latest sees [5..9] then realtime tail; earliest
                        replays [0..9]; two-stream subscribe.
- seek-rewind.rs:23-29 — mid-stream rewind/seek across batch sizes 1/5/25:
                        rewind(Beginning) replays, rewind(At(s)) resumes
                        after s, seek(ts) is timestamp-exclusive,
                        rewind(End) sees only new messages.
- load-balanced.rs:80-92 — two consumers, one group: both make progress,
                        every message delivered exactly once.
- sharding.rs:52-63   — RoundRobin producer: message i lands on shard
                        i % 3, receipts strictly increase, a full consumer
                        reads the union back.

Target selection: ``BROKERS_URL=redis://host:port`` drives a REAL broker
(the reference's env var, realtime.rs:31-38). Unset, the suite runs against
the in-repo RESP2 TCP server (``resp_server.py``) — same client, same wire
bytes, one env var from real proof. Stream keys are timestamped per run
(the reference's ``{TEST}-{now_ms}`` convention) so reruns never collide
and no cleanup is required on a shared broker.

Production parity note: messages are produced with EXPLICIT entry ids
derived from (wall-clock ms, sub-ms seq) — the repo's real sink semantics
(streaming/redis.py xadd_commands: explicit ids ⇒ idempotent replay, D9
receipts) — which real Redis accepts for any monotonically increasing ids.
"""

from __future__ import annotations

import os
import time
from urllib.parse import urlparse

import pytest

from sea_streamer_spark.streaming.ack import AckOptions, AutoCommit, GroupConsumer
from sea_streamer_spark.streaming.fake_redis import FakeRedis
from sea_streamer_spark.streaming.redis import (
    MAX_SEQ16,
    format_entry_id,
    pack_message_id,
    parse_entry_id,
    poll_shards,
    shard_key,
    unpack_message_id,
)
from sea_streamer_spark.streaming.resp import RespClient
from sea_streamer_spark.streaming.resp_server import RespServer

BROKERS_URL = os.environ.get("BROKERS_URL")


@pytest.fixture()
def broker():
    """(host, port) of the broker under test: $BROKERS_URL if set, else an
    in-process RESP2 loopback server speaking the same wire protocol."""
    if BROKERS_URL:
        p = urlparse(BROKERS_URL)
        assert p.scheme in ("redis", "rediss"), BROKERS_URL
        yield p.hostname or "localhost", p.port or 6379
        return
    srv = RespServer(FakeRedis())
    host, port = srv.serve_background()
    yield host, port
    srv.shutdown()


@pytest.fixture()
def client(broker):
    c = RespClient(*broker)
    assert c.ping()
    yield c
    c.close()


def _stream(test: str) -> str:
    """Unique stream key per run — realtime.rs:44-49's `{TEST}-{now_ms}`."""
    return f"{test}-{time.time_ns() // 1_000_000}"


class Producer:
    """Explicit-id producer over the wire client: entry id = (ms, seq16)
    with ms from the wall clock and seq bumped within one ms — the packing
    of redis/src/message.rs:84-88 and this repo's sink id rule. ``send``
    returns the receipt as a packed SeqNo (D9: the id IS the receipt)."""

    def __init__(self, client: RespClient, stream: str):
        self.client, self.stream = client, stream
        self._last_ms, self._last_seq = 0, -1

    def send(self, value: int, shard: int = 0) -> int:
        ms = max(int(time.time() * 1000), self._last_ms)
        seq = self._last_seq + 1 if ms == self._last_ms else 0
        if seq > MAX_SEQ16:
            ms, seq = ms + 1, 0
        self._last_ms, self._last_seq = ms, seq
        seq_no = pack_message_id(ms, seq)
        eid = self.client.xadd(
            shard_key(self.stream, shard),
            {"payload": str(value).encode()},
            id=format_entry_id(seq_no),
        )
        assert parse_entry_id(eid) == seq_no
        return seq_no


class WireConsumer:
    """Poll-loop consumer over :func:`poll_shards` (the engine's micro-batch
    read) with a delivery buffer, mirroring util.rs ``consume(&mut c, n)``:
    take exactly n, keep the overflow buffered for the next call."""

    def __init__(self, client, streams, shards=(0,), last=None, count=100):
        self.client = client
        self.streams = [streams] if isinstance(streams, str) else list(streams)
        self.shards = list(shards)
        self.last = {s: dict(last or {}) for s in self.streams}
        self.count = count
        self.buf: list[int] = []

    def next_n(self, n: int, deadline: float = 10.0) -> list[int]:
        t0 = time.monotonic()
        while len(self.buf) < n:
            for s in self.streams:
                rows, self.last[s] = poll_shards(
                    self.client, s, self.shards, self.last[s], count=self.count
                )
                self.buf.extend(int(bytes(r["payload"]).decode()) for r in rows)
            if len(self.buf) < n:
                assert time.monotonic() - t0 < deadline, (
                    f"timeout: delivered {len(self.buf)}/{n}"
                )
                time.sleep(0.01)
        out, self.buf = self.buf[:n], self.buf[n:]
        return out


def _latest_offsets(client, stream: str, shards=(0,)) -> dict[int, int]:
    """AutoStreamReset::Latest — position at the current stream tail."""
    out: dict[int, int] = {}
    for sid in shards:
        tail = client.xrevrange(shard_key(stream, sid), count=1)
        if tail:
            out[sid] = parse_entry_id(tail[0][0])
    return out


class TestRealtime:
    def test_latest_vs_earliest_then_realtime(self, client):
        """realtime.rs:56-127 verbatim: receipts increase; Latest starts at
        [5..9]; Earliest replays [0..9]; both then follow the live tail,
        including a second stream subscribed from the start."""
        a, b = _stream("realtime") + "a", _stream("realtime") + "b"
        producer = Producer(client, a)
        producer_b = Producer(client, b)

        sequence = 0
        for i in range(5):
            receipt = producer.send(i)
            assert receipt > sequence  # should always increase
            sequence = receipt

        # AutoStreamReset::Latest — create BEFORE producing 5..9
        half = WireConsumer(client, a, last=_latest_offsets(client, a))
        for i in range(5, 10):
            producer.send(i)

        # AutoStreamReset::Earliest over BOTH streams
        full = WireConsumer(client, [a, b])

        assert half.next_n(5) == [5, 6, 7, 8, 9]  # Stream latest ... ok
        assert full.next_n(10) == list(range(10))  # Stream history ... ok

        for i in range(10, 13):
            producer.send(i)
        assert full.next_n(2) == [10, 11]

        for i in range(13, 15):
            producer.send(i)
        for i in range(15, 20):
            producer_b.send(i)

        assert full.next_n(3) == [12, 13, 14]
        assert full.next_n(5) == [15, 16, 17, 18, 19]  # Stream realtime ... ok


class TestSeekRewind:
    @pytest.mark.parametrize("batch_size", [1, 5, 25])
    def test_seek_rewind_mid_stream(self, client, batch_size):
        """seek-rewind.rs:30-120: head → rewind(Beginning) → rewind(At(s))
        → seek(ts) (exclusive) → rewind(End) + live tail, across the
        reference's batch-size grid."""
        stream = _stream(f"seek-rewind-{batch_size}")
        producer = Producer(client, stream)

        one_third = point_ms = 0
        for i in range(30):
            receipt = producer.send(i)
            if i == 29:
                one_third = receipt
                point_ms = unpack_message_id(receipt)[0]
        time.sleep(0.002)  # the reference's 1 ms gap before message 30
        for i in range(30, 100):
            producer.send(i)

        seeker = WireConsumer(client, stream, count=batch_size)
        assert seeker.next_n(10) == list(range(10))  # Stream head ... ok

        # rewind(SeqPos::Beginning)
        seeker = WireConsumer(client, stream, count=batch_size)
        assert seeker.next_n(10) == list(range(10))  # Stream again ... ok

        # rewind(SeqPos::At(one_third)): resume after that receipt
        seeker = WireConsumer(
            client, stream, last={0: one_third}, count=batch_size
        )
        assert seeker.next_n(10) == list(range(30, 40))  # Stream rewind ... ok

        # seek(point_in_time): timestamp-EXCLUSIVE (T1) — everything in a
        # later millisecond, nothing at point_ms itself
        seeker = WireConsumer(
            client,
            stream,
            last={0: pack_message_id(point_ms, MAX_SEQ16)},
            count=batch_size,
        )
        assert seeker.next_n(10) == list(range(30, 40))  # Stream seek ... ok

        # rewind(SeqPos::End): only messages produced from now on
        seeker = WireConsumer(
            client,
            stream,
            last=_latest_offsets(client, stream),
            count=batch_size,
        )
        for i in range(100, 110):
            producer.send(i)
        assert seeker.next_n(5) == list(range(100, 105))
        assert seeker.next_n(5) == list(range(105, 110))  # Stream latest ... ok


class TestLoadBalanced:
    def test_two_consumers_split_the_stream(self, client):
        """load-balanced.rs:58-150: two consumers in ONE group (different
        consumer ids), batch size 1 — both make progress and the union is
        exactly-once delivery of all ten messages."""
        stream = _stream("balanced-1")
        producer = Producer(client, stream)
        for i in range(5):
            producer.send(i)

        opts = AckOptions(mode=AutoCommit.DISABLED)
        alpha = GroupConsumer(client, stream, [0], "g", "alpha", opts)
        beta = GroupConsumer(client, stream, [0], "g", "beta", opts)
        alpha.create_group(from_beginning=True)
        assert alpha.group == beta.group  # same (default) group ...
        assert alpha.consumer != beta.consumer  # ... distinct consumer ids

        for i in range(5, 10):
            producer.send(i)

        numbers: list[int] = []
        a_count = b_count = 0
        deadline = time.monotonic() + 10.0
        while len(numbers) < 10:
            assert time.monotonic() < deadline, f"delivered {len(numbers)}/10"
            for who, consumer in (("a", alpha), ("b", beta)):
                got = consumer.read(count=1)  # batch_size = 1
                for _sid, _eid, fields in got:
                    numbers.append(int(bytes(fields["payload"]).decode()))
                    if who == "a":
                        a_count += 1
                    else:
                        b_count += 1
        assert a_count > 0 and b_count > 0, (a_count, b_count)
        assert sorted(numbers) == list(range(10))  # exactly once, no dup


class TestSharding:
    def test_round_robin_producer_and_full_consumer(self, client):
        """sharding.rs:47-80: RoundRobinSharder(3) — message i lands on
        shard i % 3, receipts strictly increase across shards, and an
        Earliest consumer over all shards reads the union back."""
        shards = 3
        stream = _stream("sharding")
        producer = Producer(client, stream)

        sequence = 0
        for i in range(10):
            receipt = producer.send(i, shard=i % shards)
            assert receipt > sequence  # should always increase
            sequence = receipt
            time.sleep(0.001)  # the reference's 1 ms spacing

        # each shard key holds exactly the i % 3 == sid messages
        for sid in range(shards):
            entries = client.xrange(shard_key(stream, sid))
            vals = [int(bytes(f["payload"]).decode()) for _eid, f in entries]
            assert vals == [i for i in range(10) if i % shards == sid]

        full = WireConsumer(client, stream, shards=list(range(shards)))
        assert sorted(full.next_n(10)) == list(range(10))

        for i in range(10, 20):
            producer.send(i, shard=i % shards)
        assert sorted(full.next_n(10)) == list(range(10, 20))


class TestResumable:
    """resumable.rs `immediate_and_delayed` (lines 12-118): auto-ack modes —
    Latest group sees only the tail, Earliest group replays history, ended
    consumers leave a clean PEL, and a restarted same-group consumer resumes
    after the committed position."""

    @pytest.mark.parametrize("mode", [AutoCommit.IMMEDIATE, AutoCommit.DELAYED])
    def test_commit_then_resume(self, client, mode):
        stream = _stream(f"resumable-1-{mode.value}")
        producer = Producer(client, stream)
        sequence = 0
        for i in range(5):
            receipt = producer.send(i)
            assert receipt > sequence
            sequence = receipt

        opts = AckOptions(mode=mode, auto_commit_delay_ms=0)
        half = GroupConsumer(client, stream, [0], f"{stream}a", f"{stream}a", opts)
        half.create_group(from_beginning=False)  # AutoStreamReset::Latest ($)
        full = GroupConsumer(client, stream, [0], f"{stream}b", f"{stream}b", opts)
        full.create_group(from_beginning=True)  # Earliest

        def vals(rows):
            return [int(bytes(f["payload"]).decode()) for _s, _e, f in rows]

        got = vals(full.read(count=5))
        assert got == [0, 1, 2, 3, 4]  # Stream history ... ok

        for i in range(5, 10):
            producer.send(i)
        full.end()  # commit (flush queued acks) and end BEFORE reading more

        assert vals(half.read(count=5)) == [5, 6, 7, 8, 9]  # Stream latest

        # resume from last committed: a NEW consumer in the same group —
        # 0..4 are acked (IMMEDIATE = NOACK; DELAYED delay-0 = flushed by
        # end), so nothing is pending and `>` yields exactly the tail
        full2 = GroupConsumer(client, stream, [0], f"{stream}b", f"{stream}b", opts)
        assert full2.pending() == []
        assert vals(full2.read(count=5)) == [5, 6, 7, 8, 9]


class TestRollingDisabled:
    """resumable.rs `rolling_and_disabled` (lines 120-250): manual ack —
    un-acked entries survive in the PEL and come back to a restarted
    consumer (claimed via XAUTOCLAIM, the engine's restart/failover path),
    while a group that never commits replays everything."""

    @pytest.mark.parametrize(
        "mode", [AutoCommit.ROLLING, AutoCommit.DISABLED]
    )
    def test_partial_ack_then_resume(self, client, mode):
        stream = _stream(f"resumable-2-{mode.value}")
        producer = Producer(client, stream)
        for i in range(5):
            producer.send(i)

        opts = AckOptions(
            mode=mode,
            auto_commit_interval_ms=0,
            auto_claim_interval_ms=0,
            auto_claim_idle_ms=0,
        )
        c = GroupConsumer(client, stream, [0], f"{stream}c", f"{stream}c", opts)
        c.create_group(from_beginning=True)
        no_commit = GroupConsumer(
            client, stream, [0], f"{stream}d", f"{stream}d",
            AckOptions(mode=AutoCommit.DISABLED),
        )
        no_commit.create_group(from_beginning=True)

        def vals(rows3):
            return [int(bytes(f["payload"]).decode()) for _s, _e, f in rows3]

        # reading alone populates group d's PEL; it never acks or commits
        assert vals(no_commit.read(count=5)) == [0, 1, 2, 3, 4]

        read = c.read(count=5)
        assert vals(read) == [0, 1, 2, 3, 4]
        for i, (sid, eid, _f) in enumerate(read):
            if i < 4:  # ack only the first 4 — entry #4 stays pending
                c.ack(sid, eid)
        if mode is AutoCommit.ROLLING:
            assert c.tick() == 4  # interval-0 rolling flush on the tick
        else:
            assert c.commit() == 4  # manual commit

        for i in range(5, 10):
            producer.send(i)
        del c  # no clean end: the un-acked entry stays in group c's PEL

        # restart: same group + consumer id. The un-acked entry (4) comes
        # back through the claim path; `>` continues with the new messages.
        c2 = GroupConsumer(client, stream, [0], f"{stream}c", f"{stream}c", opts)
        replayed = [
            int(bytes(f["payload"]).decode())
            for _s, _e, f, _times in c2.auto_claim(force=True)
        ]
        assert replayed == [4]
        assert vals(c2.read(count=6)) == [5, 6, 7, 8, 9]

        # the never-committing group replays its entire history
        d2 = GroupConsumer(
            client, stream, [0], f"{stream}d", f"{stream}d",
            AckOptions(mode=AutoCommit.DISABLED, auto_claim_idle_ms=0),
        )
        replayed = [
            int(bytes(f["payload"]).decode())
            for _s, _e, f, _times in d2.auto_claim(force=True)
        ]
        assert replayed == [0, 1, 2, 3, 4]  # Stream resume ... ok


class TestConsumerGroupMkstream:
    """consumer-group.rs: XGROUP CREATE on a stream that does not exist yet
    errors without MKSTREAM; with it, the group attaches to an empty stream
    and consumes everything produced afterwards."""

    def test_without_mkstream_errors(self, client):
        stream = _stream("consumer-group")
        consumer = GroupConsumer(
            client, stream, [0], f"{stream}g", f"{stream}g",
            AckOptions(mode=AutoCommit.DISABLED),
        )
        with pytest.raises(Exception, match="requires the key to exist"):
            consumer.create_group(from_beginning=True)

    def test_with_mkstream_consumes_later_messages(self, client):
        stream = _stream("consumer-group-mk")
        consumer = GroupConsumer(
            client, stream, [0], f"{stream}g", f"{stream}g",
            AckOptions(mode=AutoCommit.DISABLED),
        )
        consumer.create_group(from_beginning=True, mkstream=True)
        producer = Producer(client, stream)
        last = 0
        for i in range(5):
            receipt = producer.send(i)
            assert receipt > last
            last = receipt
        got = [int(bytes(f["payload"]).decode()) for _s, _e, f in consumer.read(count=5)]
        assert got == [0, 1, 2, 3, 4]


class TestRealtimeMulti:
    """realtime-multi.rs: a RealTime consumer over (busy, quiet) streams —
    the reference regression where a never-delivered quiet stream re-anchored
    to `$` on every XREAD and silently lost messages produced between reads.
    This engine's poll model keeps an explicit per-(stream, shard) offset
    (never re-anchors), so the quiet message MUST arrive."""

    def test_quiet_stream_messages_are_not_lost(self, client):
        busy = _stream("realtime-multi") + "-busy"
        quiet = _stream("realtime-multi") + "-quiet"
        p_busy, p_quiet = Producer(client, busy), Producer(client, quiet)
        # Latest over both streams, captured BEFORE anything is produced
        consumer = WireConsumer(client, [busy, quiet])

        for i in range(10):
            p_busy.send(i)
        got = set(consumer.next_n(10))  # several polls of the busy stream
        assert got == set(range(10))
        # quiet stream produces ONE message after the busy reads returned
        p_quiet.send(99)
        for i in range(10, 15):
            p_busy.send(i)
        got = set(consumer.next_n(6))
        assert 99 in got, "quiet stream message was lost"
        assert got == {99, 10, 11, 12, 13, 14}


class TestPendingReplay:
    """Restart recovery via XREADGROUP id 0 (read_pending): a reconnecting
    consumer re-delivers its OWN un-acked entries before reading new ones —
    the reference's pending-first replay, distinct from XAUTOCLAIM
    failover (which transfers a PEER's entries)."""

    def test_restart_replays_own_pel_then_continues(self, client):
        stream = _stream("pending-replay")
        producer = Producer(client, stream)
        for i in range(6):
            producer.send(i)

        opts = AckOptions(mode=AutoCommit.DISABLED)
        c = GroupConsumer(client, stream, [0], f"{stream}g", f"{stream}g", opts)
        c.create_group(from_beginning=True)

        def vals(rows3):
            return [int(bytes(f["payload"]).decode()) for _s, _e, f in rows3]

        read = c.read(count=6)
        assert vals(read) == [0, 1, 2, 3, 4, 5]
        for i, (sid, eid, _f) in enumerate(read):
            if i < 3:
                c.ack(sid, eid)
        c.commit()  # 0..2 acked; 3..5 stay in this consumer's PEL
        del c

        c2 = GroupConsumer(client, stream, [0], f"{stream}g", f"{stream}g", opts)
        assert vals(c2.read_pending()) == [3, 4, 5]  # own PEL first ...
        for i in range(6, 9):
            producer.send(i)
        assert vals(c2.read(count=3)) == [6, 7, 8]  # ... then `>` continues
        # nothing was acked, so the `>` reads joined the PEL as well: a
        # second replay re-delivers ALL six (un-acked reads stay pending)
        assert vals(c2.read_pending(count=10)) == [3, 4, 5, 6, 7, 8]
