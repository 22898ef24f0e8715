"""D4-D7: consumer-group ack/commit engine + XAUTOCLAIM failover.

Deterministic-time tests (manual clock) of sea_streamer_spark.streaming.ack
over the loopback broker's consumer-group surface — the semantics the
reference implements in redis/src/consumer/{options.rs,mod.rs,node.rs}.
"""

from __future__ import annotations

import pytest

from sea_streamer_spark.streaming.ack import AckOptions, AutoCommit, GroupConsumer
from sea_streamer_spark.streaming.fake_redis import FakeRedis, ResponseError


class Clock:
    def __init__(self, ms: int = 1_000_000) -> None:
        self.ms = ms

    def __call__(self) -> int:
        return self.ms

    def advance(self, ms: int) -> None:
        self.ms += ms


def seeded_broker(clock, shards: int = 2, per_shard: int = 6) -> FakeRedis:
    client = FakeRedis(clock=clock)
    for s in range(shards):
        key = "jobs" if s == 0 else f"jobs:{s}"
        for i in range(per_shard):
            client.xadd(key, {"payload": f"p-{s}-{i}".encode()}, id=f"{100 + i}-0")
    return client


def consumer(client, clock, name: str, mode: AutoCommit, **kw) -> GroupConsumer:
    return GroupConsumer(
        client,
        "jobs",
        [0, 1],
        group="g",
        consumer=name,
        options=AckOptions(mode=mode, **kw),
        clock=clock,
    )


class TestGroupCommands:
    def test_readgroup_delivers_past_cursor_and_fills_pel(self):
        clock = Clock()
        client = seeded_broker(clock)
        c = consumer(client, clock, "c1", AutoCommit.DISABLED)
        c.create_group()
        rows = c.read(count=4)
        # 4 per shard, id order within shard
        assert [(s, i) for s, i, _ in rows] == [
            (0, "100-0"), (0, "101-0"), (0, "102-0"), (0, "103-0"),
            (1, "100-0"), (1, "101-0"), (1, "102-0"), (1, "103-0"),
        ]
        assert len(client.xpending_range("jobs", "g", count=100)) == 4
        # a second read continues, never re-delivers
        rows2 = c.read(count=4)
        assert [(s, i) for s, i, _ in rows2] == [
            (0, "104-0"), (0, "105-0"), (1, "104-0"), (1, "105-0"),
        ]

    def test_busygroup_is_idempotent_and_nogroup_raises(self):
        clock = Clock()
        client = seeded_broker(clock)
        c = consumer(client, clock, "c1", AutoCommit.DISABLED)
        c.create_group()
        c.create_group()  # BUSYGROUP swallowed
        with pytest.raises(ResponseError, match="NOGROUP"):
            client.xack("jobs", "nope", "100-0")

    def test_history_replay_form_returns_own_pending_only(self):
        clock = Clock()
        client = seeded_broker(clock)
        c1 = consumer(client, clock, "c1", AutoCommit.DISABLED)
        c1.create_group()
        c1.read(count=2)
        c2 = consumer(client, clock, "c2", AutoCommit.DISABLED)
        c2.read(count=2)
        # c1 re-reads its own history from 0: only its 2 entries per shard
        got = client.xreadgroup("g", "c1", {"jobs": "0-0"}, count=10)
        assert [i for i, _ in got[0][1]] == ["100-0", "101-0"]

    def test_two_consumers_split_without_double_delivery(self):
        clock = Clock()
        client = seeded_broker(clock)
        c1 = consumer(client, clock, "c1", AutoCommit.DISABLED)
        c1.create_group()
        c2 = consumer(client, clock, "c2", AutoCommit.DISABLED)
        seen = [i for _, i, _ in c1.read(count=3)] + [
            i for _, i, _ in c2.read(count=3)
        ]
        assert len(seen) == 12  # 6 per shard x 2 shards, each exactly once
        own1 = {r["message_id"] for r in client.xpending_range("jobs", "g", count=99, consumername="c1")}
        own2 = {r["message_id"] for r in client.xpending_range("jobs", "g", count=99, consumername="c2")}
        assert own1 == {"100-0", "101-0", "102-0"}
        assert own2 == {"103-0", "104-0", "105-0"}


class TestAutoCommitModes:
    def test_immediate_noack_leaves_pel_empty(self):
        clock = Clock()
        client = seeded_broker(clock)
        c = consumer(client, clock, "c1", AutoCommit.IMMEDIATE)
        c.create_group()
        assert len(c.read()) == 12
        assert c.pending() == []
        assert c.tick() == 0

    def test_delayed_acks_after_auto_commit_delay(self):
        clock = Clock()
        client = seeded_broker(clock)
        c = consumer(client, clock, "c1", AutoCommit.DELAYED, auto_commit_delay_ms=5_000)
        c.create_group()
        c.read(count=2)  # 4 entries at t0
        clock.advance(3_000)
        c.read(count=2)  # 4 more at t0+3s
        clock.advance(2_500)  # t0+5.5s: first batch due, second not
        assert c.tick() == 4
        assert len(c.pending()) == 4
        clock.advance(3_000)
        assert c.tick() == 4
        assert c.pending() == []

    def test_rolling_flushes_at_interval_only(self):
        clock = Clock()
        client = seeded_broker(clock)
        c = consumer(client, clock, "c1", AutoCommit.ROLLING, auto_commit_interval_ms=1_000)
        c.create_group()
        rows = c.read(count=3)
        for sid, eid, _ in rows:
            c.ack(sid, eid)
        assert c.tick() == 0  # interval not elapsed
        assert len(c.pending()) == 6
        clock.advance(1_000)
        assert c.tick() == 6  # one batched XACK per shard
        assert c.pending() == []

    def test_disabled_only_commit_flushes(self):
        clock = Clock()
        client = seeded_broker(clock)
        c = consumer(client, clock, "c1", AutoCommit.DISABLED)
        c.create_group()
        for sid, eid, _ in c.read(count=2):
            c.ack(sid, eid)
        clock.advance(10 ** 6)
        assert c.tick() == 0
        assert len(c.pending()) == 4
        assert c.commit() == 4
        assert c.pending() == []

    def test_end_commits_everything_pending(self):
        clock = Clock()
        client = seeded_broker(clock)
        c = consumer(client, clock, "c1", AutoCommit.ROLLING)
        c.create_group()
        for sid, eid, _ in c.read():
            c.ack(sid, eid)
        assert c.end() == 12  # Kill commits pending (node.rs:244-265)
        assert c.pending() == []


class TestAutoClaimFailover:
    def test_dead_consumer_entries_claimed_and_reprocessed(self):
        clock = Clock()
        client = seeded_broker(clock)
        opts = dict(auto_claim_interval_ms=30_000, auto_claim_idle_ms=60_000)
        c1 = consumer(client, clock, "c1", AutoCommit.ROLLING, **opts)
        c1.create_group()
        c2 = consumer(client, clock, "c2", AutoCommit.ROLLING, **opts)
        for sid, eid, _ in c1.read(count=3):
            c1.ack(sid, eid)
        c2.read(count=3)  # c2 reads its half, then dies un-acked
        clock.advance(1_000)
        c1.tick()
        # interval gate: a poll before auto_claim_interval is a no-op
        assert c1.auto_claim() == []
        clock.advance(59_500)  # past claim interval, but idle = 60.5s > 60s
        claimed = c1.auto_claim()
        assert [(s, i, t) for s, i, _, t in claimed] == [
            (0, "103-0", 2), (0, "104-0", 2), (0, "105-0", 2),
            (1, "103-0", 2), (1, "104-0", 2), (1, "105-0", 2),
        ]
        # claimed entries are now c1's; acking them drains the group
        for sid, eid, _f, _t in claimed:
            c1.ack(sid, eid)
        c1.commit()
        assert c1.pending() == []

    def test_claim_resets_idle_so_no_double_claim(self):
        clock = Clock()
        client = seeded_broker(clock, shards=1)
        opts = dict(auto_claim_interval_ms=0, auto_claim_idle_ms=60_000)
        c1 = GroupConsumer(client, "jobs", [0], "g", "c1",
                           AckOptions(mode=AutoCommit.ROLLING, **opts), clock)
        c1.create_group()
        c2 = GroupConsumer(client, "jobs", [0], "g", "c2",
                           AckOptions(mode=AutoCommit.ROLLING, **opts), clock)
        c2.read()
        clock.advance(61_000)
        assert len(c1.auto_claim(force=True)) == 6
        # immediately after, idle is ~0 — another sweep claims nothing
        assert c1.auto_claim(force=True) == []
        # a third consumer can steal from c1 once idle re-elapses
        c3 = GroupConsumer(client, "jobs", [0], "g", "c3",
                           AckOptions(mode=AutoCommit.ROLLING, **opts), clock)
        clock.advance(61_000)
        claimed = c3.auto_claim(force=True)
        assert [t for _, _, _, t in claimed] == [3] * 6

    def test_trimmed_entries_dropped_from_pel_on_claim(self):
        clock = Clock()
        client = seeded_broker(clock, shards=1)
        c2 = GroupConsumer(client, "jobs", [0], "g", "c2",
                           AckOptions(mode=AutoCommit.ROLLING), clock)
        c2.create_group()
        c2.read()
        client.xtrim("jobs", maxlen=2)  # retention outruns the dead consumer
        clock.advance(120_000)
        c1 = GroupConsumer(client, "jobs", [0], "g", "c1",
                           AckOptions(mode=AutoCommit.ROLLING), clock)
        claimed = c1.auto_claim(force=True)
        assert [i for _, i, _, _ in claimed] == ["104-0", "105-0"]
        assert len(client.xpending_range("jobs", "g", count=99)) == 2

    def test_xpending_idle_filter(self):
        clock = Clock()
        client = seeded_broker(clock, shards=1)
        c = GroupConsumer(client, "jobs", [0], "g", "c1",
                          AckOptions(mode=AutoCommit.DISABLED), clock)
        c.create_group()
        c.read(count=3)
        clock.advance(5_000)
        c.read(count=3)
        old = client.xpending_range("jobs", "g", count=99, idle=4_000)
        assert [r["message_id"] for r in old] == ["100-0", "101-0", "102-0"]


class TestFileBackedGroups:
    def test_group_state_shared_across_instances(self, tmp_path):
        clock = Clock()
        root = str(tmp_path / "broker")
        a = FakeRedis(root=root, clock=clock)
        for i in range(4):
            a.xadd("jobs", {"payload": b"x"}, id=f"{100 + i}-0")
        a.xgroup_create("jobs", "g", id="0-0")
        b = FakeRedis(root=root, clock=clock)  # separate instance, same files
        got = b.xreadgroup("g", "c1", {"jobs": ">"}, count=2)
        assert [i for i, _ in got[0][1]] == ["100-0", "101-0"]
        # instance a sees the advanced cursor and c1's PEL
        got_a = a.xreadgroup("g", "c2", {"jobs": ">"}, count=9)
        assert [i for i, _ in got_a[0][1]] == ["102-0", "103-0"]
        assert b.xack("jobs", "g", "100-0", "102-0") == 2
        assert len(a.xpending_range("jobs", "g", count=99)) == 2
