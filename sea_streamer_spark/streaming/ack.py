"""Ack / commit / auto-claim engine (D4-D7) over Redis consumer groups.

The reference's Redis backend ships its own at-least-once machinery:

- **AutoCommit modes** (redis/src/consumer/options.rs:15-34; defaults
  consumer/mod.rs:70-79): ``Immediate`` (XREADGROUP NOACK — nothing enters
  the PEL), ``Delayed`` (every read is auto-acked once it is older than
  ``auto_commit_delay``, default 5 s), ``Rolling`` (the user acks, the
  engine flushes queued acks at most every ``auto_commit_interval``,
  default 1 s — "recommended for at-least-once"), ``Disabled`` (manual
  ack + explicit commit only).
- **ack / commit machinery** (redis/src/consumer/mod.rs:186-281;
  node.rs:244-265, 372-430): acks queue in a channel, are batched *per
  shard* into one XACK, a forced ``commit()`` flushes immediately with a
  receipt, and shutdown (Kill) commits everything still pending.
- **XAUTOCLAIM failover** (redis/src/consumer/node.rs:647-744; options
  redis/src/consumer/options.rs:200-222): every ``auto_claim_interval``
  (30 s) a consumer claims peers' entries idle longer than
  ``auto_claim_idle`` (60 s) — dead-consumer recovery.

On Spark, checkpointed offset ranges subsume per-message acks for the
*source* path (SURVEY §2.5) — but a user migrating reference pipelines that
interoperate with non-Spark group consumers on the same streams still needs
the group/PEL contract. This module is that contract, deterministic-time
(injectable clock) and client-agnostic (redis-py or the loopback model).
Driver-checked by ``redis_group_pending_summary`` /
``redis_group_autoclaim_failover`` in plans/streaming_ops.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from .redis import shard_key


class AutoCommit(Enum):
    """redis/src/consumer/options.rs:15-34."""

    IMMEDIATE = "immediate"  # XREADGROUP NOACK: acked by the act of reading
    DELAYED = "delayed"      # auto-ack reads older than auto_commit_delay
    ROLLING = "rolling"      # manual ack, flushed every auto_commit_interval
    DISABLED = "disabled"    # manual ack, flushed only by commit()/end()


@dataclass
class AckOptions:
    """Defaults mirror consumer/mod.rs:70-79 and options.rs:200-222."""

    mode: AutoCommit = AutoCommit.ROLLING
    auto_commit_delay_ms: int = 5_000
    auto_commit_interval_ms: int = 1_000
    auto_claim_interval_ms: int = 30_000
    auto_claim_idle_ms: int = 60_000
    batch_size: int = 100  # consumer/mod.rs:74-75


@dataclass
class _QueuedAck:
    entry_id: str
    queued_ms: int


class GroupConsumer:
    """One named consumer in a Redis consumer group, with the reference's
    ack batching and auto-claim loop re-expressed synchronously: the caller
    (a foreachBatch body, a test, a driver loop) provides the cadence that
    tokio timers provide in the reference — each ``read()`` / ``tick()``
    call is one turn of node.rs's event loop.
    """

    def __init__(
        self,
        client,
        stream_key: str,
        shard_ids: list[int],
        group: str,
        consumer: str,
        options: AckOptions | None = None,
        clock=None,
    ) -> None:
        self.client = client
        self.stream_key = stream_key
        self.shard_ids = list(shard_ids)
        self.group = group
        self.consumer = consumer
        self.opts = options or AckOptions()
        self._clock = clock
        self._pending: dict[str, list[_QueuedAck]] = {}  # shard key → queued acks
        self._last_commit_ms = self._now_ms()
        self._last_claim_ms = self._now_ms()

    def _now_ms(self) -> int:
        if self._clock is not None:
            return int(self._clock())
        import time

        return int(time.time() * 1000)

    # -- group lifecycle ---------------------------------------------------
    def create_group(self, from_beginning: bool = True, mkstream: bool = False) -> None:
        """XGROUP CREATE per shard key (idempotent — BUSYGROUP swallowed,
        consumer/mod.rs:283-356's setup). ``mkstream`` maps the reference's
        ``set_mkstream`` (options.rs): without it, creating a group on a
        stream that does not exist yet is an error (consumer-group.rs)."""
        for sid in self.shard_ids:
            try:
                self.client.xgroup_create(
                    shard_key(self.stream_key, sid),
                    self.group,
                    id="0-0" if from_beginning else "$",
                    mkstream=mkstream,
                )
            except Exception as e:  # noqa: BLE001 — BUSYGROUP is expected
                if "BUSYGROUP" not in str(e):
                    raise

    # -- read path ---------------------------------------------------------
    def read(self, count: int | None = None) -> list[tuple[int, str, dict]]:
        """One XREADGROUP ``>`` page across this consumer's shards; returns
        ``(shard_id, entry_id, fields)`` rows. ``Immediate`` passes NOACK
        (options.rs:19-22); ``Delayed`` queues the auto-ack at read time —
        it becomes due ``auto_commit_delay`` later (options.rs:23-27)."""
        count = count or self.opts.batch_size
        noack = self.opts.mode is AutoCommit.IMMEDIATE
        now = self._now_ms()
        rows: list[tuple[int, str, dict]] = []
        for sid in self.shard_ids:
            key = shard_key(self.stream_key, sid)
            for _key, batch in self.client.xreadgroup(
                self.group, self.consumer, {key: ">"}, count=count, noack=noack
            ):
                for entry_id, fields in batch:
                    rows.append((sid, entry_id, fields))
                    if self.opts.mode is AutoCommit.DELAYED:
                        self._pending.setdefault(key, []).append(
                            _QueuedAck(entry_id, now)
                        )
        return rows

    def read_pending(self, count: int | None = None) -> list[tuple[int, str, dict]]:
        """Restart recovery: XREADGROUP with the concrete id ``0`` re-delivers
        THIS consumer's own un-acked (PEL) entries — what a reference
        consumer does on reconnect before switching to ``>`` (Redis docs;
        consumer/mod.rs's pending-first replay). Distinct from
        :meth:`auto_claim`, which transfers OTHER consumers' idle entries.
        Re-delivered entries queue a Delayed auto-ack exactly like a fresh
        read."""
        count = count or self.opts.batch_size
        now = self._now_ms()
        rows: list[tuple[int, str, dict]] = []
        for sid in self.shard_ids:
            key = shard_key(self.stream_key, sid)
            for _key, batch in self.client.xreadgroup(
                self.group, self.consumer, {key: "0"}, count=count
            ):
                for entry_id, fields in batch:
                    rows.append((sid, entry_id, fields))
                    if self.opts.mode is AutoCommit.DELAYED:
                        self._pending.setdefault(key, []).append(
                            _QueuedAck(entry_id, now)
                        )
        return rows

    # -- ack path ----------------------------------------------------------
    def ack(self, shard_id: int, entry_id: str) -> None:
        """Queue an ack (mod.rs:186-224). Ignored under ``Immediate``
        (already NOACK) and a no-op repeat under ``Delayed`` (the read
        queued it)."""
        if self.opts.mode in (AutoCommit.IMMEDIATE, AutoCommit.DELAYED):
            return
        key = shard_key(self.stream_key, shard_id)
        self._pending.setdefault(key, []).append(_QueuedAck(entry_id, self._now_ms()))

    def _flush(self, due_only: bool) -> int:
        """Batched XACK — one call per shard for everything flushable
        (node.rs:372-430). ``due_only`` applies the Delayed age gate."""
        now = self._now_ms()
        n = 0
        for key, queue in list(self._pending.items()):
            if due_only and self.opts.mode is AutoCommit.DELAYED:
                due = [q for q in queue if now - q.queued_ms >= self.opts.auto_commit_delay_ms]
                keep = [q for q in queue if now - q.queued_ms < self.opts.auto_commit_delay_ms]
            else:
                due, keep = queue, []
            if due:
                n += self.client.xack(key, self.group, *[q.entry_id for q in due])
            if keep:
                self._pending[key] = keep
            else:
                del self._pending[key]
        return n

    def tick(self) -> int:
        """One timer turn: flush what the mode says is due now. ``Rolling``
        flushes at most every ``auto_commit_interval`` (options.rs:28-33);
        ``Delayed`` flushes reads older than ``auto_commit_delay``;
        ``Disabled`` never flushes here."""
        mode, now = self.opts.mode, self._now_ms()
        if mode is AutoCommit.DISABLED or mode is AutoCommit.IMMEDIATE:
            return 0
        if mode is AutoCommit.ROLLING:
            if now - self._last_commit_ms < self.opts.auto_commit_interval_ms:
                return 0
            self._last_commit_ms = now
            return self._flush(due_only=False)
        return self._flush(due_only=True)

    def commit(self) -> int:
        """commit_asap (mod.rs:246-263): flush everything queued, now; the
        return count is the receipt."""
        self._last_commit_ms = self._now_ms()
        return self._flush(due_only=False)

    def end(self) -> int:
        """Shutdown: Kill commits all pending acks (node.rs:244-265)."""
        return self.commit()

    # -- failover (D7) -----------------------------------------------------
    def auto_claim(self, force: bool = False) -> list[tuple[int, str, dict, int]]:
        """The XAUTOCLAIM poll (node.rs:647-744): every
        ``auto_claim_interval``, claim peers' entries idle ≥
        ``auto_claim_idle`` into this consumer. Returns
        ``(shard_id, entry_id, fields, times_delivered)`` for re-processing;
        claimed entries must be acked like any read."""
        now = self._now_ms()
        if not force and now - self._last_claim_ms < self.opts.auto_claim_interval_ms:
            return []
        self._last_claim_ms = now
        out: list[tuple[int, str, dict, int]] = []
        for sid in self.shard_ids:
            key = shard_key(self.stream_key, sid)
            cursor = "0-0"
            while True:
                cursor, claimed, _deleted = self.client.xautoclaim(
                    key,
                    self.group,
                    self.consumer,
                    min_idle_time=self.opts.auto_claim_idle_ms,
                    start_id=cursor,
                    count=self.opts.batch_size,
                )
                if claimed:
                    # XPENDING per page (not per entry) for the delivery
                    # counters; paginate until every claimed id is resolved —
                    # the id span may interleave arbitrarily many of this
                    # consumer's other un-acked entries, so a single capped
                    # call could miss claimed ids (and silently reporting
                    # times_delivered=1 would let poison messages evade
                    # delivery-count thresholds)
                    ids = [entry_id for entry_id, _ in claimed]
                    times_by_id: dict[str, int] = {}
                    lo = ids[0]
                    while True:
                        pend = self.client.xpending_range(
                            key, self.group, min=lo, max=ids[-1],
                            count=1000, consumername=self.consumer,
                        )
                        for p in pend:
                            times_by_id[p["message_id"]] = p["times_delivered"]
                        if len(pend) < 1000 or all(i in times_by_id for i in ids):
                            break
                        from .redis import format_entry_id, next_after, parse_entry_id

                        lo = format_entry_id(
                            next_after(parse_entry_id(pend[-1]["message_id"]))
                        )
                    for entry_id, fields in claimed:
                        out.append((sid, entry_id, fields, times_by_id[entry_id]))
                if cursor == "0-0":
                    break
        return out

    def pending(self, count: int = 1000) -> list[dict]:
        """XPENDING over this consumer's shards (all consumers' entries) —
        each row gains a ``shard_id``."""
        rows = []
        for sid in self.shard_ids:
            key = shard_key(self.stream_key, sid)
            for r in self.client.xpending_range(key, self.group, count=count):
                rows.append({"shard_id": sid, **r})
        return rows
