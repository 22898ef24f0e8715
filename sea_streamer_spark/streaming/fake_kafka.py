"""In-process Kafka model — the loopback broker for validating the S1/S2
mapping's *semantics* without a server (the role fake_redis plays for S4/S5).

The live Kafka path is Spark's built-in JVM source (streaming/consumer.py),
so unlike Redis there is no Python wire client to drive; what this model
verifies is that the option mapping ``kafka_options``/``kafka.py`` encodes —
earliest/latest offset reset, committed-offset resume, load-balanced
partition assignment, seek-by-timestamp — delivers exactly the message sets
Kafka's documented semantics promise. Implements the broker surface those
semantics rest on:

- topics of N partitions, each an append-only offset log (offset = position);
- ``offsets_for_times``: the first offset whose timestamp >= target (how
  Kafka's ``startingTimestamp`` / reference seek(ts) resolves,
  kafka/src/consumer.rs:454-495);
- per-group committed offsets (the Resumable/D2 resume point);
- range partition assignment (consumer.rs:638-654's description: partitions
  split contiguously, extras to the first members; 1 partition + N consumers
  = hot standby).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FakeRecord:
    topic: str
    partition: int
    offset: int
    timestamp_ms: int
    key: bytes | None
    value: bytes
    txn_id: str | None = None


class FakeKafka:
    """Minimal in-memory Kafka broker (see module docstring).

    Transactions (S3 substrate): records produced under an open
    transactional id are appended to the log immediately (real Kafka does
    the same — transactional records occupy offsets) but are invisible to
    ``read_committed`` fetches until the txn commits; aborted records stay
    in the log and remain visible only to ``read_uncommitted``. Offsets
    sent to a transaction commit atomically with it (EOS
    consume-transform-produce). Simplification vs the real broker: we
    filter per record by final txn state instead of modeling the LSO
    watermark + abort markers — same visibility outcome for this model's
    single-broker tests.
    """

    def __init__(self) -> None:
        self._logs: dict[tuple[str, int], list[FakeRecord]] = {}
        self._partitions: dict[str, int] = {}
        self._committed: dict[tuple[str, str, int], int] = {}
        self._rr: dict[str, int] = {}
        #: txn INSTANCE ("id#epoch") → state: "open" | "committed" | "aborted"
        #: — per-instance so a committed batch stays committed when the same
        #: transactional id begins its next transaction (Kafka epoch bump)
        self._txns: dict[str, str] = {}
        self._txn_epoch: dict[str, int] = {}
        self._txn_instance: dict[str, str] = {}  # txn_id → current instance
        #: offsets staged by an open txn: instance → {(group, topic, part): off}
        self._txn_offsets: dict[str, dict[tuple[str, str, int], int]] = {}

    # -- topics ------------------------------------------------------------
    def create_topic(self, topic: str, partitions: int = 1) -> None:
        if topic in self._partitions:
            raise ValueError(f"topic exists: {topic}")
        self._partitions[topic] = partitions
        for p in range(partitions):
            self._logs[(topic, p)] = []

    def partitions_for(self, topic: str) -> list[int]:
        return list(range(self._partitions.get(topic, 0)))

    # -- producer ----------------------------------------------------------
    def produce(
        self,
        topic: str,
        value: bytes,
        key: bytes | None = None,
        partition: int | None = None,
        timestamp_ms: int = 0,
        txn_id: str | None = None,
    ) -> tuple[int, int]:
        """Append one record; returns (partition, offset) — the receipt.
        Partitioning: explicit > hash(key) % n > round-robin (the rdkafka
        default partitioner family). ``txn_id`` must name an OPEN
        transaction (begin_transaction first)."""
        if txn_id is not None:
            inst = self._txn_instance.get(txn_id)
            if inst is None or self._txns.get(inst) != "open":
                raise RuntimeError(f"transaction not open: {txn_id!r}")
            txn_id = inst  # records reference the instance, not the bare id
        if topic not in self._partitions:
            self.create_topic(topic, 1)
        n = self._partitions[topic]
        if partition is None:
            if key is not None:
                partition = sum(key) % n  # any deterministic keyed spread
            else:
                partition = self._rr.get(topic, 0) % n
                self._rr[topic] = partition + 1
        log = self._logs[(topic, partition)]
        rec = FakeRecord(topic, partition, len(log), timestamp_ms, key, value, txn_id)
        log.append(rec)
        return partition, rec.offset

    # -- consumer ----------------------------------------------------------
    def fetch(
        self,
        topic: str,
        partition: int,
        offset: int,
        max_records: int | None = None,
        isolation: str = "read_uncommitted",
    ) -> list[FakeRecord]:
        out = self._logs.get((topic, partition), [])[max(offset, 0) :]
        if isolation == "read_committed":
            out = [
                r for r in out
                if r.txn_id is None or self._txns.get(r.txn_id) == "committed"
            ]
        out = out if max_records is None else out[:max_records]
        return out

    def beginning_offset(self, topic: str, partition: int) -> int:
        return 0

    def end_offset(self, topic: str, partition: int) -> int:
        """The NEXT offset to be produced (Kafka's high watermark)."""
        return len(self._logs.get((topic, partition), []))

    def offsets_for_times(self, topic: str, partition: int, timestamp_ms: int) -> int | None:
        """First offset whose record timestamp >= target; None when every
        record is older (Kafka ListOffsets semantics)."""
        for rec in self._logs.get((topic, partition), []):
            if rec.timestamp_ms >= timestamp_ms:
                return rec.offset
        return None

    # -- transactions (S3) -------------------------------------------------
    def begin_txn(self, txn_id: str) -> None:
        """Open the next transaction for a transactional id (epoch bump —
        earlier committed/aborted batches keep their state); a
        concurrently-open same-id txn errors like producer fencing."""
        inst = self._txn_instance.get(txn_id)
        if inst is not None and self._txns.get(inst) == "open":
            raise RuntimeError(f"transaction already open: {txn_id!r}")
        epoch = self._txn_epoch.get(txn_id, -1) + 1
        self._txn_epoch[txn_id] = epoch
        inst = f"{txn_id}#{epoch}"
        self._txn_instance[txn_id] = inst
        self._txns[inst] = "open"
        self._txn_offsets[inst] = {}

    def _open_instance(self, txn_id: str) -> str:
        inst = self._txn_instance.get(txn_id)
        if inst is None or self._txns.get(inst) != "open":
            raise RuntimeError(f"transaction not open: {txn_id!r}")
        return inst

    def stage_txn_offset(
        self, txn_id: str, group: str, topic: str, partition: int, offset: int
    ) -> None:
        """send_offsets_to_transaction: the group offset commits if and only
        if the transaction commits (EOS consume-transform-produce)."""
        inst = self._open_instance(txn_id)
        self._txn_offsets[inst][(group, topic, partition)] = offset

    def commit_txn(self, txn_id: str) -> None:
        inst = self._open_instance(txn_id)
        self._txns[inst] = "committed"
        for (group, topic, part), off in self._txn_offsets.pop(inst).items():
            self._committed[(group, topic, part)] = off

    def abort_txn(self, txn_id: str) -> None:
        inst = self._open_instance(txn_id)
        self._txns[inst] = "aborted"
        self._txn_offsets.pop(inst)  # staged offsets die with the txn

    # -- consumer groups ---------------------------------------------------
    def commit(self, group: str, topic: str, partition: int, offset: int) -> None:
        """Commit the offset of the NEXT message to consume (Kafka's
        convention: committed = last processed + 1)."""
        self._committed[(group, topic, partition)] = offset

    def committed(self, group: str, topic: str, partition: int) -> int | None:
        return self._committed.get((group, topic, partition))

    @staticmethod
    def range_assign(members: list[str], partitions: list[int]) -> dict[str, list[int]]:
        """Range assignor: sorted partitions split contiguously over sorted
        members; the first ``extra`` members get one more. 2 members x 3
        partitions → [p0,p1] + [p2]; 1 partition x N members → first member
        owns it, the rest stand by (hot failover, consumer.rs:652-654)."""
        members = sorted(members)
        partitions = sorted(partitions)
        n, m = len(partitions), len(members)
        per, extra = divmod(n, m)
        out: dict[str, list[int]] = {}
        pos = 0
        for i, member in enumerate(members):
            take = per + (1 if i < extra else 0)
            out[member] = partitions[pos : pos + take]
            pos += take
        return out


def resolve_start_offset(
    broker: FakeKafka,
    topic: str,
    partition: int,
    group: str | None,
    auto_offset_reset: str,
    starting_timestamp_ms: int | None = None,
) -> int:
    """The starting offset a consumer actually reads from — the semantics the
    ``kafka_options`` mapping relies on:

    1. an explicit timestamp (seek/T1, already +1ms'd by the mapping for
       ts-exclusivity) resolves via offsets-for-times; no record that new →
       the log end (nothing replayed);
    2. else a committed group offset wins (Resumable/D2 resume);
    3. else ``auto.offset.reset``: earliest → 0, latest → high watermark.
    """
    if starting_timestamp_ms is not None:
        off = broker.offsets_for_times(topic, partition, starting_timestamp_ms)
        return off if off is not None else broker.end_offset(topic, partition)
    if group is not None:
        committed = broker.committed(group, topic, partition)
        if committed is not None:
            return committed
    if auto_offset_reset == "earliest":
        return broker.beginning_offset(topic, partition)
    if auto_offset_reset == "latest":
        return broker.end_offset(topic, partition)
    raise LookupError(f"no offset and auto.offset.reset={auto_offset_reset!r}")
