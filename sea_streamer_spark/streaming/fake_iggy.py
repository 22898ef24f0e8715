"""In-process Apache Iggy model — loopback test backend for the S15
connector, mirroring the subset of the Iggy server the reference backend
drives (sea-streamer-iggy): streams → topics → numbered partitions of
offset-sequenced, microsecond-timestamped messages; polling by
Offset/Timestamp/First/Last/Next (iggy/src/options.rs:71-84) with optional
per-consumer offset auto-commit (options.rs:87-97).

Same role fake_redis.FakeRedis plays for S4/S5: the polling engine in
``streaming/iggy.py`` runs its real code paths against this model; a wire
client (iggy-py) slots in without semantic changes.
"""

from __future__ import annotations


class FakeIggy:
    """Minimal in-memory Iggy server model (see module docstring)."""

    def __init__(self) -> None:
        # (stream, topic, partition) -> list[(offset, ts_us, payload_bytes)]
        self._parts: dict[tuple[str, str, int], list[tuple[int, int, bytes]]] = {}
        # (consumer, stream, topic, partition) -> last committed offset
        self._offsets: dict[tuple[str, str, str, int], int] = {}

    # -- producer side ----------------------------------------------------
    def send_messages(
        self,
        stream: str,
        topic: str,
        partition_id: int,
        messages: list[tuple[int, bytes]],
    ) -> list[int]:
        """Append (ts_us, payload) messages; returns assigned offsets
        (sequential per partition, like the server)."""
        part = self._parts.setdefault((stream, topic, partition_id), [])
        out = []
        next_off = part[-1][0] + 1 if part else 0
        for ts_us, payload in messages:
            part.append((next_off, int(ts_us), bytes(payload)))
            out.append(next_off)
            next_off += 1
        return out

    # -- metadata ---------------------------------------------------------
    def partition_ids(self, stream: str, topic: str) -> list[int]:
        return sorted(p for (s, t, p) in self._parts if (s, t) == (stream, topic))

    # -- consumer side ----------------------------------------------------
    def poll_messages(
        self,
        stream: str,
        topic: str,
        partition_id: int,
        strategy: str,
        value: int | None = None,
        count: int = 1000,
        consumer: str = "consumer",
        auto_commit: bool = True,
    ) -> list[tuple[int, int, bytes]]:
        """Poll up to ``count`` messages as (offset, ts_us, payload).

        Strategies (iggy/src/options.rs:71-84): ``offset`` from ``value``
        inclusive; ``timestamp`` from the first message with ts_us >=
        ``value``; ``first`` from the beginning; ``last`` the final message
        only; ``next`` after this consumer's committed offset (auto_commit
        advances it past what was polled — AutoCommit::AfterPolling).
        """
        part = self._parts.get((stream, topic, partition_id), [])
        key = (consumer, stream, topic, partition_id)
        if strategy == "offset":
            msgs = [m for m in part if m[0] >= int(value)]
        elif strategy == "timestamp":
            msgs = [m for m in part if m[1] >= int(value)]
        elif strategy == "first":
            msgs = list(part)
        elif strategy == "last":
            msgs = part[-1:]
        elif strategy == "next":
            after = self._offsets.get(key, -1)
            msgs = [m for m in part if m[0] > after]
        else:
            raise ValueError(f"unknown polling strategy {strategy!r}")
        msgs = msgs[:count]
        if auto_commit and msgs:
            self._offsets[key] = msgs[-1][0]
        return msgs

    def store_offset(
        self, consumer: str, stream: str, topic: str, partition_id: int, offset: int
    ) -> None:
        self._offsets[(consumer, stream, topic, partition_id)] = int(offset)
