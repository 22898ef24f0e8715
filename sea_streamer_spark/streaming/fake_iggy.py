"""In-process Apache Iggy model — loopback test backend for the S15
connector, mirroring the subset of the Iggy server the reference backend
drives (sea-streamer-iggy): streams → topics → numbered partitions of
offset-sequenced, microsecond-timestamped messages; polling by
Offset/Timestamp/First/Last/Next (iggy/src/options.rs:71-84) with optional
per-consumer offset auto-commit (options.rs:87-97).

Same role fake_redis.FakeRedis plays for S4/S5: the polling engine in
``streaming/iggy.py`` runs its real code paths against this model; a wire
client (iggy-py) slots in without semantic changes.

``FakeIggy(root=dir)`` is file-backed (flock-guarded append logs, one per
partition), so separate executor processes share one server — the property
the registered ``sea_iggy`` DataSource's partitioned reads need to run true
end-to-end in one container (same trick as ``FakeRedis(root=…)``).
"""

from __future__ import annotations

import json
import os
from contextlib import contextmanager
from urllib.parse import quote

_SUFFIX = ".part"


class FakeIggy:
    """Minimal Iggy server model (see module docstring)."""

    def __init__(self, root: str | None = None) -> None:
        self._root = root
        # (stream, topic, partition) -> list[(offset, ts_us, payload_bytes)]
        self._parts: dict[tuple[str, str, int], list[tuple[int, int, bytes]]] = {}
        # (consumer, stream, topic, partition) -> last committed offset
        self._offsets: dict[tuple[str, str, str, int], int] = {}
        if root is not None:
            os.makedirs(root, exist_ok=True)

    # -- storage layer -----------------------------------------------------
    def _path(self, stream: str, topic: str, pid: int) -> str:
        assert self._root is not None
        name = f"{quote(stream, safe='')}__{quote(topic, safe='')}__{pid}{_SUFFIX}"
        return os.path.join(self._root, name)

    @contextmanager
    def _entries(self, stream: str, topic: str, pid: int, write: bool = False):
        if self._root is None:
            key = (stream, topic, pid)
            yield self._parts.setdefault(key, []) if write else self._parts.get(key, [])
            return
        import fcntl

        path = self._path(stream, topic, pid)
        if not write and not os.path.exists(path):
            yield []
            return
        with open(path, "a+b") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX if write else fcntl.LOCK_SH)
            fh.seek(0)
            entries = [
                (o, t, bytes.fromhex(p))
                for o, t, p in (json.loads(ln) for ln in fh.read().splitlines() if ln)
            ]
            yield entries
            if write:
                fh.seek(0)
                fh.truncate()
                fh.write(
                    b"".join(
                        (json.dumps([o, t, p.hex()]) + "\n").encode()
                        for o, t, p in entries
                    )
                )
                fh.flush()

    @contextmanager
    def _offset_store(self, write: bool = False):
        if self._root is None:
            yield self._offsets
            return
        import fcntl

        path = os.path.join(self._root, "offsets.json")
        with open(path, "a+") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX if write else fcntl.LOCK_SH)
            fh.seek(0)
            raw = fh.read()
            store = {
                tuple(k.split("\x00")): v for k, v in (json.loads(raw) if raw else {}).items()
            }
            store = {(c, s, t, int(p)): v for (c, s, t, p), v in store.items()}
            yield store
            if write:
                fh.seek(0)
                fh.truncate()
                fh.write(
                    json.dumps(
                        {"\x00".join((c, s, t, str(p))): v for (c, s, t, p), v in store.items()}
                    )
                )
                fh.flush()

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
        with self._entries(stream, topic, partition_id, write=True) as part:
            out = []
            next_off = part[-1][0] + 1 if part else 0
            for ts_us, payload in messages:
                part.append((next_off, int(ts_us), bytes(payload)))
                out.append(next_off)
                next_off += 1
        return out

    # -- metadata ---------------------------------------------------------
    def partition_ids(self, stream: str, topic: str) -> list[int]:
        if self._root is None:
            return sorted(p for (s, t, p) in self._parts if (s, t) == (stream, topic))
        prefix = f"{quote(stream, safe='')}__{quote(topic, safe='')}__"
        out = []
        for fn in os.listdir(self._root):
            if fn.startswith(prefix) and fn.endswith(_SUFFIX):
                out.append(int(fn[len(prefix) : -len(_SUFFIX)]))
        return sorted(out)

    def end_offset(self, stream: str, topic: str, partition_id: int) -> int:
        """The NEXT offset to be assigned (high watermark analog)."""
        with self._entries(stream, topic, partition_id) as part:
            return part[-1][0] + 1 if part else 0

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
        with self._entries(stream, topic, partition_id) as part:
            part = list(part)
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
            with self._offset_store() as store:
                after = store.get(key, -1)
            msgs = [m for m in part if m[0] > after]
        else:
            raise ValueError(f"unknown polling strategy {strategy!r}")
        msgs = msgs[:count]
        if auto_commit and msgs:
            with self._offset_store(write=True) as store:
                store[key] = msgs[-1][0]
        return msgs

    def store_offset(
        self, consumer: str, stream: str, topic: str, partition_id: int, offset: int
    ) -> None:
        with self._offset_store(write=True) as store:
            store[(consumer, stream, topic, partition_id)] = int(offset)
