"""In-process Redis Streams model — the loopback test backend for the S4/S5
connector (the role sea-streamer-stdio plays for the reference: "testable
without setting up a cluster", reference README.md:30-31).

Implements the exact subset of the Redis command surface the connector uses —
``XADD`` (explicit monotonic ids), ``XRANGE``/``XREVRANGE`` (inclusive
min/max, COUNT), ``XLEN``, ``XTRIM MAXLEN~/MINID~``, ``SCAN MATCH``,
pipelining, and the consumer-group surface the reference's ack engine needs
(``XGROUP CREATE``, ``XREADGROUP`` incl. ``NOACK``, ``XACK``,
``XPENDING``/``XPENDING_RANGE``, ``XAUTOCLAIM``) — with Redis's documented
semantics, so the polling reader, sink, and ack/claim engine run their real
code paths against it. Swapping in redis-py is a one-line
``client_factory`` change; no connector logic differs.

Group/PEL semantics follow the Redis docs: ``>`` delivers entries after the
group's ``last_delivered_id`` and adds them to the consumer's PEL (unless
``NOACK``); a concrete id re-delivers that consumer's own pending entries
above it; ``XACK`` removes from the PEL; ``XAUTOCLAIM`` transfers entries
idle ≥ ``min_idle_time`` to the claiming consumer, bumping
``times_delivered`` and resetting the idle clock. Time is injectable
(``clock=...``) so idle-based tests are deterministic.

Two storage modes:

- ``FakeRedis()`` — in-memory dict; single-process tests.
- ``FakeRedis(root=dir)`` — file-backed (one append-log per stream key,
  ``flock``-guarded): *separate processes* see the same broker, which is
  what lets the partitioned ``sea_redis`` DataSource (reads on executor
  Python workers) and the executor-side ``foreachPartition`` sink run true
  end-to-end in one container. Performance is irrelevant — correctness of
  the command semantics is the contract.
"""

from __future__ import annotations

import builtins
import fnmatch
import json
import os
from contextlib import contextmanager
from urllib.parse import quote, unquote


class ResponseError(Exception):
    """Mirror of redis.exceptions.ResponseError for id-ordering violations."""


def _parse_id(entry_id: str, default_seq: int) -> tuple[int, int]:
    ms_str, _, seq_str = entry_id.partition("-")
    return int(ms_str), int(seq_str) if seq_str else default_seq


_SUFFIX = ".stream"


class FakeRedis:
    """Minimal Redis with stream commands (see module docstring)."""

    def __init__(self, root: str | None = None, clock=None) -> None:
        self._root = root
        self._streams: dict[str, list[tuple[tuple[int, int], dict]]] = {}
        #: key → group → {"last": [ms, seq], "pel": {id_str: [consumer, ms, n]}}
        self._groups: dict[str, dict[str, dict]] = {}
        self._clock = clock
        if root is not None:
            os.makedirs(root, exist_ok=True)

    def _now_ms(self) -> int:
        if self._clock is not None:
            return int(self._clock())
        import time

        return int(time.time() * 1000)

    # -- storage layer -----------------------------------------------------
    def _path(self, key: str) -> str:
        assert self._root is not None
        return os.path.join(self._root, quote(key, safe="") + _SUFFIX)

    def _keys(self) -> list[str]:
        if self._root is None:
            return sorted(self._streams)
        return sorted(
            unquote(fn[: -len(_SUFFIX)])
            for fn in os.listdir(self._root)
            if fn.endswith(_SUFFIX)
        )

    @staticmethod
    def _encode_line(entry: tuple[tuple[int, int], dict]) -> bytes:
        (ms, seq), fields = entry
        enc = {
            (k.decode() if isinstance(k, (bytes, bytearray)) else str(k)): (
                ["b", bytes(v).hex()] if isinstance(v, (bytes, bytearray)) else ["s", str(v)]
            )
            for k, v in fields.items()
        }
        return (json.dumps([ms, seq, enc]) + "\n").encode()

    @staticmethod
    def _decode_line(line: bytes) -> tuple[tuple[int, int], dict]:
        ms, seq, enc = json.loads(line)
        fields = {
            k: bytes.fromhex(v[1]) if v[0] == "b" else v[1] for k, v in enc.items()
        }
        return ((ms, seq), fields)

    @contextmanager
    def _entries(self, key: str, write: bool = False):
        """Yield the entry list for ``key``; ``write=True`` persists in-place
        mutations atomically (exclusive flock + whole-log rewrite — the
        simplest thing that gives multi-process linearizability)."""
        if self._root is None:
            yield self._streams.setdefault(key, []) if write else self._streams.get(key, [])
            return
        import fcntl

        path = self._path(key)
        if not write and not os.path.exists(path):
            yield []
            return
        with open(path, "a+b") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX if write else fcntl.LOCK_SH)
            fh.seek(0)
            entries = [self._decode_line(ln) for ln in fh.read().splitlines() if ln]
            yield entries
            if write:
                fh.seek(0)
                fh.truncate()
                fh.write(b"".join(self._encode_line(e) for e in entries))
                fh.flush()

    # -- producer side ----------------------------------------------------
    def xadd(self, key: str, fields: dict, id: str = "*") -> str:  # noqa: A002
        return self._xadd_impl(key, dict(fields), id)

    def xadd_owned(self, key: str, fields: dict, id: str = "*") -> str:  # noqa: A002
        """XADD that takes OWNERSHIP of ``fields`` (no defensive copy) —
        the RESP server's hot path builds a fresh dict per parsed command,
        so copying it again was pure waste (r9 task #1 profile). Same
        semantics as :meth:`xadd` otherwise."""
        return self._xadd_impl(key, fields, id)

    def _xadd_impl(self, key: str, fields: dict, id: str) -> str:  # noqa: A002
        if self._root is None:
            # In-memory fast path: skip the contextmanager frame — an
            # XADD-heavy pipeline spent ~15% of broker CPU entering and
            # exiting _entries for a plain list append.
            entries = self._streams.get(key)
            if entries is None:
                entries = self._streams.setdefault(key, [])
            return self._append_entry(entries, fields, id)
        with self._entries(key, write=True) as entries:
            return self._append_entry(entries, fields, id)

    @staticmethod
    def _append_entry(entries: list, fields: dict, id: str) -> str:  # noqa: A002
        if id == "*":
            last = entries[-1][0] if entries else (0, -1)
            new = (last[0], last[1] + 1)
        else:
            new = _parse_id(id, 0)
            if entries and new <= entries[-1][0]:
                raise ResponseError(
                    "The ID specified in XADD is equal or smaller than the "
                    "target stream top item"
                )
        entries.append((new, fields))
        return f"{new[0]}-{new[1]}"

    def xtrim(
        self,
        key: str,
        maxlen: int | None = None,
        minid: str | None = None,
        approximate: bool = True,
    ) -> int:
        with self._entries(key, write=True) as entries:
            n0 = len(entries)
            if maxlen is not None:
                entries[:] = entries[-maxlen:] if maxlen else []
            elif minid is not None:
                lo = _parse_id(str(minid), 0)
                entries[:] = [e for e in entries if e[0] >= lo]
            return n0 - len(entries)

    # -- consumer side ----------------------------------------------------
    @staticmethod
    def _bounds(entries, min: str, max: str) -> tuple[int, int]:  # noqa: A002
        """[start, stop) slice of the sorted entry list covered by an
        inclusive id range — bisect, not a full scan, so a paged XRANGE
        cursor walk is O(page) per call instead of O(stream)."""
        import bisect

        lo = (0, 0) if min == "-" else _parse_id(min, 0)
        hi = (1 << 48, 1 << 16) if max == "+" else _parse_id(max, (1 << 16) - 1)
        start = bisect.bisect_left(entries, lo, key=lambda e: e[0])
        stop = bisect.bisect_right(entries, hi, lo=start, key=lambda e: e[0])
        return start, stop

    def xrange(
        self, key: str, min: str = "-", max: str = "+", count: int | None = None  # noqa: A002
    ) -> list[tuple[str, dict]]:
        with self._entries(key) as entries:
            start, stop = self._bounds(entries, min, max)
            if count is not None:
                stop = builtins.min(stop, start + count)
            return [(f"{i[0]}-{i[1]}", dict(f)) for i, f in entries[start:stop]]

    def xrevrange(
        self, key: str, max: str = "+", min: str = "-", count: int | None = None  # noqa: A002
    ) -> list[tuple[str, dict]]:
        with self._entries(key) as entries:
            start, stop = self._bounds(entries, min, max)
            if count is not None:
                start = builtins.max(start, stop - count)
            return [
                (f"{i[0]}-{i[1]}", dict(f))
                for i, f in reversed(entries[start:stop])
            ]

    def xlen(self, key: str) -> int:
        with self._entries(key) as entries:
            return len(entries)

    def scan_iter(self, match: str = "*"):
        yield from (k for k in self._keys() if fnmatch.fnmatch(k, match))

    # -- consumer groups (D4-D7 substrate) ---------------------------------
    @contextmanager
    def _group_state(self, key: str, write: bool = False):
        """Yield the per-key group dict; file-backed mode persists it in a
        sidecar JSON (own exclusive flock — group ops serialize per key,
        which is what gives XREADGROUP its no-double-delivery guarantee
        across processes)."""
        if self._root is None:
            yield self._groups.setdefault(key, {})
            return
        import fcntl

        path = os.path.join(self._root, quote(key, safe="") + ".groups.json")
        with open(path, "a+b") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX)
            fh.seek(0)
            raw = fh.read()
            state = json.loads(raw) if raw else {}
            yield state
            if write:
                fh.seek(0)
                fh.truncate()
                fh.write(json.dumps(state).encode())
                fh.flush()

    def _stream_exists(self, key: str) -> bool:
        if self._root is None:
            return key in self._streams
        return os.path.exists(self._path(key))

    def xgroup_create(
        self, name: str, groupname: str, id: str = "$", mkstream: bool = False  # noqa: A002
    ) -> bool:
        # Redis semantics (XGROUP CREATE docs): the stream must exist unless
        # MKSTREAM creates it empty — consumer-group.rs:50-72 pins this.
        if not self._stream_exists(name):
            if not mkstream:
                raise ResponseError(
                    "ERR The XGROUP subcommand requires the key to exist. "
                    "Note that for CREATE you may want to use the MKSTREAM "
                    "option to create an empty stream automatically."
                )
            with self._entries(name, write=True):
                pass  # touch: an empty stream now exists
        with self._group_state(name, write=True) as groups:
            if groupname in groups:
                raise ResponseError("BUSYGROUP Consumer Group name already exists")
            if id == "$":
                with self._entries(name) as entries:
                    last = list(entries[-1][0]) if entries else [0, 0]
            else:
                last = list(_parse_id(id, 0))
            groups[groupname] = {"last": last, "pel": {}}
        return True

    def _group(self, groups: dict, groupname: str) -> dict:
        if groupname not in groups:
            raise ResponseError(
                f"NOGROUP No such consumer group '{groupname}'"
            )
        return groups[groupname]

    def xreadgroup(
        self,
        groupname: str,
        consumername: str,
        streams: dict,
        count: int | None = None,
        block: int | None = None,
        noack: bool = False,
    ) -> list:
        """``>`` delivers past the group cursor (into the PEL unless
        ``noack`` — the reference's AutoCommit::Immediate, XREAD-like);
        a concrete id re-delivers the *caller's own* pending entries with
        id strictly greater (Redis's history-replay form)."""
        out = []
        now = self._now_ms()
        for key, start in streams.items():
            with self._group_state(key, write=True) as groups:
                g = self._group(groups, groupname)
                batch: list[tuple[str, dict]] = []
                if start == ">":
                    cursor = tuple(g["last"])
                    with self._entries(key) as entries:
                        for eid, fields in entries:
                            if eid <= cursor:
                                continue
                            if count is not None and len(batch) >= count:
                                break
                            id_str = f"{eid[0]}-{eid[1]}"
                            batch.append((id_str, dict(fields)))
                            g["last"] = list(eid)
                            if not noack:
                                g["pel"][id_str] = [consumername, now, 1]
                else:
                    lo = _parse_id(str(start), 0)
                    own = sorted(
                        (_parse_id(i, 0), i)
                        for i, (c, _, _) in g["pel"].items()
                        if c == consumername
                    )
                    with self._entries(key) as entries:
                        by_id = {i: f for i, f in entries}
                        for eid, id_str in own:
                            if eid <= lo:
                                continue
                            if count is not None and len(batch) >= count:
                                break
                            batch.append((id_str, dict(by_id.get(eid, {}))))
                if batch:
                    out.append([key, batch])
        return out

    def xack(self, name: str, groupname: str, *ids: str) -> int:
        n = 0
        with self._group_state(name, write=True) as groups:
            g = self._group(groups, groupname)
            for eid in ids:
                ms, seq = _parse_id(str(eid), 0)
                if g["pel"].pop(f"{ms}-{seq}", None) is not None:
                    n += 1
        return n

    def xpending_range(
        self,
        name: str,
        groupname: str,
        min: str = "-",  # noqa: A002
        max: str = "+",  # noqa: A002
        count: int = 10,
        consumername: str | None = None,
        idle: int | None = None,
    ) -> list[dict]:
        now = self._now_ms()
        lo = (0, 0) if min == "-" else _parse_id(min, 0)
        hi = (1 << 48, 1 << 16) if max == "+" else _parse_id(max, (1 << 16) - 1)
        with self._group_state(name) as groups:
            g = self._group(groups, groupname)
            rows = []
            for id_str, (consumer, delivered_ms, times) in sorted(
                g["pel"].items(), key=lambda kv: _parse_id(kv[0], 0)
            ):
                eid = _parse_id(id_str, 0)
                if not (lo <= eid <= hi):
                    continue
                if consumername is not None and consumer != consumername:
                    continue
                since = now - delivered_ms
                if idle is not None and since < idle:
                    continue
                rows.append(
                    {
                        "message_id": id_str,
                        "consumer": consumer,
                        "time_since_delivered": since,
                        "times_delivered": times,
                    }
                )
                if len(rows) >= count:
                    break
        return rows

    def xautoclaim(
        self,
        name: str,
        groupname: str,
        consumername: str,
        min_idle_time: int = 0,
        start_id: str = "0-0",
        count: int | None = None,
        justid: bool = False,
    ) -> list:
        """Transfer ownership of entries idle ≥ ``min_idle_time`` to
        ``consumername`` (delivery counter bumped, idle clock reset), as the
        reference's dead-consumer failover polls it
        (redis/src/consumer/node.rs:647-744). Returns
        ``[next_cursor, claimed, deleted]`` like redis-py."""
        now = self._now_ms()
        lo = _parse_id(start_id, 0)
        claimed: list = []
        deleted: list[str] = []
        budget = count if count is not None else 100
        next_cursor = "0-0"
        with self._group_state(name, write=True) as groups:
            g = self._group(groups, groupname)
            with self._entries(name) as entries:
                by_id = {i: f for i, f in entries}
            pel = sorted(g["pel"].items(), key=lambda kv: _parse_id(kv[0], 0))
            for id_str, (consumer, delivered_ms, times) in pel:
                eid = _parse_id(id_str, 0)
                if eid < lo:
                    continue
                if len(claimed) >= budget:
                    next_cursor = id_str
                    break
                if now - delivered_ms < min_idle_time:
                    continue
                if eid not in by_id:  # trimmed from the stream: drop from PEL
                    del g["pel"][id_str]
                    deleted.append(id_str)
                    continue
                g["pel"][id_str] = [consumername, now, times + 1]
                claimed.append(id_str if justid else (id_str, dict(by_id[eid])))
        return [next_cursor, claimed, deleted]

    # -- pipeline ----------------------------------------------------------
    def pipeline(self, transaction: bool = False) -> "FakePipeline":
        return FakePipeline(self)


class FakePipeline:
    """Queue commands, run on execute() — order-preserving like redis-py."""

    def __init__(self, client: FakeRedis) -> None:
        self._client = client
        self._cmds: list[tuple] = []

    def xadd(self, key, fields, id="*"):  # noqa: A002
        self._cmds.append(("xadd", key, fields, id))
        return self

    def xtrim(self, key, maxlen=None, minid=None, approximate=True):
        self._cmds.append(("xtrim", key, maxlen, minid, approximate))
        return self

    def execute(self, raise_on_error: bool = True) -> list:
        out = []
        for cmd in self._cmds:
            try:
                if cmd[0] == "xadd":
                    out.append(self._client.xadd(cmd[1], cmd[2], id=cmd[3]))
                else:
                    out.append(self._client.xtrim(cmd[1], maxlen=cmd[2], minid=cmd[3]))
            except ResponseError as e:
                if raise_on_error:
                    raise
                out.append(e)
        self._cmds.clear()
        return out
