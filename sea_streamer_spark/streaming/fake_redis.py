"""In-process Redis Streams model — the loopback test backend for the S4/S5
connector (the role sea-streamer-stdio plays for the reference: "testable
without setting up a cluster", reference README.md:30-31).

Implements the exact subset of the Redis command surface the connector uses —
``XADD`` (explicit monotonic ids), ``XRANGE``/``XREVRANGE`` (inclusive
min/max, COUNT), ``XLEN``, ``XTRIM MAXLEN~/MINID~``, ``SCAN MATCH`` and
pipelining — with Redis's documented semantics, so the polling reader and
sink run their real code paths against it. Swapping in redis-py is a
one-line ``client_factory`` change; no connector logic differs.

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

    def __init__(self, root: str | None = None) -> None:
        self._root = root
        self._streams: dict[str, list[tuple[tuple[int, int], dict]]] = {}
        if root is not None:
            os.makedirs(root, exist_ok=True)

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
        with self._entries(key, write=True) as entries:
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
            entries.append((new, dict(fields)))
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
    def xrange(
        self, key: str, min: str = "-", max: str = "+", count: int | None = None  # noqa: A002
    ) -> list[tuple[str, dict]]:
        with self._entries(key) as entries:
            lo = (0, 0) if min == "-" else _parse_id(min, 0)
            hi = (1 << 48, 1 << 16) if max == "+" else _parse_id(max, (1 << 16) - 1)
            out = [(f"{i[0]}-{i[1]}", dict(f)) for i, f in entries if lo <= i <= hi]
        return out[:count] if count is not None else out

    def xrevrange(
        self, key: str, max: str = "+", min: str = "-", count: int | None = None  # noqa: A002
    ) -> list[tuple[str, dict]]:
        out = list(reversed(self.xrange(key, min=min, max=max)))
        return out[:count] if count is not None else out

    def xlen(self, key: str) -> int:
        with self._entries(key) as entries:
            return len(entries)

    def scan_iter(self, match: str = "*"):
        yield from (k for k in self._keys() if fnmatch.fnmatch(k, match))

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
