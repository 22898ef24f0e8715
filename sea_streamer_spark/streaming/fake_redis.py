"""In-process Redis Streams model — the loopback test backend for the S4/S5
connector (the role sea-streamer-stdio plays for the reference: "testable
without setting up a cluster", reference README.md:30-31).

Implements the exact subset of the Redis command surface the connector uses —
``XADD`` (explicit monotonic ids), ``XRANGE`` (inclusive min/max, COUNT),
``XLEN``, ``XTRIM MAXLEN~/MINID~``, ``SCAN MATCH`` and pipelining — with
Redis's documented semantics, so the polling reader and foreachBatch sink
run their real code paths against it. Swapping in redis-py is a one-line
``client_factory`` change; no connector logic differs.
"""

from __future__ import annotations


class ResponseError(Exception):
    """Mirror of redis.exceptions.ResponseError for id-ordering violations."""


def _parse_id(entry_id: str, default_seq: int) -> tuple[int, int]:
    ms_str, _, seq_str = entry_id.partition("-")
    return int(ms_str), int(seq_str) if seq_str else default_seq


class FakeRedis:
    """Minimal in-memory Redis with stream commands (see module docstring)."""

    def __init__(self) -> None:
        self._streams: dict[str, list[tuple[tuple[int, int], dict]]] = {}

    # -- producer side ----------------------------------------------------
    def xadd(self, key: str, fields: dict, id: str = "*") -> str:  # noqa: A002
        entries = self._streams.setdefault(key, [])
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
        entries = self._streams.get(key, [])
        n0 = len(entries)
        if maxlen is not None:
            self._streams[key] = entries[-maxlen:] if maxlen else []
        elif minid is not None:
            lo = _parse_id(str(minid), 0)
            self._streams[key] = [e for e in entries if e[0] >= lo]
        return n0 - len(self._streams.get(key, []))

    # -- consumer side ----------------------------------------------------
    def xrange(
        self, key: str, min: str = "-", max: str = "+", count: int | None = None  # noqa: A002
    ) -> list[tuple[str, dict]]:
        entries = self._streams.get(key, [])
        lo = (0, 0) if min == "-" else _parse_id(min, 0)
        hi = (1 << 48, 1 << 16) if max == "+" else _parse_id(max, (1 << 16) - 1)
        out = [
            (f"{i[0]}-{i[1]}", dict(f)) for i, f in entries if lo <= i <= hi
        ]
        return out[:count] if count is not None else out

    def xlen(self, key: str) -> int:
        return len(self._streams.get(key, []))

    def scan_iter(self, match: str = "*"):
        import fnmatch

        yield from (k for k in sorted(self._streams) if fnmatch.fnmatch(k, match))

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
