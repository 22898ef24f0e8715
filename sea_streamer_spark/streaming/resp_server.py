"""A real TCP listener speaking RESP2 in front of the loopback broker —
the server half of :mod:`.resp`.

This puts the in-process Redis Streams model (:class:`.fake_redis.FakeRedis`)
behind an actual socket: executors and driver connect over TCP, request
frames are parsed off the wire, commands dispatch into the model under a
lock (Redis's single-threaded command semantics), and replies are encoded
back as RESP frames — including pipelined bursts, which arrive as
back-to-back frames on one connection exactly as redis-py/fred send them.

Purpose: wire-level evidence for the S4/S5 connector and D4-D7 ack engine.
With this, the identical client code that would talk to a real Redis (the
RESP protocol is the contract) runs end-to-end in-container, across
processes, over TCP.
"""

from __future__ import annotations

import socketserver
import threading

from .fake_redis import FakeRedis, ResponseError


class Simple(str):
    """Marker: encode as a RESP simple string (+OK / +PONG), like Redis
    status replies — a plain str encodes as a bulk string."""


class RawReply(bytes):
    """Marker: already a complete RESP frame — pass through unencoded.
    The XRANGE hot path encodes its entry list directly (one %-format per
    entry) instead of building nested Python lists for the recursive
    generic encoder (r9 task #1 profile: ~6 ``_enc`` calls per entry)."""


def _enc(value) -> bytes:
    """Python value → RESP2 reply frame."""
    if type(value) is RawReply:
        return value
    if isinstance(value, ResponseError):
        # error text rides in a line-delimited frame: strip embedded CR/LF
        # (e.g. from an int() message quoting binary input) or the client's
        # read_line would split mid-message and desync the connection
        msg = str(value).replace("\r", " ").replace("\n", " ")
        return b"-%s\r\n" % msg.encode("utf-8", "replace")
    if isinstance(value, Simple):
        return b"+%s\r\n" % value.encode()
    if value is None:
        return b"$-1\r\n"
    if isinstance(value, bool):
        return b"+OK\r\n" if value else b":0\r\n"
    if isinstance(value, int):
        return b":%d\r\n" % value
    if isinstance(value, (bytes, bytearray)):
        return b"$%d\r\n%s\r\n" % (len(value), bytes(value))
    if isinstance(value, str):
        b = value.encode()
        return b"$%d\r\n%s\r\n" % (len(b), b)
    if isinstance(value, (list, tuple)):
        return b"*%d\r\n" % len(value) + b"".join(_enc(v) for v in value)
    raise TypeError(f"cannot encode {type(value)}")


def _entry(eid: str, fields: dict) -> list:
    flat: list = []
    for k, v in fields.items():
        flat += [k, v]
    return [eid, flat]


class _Handler(socketserver.BaseRequestHandler):
    def handle(self) -> None:
        server: RespServer = self.server  # type: ignore[assignment]
        from .resp import _SockReader  # single-source the RESP framing

        reader = _SockReader(self.request)
        # Replies accumulate until the pipelined input drains (nothing left
        # buffered), then flush in ONE sendall — a syscall per pipeline
        # chunk instead of per command, the server half of what makes
        # RESP pipelining fast (client half: RespPipeline's single send).
        out: list[bytes] = []
        while True:
            try:
                args = reader.read_command()
            except ConnectionError:  # client hung up: normal end of session
                return
            except ValueError:  # malformed frame: -ERR and drop the session
                self.request.sendall(
                    _enc(ResponseError("ERR protocol: expected array"))
                )
                return
            try:
                reply = server.dispatch_raw(args)
            except ResponseError as e:
                reply = e
            except Exception as e:  # noqa: BLE001 — surface as -ERR
                reply = ResponseError(f"ERR {e}")
            out.append(_enc(reply))
            if not reader.has_buffered():
                self.request.sendall(b"".join(out))
                out.clear()


class RespServer(socketserver.ThreadingTCPServer):
    """``RespServer(broker).serve_background()`` → (host, port)."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, broker: FakeRedis | None = None, host: str = "127.0.0.1", port: int = 0):
        super().__init__((host, port), _Handler)
        self.broker = broker or FakeRedis()
        self.lock = threading.Lock()

    def serve_background(self) -> tuple[str, int]:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return self.server_address[0], self.server_address[1]

    # -- command dispatch ---------------------------------------------------
    def dispatch_raw(self, raw: list[bytes]):
        """Hot-path dispatch over the undecoded argv. A pipelined produce
        burst is thousands of ``XADD key id field value`` frames; the
        generic path decoded every arg (including the payload bytes,
        surrogateescape) before looking at the command. Here the dominant
        shape — single-field XADD, no MAXLEN — keeps the payload as the
        bytes it arrived as and decodes only the three small args
        (key/id/field, pure ASCII in the streams contract). Everything
        else falls through to :meth:`dispatch` unchanged."""
        if len(raw) == 5 and raw[0].upper() == b"XADD":
            with self.lock:
                return self.broker.xadd_owned(
                    raw[1].decode("utf-8", "surrogateescape"),
                    {raw[3].decode("utf-8", "surrogateescape"): raw[4]},
                    id=raw[2].decode(),
                )
        return self.dispatch(raw)

    def dispatch(self, raw: list[bytes]):
        args = [a.decode("utf-8", "surrogateescape") for a in raw]
        cmd = args[0].upper()
        with self.lock:
            if cmd == "PING":
                return Simple("PONG")
            if cmd == "XADD":
                return self._xadd(args, raw)
            if cmd == "XRANGE":
                return self._xrange(args, rev=False)
            if cmd == "XREVRANGE":
                return self._xrange(args, rev=True)
            if cmd == "XLEN":
                return self.broker.xlen(args[1])
            if cmd == "XTRIM":
                return self._xtrim(args)
            if cmd == "SCAN":
                return self._scan(args)
            if cmd == "XGROUP":
                if args[1].upper() != "CREATE":
                    raise ResponseError(f"ERR unsupported XGROUP subcommand {args[1]}")
                self.broker.xgroup_create(
                    args[2], args[3], id=args[4], mkstream="MKSTREAM" in (a.upper() for a in args[5:])
                )
                return Simple("OK")
            if cmd == "XREADGROUP":
                return self._xreadgroup(args)
            if cmd == "XACK":
                return self.broker.xack(args[1], args[2], *args[3:])
            if cmd == "XPENDING":
                return self._xpending(args)
            if cmd == "XAUTOCLAIM":
                return self._xautoclaim(args)
            raise ResponseError(f"ERR unknown command '{args[0]}'")

    def _xadd(self, args: list[str], raw: list[bytes]):
        i = 2
        maxlen = None
        if args[i].upper() == "MAXLEN":
            i += 1
            if args[i] == "~":
                i += 1
            maxlen = int(args[i])
            i += 1
        entry_id = args[i]
        i += 1
        fields = {}
        while i + 1 < len(args):
            fields[args[i]] = raw[i + 1]  # values stay bytes
            i += 2
        new_id = self.broker.xadd(args[1], fields, id=entry_id)
        if maxlen is not None:
            self.broker.xtrim(args[1], maxlen=maxlen)
        return new_id

    def _xrange(self, args: list[str], rev: bool):
        key = args[1]
        a, b = args[2], args[3]
        count = None
        rest = [x.upper() for x in args[4:]]
        if "COUNT" in rest:
            count = int(args[4 + rest.index("COUNT") + 1])
        if rev:
            entries = self.broker.xrevrange(key, max=a, min=b, count=count)
        else:
            entries = self.broker.xrange(key, min=a, max=b, count=count)
        # Encode the reply frame directly: the paged consume loop returns
        # thousands of entries per call, and the generic recursive encoder
        # cost ~6 calls per entry (see RawReply).
        parts = [b"*%d\r\n" % len(entries)]
        for eid, fields in entries:
            eb = eid.encode()
            parts.append(b"*2\r\n$%d\r\n%s\r\n*%d\r\n" % (len(eb), eb, 2 * len(fields)))
            for k, v in fields.items():
                kb = k.encode() if isinstance(k, str) else bytes(k)
                vb = v if type(v) is bytes else (
                    bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                )
                parts.append(b"$%d\r\n%s\r\n$%d\r\n%s\r\n" % (len(kb), kb, len(vb), vb))
        return RawReply(b"".join(parts))

    def _xtrim(self, args: list[str]):
        mode = args[2].upper()
        i = 3
        if args[i] == "~":
            i += 1
        if mode == "MAXLEN":
            return self.broker.xtrim(args[1], maxlen=int(args[i]))
        if mode == "MINID":
            return self.broker.xtrim(args[1], minid=args[i])
        raise ResponseError("ERR syntax error")

    def _scan(self, args: list[str]):
        match = "*"
        up = [a.upper() for a in args]
        if "MATCH" in up:
            match = args[up.index("MATCH") + 1]
        keys = list(self.broker.scan_iter(match=match))
        return ["0", keys]  # one pass: the model's keyspace is small

    def _xreadgroup(self, args: list[str]):
        up = [a.upper() for a in args]
        group, consumer = args[2], args[3]
        count = int(args[up.index("COUNT") + 1]) if "COUNT" in up else None
        noack = "NOACK" in up
        si = up.index("STREAMS") + 1
        rest = args[si:]
        nkeys = len(rest) // 2
        streams = dict(zip(rest[:nkeys], rest[nkeys:]))
        reply = self.broker.xreadgroup(group, consumer, streams, count=count, noack=noack)
        if not reply:
            return None
        return [[key, [_entry(i, f) for i, f in batch]] for key, batch in reply]

    def _xpending(self, args: list[str]):
        idle = None
        i = 3
        if args[i].upper() == "IDLE":
            idle = int(args[i + 1])
            i += 2
        lo, hi, count = args[i], args[i + 1], int(args[i + 2])
        consumer = args[i + 3] if len(args) > i + 3 else None
        rows = self.broker.xpending_range(
            args[1], args[2], min=lo, max=hi, count=count,
            consumername=consumer, idle=idle,
        )
        return [
            [r["message_id"], r["consumer"], r["time_since_delivered"], r["times_delivered"]]
            for r in rows
        ]

    def _xautoclaim(self, args: list[str]):
        up = [a.upper() for a in args]
        count = int(args[up.index("COUNT") + 1]) if "COUNT" in up else None
        justid = "JUSTID" in up
        cursor, claimed, deleted = self.broker.xautoclaim(
            args[1], args[2], args[3],
            min_idle_time=int(args[4]), start_id=args[5],
            count=count, justid=justid,
        )
        if justid:
            return [cursor, list(claimed), list(deleted)]
        return [cursor, [_entry(i, f) for i, f in claimed], list(deleted)]
