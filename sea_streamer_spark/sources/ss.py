"""The `.ss` seekable container format (S8/S9/S11): codec + Spark reader/writer.

Format (observed from sea-streamer-file/src/format.rs:1-59 and the sink/source
logic in messages.rs:412-660, 290-344):

- **Header** (128 bytes): ``0x53 0x73 0x01`` + ShortString file_name +
  u64-BE created_at (unix ms) + u32-BE beacon_interval + zero padding ending
  with ``0x0D``.
- **Message**: ShortString stream_key + u64 shard_id + u64 seq_no +
  u64 timestamp(ms) + u32 payload_len + payload + u16 CRC16/CDMA2000(payload)
  + ``0x0D``.
- **Beacon** at every positive multiple of ``beacon_interval`` of the raw
  file offset: ``0x0D`` + u32 remaining-bytes-of-spliced-message + u8 item
  count + items (message header + u16 running checksum) + ``0x0D``. Messages
  are spliced around beacons (messages.rs:573-585); the reader consumes a
  beacon whenever its offset hits a boundary (messages.rs:299-305).
- **EOS**: a message on stream ``SEA_STREAMER_INTERNAL`` with payload
  ``EOS`` terminates the stream (messages.rs:16).

All integers big-endian. Per-message CRC is over the payload only; each
stream's running checksum folds the message checksums big-endian
(format.rs:470-504).

Spark integration:

- :func:`read_ss` — batch read via ``binaryFile`` + ``mapInPandas``: one
  Arrow-batched parse per file, fully parallel across files. (Parquet is the
  engine's native storage — beacons' seek function is subsumed by row-group
  stats — so `.ss` support is for interop with reference-produced data.)
- :func:`write_ss` — driver-side single-file writer (the format is a single
  sequential container; for partitioned output write one file per partition
  directory instead).
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..functions.crc16 import RunningChecksum, crc16_cdma2000
from ..model import EOS_PAYLOAD, MESSAGE_SCHEMA, SEA_STREAMER_INTERNAL

HEADER_SIZE = 128
DEFAULT_BEACON_INTERVAL = 1024 * 1024  # file/src/lib.rs:92


class SsFormatError(ValueError):
    pass


@dataclass
class SsHeader:
    file_name: str
    created_at_ms: int
    beacon_interval: int


@dataclass
class SsMessage:
    stream_key: str
    shard_id: int
    sequence: int
    timestamp_ms: int
    payload: bytes

    @property
    def is_eos(self) -> bool:
        return self.stream_key == SEA_STREAMER_INTERNAL and self.payload == EOS_PAYLOAD


# ------------------------------------------------------------------ encoding


def _short_string(s: str) -> bytes:
    b = s.encode("utf-8")
    if len(b) > 255:
        raise SsFormatError(f"string too long for ShortString: {len(b)}")
    return bytes([len(b)]) + b


def encode_header(h: SsHeader) -> bytes:
    body = b"\x53\x73\x01" + _short_string(h.file_name)
    body += h.created_at_ms.to_bytes(8, "big")
    body += h.beacon_interval.to_bytes(4, "big")
    pad = HEADER_SIZE - len(body)
    if pad < 1:
        raise SsFormatError("file name too long for 128-byte header")
    return body + b"\x00" * (pad - 1) + b"\x0d"


def encode_message_header(m: SsMessage) -> bytes:
    return (
        _short_string(m.stream_key)
        + m.shard_id.to_bytes(8, "big")
        + m.sequence.to_bytes(8, "big")
        + m.timestamp_ms.to_bytes(8, "big")
    )


def encode_message(m: SsMessage) -> tuple[bytes, int]:
    """Returns (encoded bytes, payload checksum)."""
    crc = crc16_cdma2000(m.payload)
    out = (
        encode_message_header(m)
        + len(m.payload).to_bytes(4, "big")
        + m.payload
        + crc.to_bytes(2, "big")
        + b"\x0d"
    )
    return out, crc


# ------------------------------------------------------------------ decoding


class _Cursor:
    """Byte cursor that transparently consumes beacons at interval
    boundaries, mirroring MessageSource::request_bytes (messages.rs:297-318)."""

    def __init__(self, data: bytes, beacon_interval: int, offset: int = HEADER_SIZE):
        self.data = data
        self.interval = beacon_interval
        self.offset = offset
        self.beacons: list[tuple[int, list[dict]]] = []

    def eof(self) -> bool:
        return self.offset >= len(self.data)

    def _raw(self, n: int) -> bytes:
        if self.offset + n > len(self.data):
            raise EOFError("not enough bytes")
        b = self.data[self.offset : self.offset + n]
        self.offset += n
        return b

    def _maybe_beacon(self) -> None:
        while self.offset > 0 and self.offset % self.interval == 0 and not self.eof():
            self.beacons.append((self.offset // self.interval, self._read_beacon()))

    def _read_beacon(self) -> list[dict]:
        self._raw(1)  # 0x0D
        _remaining = int.from_bytes(self._raw(4), "big")
        num = self._raw(1)[0]
        items = []
        for _ in range(num):
            key_len = self._raw(1)[0]
            key = self._raw(key_len).decode("utf-8")
            shard = int.from_bytes(self._raw(8), "big")
            seq = int.from_bytes(self._raw(8), "big")
            ts = int.from_bytes(self._raw(8), "big")
            rcs = int.from_bytes(self._raw(2), "big")
            items.append(
                {"stream_key": key, "shard_id": shard, "sequence": seq,
                 "timestamp_ms": ts, "running_checksum": rcs}
            )
        self._raw(1)  # 0x0D
        return items

    def read(self, n: int) -> bytes:
        """Read n message bytes, skipping interleaved beacons."""
        out = bytearray()
        while len(out) < n:
            self._maybe_beacon()
            chunk = min(n - len(out), self.interval - (self.offset % self.interval))
            out += self._raw(chunk)
        return bytes(out)


def decode_header(data: bytes) -> SsHeader:
    if len(data) < HEADER_SIZE:
        raise SsFormatError("file shorter than header")
    if data[0] != 0x53 or data[1] != 0x73:
        raise SsFormatError("byte mark mismatch")
    if data[2] != 0x01:
        raise SsFormatError("version mismatch")
    pos = 3
    name_len = data[pos]
    name = data[pos + 1 : pos + 1 + name_len].decode("utf-8")
    pos += 1 + name_len
    created = int.from_bytes(data[pos : pos + 8], "big")
    beacon_interval = int.from_bytes(data[pos + 8 : pos + 12], "big")
    return SsHeader(name, created, beacon_interval)


def _beacon_items_at(data: bytes, interval: int, k: int) -> list[dict]:
    """Decode only the beacon block at offset k*interval."""
    cur = _Cursor(data, interval, offset=k * interval)
    return cur._read_beacon()


def _skip_past_beacon(data: bytes, interval: int, k: int) -> int:
    """Byte offset of the first *complete* message after beacon k: decode the
    beacon, then consume its ``remaining`` in-flight bytes (beacon-aware, so
    messages longer than an interval skip the interleaved beacons too)."""
    cur = _Cursor(data, interval, offset=k * interval)
    cur._raw(1)
    remaining = int.from_bytes(cur._raw(4), "big")
    num = cur._raw(1)[0]
    for _ in range(num):
        key_len = cur._raw(1)[0]
        cur._raw(key_len + 8 + 8 + 8 + 2)
    cur._raw(1)
    if remaining:
        cur.read(remaining)
    return cur.offset


def seek_offset(data: bytes, timestamp_ms: int | None = None, sequence: int | None = None) -> int:
    """Surveyor seek (file/src/surveyor.rs:16-122 re-expressed): binary-search
    the beacon index for the last beacon whose markers are all at-or-before
    the target, and return the first message boundary after it. The caller
    still applies the exact predicate (ts strictly greater / seq >=,
    messages.rs:262-279) — as in the reference, the beacon jump is the scan
    *pruning*, the linear tail finds the exact boundary.

    A beacon is only trusted when its marker list is untruncated (count below
    the writer's marker capacity for this interval — then it provably covers
    every live (stream, shard)); once streams exceed capacity the writer
    rotates markers and seek degrades to conservative = no skip."""
    header = decode_header(data)
    best = best_skippable_beacon(
        data, header.beacon_interval, timestamp_ms=timestamp_ms, sequence=sequence
    )
    if best == 0:
        return HEADER_SIZE
    return _skip_past_beacon(data, header.beacon_interval, best)


def best_skippable_beacon(
    data, interval: int, timestamp_ms: int | None = None, sequence: int | None = None
) -> int:
    """Largest beacon index k such that everything before beacon k is
    at-or-before the target (untruncated-marker rule — see seek_offset);
    0 if none. Shared by seek and DataSource partition pruning."""
    n = len(data) // interval
    capacity = min(255, max(0, (interval - 7)) // SsWriter.MARKER_MAX_SIZE) // 2

    def skippable(k: int) -> bool:
        items = _beacon_items_at(data, interval, k)
        if not items or len(items) >= capacity:
            return False
        if timestamp_ms is not None and max(i["timestamp_ms"] for i in items) > timestamp_ms:
            return False
        if sequence is not None and max(i["sequence"] for i in items) >= sequence:
            return False
        return True

    lo, best = 1, 0
    hi = n
    while lo <= hi:
        mid = (lo + hi) // 2
        if skippable(mid):
            best, lo = mid, mid + 1
        else:
            hi = mid - 1
    return best


def iter_messages_range(
    data,
    interval: int,
    start_offset: int,
    end_byte: int,
    verify_crc: bool = True,
    stop_at_eos: bool = True,
):
    """Yield SsMessage for every message whose *start offset* lies in
    [start_offset, end_byte) — the partition-read primitive for beacon-split
    parallel parsing. ``data`` may be bytes or an mmap (pages load lazily, so
    a range read touches ~its own bytes, not the file)."""
    cur = _Cursor(data, interval)
    cur.offset = start_offset
    while True:
        cur._maybe_beacon()
        if cur.eof() or cur.offset >= end_byte:
            return
        try:
            key_len = cur.read(1)[0]
            key = cur.read(key_len).decode("utf-8")
            shard = int.from_bytes(cur.read(8), "big")
            seq = int.from_bytes(cur.read(8), "big")
            ts = int.from_bytes(cur.read(8), "big")
            size = int.from_bytes(cur.read(4), "big")
            payload = cur.read(size)
            crc = int.from_bytes(cur.read(2), "big")
            cur.read(1)  # 0x0D
        except EOFError:
            return
        if verify_crc:
            computed = crc16_cdma2000(payload)
            if crc != computed:
                raise SsFormatError(f"checksum error: received {crc}, computed {computed}")
        msg = SsMessage(key, shard, seq, ts, payload)
        if msg.is_eos and stop_at_eos:
            return
        yield msg


def iter_messages(
    data: bytes,
    verify_crc: bool = True,
    stop_at_eos: bool = True,
    start_offset: int | None = None,
):
    """Yield SsMessage from raw `.ss` bytes (beacon-aware, CRC-verified).
    ``start_offset`` (from :func:`seek_offset`) begins mid-file at a message
    boundary."""
    header = decode_header(data)
    cur = _Cursor(data, header.beacon_interval)
    if start_offset is not None:
        cur.offset = start_offset
    while True:
        cur._maybe_beacon()
        if cur.eof():
            return
        try:
            key_len = cur.read(1)[0]
            key = cur.read(key_len).decode("utf-8")
            shard = int.from_bytes(cur.read(8), "big")
            seq = int.from_bytes(cur.read(8), "big")
            ts = int.from_bytes(cur.read(8), "big")
            size = int.from_bytes(cur.read(4), "big")
            payload = cur.read(size)
            crc = int.from_bytes(cur.read(2), "big")
            cur.read(1)  # 0x0D
        except EOFError:
            return  # truncated tail (file being written) — stop cleanly
        if verify_crc:
            computed = crc16_cdma2000(payload)
            if crc != computed:
                raise SsFormatError(f"checksum error: received {crc}, computed {computed}")
        msg = SsMessage(key, shard, seq, ts, payload)
        if msg.is_eos and stop_at_eos:
            return
        yield msg


# ------------------------------------------------------------------- writing


class SsWriter:
    """`.ss` writer mirroring MessageSink (messages.rs:555-609): chunked
    writes with beacons at interval boundaries, per-stream running checksums,
    round-robin marker selection when streams > marker slots.

    ``out`` is any writable byte sink (default: in-memory). Appending to an
    existing file goes through :meth:`append_to` (messages.rs:419-515
    parity): reopen, trim a torn tail and any EOS marker, reconstruct the
    beacon state from the surviving prefix, resume in place."""

    MARKER_MAX_SIZE = 1 + 255 + 8 + 8 + 8 + 2

    def __init__(self, file_name: str, beacon_interval: int = DEFAULT_BEACON_INTERVAL,
                 created_at_ms: int = 0, out=None, _resume_state=None):
        if HEADER_SIZE > beacon_interval:
            raise SsFormatError("beacon_interval must be >= header size")
        self.buf = out if out is not None else io.BytesIO()
        self.interval = beacon_interval
        self.offset = 0
        self.beacon_state: dict[tuple[str, int], dict] = {}
        self.beacon_count = 0
        if _resume_state is not None:
            self.offset, self.beacon_state, self.beacon_count = _resume_state
            if self.offset > 0 and self.offset % self.interval == 0:
                # resumed exactly at an interval boundary (the truncated tail
                # took the boundary's beacon with it): re-emit it, nothing
                # in-flight
                self._write_beacon(0)
            return
        self._write_raw(encode_header(SsHeader(file_name, created_at_ms, beacon_interval)))
        if self.offset == beacon_interval:
            # header exactly fills the first interval: an empty beacon follows
            # immediately (messages.rs:517-525, "a very special case")
            self._write_beacon(0)

    @classmethod
    def append_to(cls, path: str, verify_crc: bool = True):
        """Reopen ``path`` for appending (messages.rs:419-515): parse the
        complete prefix, drop a torn tail and any EOS marker (truncate), and
        return ``(writer, prefix_messages)`` with per-stream seq/ts/running-
        checksum state rebuilt so beacons continue correctly."""
        with open(path, "rb") as fh:
            data = fh.read()
        header = decode_header(data)
        interval = header.beacon_interval
        msgs, resume, beacons = _parse_complete_ex(
            data, interval, HEADER_SIZE, eos_resume="before", verify_crc=verify_crc
        )
        # markers already on disk before the resume point (beacons whose
        # bytes survive the truncation) keep their place in the rotation
        markers = sum(len(items) for k, items in beacons if k * interval < resume)
        state: dict[tuple[str, int], dict] = {}
        for m in msgs:
            st = state.setdefault(
                (m.stream_key, m.shard_id),
                {"seq": m.sequence, "ts": m.timestamp_ms, "crc": RunningChecksum()},
            )
            st["seq"] = max(st["seq"], m.sequence)
            st["ts"] = max(st["ts"], m.timestamp_ms)
            st["crc"].update(crc16_cdma2000(m.payload))
        fh = open(path, "r+b")
        fh.truncate(resume)
        fh.seek(resume)
        writer = cls(
            header.file_name,
            interval,
            header.created_at_ms,
            out=fh,
            _resume_state=(resume, state, markers),
        )
        return writer, msgs

    def _write_raw(self, b: bytes) -> None:
        self.buf.write(b)
        self.offset += len(b)

    def _num_markers(self) -> int:
        space = self.interval
        if space < 7:
            return 0
        return min(255, (space - 7) // self.MARKER_MAX_SIZE) // 2

    def _write_beacon(self, remaining: int) -> None:
        states = list(self.beacon_state.items())
        n = min(len(states), self._num_markers())
        start = self.beacon_count % len(states) if states else 0
        chosen = (states[start:] + states[:start])[:n]
        out = b"\x0d" + remaining.to_bytes(4, "big") + bytes([len(chosen)])
        for (key, shard), st in chosen:
            out += (
                _short_string(key)
                + shard.to_bytes(8, "big")
                + st["seq"].to_bytes(8, "big")
                + st["ts"].to_bytes(8, "big")
                + st["crc"].crc.to_bytes(2, "big")
            )
        out += b"\x0d"
        self._write_raw(out)
        self.beacon_count += len(chosen)

    def write(self, m: SsMessage) -> int:
        encoded, crc = encode_message(m)
        st = self.beacon_state.setdefault(
            (m.stream_key, m.shard_id),
            {"seq": m.sequence, "ts": m.timestamp_ms, "crc": RunningChecksum()},
        )
        st["seq"] = max(st["seq"], m.sequence)
        st["ts"] = max(st["ts"], m.timestamp_ms)
        st["crc"].update(crc)
        view = memoryview(encoded)
        while len(view) > 0:
            chunk = min(self.interval - (self.offset % self.interval), len(view))
            self._write_raw(bytes(view[:chunk]))
            view = view[chunk:]
            if self.offset > 0 and self.offset % self.interval == 0:
                self._write_beacon(len(view))
        return crc

    def end(self, eos: bool = True) -> bytes:
        """Optionally write the EOS marker (D10) and finalize. Returns the
        container bytes for an in-memory sink; file sinks are flushed and
        closed (their bytes are already on disk)."""
        if eos:
            self.write(SsMessage(SEA_STREAMER_INTERNAL, 0, 0, 0, EOS_PAYLOAD))
        if isinstance(self.buf, io.BytesIO):
            return self.buf.getvalue()
        self.buf.flush()
        self.buf.close()
        return b""


# ------------------------------------------------------------- Spark surface


def read_ss(
    spark: SparkSession,
    path: str,
    since_timestamp_ms: int | None = None,
    since_sequence: int | None = None,
) -> DataFrame:
    """Read `.ss` file(s) into the canonical envelope DataFrame.

    ``binaryFile`` source + Arrow-batched parse; one task per file (files are
    sequential containers — cross-file parallelism is the scale axis; for a
    single huge file, split at beacon boundaries in a follow-up).

    ``since_timestamp_ms`` / ``since_sequence`` apply the Surveyor beacon-skip
    (T1/T2, S11) inside each file's parser before the exact predicate — the
    `.ss` analog of parquet row-group pruning: ts strictly greater, seq
    inclusive (messages.rs:262-279).
    """
    from pyspark.sql import functions as F

    if os.path.isdir(path):
        path = os.path.join(path, "*.ss")
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                data = bytes(content)
                start = None
                if since_timestamp_ms is not None or since_sequence is not None:
                    start = seek_offset(
                        data, timestamp_ms=since_timestamp_ms, sequence=since_sequence
                    )
                for m in iter_messages(data, start_offset=start):
                    if since_timestamp_ms is not None and m.timestamp_ms <= since_timestamp_ms:
                        continue
                    if since_sequence is not None and m.sequence < since_sequence:
                        continue
                    rows.append(
                        (m.stream_key, m.shard_id, m.sequence, m.timestamp_ms, m.payload)
                    )
            yield pd.DataFrame(
                rows, columns=["stream_key", "shard_id", "sequence", "ts_ms", "payload"]
            )

    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    parsed_schema = StructType(
        [
            StructField("stream_key", StringType()),
            StructField("shard_id", LongType()),
            StructField("sequence", LongType()),
            StructField("ts_ms", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return raw.mapInPandas(parse, parsed_schema).select(
        "stream_key",
        "shard_id",
        "sequence",
        F.timestamp_millis(F.col("ts_ms")).alias("timestamp"),
        "payload",
    )


def write_ss(
    df: DataFrame,
    path: str,
    beacon_interval: int = DEFAULT_BEACON_INTERVAL,
    eos: bool = True,
) -> int:
    """Write an envelope DataFrame to a single `.ss` file (driver-side;
    ordered by (timestamp, stream_key, sequence)). Returns message count."""
    from pyspark.sql import functions as F

    rows = (
        df.select("stream_key", "shard_id", "sequence", "timestamp", "payload")
        .orderBy("timestamp", "stream_key", "sequence")
        .collect()
    )
    w = SsWriter(os.path.basename(path), beacon_interval)
    for r in rows:
        ts_ms = int(r.timestamp.timestamp() * 1000)
        w.write(SsMessage(r.stream_key, r.shard_id, r.sequence, ts_ms, bytes(r.payload or b"")))
    data = w.end(eos)
    with open(path, "wb") as f:
        f.write(data)
    return len(rows)


def write_ss_dir(
    df: DataFrame,
    out_dir: str,
    beacon_interval: int = DEFAULT_BEACON_INTERVAL,
    eos: bool = True,
    partition_cols: tuple[str, ...] = ("stream_key", "shard_id"),
    num_files: int | None = None,
) -> list:
    """Distributed `.ss` write: one container file per Spark partition
    (``part-NNNNN.ss``), written *on executors* — the S9 sink at scale.

    Layout: repartition by ``partition_cols`` (default: each (stream, shard)
    lands wholly in one file — the unit the format orders, matching the
    reference's one-sink-per-file model, messages.rs:555-609) and sort within
    partitions by (timestamp, stream_key, sequence), so every file is a
    well-ordered standalone container. ``read_ss(out_dir)`` parses the whole
    directory back with one task per file.

    Files are staged as ``.tmp`` and atomically renamed, so a killed task
    retried by Spark never leaves a half-written visible file. ``out_dir``
    must be on a filesystem every executor can reach (true on local[...] and
    on any shared-FS/NFS cluster deployment; object stores would take a
    custom commit protocol — out of scope for an interop format).

    Returns the per-file summaries ``[(path, messages, bytes), ...]``.
    """
    import pandas as pd  # noqa: F401 (executor-side import kept explicit)

    os.makedirs(out_dir, exist_ok=True)
    cols = df.select("stream_key", "shard_id", "sequence", "timestamp", "payload")
    if partition_cols:
        # an explicit num_files pins the file count (AQE coalescing would
        # otherwise merge small shuffles down — right at scale, but callers
        # sometimes want a fixed layout)
        arranged = (
            cols.repartition(num_files, *partition_cols)
            if num_files
            else cols.repartition(*partition_cols)
        )
    else:
        arranged = cols.repartition(num_files) if num_files else cols
    arranged = arranged.sortWithinPartitions("timestamp", "stream_key", "sequence")

    def write_partition(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = os.path.join(out_dir, f"part-{pid:05d}.ss")
        tmp = final + ".tmp"
        writer = None
        n = 0
        for pdf in batches:
            if writer is None and len(pdf):
                writer = SsWriter(os.path.basename(final), beacon_interval)
            for r in pdf.itertuples(index=False):
                ts_ms = int(pd.Timestamp(r.timestamp).value // 1_000_000)
                writer.write(
                    SsMessage(
                        r.stream_key,
                        int(r.shard_id),
                        int(r.sequence),
                        ts_ms,
                        bytes(r.payload or b""),
                    )
                )
                n += 1
        if writer is None:
            yield pd.DataFrame([], columns=["path", "messages", "bytes"]).astype(
                {"path": "string", "messages": "int64", "bytes": "int64"}
            )
            return
        data = writer.end(eos)
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, final)
        yield pd.DataFrame([(final, n, len(data))], columns=["path", "messages", "bytes"])

    return (
        arranged.mapInPandas(write_partition, "path string, messages long, bytes long")
        .collect()
    )


def _parse_complete_ex(
    data,
    interval: int,
    start_offset: int,
    end_byte: int | None = None,
    eos_resume: str = "after",
    verify_crc: bool = True,
):
    """Core of :func:`parse_complete`; additionally returns the consumed
    beacons and supports ``eos_resume="before"`` (resume at the EOS marker's
    start — the append path truncates it away, messages.rs:419-515)."""
    end = len(data) if end_byte is None else min(end_byte, len(data))
    cur = _Cursor(data, interval)
    cur.offset = start_offset
    out: list[SsMessage] = []
    resume = cur.offset
    while True:
        try:
            cur._maybe_beacon()
        except EOFError:
            break  # truncated beacon: retry from the boundary next poll
        if cur.eof() or cur.offset >= end:
            resume = min(cur.offset, end)
            break
        msg_start = cur.offset
        try:
            key_len = cur.read(1)[0]
            key = cur.read(key_len).decode("utf-8")
            shard = int.from_bytes(cur.read(8), "big")
            seq = int.from_bytes(cur.read(8), "big")
            ts = int.from_bytes(cur.read(8), "big")
            size = int.from_bytes(cur.read(4), "big")
            payload = cur.read(size)
            crc = int.from_bytes(cur.read(2), "big")
            cur.read(1)
        except EOFError:
            break  # incomplete message: resume stays before it
        if verify_crc:
            computed = crc16_cdma2000(payload)
            if crc != computed:
                raise SsFormatError(f"checksum error: received {crc}, computed {computed}")
        msg = SsMessage(key, shard, seq, ts, payload)
        if msg.is_eos:
            resume = msg_start if eos_resume == "before" else cur.offset
            break
        resume = cur.offset
        out.append(msg)
    return out, resume, cur.beacons


def parse_complete(data, interval: int, start_offset: int, end_byte: int | None = None):
    """Parse complete messages from ``start_offset``; return
    ``(messages, resume_offset)`` where ``resume_offset`` is the byte
    position after the last *fully written* message — the live-tail resume
    point (a partially appended message or beacon leaves resume at its
    start, to be retried when more bytes arrive)."""
    msgs, resume, _beacons = _parse_complete_ex(data, interval, start_offset, end_byte)
    return msgs, resume
