"""The stdio line protocol (S12/S13): ``[ts | key | seq | shard] payload``.

Parsing semantics observed from sea-streamer-stdio/src/parser.rs:31-110 and
its 8 test vectors (parser.rs:112-249):

- a line without a ``[...]`` prefix is all payload (timestamp := now);
- meta parts are ``|``-separated and trimmed; the first part may be a
  timestamp (``YYYY-MM-DDTHH:MM:SS`` with optional ``.subsec`` — lib.rs:65-70,
  only accepted while no other field is set), then stream key (full match of
  ``[a-zA-Z0-9._-]{1,249}``), then sequence, then shard id;
- an unparseable part is an error (``[ ]`` → Unknown).

Two implementations with identical semantics:

- :func:`parse_line` — pure Python, used by tests and driver-side tools;
- :func:`parse_lines_df` — Spark-native column expressions (regexp), the
  scale path for parsing a text stream (``readStream.format("socket")`` /
  file lines) into the envelope; fields stay inside codegen.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model import is_valid_stream_key

TS_RE = r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?"
KEY_RE = r"[a-zA-Z0-9._\-]{1,249}"
META_RE = re.compile(r"^\[([^\]]+)\](.*)$", re.S)


class LineParseError(ValueError):
    pass


@dataclass
class ParsedLine:
    timestamp: datetime | None
    stream_key: str | None
    sequence: int | None
    shard_id: int | None
    payload: str


def _parse_ts(part: str) -> datetime | None:
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S"):
        try:
            return datetime.strptime(part, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    return None


def parse_line(line: str, now: datetime | None = None) -> ParsedLine:
    """Parse one protocol line (reference parser.rs:31-110 semantics)."""
    m = META_RE.match(line)
    if not m:
        ts = now or datetime.now(timezone.utc)
        return ParsedLine(ts, None, None, None, line)
    raw, payload = m.group(1), m.group(2).strip()
    meta = ParsedLine(None, None, None, None, payload)
    any_set = False
    for part in (p.strip() for p in raw.split("|")):
        parsed = False
        if not any_set:
            ts = _parse_ts(part)
            if ts is not None:
                meta.timestamp, parsed, any_set = ts, True, True
        if not parsed and meta.stream_key is None and is_valid_stream_key(part):
            meta.stream_key, parsed, any_set = part, True, True
        if (
            not parsed
            and meta.stream_key is not None
            and meta.sequence is None
            and meta.shard_id is None
            and part.isdigit()
        ):
            meta.sequence, parsed = int(part), True
        if (
            not parsed
            and meta.stream_key is not None
            and meta.sequence is not None
            and meta.shard_id is None
            and part.isdigit()
        ):
            meta.shard_id, parsed = int(part), True
        if not parsed:
            raise LineParseError(f"unknown part: {part!r}")
    if not any_set and meta.sequence is None and meta.shard_id is None:
        raise LineParseError("empty meta")
    return meta


def format_line(
    payload: str,
    timestamp: datetime | None = None,
    stream_key: str | None = None,
    sequence: int | None = None,
    shard_id: int | None = None,
) -> str:
    """Format a protocol line (the producer side, stdio/src/producer.rs:43-151)."""
    parts: list[str] = []
    if timestamp is not None:
        parts.append(timestamp.strftime("%Y-%m-%dT%H:%M:%S"))
    if stream_key is not None:
        parts.append(stream_key)
        if sequence is not None:
            parts.append(str(sequence))
            if shard_id is not None:
                parts.append(str(shard_id))
    prefix = f"[{' | '.join(parts)}] " if parts else ""
    return prefix + payload


def _meta_col(line: Column) -> Column:
    return F.regexp_extract(line, r"^\[([^\]]+)\]", 1)


def parse_lines_df(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Spark-native line parse → envelope-shaped columns.

    Handles the common producer-emitted shapes (``[ts | key | seq | shard]``
    with optional trailing fields); arbitrary permutations fall back to the
    Python parser if ever needed. All regexp work is JVM-side codegen.
    """
    line = F.col(line_col)
    meta = _meta_col(line)
    has_meta = meta != ""
    payload = F.when(
        has_meta, F.trim(F.regexp_replace(line, r"^\[[^\]]*\]\s*", ""))
    ).otherwise(line)
    parts = F.split(meta, r"\s*\|\s*")
    first = F.element_at(parts, 1)
    has_ts = first.rlike(f"^{TS_RE}$")
    ts = F.when(has_ts, F.to_timestamp(F.regexp_replace(first, "T", " ")))
    key_idx = F.when(has_ts, 2).otherwise(1)
    key = F.element_at(parts, key_idx)
    seq = F.element_at(parts, key_idx + 1)
    shard = F.element_at(parts, key_idx + 2)
    return df.select(
        F.when(has_meta & key.isNotNull() & key.rlike(f"^{KEY_RE}$"), key).alias("stream_key"),
        F.coalesce(
            F.when(has_meta, shard.cast("long")), F.lit(0).cast("long")
        ).alias("shard_id"),
        F.coalesce(
            F.when(has_meta, seq.cast("long")), F.lit(0).cast("long")
        ).alias("sequence"),
        F.coalesce(ts, F.current_timestamp()).alias("timestamp"),
        payload.cast("binary").alias("payload"),
    )


def format_lines_df(env: DataFrame) -> DataFrame:
    """Envelope → protocol lines (the console/stdout sink projection)."""
    return env.select(
        F.concat(
            F.lit("["),
            F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss"),
            F.lit(" | "),
            F.col("stream_key"),
            F.lit(" | "),
            F.col("sequence").cast("string"),
            F.lit(" | "),
            F.col("shard_id").cast("string"),
            F.lit("] "),
            F.col("payload").cast("string"),
        ).alias("value")
    )
