"""Streaming-semantics queries, checked batch-equivalently.

Each query replays the driver's ``events`` table through the canonical message
envelope (FIXTURES.md §1) and expresses one piece of the reference's streaming
surface — seek/rewind (T1/T2), shard assignment (T3, H1-H4), consumer modes
(D1-D3), the fuse StreamJoin (J1), windowed aggregation — as a deterministic
batch query the DuckDB oracle can verify. The live streaming path reuses the
same column expressions over ``readStream`` (see streaming/ and tests).

The envelope mapping (shared with the oracle):
``stream_key=event_type, shard_id=user_id%4, sequence=event_id, timestamp=ts,
payload=props``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import envelope_from_events
from ..sources.tables import load_tables
from .registry import query

#: The envelope projection as oracle SQL (payload kept as string for hashing).
ENVELOPE_SQL = """
    SELECT event_type AS stream_key,
           user_id % 4 AS shard_id,
           event_id AS sequence,
           ts AS timestamp,
           props AS payload_str
    FROM events
"""


def _envelope(spark: SparkSession, sf_dir: str, num_shards: int = 4) -> DataFrame:
    t = load_tables(spark, sf_dir, "events")
    return envelope_from_events(t.events, num_shards=num_shards)


def _with_payload_str(env: DataFrame) -> DataFrame:
    return env.select(
        "stream_key",
        "shard_id",
        "sequence",
        "timestamp",
        F.col("payload").cast("string").alias("payload_str"),
    )


@query(
    "envelope_project",
    oracle=ENVELOPE_SQL,
    tags=("streaming", "envelope"),
)
def envelope_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical envelope itself (S16 socket layer data model): a pure
    projection — no shuffle at any scale."""
    return _with_payload_str(_envelope(spark, sf_dir))


@query(
    "envelope_wide_seqno",
    oracle="""
    SELECT event_type AS stream_key,
           event_id AS sequence,
           CAST(CAST(epoch_ns(ts) AS HUGEINT) * 65536
                + (event_id % 65536) AS VARCHAR) AS wide_seq_no
    FROM events
    """,
    tags=("streaming", "envelope"),
)
def envelope_wide_seqno(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``wide-seq-no`` + ``nanosecond-timestamp`` opt-in pair
    (sea-streamer-types/Cargo.toml:29; TimestampFormat::UnixTimestampNanos,
    redis/src/streamer.rs:41-47): SeqNo = (unix-ns << 16) | seq16 carried as
    ``decimal(38,0)`` beside the default i64 envelope column — the packing
    of redis/src/message.rs:51-60 at nanosecond width. Pure projection (no
    shuffle, no Python); compared as strings because int128 has no common
    arrow dtype across engines."""
    from ..streaming.redis import wide_sequence_col

    return _envelope(spark, sf_dir).select(
        "stream_key",
        "sequence",
        wide_sequence_col("timestamp", "sequence")
        .cast("string")
        .alias("wide_seq_no"),
    )


@query(
    "seek_timestamp",
    oracle=f"""
    SELECT stream_key, shard_id, sequence, timestamp
    FROM ({ENVELOPE_SQL})
    WHERE timestamp > TIMESTAMP '2024-01-15 00:00:00'
    """,
    tags=("streaming", "seek"),
)
def seek_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 seek(Timestamp): earliest message with timestamp strictly later
    than the target (exclusive — file/src/messages.rs:262-279). On parquet
    the predicate prunes row groups; on Kafka it maps to
    ``startingOffsetsByTimestamp``."""
    return (
        _envelope(spark, sf_dir)
        .filter(F.col("timestamp") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .select("stream_key", "shard_id", "sequence", "timestamp")
    )


@query(
    "rewind_at_seqno",
    oracle=f"""
    SELECT stream_key, shard_id, sequence
    FROM ({ENVELOPE_SQL})
    WHERE sequence >= 5000
    """,
    tags=("streaming", "seek"),
)
def rewind_at_seqno(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 rewind(SeqPos::At(n)): seqno comparison is *inclusive*
    (types/src/consumer.rs:69-75); Kafka analog ``startingOffsets`` JSON."""
    return (
        _envelope(spark, sf_dir)
        .filter(F.col("sequence") >= 5000)
        .select("stream_key", "shard_id", "sequence")
    )


@query(
    "assign_shard",
    oracle=f"""
    SELECT stream_key, shard_id, sequence
    FROM ({ENVELOPE_SQL})
    WHERE shard_id = 2
    """,
    tags=("streaming", "shard"),
)
def assign_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 assign(): pin a consumer to one (stream, shard)
    (types/src/consumer.rs:77-85)."""
    return (
        _envelope(spark, sf_dir)
        .filter(F.col("shard_id") == 2)
        .select("stream_key", "shard_id", "sequence")
    )


@query(
    "shard_round_robin",
    oracle="""
    SELECT event_type AS stream_key,
           event_id % 3 AS shard_id,
           COUNT(*) AS n,
           MIN(event_id) AS min_seq,
           MAX(event_id) AS max_seq
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "shard"),
)
def shard_round_robin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 RoundRobinSharder: message i → shard ``i % num_shards`` (verified by
    the reference's sharding test, redis/tests/sharding.rs:52-63)."""
    t = load_tables(spark, sf_dir, "events")
    return (
        t.events.select(
            F.col("event_type").alias("stream_key"),
            F.pmod(F.col("event_id"), F.lit(3)).cast("long").alias("shard_id"),
            F.col("event_id"),
        )
        .groupBy("stream_key", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_seq"),
            F.max("event_id").alias("max_seq"),
        )
    )


@query(
    "shard_pseudo_random",
    oracle="""
    SELECT (epoch_ms(ts) % 1000) % 4 AS shard_id, COUNT(*) AS n
    FROM events GROUP BY 1
    """,
    tags=("streaming", "shard"),
)
def shard_pseudo_random(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 PseudoRandomSharder: ``millisecond % num_shards``
    (redis/src/producer.rs:592-608), applied to event time for determinism."""
    t = load_tables(spark, sf_dir, "events")
    return (
        t.events.select(
            F.pmod(F.pmod(F.unix_millis(F.col("ts")), F.lit(1000)), F.lit(4)).alias("shard_id")
        )
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "consumer_group_round_robin",
    oracle=f"""
    SELECT sequence % 3 AS group_member, COUNT(*) AS n,
           MIN(sequence) AS min_seq, MAX(sequence) AS max_seq
    FROM ({ENVELOPE_SQL})
    GROUP BY 1
    """,
    tags=("streaming", "group"),
)
def consumer_group_round_robin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11 in-process consumer groups: member = ``sequence % group_size``
    (file/src/consumer/group.rs:485-524, pick at :493)."""
    return (
        _envelope(spark, sf_dir)
        .select(F.pmod(F.col("sequence"), F.lit(3)).cast("long").alias("group_member"), "sequence")
        .groupBy("group_member")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("sequence").alias("min_seq"),
            F.max("sequence").alias("max_seq"),
        )
    )


@query(
    "latest_vs_earliest",
    oracle=f"""
    SELECT 'earliest' AS consumer, COUNT(*) AS n, MIN(sequence) AS first_seq
    FROM ({ENVELOPE_SQL})
    UNION ALL
    SELECT 'latest' AS consumer, COUNT(*) AS n, MIN(sequence) AS first_seq
    FROM ({ENVELOPE_SQL}) WHERE sequence >= 9000
    """,
    tags=("streaming", "mode"),
)
def latest_vs_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 RealTime consumer reset semantics (redis/tests/realtime.rs:67-98):
    an 'earliest' consumer replays everything, a 'latest' consumer only sees
    messages after its subscription point (here seq 9000)."""
    env = _envelope(spark, sf_dir)
    earliest = env.agg(
        F.count(F.lit(1)).alias("n"), F.min("sequence").alias("first_seq")
    ).select(F.lit("earliest").alias("consumer"), "n", "first_seq")
    latest = (
        env.filter(F.col("sequence") >= 9000)
        .agg(F.count(F.lit(1)).alias("n"), F.min("sequence").alias("first_seq"))
        .select(F.lit("latest").alias("consumer"), "n", "first_seq")
    )
    return earliest.unionByName(latest)


@query(
    "xrange_bounded_scan",
    oracle=f"""
    SELECT stream_key, sequence, timestamp
    FROM ({ENVELOPE_SQL})
    WHERE stream_key = 'view'
      AND timestamp >= TIMESTAMP '2024-01-10 00:00:00'
      AND timestamp <  TIMESTAMP '2024-01-20 00:00:00'
    """,
    tags=("streaming", "scan"),
)
def xrange_bounded_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 RedisManager::range (XRANGE start end): bounded batch scan of one
    stream (redis/src/manager.rs:70-105); Kafka analog = batch read with
    starting/endingOffsets."""
    return (
        _envelope(spark, sf_dir)
        .filter(
            (F.col("stream_key") == "view")
            & (F.col("timestamp") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("timestamp") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
        )
        .select("stream_key", "sequence", "timestamp")
    )


@query(
    "relay_filtered_copy",
    oracle=f"""
    SELECT stream_key, shard_id, sequence, timestamp, payload_str
    FROM ({ENVELOPE_SQL})
    WHERE stream_key IN ('click', 'view')
    """,
    tags=("streaming", "relay"),
)
def relay_filtered_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S17 relay: copy stream A→B across backends — in Spark a
    read→filter→write one-liner; the payload passes through untouched."""
    return _with_payload_str(
        _envelope(spark, sf_dir).filter(F.col("stream_key").isin("click", "view"))
    )


@query(
    "stream_merge_order_fuse",
    oracle=f"""
    SELECT ROW_NUMBER() OVER (ORDER BY timestamp, stream_key, sequence) AS emit_index,
           stream_key, sequence, timestamp
    FROM ({ENVELOPE_SQL})
    WHERE stream_key IN ('click', 'error')
    """,
    tags=("streaming", "fuse", "join"),
)
def stream_merge_order_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 fuse StreamJoin: timestamp-ordered merge of N streams with ties
    broken by stream key (sea-streamer-fuse/src/lib.rs:71-89). The emit index
    encodes the merge order so the oracle hash verifies ordering, not just
    membership."""
    from ..operators.fuse import stream_join

    # scope="global" is a deliberate opt-in: this query pins the reference's
    # single total merge order, computed DISTRIBUTED (event-time range
    # buckets + per-bucket rank + broadcast offsets — no one-partition
    # window over the data; see stream_join_batch). The operator's default
    # remains the per-shard merge checked by stream_merge_sharded.
    env = _envelope(spark, sf_dir).filter(F.col("stream_key").isin("click", "error"))
    return stream_join(env, scope="global").select(
        "emit_index", "stream_key", "sequence", "timestamp"
    )


@query(
    "stream_join_correlate",
    oracle="""
    SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    tags=("streaming", "join", "interval"),
)
def stream_join_correlate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream correlation join with an event-time range condition —
    the watermarked interval-join pattern (clicks followed by a purchase
    within 30 minutes). Equi-join on user_id keeps the shuffle keyed; the
    time range is evaluated within each key group."""
    t = load_tables(spark, sf_dir, "events")
    clicks = t.events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    return (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")),
        )
        .select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")
    )


@query(
    "window_tumbling_1h",
    oracle="""
    SELECT event_type,
           DATE_TRUNC('hour', ts) AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window", "bench"),
)
def window_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (the micro-batch analog of P4
    buffering); in streaming mode the same expression runs under a watermark."""
    t = load_tables(spark, sf_dir, "events")
    return (
        t.events.groupBy(
            "event_type", F.window("ts", "1 hour").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(value AS DECIMAL(14,2))")).cast("double").alias("sum_value"),
        )
        .select("event_type", F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@query(
    "window_sliding_1h_30m",
    oracle="""
    WITH starts AS (
      SELECT *, time_bucket(INTERVAL 30 MINUTE, ts) AS b FROM events
    ), expanded AS (
      SELECT event_type, value, b AS window_start FROM starts
      UNION ALL
      SELECT event_type, value, b - INTERVAL 30 MINUTE AS window_start FROM starts
    )
    SELECT event_type, window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM expanded GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def window_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30m slide): each event lands in 2 windows."""
    t = load_tables(spark, sf_dir, "events")
    return (
        t.events.groupBy("event_type", F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(value AS DECIMAL(14,2))")).cast("double").alias("sum_value"),
        )
        .select("event_type", F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@query(
    "window_session_30m",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
    tags=("streaming", "window", "session"),
)
def window_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap per user — Spark's native
    ``session_window`` (streaming-capable with a watermark); the oracle
    reconstructs sessions with a lag/cumsum idiom."""
    t = load_tables(spark, sf_dir, "events")
    return (
        t.events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "dedup_events_first_per_key",
    oracle="""
    SELECT user_id, event_type, MIN(event_id) AS first_event_id, COUNT(*) AS n_dups
    FROM events GROUP BY user_id, event_type
    """,
    tags=("streaming", "dedup"),
)
def dedup_events_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the first message per (user, type) — the batch
    analog of ``dropDuplicatesWithinWatermark``; deterministic via MIN."""
    t = load_tables(spark, sf_dir, "events")
    return t.events.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"), F.count(F.lit(1)).alias("n_dups")
    )


@query(
    "stream_merge_sharded",
    oracle=f"""
    SELECT ROW_NUMBER() OVER (PARTITION BY shard_id
                              ORDER BY timestamp, stream_key, sequence) AS emit_index,
           shard_id, stream_key, sequence
    FROM ({ENVELOPE_SQL})
    """,
    tags=("streaming", "fuse", "shard"),
)
def stream_merge_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 fuse StreamJoin, scale path: merge order maintained per shard via a
    hash-partitioned window — fully parallel, the ordering guarantee the
    reference actually delivers per shard."""
    from ..operators.fuse import stream_join_sharded

    return stream_join_sharded(_envelope(spark, sf_dir)).select(
        "emit_index", "shard_id", "stream_key", "sequence"
    )


@query(
    "stdio_line_roundtrip",
    oracle="""
    SELECT event_type AS stream_key,
           user_id % 4 AS shard_id,
           event_id AS sequence,
           DATE_TRUNC('second', ts) AS timestamp,
           props AS payload_str
    FROM events
    """,
    tags=("streaming", "stdio"),
)
def stdio_line_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12/S13 stdio line protocol: envelope → `[ts | key | seq | shard] payload`
    lines → parsed back to the envelope, entirely in JVM regexp expressions.
    The oracle is the *intended* envelope (second-precision timestamps — the
    protocol's own resolution, lib.rs:65-66), so the round trip is verified
    against ground truth rather than self-consistency."""
    from ..sources.stdio import format_lines_df, parse_lines_df

    env = _envelope(spark, sf_dir)
    parsed = parse_lines_df(format_lines_df(env))
    return parsed.select(
        "stream_key",
        "shard_id",
        "sequence",
        "timestamp",
        F.col("payload").cast("string").alias("payload_str"),
    )


@query(
    "ss_file_decode",
    oracle="""
    SELECT stream_key, CAST(shard_id AS BIGINT) AS shard_id,
           CAST(sequence AS BIGINT) AS sequence,
           CAST(timestamp_ms AS BIGINT) AS timestamp_ms,
           CAST(payload_len AS INTEGER) AS payload_len, payload_md5
    FROM (VALUES
        ('file', 0, 1, 1694767177912, 134, 'e829091a58f7f29dcc1a250cfb9852f3'),
        ('breakpoint', 0, 1, 1694767177917, 159, '69ec76a43785f0671e2edf0020b459ab'),
        ('breakpoint', 0, 2, 1694767177917, 157, 'a3e5d30327a79b44d8ca72cdcfb0e6fb'),
        ('breakpoint', 0, 3, 1694767178487, 118, '6c8559cbb6d0a8726ebb3a90718b213e'),
        ('event', 0, 1, 1694767178489, 44, 'ea8a998d6bd07b37a530f8cd4e231ea2'),
        ('breakpoint', 0, 4, 1694767178493, 118, '8952eaaf92e687f493c74b94c64d19a8'),
        ('event', 0, 2, 1694767178494, 77, '5831e04a369aa3c663a67e93317d6d6b'),
        ('event', 0, 3, 1694767178514, 72, '80c7b5e78c253e53ba6e7be9856da141'),
        ('event', 0, 4, 1694767178518, 77, 'adc2ff76ddbff3bb3d64045b64b56c2b'),
        ('event', 0, 5, 1694767178520, 72, '5fba4f5c30006ef37d8d264a112f8161'),
        ('event', 0, 6, 1694767178523, 77, '35ee652583f995248556c1166ccb274c'),
        ('event', 0, 7, 1694767178525, 72, '88f92552b9e343535df24642a865539c'),
        ('event', 0, 8, 1694767178527, 77, 'b51606fd0559c0e8e94fd8d495372642'),
        ('event', 0, 9, 1694767178529, 72, '34149787087f43bd9ea7e9d8198064d4'),
        ('event', 0, 10, 1694767178532, 77, 'b52cdef0c081d54885c7bb2cd5401743'),
        ('event', 0, 11, 1694767178534, 72, '3ff46b58ff3d97e16feba118778c9e60'),
        ('event', 0, 12, 1694767178536, 77, '8429454744878b9fc813098becfb26e1'),
        ('event', 0, 13, 1694767178538, 72, '3ef5da7ab3e3b95b9df995733f51bcbf'),
        ('event', 0, 14, 1694767178540, 77, '287a87b4408a44ac30ab3c36da4669e8'),
        ('event', 0, 15, 1694767178543, 72, 'd934e5a28e91c243ff9daa044f01f8c2'),
        ('event', 0, 16, 1694767178545, 78, '94a376f5f3c43f77a908d4a9f208e04d'),
        ('event', 0, 17, 1694767178548, 73, 'af9884381b3383f3a6165cbe1528f9bc'),
        ('event', 0, 18, 1694767178551, 78, '894ad23d2bafb416b855352e22248946'),
        ('event', 0, 19, 1694767178553, 73, 'fadbb76f734bf812374432d773f23d15'),
        ('event', 0, 20, 1694767178556, 78, 'b03e64cc46759ed7e8152c52b8ed0cdc'),
        ('event', 0, 21, 1694767178559, 73, '0def358777ea101ce319fa68e9d957dd'),
        ('event', 0, 22, 1694767178564, 53, '84138d92c00d219b767f94b256a3740a')
    ) AS t(stream_key, shard_id, sequence, timestamp_ms, payload_len, payload_md5)
    ORDER BY stream_key, sequence
    """,
    tags=("streaming", "ss", "file"),
)
def ss_file_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/S18 `.ss` seekable-file decode: parse the reference's own golden
    container (tests/data/sample-1.ss) into the envelope, summarized as
    (len, md5) per message so byte fidelity is value-hash checkable. The
    oracle is the frozen golden vector (the 27 messages sample.rs expects) as
    literal VALUES — independent of this repo's codec. Full payload bytes are
    asserted in tests/test_ss_format.py."""
    import os

    from ..sources.ss import read_ss

    golden = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                          "tests", "data", "sample-1.ss")
    return (
        read_ss(spark, golden)
        .select(
            "stream_key",
            "shard_id",
            "sequence",
            F.unix_millis("timestamp").alias("timestamp_ms"),
            F.length("payload").alias("payload_len"),
            F.md5("payload").alias("payload_md5"),
        )
        .orderBy("stream_key", "sequence")
    )


@query(
    "asof_join_purchase_click",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.value AS value_click, r.ts AS ts_click
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id
    """,
    tags=("events", "asof", "join"),
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): attribute each purchase to the latest
    at-or-before click by the same user — the set-oriented form of the
    reference's seek(ts)-then-correlate replay (types/src/consumer.rs:62-67)
    and the staple exposure-attribution op of training-data pipelines.

    Plan: union + one window shuffle on user_id, running carry-forward —
    no per-group buffering, no UDF; oracle is DuckDB's native ASOF JOIN."""
    from ..operators.asof import asof_join

    t = load_tables(spark, sf_dir, "events")
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = t.events.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    return (
        asof_join(purchases, clicks, on="ts", by="user_id", value_cols=["value"], suffix="_click")
        .orderBy("event_id")
    )


@query(
    "range_join_click_window",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           COUNT(*) AS click_cnt,
           CAST(SUM(CAST(r.value AS DECIMAL(14,2))) AS DOUBLE) AS click_value_sum
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
    GROUP BY l.event_id, l.user_id, l.ts
    ORDER BY l.event_id
    """,
    tags=("events", "range-join", "join"),
)
def range_join_click_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/range_join.py): all clicks in the hour before
    each purchase by the same user, aggregated per purchase — the bounded
    context-window correlation of training pipelines, generalizing the fuse
    crate's timestamp interleaving (sea-streamer-fuse/src/lib.rs:9-151).

    Plan: time-bucketed equi-join (never a nested loop) + single agg; the
    oracle is DuckDB's native inequality join."""
    from ..operators.range_join import range_join

    t = load_tables(spark, sf_dir, "events")
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = t.events.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    return (
        range_join(purchases, clicks, on="ts", lower_seconds=3600, upper_seconds=0, by="user_id")
        .groupBy("event_id", "user_id", "ts")
        .agg(
            F.count(F.lit(1)).alias("click_cnt"),
            F.sum(F.expr("CAST(value_right AS DECIMAL(14,2))"))
            .cast("double")
            .alias("click_value_sum"),
        )
        .orderBy("event_id")
    )


@query(
    "asof_join_forward_next_click",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, MIN(value) AS value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), p AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), m AS (
      SELECT p.*, (SELECT MIN(c.ts) FROM c
                   WHERE c.user_id = p.user_id AND c.ts >= p.ts) AS ts_click
      FROM p
    )
    SELECT m.event_id, m.user_id, m.ts, m.value,
           c.value AS value_click, m.ts_click
    FROM m LEFT JOIN c ON c.user_id = m.user_id AND c.ts = m.ts_click
    ORDER BY m.event_id
    """,
    tags=("events", "asof", "join"),
)
def asof_join_forward_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (operators/asof.py direction="forward"): the
    EARLIEST at-or-after click per purchase — outcome attribution after an
    anchor event. Right side pre-deduped on (user, ts) with MIN(value) so
    Spark and the correlated-subquery oracle resolve ties identically."""
    from ..operators.asof import asof_join

    t = load_tables(spark, sf_dir, "events")
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        t.events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("value").alias("value"))
    )
    return (
        asof_join(
            purchases, clicks, on="ts", by="user_id",
            value_cols=["value"], suffix="_click", direction="forward",
        )
        .orderBy("event_id")
    )


@query(
    "asof_join_nearest_click",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, MIN(value) AS value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), p AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), m AS (
      SELECT p.*,
             (SELECT MAX(c.ts) FROM c
              WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS bts,
             (SELECT MIN(c.ts) FROM c
              WHERE c.user_id = p.user_id AND c.ts >= p.ts) AS fts
      FROM p
    ), pick AS (
      SELECT m.event_id, m.user_id, m.ts, m.value,
             CASE WHEN bts IS NULL THEN fts
                  WHEN fts IS NULL THEN bts
                  WHEN epoch_ns(m.ts) - epoch_ns(bts)
                       <= epoch_ns(fts) - epoch_ns(m.ts) THEN bts
                  ELSE fts END AS ts_click
      FROM m
    )
    SELECT pick.event_id, pick.user_id, pick.ts, pick.value,
           c.value AS value_click, pick.ts_click
    FROM pick LEFT JOIN c ON c.user_id = pick.user_id AND c.ts = pick.ts_click
    ORDER BY pick.event_id
    """,
    tags=("events", "asof", "join"),
)
def asof_join_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (operators/asof.py direction="nearest"): the
    closest-in-time click per purchase, ties resolved backward — pandas
    merge_asof's third direction, completing the asof family. Same plan as
    the directional forms (ONE user-keyed exchange; nearest costs only a
    second in-partition sort), with the backward/forward carry structs
    compared by event-time distance. Right side pre-deduped on (user, ts)
    with MIN(value) so both engines resolve equal-time ties identically."""
    from ..operators.asof import asof_join

    t = load_tables(spark, sf_dir, "events")
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        t.events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("value").alias("value"))
    )
    return (
        asof_join(
            purchases, clicks, on="ts", by="user_id",
            value_cols=["value"], suffix="_click", direction="nearest",
        )
        .orderBy("event_id")
    )


# ------------------------------------------------------- sea_redis roundtrip

#: Deterministic broker content for the registered-DataSource roundtrip:
#: 3 shards x 20 entries, entry id = (BASE_MS + 37*i, shard).
_RT_BASE_MS = 1_700_000_000_000
_RT_SHARDS, _RT_PER_SHARD = 3, 20


def _rt_rows() -> list[tuple[str, int, int, int, str]]:
    from ..streaming.redis import pack_message_id

    rows = []
    for s in range(_RT_SHARDS):
        for i in range(_RT_PER_SHARD):
            ms = _RT_BASE_MS + 37 * i
            rows.append(("loop", s, pack_message_id(ms, s), ms, f"p-{s}-{i}"))
    return rows


def _rt_broker_root() -> str:
    """Populate (once per machine) a file-backed loopback broker with the
    deterministic fixture; concurrent populators race benignly (duplicate
    explicit ids are rejected, content converges to the same 60 entries)."""
    import os
    import tempfile

    from ..streaming.fake_redis import FakeRedis, ResponseError
    from ..streaming.redis import format_entry_id, shard_key

    root = os.path.join(tempfile.gettempdir(), "sea_redis_roundtrip_v1")
    done = os.path.join(root, ".done")
    if not os.path.exists(done):
        client = FakeRedis(root=root)
        for stream_key, sid, seq_no, _ms, payload in _rt_rows():
            try:
                client.xadd(
                    shard_key(stream_key, sid),
                    {"payload": payload.encode()},
                    id=format_entry_id(seq_no),
                )
            except ResponseError:
                pass  # another process already wrote this id
        with open(done, "w"):
            pass
    return root


_RT_VALUES = ",\n        ".join(
    f"('{k}', {s}, {q}, {ms}, '{p}')" for k, s, q, ms, p in _rt_rows()
)


@query(
    "redis_stream_roundtrip",
    oracle=f"""
    SELECT stream_key, CAST(shard_id AS BIGINT) AS shard_id,
           CAST(sequence AS BIGINT) AS sequence,
           CAST(timestamp_ms AS BIGINT) AS timestamp_ms, payload_str
    FROM (VALUES
        {_RT_VALUES}
    ) AS t(stream_key, shard_id, sequence, timestamp_ms, payload_str)
    ORDER BY shard_id, sequence
    """,
    tags=("streaming", "redis", "source"),
)
def redis_stream_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S5 through the *registered* ``sea_redis`` DataSource: XADD a
    deterministic fixture into the file-backed loopback broker, read it back
    with ``spark.read.format("sea_redis")`` (one task per shard, bounded
    XRANGE — redis/src/manager.rs:70-105), and verify the envelope against
    the literal fixture VALUES. Executors open the broker directory
    themselves — the identical partition/read path a redis-py deployment
    runs (sources/redis_datasource.py)."""
    from ..sources.redis_datasource import SeaRedisDataSource

    spark.dataSource.register(SeaRedisDataSource)
    root = _rt_broker_root()
    return (
        spark.read.format("sea_redis")
        .option("stream_key", "loop")
        .option("fake_root", root)
        .load()
        .select(
            "stream_key",
            "shard_id",
            "sequence",
            F.unix_millis("timestamp").alias("timestamp_ms"),
            F.col("payload").cast("string").alias("payload_str"),
        )
        .orderBy("shard_id", "sequence")
    )


@query(
    "ss_write_roundtrip",
    oracle=f"""
    SELECT stream_key, shard_id, sequence,
           epoch_ms(timestamp) AS timestamp_ms,
           md5(payload_str) AS payload_md5
    FROM ({ENVELOPE_SQL})
    WHERE stream_key = 'purchase'
    ORDER BY sequence
    """,
    tags=("streaming", "ss", "file", "sink"),
)
def ss_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 distributed `.ss` sink → S8 source round-trip: write the purchase
    stream through ``write_ss_dir`` (per-partition container files built on
    executors, messages.rs:555-609 re-expressed) and parse the directory
    back. The oracle is the source envelope itself (ms-truncated timestamps
    — the container's resolution), so a byte-level encode/decode defect
    anywhere in the path breaks the value hash."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..sources.ss import read_ss, write_ss_dir

    env = _envelope(spark, sf_dir).filter(F.col("stream_key") == "purchase")
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    out = os.path.join(tempfile.gettempdir(), f"ss_write_roundtrip_{tag}")
    shutil.rmtree(out, ignore_errors=True)
    write_ss_dir(env, out, beacon_interval=256 * 1024, num_files=4)
    return (
        read_ss(spark, out)
        .select(
            "stream_key",
            "shard_id",
            "sequence",
            F.unix_millis("timestamp").alias("timestamp_ms"),
            F.md5(F.col("payload").cast("string")).alias("payload_md5"),
        )
        .orderBy("sequence")
    )


def _iggy_rt_root() -> str:
    """Populate (once per machine) a file-backed loopback Iggy server with
    the same deterministic fixture as the Redis round-trip; appends are
    offset-assigned so a concurrent populator is detected via end_offset."""
    import os
    import tempfile

    from ..streaming.fake_iggy import FakeIggy

    root = os.path.join(tempfile.gettempdir(), "sea_iggy_roundtrip_v1")
    done = os.path.join(root, ".done")
    if not os.path.exists(done):
        os.makedirs(root, exist_ok=True)
        client = FakeIggy(root=root)
        by_part: dict[int, list[tuple[int, bytes]]] = {}
        for _k, sid, seq_no, ms, payload in _rt_rows():
            # per-partition offset == per-shard arrival index; ts carries ms
            by_part.setdefault(sid, []).append((ms * 1000, payload.encode()))
        for sid, msgs in sorted(by_part.items()):
            if client.end_offset("sea", "loop", sid) == 0:
                client.send_messages("sea", "loop", sid, msgs)
        with open(done, "w"):
            pass
    return root


@query(
    "iggy_stream_roundtrip",
    oracle=f"""
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY sequence) - 1
                AS BIGINT) AS srv_offset,
           CAST(timestamp_ms AS BIGINT) AS timestamp_ms, payload_str
    FROM (VALUES
        {_RT_VALUES}
    ) AS t(stream_key, shard_id, sequence, timestamp_ms, payload_str)
    ORDER BY shard_id, srv_offset
    """,
    tags=("streaming", "iggy", "source"),
)
def iggy_stream_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15 through the *registered* ``sea_iggy`` DataSource: append the
    deterministic fixture into the file-backed loopback server (offsets
    assigned per partition like the real server, iggy/src/producer.rs),
    read it back with ``spark.read.format("sea_iggy")`` — one task per
    partition, bounded offset scan — and verify the envelope against the
    fixture VALUES (server offsets = per-shard arrival order)."""
    from ..sources.iggy_datasource import SeaIggyDataSource

    spark.dataSource.register(SeaIggyDataSource)
    root = _iggy_rt_root()
    return (
        spark.read.format("sea_iggy")
        .option("topic", "loop")
        .option("fake_root", root)
        .load()
        .select(
            "shard_id",
            F.col("sequence").alias("srv_offset"),
            F.unix_millis("timestamp").alias("timestamp_ms"),
            F.col("payload").cast("string").alias("payload_str"),
        )
        .orderBy("shard_id", "srv_offset")
    )


# ------------------------------------------- consumer groups (D4-D7) e2e

#: Group-scenario fixture: 2 shards x 12 entries on stream "task",
#: entry id = (GRP_BASE_MS + 41*i)-<shard>, payload "t-<shard>-<i>".
_GRP_BASE_MS = 1_710_000_000_000
_GRP_SHARDS, _GRP_PER_SHARD = 2, 12


def _grp_rows() -> list[tuple[int, int, int, str]]:
    return [
        (s, i, _GRP_BASE_MS + 41 * i, f"t-{s}-{i}")
        for s in range(_GRP_SHARDS)
        for i in range(_GRP_PER_SHARD)
    ]


def _grp_scenario_root(tag: str, scenario) -> str:
    """Run a deterministic consumer-group scenario exactly once per machine
    (exclusive flock — unlike the append-only roundtrip fixtures, group
    state mutates, so concurrent populators must serialize, the same
    single-writer rule Redis itself gives XREADGROUP)."""
    import fcntl
    import os
    import tempfile

    from ..streaming.fake_redis import FakeRedis
    from ..streaming.redis import shard_key

    root = os.path.join(tempfile.gettempdir(), f"sea_redis_{tag}_v1")
    os.makedirs(root, exist_ok=True)
    done = os.path.join(root, ".done")
    with open(os.path.join(root, ".lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if not os.path.exists(done):
            for fn in os.listdir(root):  # a failed populate can't poison state
                if fn.endswith((".stream", ".groups.json")):
                    os.unlink(os.path.join(root, fn))
            clock = {"ms": 2_000_000_000_000}
            client = FakeRedis(root=root, clock=lambda: clock["ms"])
            for s, _i, ms, payload in _grp_rows():
                client.xadd(
                    shard_key("task", s), {"payload": payload.encode()}, id=f"{ms}-{s}"
                )
            scenario(client, clock)
            with open(done, "w"):
                pass
    return root


def _grp_consumer(client, clock, name: str):
    from ..streaming.ack import AckOptions, AutoCommit, GroupConsumer

    return GroupConsumer(
        client,
        "task",
        list(range(_GRP_SHARDS)),
        group="g",
        consumer=name,
        options=AckOptions(mode=AutoCommit.ROLLING, auto_commit_interval_ms=1_000),
        clock=lambda: clock["ms"],
    )


def _pending_scenario(client, clock) -> None:
    """c1 reads 4/shard and acks the even-indexed half (Rolling flush); c2
    reads the next 4/shard and dies un-acked. Leaves a deterministic PEL:
    c1 owns indexes {1,3}, c2 owns {4..7}, per shard."""
    c1 = _grp_consumer(client, clock, "c1")
    c1.create_group(from_beginning=True)
    c2 = _grp_consumer(client, clock, "c2")
    by_payload = {p: i for _s, i, _ms, p in _grp_rows()}
    for sid, eid, fields in c1.read(count=4):
        if by_payload[fields["payload"].decode()] % 2 == 0:
            c1.ack(sid, eid)
    c2.read(count=4)
    clock["ms"] += 1_000
    c1.tick()  # Rolling interval elapsed: one batched XACK per shard


_GRP_PENDING_VALUES = ",\n        ".join(
    f"('{c}', {n}, {lo}, {hi})"
    for c, n, lo, hi in [
        # consumer, n_pending, min/max pending entry index (per the scenario)
        ("c1", 2 * _GRP_SHARDS, 1, 3),
        ("c2", 4 * _GRP_SHARDS, 4, 7),
    ]
)


@query(
    "redis_group_pending_summary",
    oracle=f"""
    SELECT consumer, CAST(n_pending AS BIGINT) AS n_pending,
           CAST(min_idx AS BIGINT) AS min_idx, CAST(max_idx AS BIGINT) AS max_idx
    FROM (VALUES
        {_GRP_PENDING_VALUES}
    ) AS t(consumer, n_pending, min_idx, max_idx)
    ORDER BY consumer
    """,
    tags=("streaming", "redis", "group", "ack"),
)
def redis_group_pending_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4-D6 ack machinery, driver-checked: run the Rolling-mode scenario
    (partial acks + a dead consumer) through the GroupConsumer engine
    (streaming/ack.py — options.rs:15-34, node.rs:372-430 parity), then
    aggregate the surviving PEL with Spark into the XPENDING summary
    (per-consumer count + min/max pending entry). The oracle pins the
    at-least-once contract: exactly the un-acked deliveries remain, per
    consumer, across shards."""
    from ..streaming.ack import AckOptions, AutoCommit, GroupConsumer
    from ..streaming.fake_redis import FakeRedis

    root = _grp_scenario_root("group_pending", _pending_scenario)
    client = FakeRedis(root=root)
    survey = GroupConsumer(
        client, "task", list(range(_GRP_SHARDS)), "g", "survey",
        AckOptions(mode=AutoCommit.DISABLED),
    )
    ms_to_idx = {ms: i for _s, i, ms, _p in _grp_rows()}
    pel = [
        (r["consumer"], int(r["shard_id"]),
         ms_to_idx[int(r["message_id"].split("-")[0])])
        for r in survey.pending()
    ]
    return (
        spark.createDataFrame(pel, "consumer string, shard_id int, idx int")
        .groupBy("consumer")
        .agg(
            F.count("*").alias("n_pending"),
            F.min("idx").cast("long").alias("min_idx"),
            F.max("idx").cast("long").alias("max_idx"),
        )
        .orderBy("consumer")
    )


def _claim_scenario(client, clock) -> None:
    """Failover: c1 processes+acks indexes 0-3 and 8-11; c2 reads 4-7 and
    dies; after auto_claim_idle c1's XAUTOCLAIM sweep claims them
    (times_delivered=2), re-processes, acks. Every processed message is
    XADDed to "task_done" with its delivery count — the failover ledger."""
    from ..streaming.redis import shard_key

    c1 = _grp_consumer(client, clock, "c1")
    c1.create_group(from_beginning=True)
    c2 = _grp_consumer(client, clock, "c2")

    def process(sid: int, eid: str, fields: dict, times: int) -> None:
        # Ledger ids are broker-assigned ("*"): claimed entries re-process
        # *after* newer acked ones, so their original (lower) ids would
        # violate XADD monotonicity — the original event time rides in the
        # payload instead.
        ms = eid.split("-")[0]
        client.xadd(
            shard_key("task_done", sid),
            {"payload": fields["payload"] + f"|{ms}|{times}".encode()},
        )

    for sid, eid, fields in c1.read(count=4):  # idx 0-3
        process(sid, eid, fields, 1)
        c1.ack(sid, eid)
    c2.read(count=4)  # idx 4-7, never acked
    for sid, eid, fields in c1.read(count=4):  # idx 8-11
        process(sid, eid, fields, 1)
        c1.ack(sid, eid)
    clock["ms"] += 1_000
    c1.tick()
    clock["ms"] += 61_000  # > auto_claim_idle (60 s) and claim interval (30 s)
    for sid, eid, fields, times in c1.auto_claim():
        process(sid, eid, fields, times)
        c1.ack(sid, eid)
    c1.end()  # Kill commits pending (node.rs:244-265): PEL drains to empty
    assert c1.pending() == []


_GRP_CLAIM_VALUES = ",\n        ".join(
    f"({s}, {ms}, 't-{s}-{i}', {2 if 4 <= i <= 7 else 1})"
    for s, i, ms, _p in _grp_rows()
)


@query(
    "redis_group_autoclaim_failover",
    oracle=f"""
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           CAST(timestamp_ms AS BIGINT) AS timestamp_ms,
           payload_str, CAST(deliveries AS BIGINT) AS deliveries
    FROM (VALUES
        {_GRP_CLAIM_VALUES}
    ) AS t(shard_id, timestamp_ms, payload_str, deliveries)
    ORDER BY shard_id, timestamp_ms
    """,
    tags=("streaming", "redis", "group", "failover"),
)
def redis_group_autoclaim_failover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 XAUTOCLAIM failover, driver-checked end-to-end: the dead
    consumer's un-acked entries (indexes 4-7 per shard) are claimed by the
    survivor after ``auto_claim_idle`` (node.rs:647-744 re-expressed in
    streaming/ack.py) and re-processed — so the "task_done" ledger contains
    *every* message exactly once, with deliveries=2 for the claimed block
    and 1 elsewhere. The ledger is read back through the registered
    ``sea_redis`` DataSource (one task per shard), making this the full
    at-least-once loop: read → die → claim → re-process → ack → drain."""
    from ..sources.redis_datasource import SeaRedisDataSource

    spark.dataSource.register(SeaRedisDataSource)
    root = _grp_scenario_root("group_claim", _claim_scenario)
    parsed = (
        spark.read.format("sea_redis")
        .option("stream_key", "task_done")
        .option("fake_root", root)
        .load()
        .select("shard_id", F.col("payload").cast("string").alias("raw"))
    )
    return (
        parsed.select(
            "shard_id",
            F.split("raw", "\\|")[1].cast("long").alias("timestamp_ms"),
            F.split("raw", "\\|")[0].alias("payload_str"),
            F.split("raw", "\\|")[2].cast("long").alias("deliveries"),
        )
        .orderBy("shard_id", "timestamp_ms")
    )


# ----------------------------------------------------- Kafka transactions (S3)


@query(
    "kafka_txn_visibility",
    oracle="""
    SELECT * FROM (VALUES
        ('committed-1',  0, 'read_committed'),
        ('committed-2',  2, 'read_committed'),
        ('plain',        3, 'read_committed'),
        ('committed-1',  0, 'read_uncommitted'),
        ('aborted-1',    1, 'read_uncommitted'),
        ('committed-2',  2, 'read_uncommitted'),
        ('plain',        3, 'read_uncommitted')
    ) AS t(value_str, rec_offset, isolation)
    ORDER BY isolation, rec_offset
    """,
    tags=("streaming", "kafka", "transaction"),
)
def kafka_txn_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 Kafka transactions, driver-checked: run the reference's
    transactional-producer state machine (streaming/kafka_txn.py —
    producer.rs:236-290) through a commit / abort / epoch-bump sequence
    against the in-process broker, then read the topic under BOTH isolation
    levels. The oracle pins the visibility contract: ``read_committed``
    sees committed-txn + plain records only (the aborted record's offset 1
    is skipped but later offsets still appear — committed batches survive
    the id's next epoch); ``read_uncommitted`` sees the aborted record
    too. Atomic offset staging is covered by
    tests/test_kafka.py::TestKafkaTransactions."""
    from ..streaming.fake_kafka import FakeKafka
    from ..streaming.kafka_txn import TransactionalProducer

    b = FakeKafka()
    b.create_topic("out", 1)
    p = TransactionalProducer(b, "tx-q").init_transactions()
    p.begin_transaction(); p.send("out", b"committed-1"); p.commit_transaction()
    p.begin_transaction(); p.send("out", b"aborted-1"); p.abort_transaction()
    p.begin_transaction(); p.send("out", b"committed-2"); p.commit_transaction()
    b.produce("out", b"plain")
    rows = [
        (r.value.decode(), r.offset, iso)
        for iso in ("read_committed", "read_uncommitted")
        for r in b.fetch("out", 0, 0, isolation=iso)
    ]
    return (
        spark.createDataFrame(rows, "value_str string, rec_offset int, isolation string")
        .orderBy("isolation", "rec_offset")
    )


# ------------------------------------------------- RESP wire-protocol e2e

_WIRE: dict = {}


def _wire_server() -> tuple[str, int]:
    """One RESP TCP listener per process (alive until process exit), fronting
    an in-memory broker — what lets a registry query exercise the real
    redis:// wire path (executors connect per task) under the driver's
    correctness gate."""
    if "addr" not in _WIRE:
        from ..streaming.fake_redis import FakeRedis
        from ..streaming.resp_server import RespServer

        srv = RespServer(FakeRedis())
        _WIRE["srv"] = srv
        _WIRE["addr"] = srv.serve_background()
    return _WIRE["addr"]


@query(
    "redis_wire_roundtrip",
    oracle=f"""
    SELECT 'wire' AS stream_key, CAST(shard_id AS BIGINT) AS shard_id,
           CAST(sequence AS BIGINT) AS sequence,
           CAST(timestamp_ms AS BIGINT) AS timestamp_ms, payload_str
    FROM (VALUES
        {_RT_VALUES}
    ) AS t(loop_key, shard_id, sequence, timestamp_ms, payload_str)
    ORDER BY shard_id, sequence
    """,
    tags=("streaming", "redis", "wire"),
)
def redis_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S5 over the WIRE: the deterministic fixture is XADDed through the
    in-repo RESP2 client into a real TCP listener (streaming/resp.py /
    resp_server.py), then read back with ``spark.read.format("sea_redis")``
    pointing at host:port — each executor task opens its own socket and
    runs the bounded XRANGE scan through the same client a redis://
    deployment without redis-py uses. Distinct from
    ``redis_stream_roundtrip`` (file-backed loopback): this one proves the
    protocol layer — command framing, bulk binary payloads, pipelining,
    error passthrough — not just the command semantics."""
    from ..sources.redis_datasource import SeaRedisDataSource
    from ..streaming.fake_redis import ResponseError
    from ..streaming.redis import format_entry_id, shard_key
    from ..streaming.resp import RespClient

    host, port = _wire_server()
    seed = RespClient(host, port)
    for _k, sid, seq_no, _ms, payload in _rt_rows():
        try:
            seed.xadd(
                shard_key("wire", sid), {"payload": payload.encode()},
                id=format_entry_id(seq_no),
            )
        except ResponseError:
            pass  # re-run within the process: ids already present
    seed.close()
    spark.dataSource.register(SeaRedisDataSource)
    return (
        spark.read.format("sea_redis")
        .option("stream_key", "wire")
        .option("host", host)
        .option("port", str(port))
        .load()
        .select(
            "stream_key",
            "shard_id",
            "sequence",
            F.unix_millis("timestamp").alias("timestamp_ms"),
            F.col("payload").cast("string").alias("payload_str"),
        )
        .orderBy("shard_id", "sequence")
    )
