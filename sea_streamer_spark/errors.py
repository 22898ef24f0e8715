"""Unified error taxonomy — the StreamErr model (types/src/error.rs:7-40).

The reference wraps every backend's error in one enum so callers handle a
single type; here the same shape is an exception hierarchy. Spark's own
exceptions (AnalysisException, StreamingQueryException) surface through
``Backend`` — the generic-variant analog (error.rs:13-16)."""

from __future__ import annotations


class StreamErr(Exception):
    """Root of the engine's error taxonomy (StreamErr<E>, error.rs:7)."""


class ConnectionError_(StreamErr):
    """Connection was refused / reset / not yet established
    (error.rs Connect variants)."""


class TimedOut(StreamErr):
    """Operation exceeded its deadline (error.rs:19)."""


class AlreadyAnchored(StreamErr):
    """Producer anchored twice (producer.rs anchor contract)."""


class NotAnchored(StreamErr):
    """`send` without an anchored stream (producer.rs:56-60)."""


class ConsumerGroupIsSet(StreamErr):
    """Option invalid once a consumer group is set (error.rs:25-28)."""


class ConsumerGroupNotSet(StreamErr):
    """Operation requires a consumer group (error.rs:29-32)."""


class StreamKeyErr(StreamErr):
    """Invalid stream key (stream.rs:89-97) — see model.InvalidStreamKey."""


class StreamKeyEmpty(StreamErr):
    """Consumer created with no stream keys (error.rs:35)."""


class Backend(StreamErr):
    """Wrapped backend error — the generic variant (error.rs:13-16); carries
    the underlying Spark/py4j exception as __cause__."""
