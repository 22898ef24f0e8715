"""Per-batch stream metrics: ``DataFrame.observe`` + a listener.

The reference surfaces consumer lag / throughput via its benchmark binaries
(sea-streamer-benchmark/src/bin/*.rs); the Spark-native equivalent is the
observation API — named aggregates evaluated *inside* the running query (no
second pass, no extra action) and delivered to a ``StreamingQueryListener``
with every micro-batch's progress event.

Scale: observations are plain aggregate expressions fused into the batch
plan (map-side partials, one tiny merge), so the overhead is independent of
corpus size; the listener runs on the driver and must stay O(1) per batch —
the collector below just appends a dict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

#: Default envelope metrics: message count, event-time frontier span, shard
#: spread, payload volume.
def envelope_metrics() -> list[Column]:
    return [
        F.count(F.lit(1)).alias("n_messages"),
        F.min("timestamp").alias("min_ts"),
        F.max("timestamp").alias("max_ts"),
        F.approx_count_distinct("stream_key").alias("approx_streams"),
        F.sum(F.length("payload")).alias("payload_bytes"),
    ]


def with_metrics(df: DataFrame, name: str = "envelope", *metrics: Column) -> DataFrame:
    """Attach named observed metrics to a (streaming or batch) DataFrame.
    Pass-through transformation — downstream plans are unchanged."""
    return df.observe(name, *(metrics or envelope_metrics()))


class MetricsCollector(StreamingQueryListener):
    """Collects every batch's observed metrics as plain dicts:
    ``[{"batchId": 0, "name": "envelope", "n_messages": 42, ...}, ...]``.

    Register with ``spark.streams.addListener(collector)``; the per-batch
    rows land in ``collector.rows`` (driver memory — O(#batches)).
    """

    def __init__(self) -> None:
        self.rows: list[dict] = []

    def onQueryStarted(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryProgress(self, event) -> None:
        progress = event.progress
        for name, metrics in (progress.observedMetrics or {}).items():
            row = metrics.asDict()
            row["name"] = name
            row["batchId"] = progress.batchId
            self.rows.append(row)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - no-op
        pass
