"""sea_streamer_spark — a PySpark-native analytics/streaming engine with the
capabilities of SeaQL/sea-streamer, re-expressed Spark-first.

The reference (sea-streamer 1.0.0-rc.4, Rust) is a stream-processing toolkit:
keyed/sharded/sequenced/timestamped messages over interchangeable transports
(Kafka, Redis Streams, a seekable `.ss` file format, stdio, Iggy), consumer
groups, seek/rewind, and a timestamp-ordered stream join. This package maps
that surface onto Spark:

- data model  -> a fixed message envelope schema (``model.MESSAGE_SCHEMA``)
- transports  -> ``spark.readStream``/``writeStream`` formats behind a
  ``connect(uri)`` factory (``uri``, ``streaming``)
- `.ss` files -> a mapInPandas binary codec (``sources.ss``)
- stdio lines -> a regexp line-protocol codec (``sources.stdio``)
- fuse join   -> event-time ordered merge (``operators.fuse``)
- relational + LLM-pipeline ops (dedup, similarity, text analysis) -> native
  DataFrame operators (``operators``, ``plans.queries``)

Everything here derives from public knowledge: the Apache Spark API and the
reference repo's observable behavior (cited by file:line in docstrings).
"""

__version__ = "0.1.0"

from .model import (  # noqa: F401
    MESSAGE_SCHEMA,
    SEA_STREAMER_INTERNAL,
    SEA_STREAMER_WILDCARD,
    StreamKey,
    envelope_from_events,
)
from .errors import StreamErr  # noqa: F401
from .session import get_spark, prepare  # noqa: F401
from .streaming import (  # noqa: F401
    Consumer,
    ConsumerMode,
    ConsumerOptions,
    Producer,
    Streamer,
    connect,
    create_consumer,
    create_producer,
)
from .uri import StreamerUri, StreamUrl  # noqa: F401
