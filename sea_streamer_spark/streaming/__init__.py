"""Streaming facade: the sea-streamer consumer/producer surface on
Structured Streaming."""

from .consumer import (  # noqa: F401
    Consumer,
    ConsumerMode,
    ConsumerOptions,
    SeqPos,
    Streamer,
    connect,
    create_consumer,
)
from .producer import Producer, create_producer  # noqa: F401
