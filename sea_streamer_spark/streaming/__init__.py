"""Streaming facade: the sea-streamer consumer/producer surface on
Structured Streaming."""

from .consumer import Consumer, ConsumerMode, ConsumerOptions, SeqPos, create_consumer  # noqa: F401
from .producer import Producer, create_producer  # noqa: F401
