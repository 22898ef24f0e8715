"""Kafka backend option surface (S1/S2) — rdkafka config construction with
byte-exact reference parity, plus the Spark-source translation.

The reference's Kafka backend is a thin rdkafka wrapper; its genuinely
observable behavior is *which client config strings* each option setter
produces (kafka/src/streamer.rs:40-241, consumer.rs:117-255,
producer.rs:340-380) and how a consumer is created from them
(consumer.rs:661-687). Those mappings are reproduced here as pure data so
they are testable without a broker, and translated to Spark's Kafka source
options (``kafka.``-prefixed passthrough) for the live path
(``streaming/consumer.py`` / ``producer.py``).

Execution evidence without a broker comes from :mod:`.fake_kafka`: an
in-process topic/partition/offset/consumer-group model with Kafka's
documented semantics (range assignment, offsets-for-times, committed
offsets), driven by the same mode/seek/rewind mapping ``kafka_options``
encodes — see tests/test_kafka.py.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from datetime import timedelta


class SecurityProtocol(enum.Enum):
    """streamer.rs:56-66 → `security.protocol` values (streamer.rs:220-229)."""

    Plaintext = "PLAINTEXT"
    Ssl = "SSL"
    SaslPlaintext = "SASL_PLAINTEXT"
    SaslSsl = "SASL_SSL"


class SaslMechanism(enum.Enum):
    """streamer.rs:231-241 → `sasl.mechanism` values."""

    Plain = "PLAIN"
    Gssapi = "GSSAPI"
    ScramSha256 = "SCRAM-SHA-256"
    ScramSha512 = "SCRAM-SHA-512"
    Oauthbearer = "OAUTHBEARER"


class AutoOffsetReset(enum.Enum):
    """consumer.rs:257-265 → `auto.offset.reset` values."""

    Earliest = "earliest"
    Latest = "latest"
    NoReset = "none"


class CompressionType(enum.Enum):
    """producer.rs:364-374 → `compression.type` values."""

    Nothing = "none"
    Gzip = "gzip"
    Snappy = "snappy"
    Lz4 = "lz4"
    Zstd = "zstd"


def _ms(v: timedelta) -> str:
    return str(int(v.total_seconds() * 1000))


@dataclass
class SaslOptions:
    """streamer.rs SaslOptions: mechanism + optional username/password."""

    mechanism: SaslMechanism
    username: str | None = None
    password: str | None = None

    def make_client_config(self, cfg: dict[str, str]) -> None:
        cfg["sasl.mechanism"] = self.mechanism.value
        if self.username is not None:
            cfg["sasl.username"] = self.username
        if self.password is not None:
            cfg["sasl.password"] = self.password


@dataclass
class KafkaConnectOptions:
    """Base connection options (streamer.rs:36-171)."""

    timeout: timedelta | None = None
    security_protocol: SecurityProtocol | None = None
    sasl_options: SaslOptions | None = None
    custom_options: list[tuple[str, str]] = field(default_factory=list)

    def add_custom_option(self, key: str, value: str) -> "KafkaConnectOptions":
        self.custom_options.append((key, value))
        return self

    def make_client_config(self, cfg: dict[str, str]) -> None:
        """streamer.rs:156-171, same option order."""
        if self.timeout is not None:
            cfg["socket.timeout.ms"] = _ms(self.timeout)
        if self.security_protocol is not None:
            cfg["security.protocol"] = self.security_protocol.value
        if self.sasl_options is not None:
            self.sasl_options.make_client_config(cfg)
        for k, v in self.custom_options:
            cfg[k] = v


@dataclass
class KafkaConsumerOptions:
    """Consumer options (consumer.rs:117-255): each field maps to exactly one
    rdkafka config string via ``make_client_config``."""

    group_id: str | None = None
    session_timeout: timedelta | None = None
    auto_offset_reset: AutoOffsetReset | None = None
    enable_auto_commit: bool | None = None
    auto_commit_interval: timedelta | None = None
    enable_auto_offset_store: bool | None = None
    custom_options: list[tuple[str, str]] = field(default_factory=list)

    def add_custom_option(self, key: str, value: str) -> "KafkaConsumerOptions":
        self.custom_options.append((key, value))
        return self

    def make_client_config(self, cfg: dict[str, str]) -> None:
        """consumer.rs:215-241 — including the librdkafka quirk: a group.id
        is ALWAYS set (placeholder "abcdefg" when none was configured,
        rdkafka issue #3261 workaround, consumer.rs:216-222)."""
        if self.group_id is not None:
            cfg["group.id"] = self.group_id
        else:
            cfg["group.id"] = "abcdefg"
        if self.session_timeout is not None:
            cfg["session.timeout.ms"] = _ms(self.session_timeout)
        if self.auto_offset_reset is not None:
            cfg["auto.offset.reset"] = self.auto_offset_reset.value
        if self.enable_auto_commit is not None:
            cfg["enable.auto.commit"] = "true" if self.enable_auto_commit else "false"
        if self.auto_commit_interval is not None:
            cfg["auto.commit.interval.ms"] = _ms(self.auto_commit_interval)
        if self.enable_auto_offset_store is not None:
            cfg["enable.auto.offset.store"] = (
                "true" if self.enable_auto_offset_store else "false"
            )
        for k, v in self.custom_options:
            cfg[k] = v


@dataclass
class KafkaProducerOptions:
    """Producer options (producer.rs:48-380)."""

    compression_type: CompressionType | None = None
    custom_options: list[tuple[str, str]] = field(default_factory=list)

    def add_custom_option(self, key: str, value: str) -> "KafkaProducerOptions":
        self.custom_options.append((key, value))
        return self

    def make_client_config(self, cfg: dict[str, str]) -> None:
        if self.compression_type is not None:
            cfg["compression.type"] = self.compression_type.value
        for k, v in self.custom_options:
            cfg[k] = v


def client_config(
    bootstrap: str,
    base: KafkaConnectOptions | None = None,
    consumer: KafkaConsumerOptions | None = None,
    producer: KafkaProducerOptions | None = None,
) -> dict[str, str]:
    """``create_consumer``/``create_producer`` config assembly
    (consumer.rs:661-687, producer.rs:405-420): bootstrap first, then base
    options, then the role options — later writers win, like rdkafka's
    ClientConfig::set."""
    cfg: dict[str, str] = {"bootstrap.servers": bootstrap}
    if base is not None:
        base.make_client_config(cfg)
    if consumer is not None:
        consumer.make_client_config(cfg)
    if producer is not None:
        producer.make_client_config(cfg)
    return cfg


def to_spark_options(cfg: dict[str, str]) -> dict[str, str]:
    """rdkafka config → Spark Kafka source/sink options: every config key is
    passed through with the ``kafka.`` prefix (Spark's documented passthrough
    mechanism). Keys Spark manages itself (group.id semantics differ: Spark
    uses ``kafka.group.id``/``groupIdPrefix`` and owns commits through the
    checkpoint) are still forwarded verbatim — the caller decides policy, the
    translation stays mechanical."""
    return {f"kafka.{k}": v for k, v in cfg.items()}
