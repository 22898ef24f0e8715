"""S1/S2 Kafka execution evidence without a broker.

Two layers (VERDICT r1 #8):

1. Option vectors — every option setter must produce the exact rdkafka
   config strings the reference produces (kafka/src/streamer.rs:156-241,
   consumer.rs:215-265, producer.rs:345-374), assembled in create_consumer
   order (consumer.rs:661-687).
2. Semantics — the mode/seek/rewind mapping in ``kafka_options`` is driven
   against the in-process broker model (fake_kafka) and must deliver exactly
   the message sets Kafka's documented behavior implies: earliest/latest
   reset, committed-offset resume, range assignment load-balancing,
   timestamp seek exclusivity.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

from sea_streamer_spark.streaming.fake_kafka import FakeKafka, resolve_start_offset
from sea_streamer_spark.streaming.kafka import (
    AutoOffsetReset,
    CompressionType,
    KafkaConnectOptions,
    KafkaConsumerOptions,
    KafkaProducerOptions,
    SaslMechanism,
    SaslOptions,
    SecurityProtocol,
    client_config,
    to_spark_options,
)


class TestOptionVectors:
    def test_consumer_full_surface(self):
        opts = KafkaConsumerOptions(
            group_id="workers",
            session_timeout=timedelta(seconds=6),
            auto_offset_reset=AutoOffsetReset.Earliest,
            enable_auto_commit=False,
            auto_commit_interval=timedelta(seconds=5),
            enable_auto_offset_store=True,
        )
        opts.add_custom_option("max.poll.interval.ms", "300000")
        cfg = client_config("localhost:9092", consumer=opts)
        assert cfg == {
            "bootstrap.servers": "localhost:9092",
            "group.id": "workers",
            "session.timeout.ms": "6000",
            "auto.offset.reset": "earliest",
            "enable.auto.commit": "false",
            "auto.commit.interval.ms": "5000",
            "enable.auto.offset.store": "true",
            "max.poll.interval.ms": "300000",
        }

    def test_group_id_placeholder_quirk(self):
        # consumer.rs:216-222: librdkafka requires a group.id even without a
        # consumer group -> the reference sets the placeholder "abcdefg"
        cfg = client_config("h:1", consumer=KafkaConsumerOptions())
        assert cfg["group.id"] == "abcdefg"

    def test_auto_offset_reset_values(self):
        # consumer.rs:257-265
        assert AutoOffsetReset.Earliest.value == "earliest"
        assert AutoOffsetReset.Latest.value == "latest"
        assert AutoOffsetReset.NoReset.value == "none"

    def test_base_options_and_sasl(self):
        base = KafkaConnectOptions(
            timeout=timedelta(milliseconds=2500),
            security_protocol=SecurityProtocol.SaslSsl,
            sasl_options=SaslOptions(
                SaslMechanism.ScramSha256, username="u", password="p"
            ),
        )
        cfg = client_config("n1:9092,n2:9092", base=base)
        assert cfg == {
            "bootstrap.servers": "n1:9092,n2:9092",
            "socket.timeout.ms": "2500",
            "security.protocol": "SASL_SSL",
            "sasl.mechanism": "SCRAM-SHA-256",
            "sasl.username": "u",
            "sasl.password": "p",
        }
        # streamer.rs:220-241 value tables
        assert [p.value for p in SecurityProtocol] == [
            "PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL"
        ]
        assert [m.value for m in SaslMechanism] == [
            "PLAIN", "GSSAPI", "SCRAM-SHA-256", "SCRAM-SHA-512", "OAUTHBEARER"
        ]

    def test_producer_options(self):
        opts = KafkaProducerOptions(compression_type=CompressionType.Lz4)
        opts.add_custom_option("linger.ms", "10")
        cfg = client_config("h:1", producer=opts)
        assert cfg == {
            "bootstrap.servers": "h:1",
            "compression.type": "lz4",
            "linger.ms": "10",
        }
        assert [c.value for c in CompressionType] == [
            "none", "gzip", "snappy", "lz4", "zstd"
        ]

    def test_later_writer_wins_like_client_config_set(self):
        base = KafkaConnectOptions().add_custom_option("socket.timeout.ms", "1000")
        consumer = KafkaConsumerOptions().add_custom_option("socket.timeout.ms", "9000")
        cfg = client_config("h:1", base=base, consumer=consumer)
        assert cfg["socket.timeout.ms"] == "9000"

    def test_spark_translation_is_mechanical_passthrough(self):
        cfg = client_config(
            "h:1", consumer=KafkaConsumerOptions(group_id="g")
        )
        spark_opts = to_spark_options(cfg)
        assert spark_opts["kafka.bootstrap.servers"] == "h:1"
        assert spark_opts["kafka.group.id"] == "g"
        assert all(k.startswith("kafka.") for k in spark_opts)


class TestBrokerModel:
    def _seed(self, n=30, parts=3):
        b = FakeKafka()
        b.create_topic("t", partitions=parts)
        for i in range(n):
            b.produce("t", f"m{i}".encode(), partition=i % parts, timestamp_ms=1_000 + i)
        return b

    def test_produce_fetch_offsets(self):
        b = self._seed()
        assert b.partitions_for("t") == [0, 1, 2]
        recs = b.fetch("t", 0, 0)
        assert [r.offset for r in recs] == list(range(10))
        assert b.end_offset("t", 0) == 10
        assert b.fetch("t", 0, 7, max_records=2) == recs[7:9]

    def test_offsets_for_times(self):
        b = self._seed()
        # partition 0 has timestamps 1000, 1003, 1006, ...
        assert b.offsets_for_times("t", 0, 1_000) == 0
        assert b.offsets_for_times("t", 0, 1_004) == 2  # first ts >= target
        assert b.offsets_for_times("t", 0, 99_999) is None

    def test_range_assignment_2_consumers_3_partitions(self):
        # consumer.rs:649-651: one consumer gets 2 partitions, the other 1
        a = FakeKafka.range_assign(["c1", "c2"], [0, 1, 2])
        assert a == {"c1": [0, 1], "c2": [2]}

    def test_hot_failover_single_partition(self):
        # consumer.rs:652-654: 1 partition, extra consumers stand by
        a = FakeKafka.range_assign(["c1", "c2", "c3"], [0])
        assert a == {"c1": [0], "c2": [], "c3": []}

    def test_load_balanced_group_covers_stream_disjointly(self):
        b = self._seed(n=30, parts=3)
        assign = FakeKafka.range_assign(["c1", "c2"], b.partitions_for("t"))
        seen: dict[str, set] = {}
        for member, parts in assign.items():
            got = set()
            for p in parts:
                start = resolve_start_offset(b, "t", p, "g", "earliest")
                got |= {r.value for r in b.fetch("t", p, start)}
            seen[member] = got
        assert seen["c1"] & seen["c2"] == set()
        assert len(seen["c1"] | seen["c2"]) == 30


class TestModeSemanticsViaModel:
    """Drive the exact policies kafka_options encodes (consumer.py) against
    the broker model: the delivered sets must match D1/D2/T1/T2."""

    def _consume_all(self, b, group, reset, ts_ms=None):
        out = []
        for p in b.partitions_for("t"):
            start = resolve_start_offset(b, "t", p, group, reset, ts_ms)
            out += [r for r in b.fetch("t", p, start)]
        return out

    def test_realtime_latest_sees_only_new(self):
        b = FakeKafka()
        b.create_topic("t", 2)
        for i in range(10):
            b.produce("t", f"old{i}".encode(), partition=i % 2, timestamp_ms=i)
        # RealTime (D1): startingOffsets=latest -> snapshot the high watermark
        starts = {
            p: resolve_start_offset(b, "t", p, None, "latest")
            for p in b.partitions_for("t")
        }
        for i in range(4):
            b.produce("t", f"new{i}".encode(), partition=i % 2, timestamp_ms=100 + i)
        got = [r.value for p, s in starts.items() for r in b.fetch("t", p, s)]
        assert sorted(got) == [b"new0", b"new1", b"new2", b"new3"]

    def test_resumable_restarts_from_committed(self):
        b = FakeKafka()
        b.create_topic("t", 1)
        for i in range(20):
            b.produce("t", f"m{i}".encode(), timestamp_ms=i)
        # first run: consume 12, commit next-offset (Kafka convention)
        first = b.fetch("t", 0, resolve_start_offset(b, "t", 0, "g", "earliest"))[:12]
        b.commit("g", "t", 0, first[-1].offset + 1)
        # restart: only the remainder, no redelivery (D2)
        rest = b.fetch("t", 0, resolve_start_offset(b, "t", 0, "g", "earliest"))
        assert [r.value for r in rest] == [f"m{i}".encode() for i in range(12, 20)]

    def test_seek_timestamp_is_exclusive_via_plus_1ms(self):
        from sea_streamer_spark.streaming.consumer import ConsumerOptions, kafka_options
        from sea_streamer_spark.uri import StreamUrl

        b = FakeKafka()
        b.create_topic("t", 1)
        for i in range(10):
            b.produce("t", f"m{i}".encode(), timestamp_ms=1_000 + i * 10)
        target = datetime.fromtimestamp(1.040, tz=timezone.utc)  # ts of m4
        opts = kafka_options(
            StreamUrl.parse("kafka://h:1/t"), ConsumerOptions(seek_to=target)
        )
        # the mapping adds +1ms for T1's ts-exclusive contract
        # (types/src/consumer.rs:62-67)
        ts = int(opts["startingTimestamp"])
        assert ts == 1_041
        start = resolve_start_offset(b, "t", 0, None, "latest", ts)
        got = [r.value for r in b.fetch("t", 0, start)]
        assert got == [f"m{i}".encode() for i in range(5, 10)]  # strictly after m4

    def test_seek_past_end_replays_nothing(self):
        b = FakeKafka()
        b.create_topic("t", 1)
        b.produce("t", b"x", timestamp_ms=5)
        start = resolve_start_offset(b, "t", 0, None, "latest", 99_999)
        assert b.fetch("t", 0, start) == []

    def test_rewind_beginning_end_mapping(self):
        from sea_streamer_spark.streaming.consumer import (
            Beginning,
            ConsumerOptions,
            End,
            kafka_options,
        )
        from sea_streamer_spark.uri import StreamUrl

        url = StreamUrl.parse("kafka://h:1/t")
        assert (
            kafka_options(url, ConsumerOptions(rewind_to=Beginning))["startingOffsets"]
            == "earliest"
        )
        assert (
            kafka_options(url, ConsumerOptions(rewind_to=End))["startingOffsets"]
            == "latest"
        )
        b = FakeKafka()
        b.create_topic("t", 1)
        for i in range(5):
            b.produce("t", f"m{i}".encode())
        assert len(b.fetch("t", 0, resolve_start_offset(b, "t", 0, None, "earliest"))) == 5
        assert len(b.fetch("t", 0, resolve_start_offset(b, "t", 0, None, "latest"))) == 0


class TestKafkaTransactions:
    """S3: transactional producer state machine + read_committed visibility
    + atomic offset staging (kafka/src/producer.rs:236-290 semantics over
    the in-process broker model)."""

    def _producer(self, broker=None):
        from sea_streamer_spark.streaming.kafka_txn import TransactionalProducer

        b = broker or FakeKafka()
        return b, TransactionalProducer(b, "tx-1").init_transactions()

    def test_state_machine_errors(self):
        from sea_streamer_spark.streaming.kafka_txn import TransactionalProducer

        b = FakeKafka()
        p = TransactionalProducer(b, "tx-1")
        with pytest.raises(RuntimeError, match="begin_transaction in state"):
            p.begin_transaction()  # init first (producer.rs:236-244)
        p.init_transactions()
        with pytest.raises(RuntimeError, match="twice"):
            p.init_transactions()
        with pytest.raises(RuntimeError, match="commit without begin"):
            p.commit_transaction()
        p.begin_transaction()
        with pytest.raises(RuntimeError, match="already open"):
            b.begin_txn("tx-1")  # producer fencing at the broker
        p.commit_transaction()
        with pytest.raises(RuntimeError, match="abort without begin"):
            p.abort_transaction()

    def test_commit_gates_read_committed_visibility(self):
        b, p = self._producer()
        b.create_topic("out", 1)
        b.produce("out", b"plain")  # non-transactional: always visible
        p.begin_transaction()
        p.send("out", b"tx-msg")
        assert [r.value for r in b.fetch("out", 0, 0, isolation="read_committed")] == [b"plain"]
        assert [r.value for r in b.fetch("out", 0, 0)] == [b"plain", b"tx-msg"]
        p.commit_transaction()
        assert [r.value for r in b.fetch("out", 0, 0, isolation="read_committed")] == [
            b"plain", b"tx-msg",
        ]

    def test_abort_hides_forever_and_epoch_preserves_older_commits(self):
        b, p = self._producer()
        b.create_topic("out", 1)
        p.begin_transaction(); p.send("out", b"first"); p.commit_transaction()
        p.begin_transaction(); p.send("out", b"poison"); p.abort_transaction()
        p.begin_transaction(); p.send("out", b"second"); p.commit_transaction()
        vis = [r.value for r in b.fetch("out", 0, 0, isolation="read_committed")]
        assert vis == [b"first", b"second"]  # committed batches survive epochs
        assert [r.value for r in b.fetch("out", 0, 0)] == [b"first", b"poison", b"second"]

    def test_offsets_commit_atomically_with_txn(self):
        b, p = self._producer()
        p.begin_transaction()
        p.send_offsets_to_transaction("g", {("src", 0): 42})
        assert b.committed("g", "src", 0) is None  # staged, not visible
        p.commit_transaction()
        assert b.committed("g", "src", 0) == 42
        p.begin_transaction()
        p.send_offsets_to_transaction("g", {("src", 0): 99})
        p.abort_transaction()
        assert b.committed("g", "src", 0) == 42  # staged offsets died

    def test_interleaved_producers(self):
        from sea_streamer_spark.streaming.kafka_txn import TransactionalProducer

        b = FakeKafka()
        b.create_topic("out", 1)
        p1 = TransactionalProducer(b, "tx-a").init_transactions()
        p2 = TransactionalProducer(b, "tx-b").init_transactions()
        p1.begin_transaction(); p1.send("out", b"a1")
        p2.begin_transaction(); p2.send("out", b"b1")
        p1.commit_transaction()
        vis = [r.value for r in b.fetch("out", 0, 0, isolation="read_committed")]
        assert vis == [b"a1"]  # p2 still open
        p2.commit_transaction()
        vis = [r.value for r in b.fetch("out", 0, 0, isolation="read_committed")]
        assert vis == [b"a1", b"b1"]

    @staticmethod
    def _env_batch(spark, sf_dir):
        from sea_streamer_spark.sources.tables import load_tables
        from sea_streamer_spark.model import envelope_from_events

        return envelope_from_events(load_tables(spark, sf_dir, "events").events)

    def test_foreach_batch_eos_replay_noop(self, spark, sf_dir):
        from sea_streamer_spark.streaming.kafka_txn import (
            BATCH_LEDGER_TOPIC,
            kafka_txn_foreach_batch,
        )

        env_batch = self._env_batch(spark, sf_dir)

        b, p = self._producer()
        b.create_topic("out", 1)
        write = kafka_txn_foreach_batch(p, "out", "spark-sink")
        batch = env_batch.limit(10)
        write(batch, 0)
        n0 = len(b.fetch("out", 0, 0, isolation="read_committed"))
        assert n0 == 10
        write(batch, 0)  # checkpoint replay of a committed batch: no-op
        assert len(b.fetch("out", 0, 0, isolation="read_committed")) == n0
        assert b.committed("spark-sink", BATCH_LEDGER_TOPIC, 0) == 1
        write(batch, 1)  # the next batch appends
        assert len(b.fetch("out", 0, 0, isolation="read_committed")) == 2 * n0

    def test_foreach_batch_abort_leaves_nothing_visible(self, spark, sf_dir):
        from sea_streamer_spark.streaming.kafka_txn import kafka_txn_foreach_batch

        env_batch = self._env_batch(spark, sf_dir)

        b, p = self._producer()
        b.create_topic("out", 1)
        poisoned = env_batch.limit(5).drop("payload")  # send() will fail
        write = kafka_txn_foreach_batch(p, "out", "spark-sink")
        with pytest.raises(AttributeError):
            write(poisoned, 0)
        assert b.fetch("out", 0, 0, isolation="read_committed") == []
        assert b.committed("spark-sink", "__spark_batches", 0) is None
        # the producer is reusable after the abort
        write(env_batch.limit(5), 0)
        assert len(b.fetch("out", 0, 0, isolation="read_committed")) == 5


class TestPartitionPinning:
    """S2 parity with ``send_message``'s explicit-partition mode
    (kafka/src/producer.rs:171-185): the envelope's shard_id pins the
    Kafka partition, both in the Spark sink projection and end-to-end
    through the broker model's transactional path."""

    def test_sink_projection_maps_shard_id(self, spark, sf_dir):
        from sea_streamer_spark.model import envelope_from_events
        from sea_streamer_spark.sources.tables import load_tables
        from sea_streamer_spark.streaming.producer import kafka_sink_projection

        env = envelope_from_events(load_tables(spark, sf_dir, "events").events)
        default = kafka_sink_projection(env)
        assert default.columns == ["topic", "value", "key"]  # broker places

        pinned = kafka_sink_projection(env, pin_partitions=True)
        assert pinned.columns == ["topic", "value", "key", "partition"]
        assert dict(pinned.dtypes)["partition"] == "int"  # sink contract
        got = pinned.limit(50).collect()
        src = env.limit(50).collect()
        assert [r["partition"] for r in got] == [int(r["shard_id"]) for r in src]

    def test_rows_land_on_pinned_partition_in_broker_model(self, spark, sf_dir):
        from sea_streamer_spark.model import envelope_from_events
        from sea_streamer_spark.sources.tables import load_tables
        from sea_streamer_spark.streaming.kafka_txn import (
            TransactionalProducer,
            kafka_txn_foreach_batch,
        )

        env = envelope_from_events(
            load_tables(spark, sf_dir, "events").events
        ).limit(40)
        n_parts = 4
        b = FakeKafka()
        b.create_topic("out", n_parts)
        p = TransactionalProducer(b, "pin").init_transactions()
        write = kafka_txn_foreach_batch(
            p, "out", "spark-sink", partition_col="shard_id"
        )
        rows = env.collect()
        assert all(0 <= int(r["shard_id"]) < n_parts for r in rows)
        write(env, 0)
        want: dict[int, list[bytes]] = {i: [] for i in range(n_parts)}
        for r in rows:
            want[int(r["shard_id"])].append(bytes(r["payload"]))
        assert sum(len(v) for v in want.values()) == 40
        for part in range(n_parts):
            got = [
                rec.value
                for rec in b.fetch("out", part, 0, isolation="read_committed")
            ]
            assert got == want[part], f"partition {part}"


class TestExecutorSideTransactions:
    """kafka_txn_partition_writer (VERDICT r4 task #6): one transaction per
    Spark partition with per-partition ledger fencing — commit/abort parity
    with the driver-side batch path, minus the toLocalIterator bottleneck.
    The in-memory broker model cannot cross executor process boundaries, so
    these tests drive the exact per-task body in-process with explicit
    (rows, partition_id, batch_id) — what foreachPartition invokes."""

    @staticmethod
    def _rows(spark, sf_dir, n=20):
        from sea_streamer_spark.model import envelope_from_events
        from sea_streamer_spark.sources.tables import load_tables

        env = envelope_from_events(load_tables(spark, sf_dir, "events").events)
        return env.limit(n).collect()

    @staticmethod
    def _writer(broker, **kw):
        from sea_streamer_spark.streaming.kafka_txn import (
            TransactionalProducer,
            kafka_txn_partition_writer,
        )

        def factory(txn_id):
            return TransactionalProducer(broker, txn_id).init_transactions()

        return kafka_txn_partition_writer(factory, "out", "spark-sink", **kw)

    def test_per_partition_commit_and_replay_noop(self, spark, sf_dir):
        from sea_streamer_spark.streaming.kafka_txn import BATCH_LEDGER_TOPIC

        rows = self._rows(spark, sf_dir, 20)
        parts = [rows[:10], rows[10:]]
        b = FakeKafka()
        b.create_topic("out", 1)
        write = self._writer(b)
        for pid, chunk in enumerate(parts):
            write(chunk, pid, 0)
        assert len(b.fetch("out", 0, 0, isolation="read_committed")) == 20
        # per-partition ledger offsets advanced independently
        assert b.committed("spark-sink", BATCH_LEDGER_TOPIC, 0) == 1
        assert b.committed("spark-sink", BATCH_LEDGER_TOPIC, 1) == 1
        # replay of either (batch, partition) is a no-op
        write(parts[0], 0, 0)
        write(parts[1], 1, 0)
        assert len(b.fetch("out", 0, 0, isolation="read_committed")) == 20
        # next batch appends
        write(parts[0], 0, 1)
        assert len(b.fetch("out", 0, 0, isolation="read_committed")) == 30

    def test_abort_is_partition_scoped(self, spark, sf_dir):
        """A failed partition aborts ONLY its own transaction: the sibling
        partition's committed rows stay visible (the documented atomicity
        difference vs the whole-batch driver path), its ledger does not
        advance, and a fixed retry delivers exactly once."""
        from sea_streamer_spark.streaming.kafka_txn import BATCH_LEDGER_TOPIC

        rows = self._rows(spark, sf_dir, 20)
        good, bad = rows[:10], rows[10:]
        b = FakeKafka()
        b.create_topic("out", 4)
        write = self._writer(b, partition_col="shard_id")
        write(good, 0, 0)
        n_good = sum(
            len(b.fetch("out", p, 0, isolation="read_committed"))
            for p in range(4)
        )
        assert n_good == 10

        class _NullPin:
            """Row double whose pin column is NULL mid-partition."""

            def __init__(self, row):
                self._row = row
                self.shard_id = None

            def __getattr__(self, name):
                return getattr(self._row, name)

        poisoned = list(bad[:5]) + [_NullPin(bad[5])] + list(bad[6:])
        with pytest.raises(ValueError, match="shard_id"):
            write(poisoned, 1, 0)
        visible = sum(
            len(b.fetch("out", p, 0, isolation="read_committed"))
            for p in range(4)
        )
        assert visible == n_good  # partition 0's commit intact, 1's rolled back
        assert b.committed("spark-sink", BATCH_LEDGER_TOPIC, 1) is None
        write(bad, 1, 0)  # fixed retry: exactly once
        visible = sum(
            len(b.fetch("out", p, 0, isolation="read_committed"))
            for p in range(4)
        )
        assert visible == 20

    def test_parity_with_driver_path(self, spark, sf_dir):
        """Same input through the driver-batch sink and the executor
        partition sink (any 2-way split) yields the same read_committed
        (partition, value-multiset) — commit parity."""
        from sea_streamer_spark.model import envelope_from_events
        from sea_streamer_spark.sources.tables import load_tables
        from sea_streamer_spark.streaming.kafka_txn import (
            TransactionalProducer,
            kafka_txn_foreach_batch,
        )

        env = envelope_from_events(
            load_tables(spark, sf_dir, "events").events
        ).limit(30)
        rows = env.collect()

        b1 = FakeKafka()
        b1.create_topic("out", 4)
        p1 = TransactionalProducer(b1, "drv").init_transactions()
        kafka_txn_foreach_batch(
            p1, "out", "spark-sink", partition_col="shard_id"
        )(env, 0)

        b2 = FakeKafka()
        b2.create_topic("out", 4)
        write = self._writer(b2, partition_col="shard_id")
        write(rows[:13], 0, 0)
        write(rows[13:], 1, 0)

        def snapshot(b):
            return sorted(
                (p, bytes(r.value))
                for p in range(4)
                for r in b.fetch("out", p, 0, isolation="read_committed")
            )

        assert snapshot(b1) == snapshot(b2)

    def test_zombie_task_is_fenced(self, spark, sf_dir):
        """Two producers with the SAME transactional id (a retried task next
        to a zombie of the previous attempt): the broker's single-open-txn
        rule rejects the second begin — rdkafka's producer fencing."""
        from sea_streamer_spark.streaming.kafka_txn import TransactionalProducer

        b = FakeKafka()
        b.create_topic("out", 1)
        zombie = TransactionalProducer(b, "g/out/p0").init_transactions()
        retry = TransactionalProducer(b, "g/out/p0").init_transactions()
        zombie.begin_transaction()
        with pytest.raises(RuntimeError, match="already open"):
            retry.begin_transaction()

    def test_foreach_partition_wrapper_runs_under_spark(self, spark, sf_dir):
        """The foreachBatch wrapper itself executes cleanly through real
        foreachPartition tasks (TaskContext partition ids). The in-memory
        broker is pickled per task, so effects are worker-local by
        construction — this pins the wiring (no serialization errors, every
        partition body runs), not cross-process visibility."""
        from sea_streamer_spark.model import envelope_from_events
        from sea_streamer_spark.sources.tables import load_tables
        from sea_streamer_spark.streaming.kafka_txn import (
            TransactionalProducer,
            kafka_txn_foreach_partition,
        )

        env = envelope_from_events(
            load_tables(spark, sf_dir, "events").events
        ).limit(40).repartition(4)

        def factory(txn_id):
            b = FakeKafka()
            b.create_topic("out", 4)
            return TransactionalProducer(b, txn_id).init_transactions()

        write = kafka_txn_foreach_partition(
            factory, "out", "spark-sink", partition_col="shard_id"
        )
        write(env, 0)  # raises on any task failure


class TestKafkaConsumerIntegrationFlow:
    """The reference's full kafka consumer integration flow
    (sea-streamer-kafka/tests/consumer.rs:20-125) ported end-to-end onto the
    broker model: produce receipts (sequence == offset, shard 0), Earliest
    replay, rewind(Beginning)/rewind(At(5)), restart-without-commit replays
    from the beginning, commit(6) resumes at 6, seek(point_in_time) is
    timestamp-exclusive and lands at the first later record, and a final
    commit survives a restart."""

    def test_full_flow(self):
        from sea_streamer_spark.streaming.fake_kafka import (
            FakeKafka,
            resolve_start_offset,
        )

        b = FakeKafka()
        topic, group = "test-flow", "flow-group"
        b.create_topic(topic, 1)

        def consume(start: int, num: int) -> tuple[list[int], int]:
            recs = b.fetch(topic, 0, start, max_records=num)
            return [int(r.value.decode()) for r in recs], (
                recs[-1].offset + 1 if recs else start
            )

        # produce 0..6 with receipt assertions, then a 1s gap, then 7..19
        for i in range(7):
            part, off = b.produce(topic, str(i).encode(), partition=0,
                                  timestamp_ms=1_000_000 + i)
            assert (part, off) == (0, i)  # shard 0, sequence == i
        point_in_time = 1_000_500  # between message 6 and 7 (the 1s sleep)
        for i in range(7, 20):
            part, off = b.produce(topic, str(i).encode(), partition=0,
                                  timestamp_ms=1_001_000 + i)
            assert (part, off) == (0, i)

        # RealTime + Earliest: basic stream
        start = resolve_start_offset(b, topic, 0, None, "earliest")
        seq, pos = consume(start, 10)
        assert seq == list(range(10))  # Basic stream ... ok

        # rewind(Beginning) after assign
        seq, pos = consume(b.beginning_offset(topic, 0), 10)
        assert seq == list(range(10))  # Rewind stream ... ok

        # rewind(At(5)) — SeqPos::At is the offset itself (inclusive)
        seq, pos = consume(5, 5)
        assert seq == [5, 6, 7, 8, 9]  # Rewind to mid stream ... ok

        # Resumable consumer, no committed offset yet: starts from beginning
        start = resolve_start_offset(b, topic, 0, group, "earliest")
        seq, _ = consume(start, 10)
        assert seq == list(range(10))

        # commit up to 6, restart: resumes from 6
        b.commit(group, topic, 0, 6)
        start = resolve_start_offset(b, topic, 0, group, "earliest")
        seq, _ = consume(start, 4)
        assert seq == [6, 7, 8, 9]  # Resume ... ok

        # seek(point_in_time): ts-exclusive (+1ms in the mapping) → first
        # record strictly later → continues from 7
        start = resolve_start_offset(
            b, topic, 0, group, "earliest",
            starting_timestamp_ms=point_in_time + 1,
        )
        seq, pos = consume(start, 3)
        assert seq == [7, 8, 9]  # Seek stream ... ok

        seq, pos = consume(pos, 10)
        assert seq == list(range(10, 20))  # Resume ... ok

        # commit up to 19 and restart: only 19 remains
        b.commit(group, topic, 0, 19)
        start = resolve_start_offset(b, topic, 0, group, "earliest")
        seq, _ = consume(start, 10)
        assert seq == [19]
