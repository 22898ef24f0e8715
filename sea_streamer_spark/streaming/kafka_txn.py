"""Kafka producer transactions (S3): the reference API surface
(kafka/src/producer.rs:236-290 — ``init_transactions`` / ``begin`` /
``commit`` / ``abort_transaction`` / ``send_offsets_to_transaction``)
re-expressed as (a) a transactional producer engine with the rdkafka state
machine, and (b) the Spark EOS sink pattern that engine enables: one
transaction per micro-batch inside ``foreachBatch``, with the batch id
staged as a transactional offset so replays of an already-committed batch
are no-ops.

Spark's own exactly-once story is checkpoint + idempotent sink (the mapping
documented in streaming/producer.py) — this module is for pipelines that
interoperate with non-Spark ``read_committed`` Kafka consumers, where
atomic message-visibility + offset-commit is the contract that matters.
Client-agnostic: the broker surface it drives (produce(txn_id=..),
begin/commit/abort_txn, stage_txn_offset, read_committed fetch) is
implemented by the in-process model (fake_kafka.py) and maps 1:1 onto
confluent-kafka's transactional producer when a real client is present.
"""

from __future__ import annotations


class TxnState:
    UNINIT = "uninit"
    READY = "ready"
    IN_TXN = "in_transaction"


class TransactionalProducer:
    """The reference's transactional producer state machine
    (producer.rs:236-290): ``init_transactions`` once, then
    begin → (produce | send_offsets)* → commit/abort cycles. Calls out of
    order raise, mirroring rdkafka's fatal/state errors."""

    def __init__(self, broker, txn_id: str) -> None:
        self.broker = broker
        self.txn_id = txn_id
        self.state = TxnState.UNINIT

    def init_transactions(self) -> "TransactionalProducer":
        if self.state != TxnState.UNINIT:
            raise RuntimeError("init_transactions called twice")
        self.state = TxnState.READY
        return self

    def begin_transaction(self) -> "TransactionalProducer":
        if self.state != TxnState.READY:
            raise RuntimeError(f"begin_transaction in state {self.state}")
        self.broker.begin_txn(self.txn_id)
        self.state = TxnState.IN_TXN
        return self

    def send(self, topic: str, value: bytes, key: bytes | None = None,
             partition: int | None = None, timestamp_ms: int = 0) -> tuple[int, int]:
        if self.state != TxnState.IN_TXN:
            raise RuntimeError("send outside a transaction on a transactional producer")
        return self.broker.produce(
            topic, value, key=key, partition=partition,
            timestamp_ms=timestamp_ms, txn_id=self.txn_id,
        )

    def send_offsets_to_transaction(
        self, group: str, offsets: dict[tuple[str, int], int]
    ) -> "TransactionalProducer":
        """Stage consumer-group offsets to commit atomically with the txn
        (EOS consume-transform-produce, producer.rs:268-277)."""
        if self.state != TxnState.IN_TXN:
            raise RuntimeError("send_offsets outside a transaction")
        for (topic, partition), off in offsets.items():
            self.broker.stage_txn_offset(self.txn_id, group, topic, partition, off)
        return self

    def commit_transaction(self) -> "TransactionalProducer":
        if self.state != TxnState.IN_TXN:
            raise RuntimeError("commit without begin")
        self.broker.commit_txn(self.txn_id)
        self.state = TxnState.READY
        return self

    def abort_transaction(self) -> "TransactionalProducer":
        if self.state != TxnState.IN_TXN:
            raise RuntimeError("abort without begin")
        self.broker.abort_txn(self.txn_id)
        self.state = TxnState.READY
        return self


#: Synthetic "source" bookkeeping topic for staging Spark batch ids as
#: transactional offsets: partition 0 offset = last committed batch id + 1.
BATCH_LEDGER_TOPIC = "__spark_batches"


def kafka_txn_foreach_batch(
    producer: TransactionalProducer,
    topic: str,
    group: str,
    timestamp_col: str = "timestamp",
    value_col: str = "payload",
    key_col: str | None = "stream_key",
    partition_col: str | None = None,
):
    """foreachBatch body with Kafka-transaction EOS: each micro-batch is one
    transaction whose messages and batch-id offset commit atomically.
    Replay of a batch id at-or-below the committed ledger offset is a no-op
    — the transactional analog of the explicit-id idempotent replay the
    Redis sink uses (D9), and exactly how the reference positions
    transactions next to Spark's checkpoint (SURVEY §2.1 S3).

    Driver-side iteration (``toLocalIterator``) is deliberate: a Kafka
    transaction is bound to ONE producer instance, so whole-BATCH atomicity
    requires a single producer. The reference producer is likewise a single
    background task (producer.rs:296-572). This is the strict-atomicity
    mode; for transactional throughput at scale use
    :func:`kafka_txn_foreach_partition` (one txn per partition, executor
    side, no driver materialization — partition-level atomicity), and for
    throughput without transactions the non-transactional executor sink.
    """

    def write(batch_df, batch_id: int) -> None:
        committed = producer.broker.committed(group, BATCH_LEDGER_TOPIC, 0)
        if committed is not None and batch_id < committed:
            return  # this batch's txn already committed: replay no-op
        producer.begin_transaction()
        try:
            # partition_col pins placement per row (send_message's
            # explicit-partition mode, kafka/src/producer.rs:171-185);
            # None keeps the broker's key-hash default partitioner.
            _send_rows(
                producer, batch_df.toLocalIterator(), topic, timestamp_col,
                value_col, key_col, partition_col,
            )
            producer.send_offsets_to_transaction(
                group, {(BATCH_LEDGER_TOPIC, 0): batch_id + 1}
            )
        except Exception:
            producer.abort_transaction()  # all-or-nothing: nothing visible
            raise
        producer.commit_transaction()

    return write


def _send_rows(
    producer: TransactionalProducer,
    rows,
    topic: str,
    timestamp_col: str,
    value_col: str,
    key_col: str | None,
    partition_col: str | None,
) -> None:
    """Shared row→send loop of both EOS sinks (driver-batch and
    executor-partition): explicit-partition pinning with a clear error on a
    missing/NULL pin value, key-hash default otherwise."""
    for row in rows:
        ts = getattr(row, timestamp_col, None)
        key = getattr(row, key_col, None) if key_col else None
        part = None
        if partition_col is not None:
            raw = getattr(row, partition_col, None)
            if raw is None:
                raise ValueError(
                    f"partition pin column {partition_col!r} is missing or "
                    "NULL for a row; drop the pin or backfill the column"
                )
            part = int(raw)
        producer.send(
            topic,
            bytes(getattr(row, value_col) or b""),
            key=key.encode() if key is not None else None,
            partition=part,
            timestamp_ms=int(ts.timestamp() * 1000) if ts else 0,
        )


def kafka_txn_partition_writer(
    producer_factory,
    topic: str,
    group: str,
    timestamp_col: str = "timestamp",
    value_col: str = "payload",
    key_col: str | None = "stream_key",
    partition_col: str | None = None,
):
    """Executor-side transactional sink body: ONE transactional producer per
    Spark partition (VERDICT r4 task #6 — the scale-safe alternative to the
    driver-side ``toLocalIterator`` loop of :func:`kafka_txn_foreach_batch`).

    ``producer_factory(txn_id)`` must return an initialized
    :class:`TransactionalProducer` (confluent-kafka's transactional producer
    in a deployment; the in-process broker model in tests). The
    ``transactional.id`` is ``{group}/{topic}/p{partition_id}`` — stable
    across batch replays of the same partition, so the broker's epoch bump
    fences a zombie task of a previous attempt, exactly rdkafka's
    per-producer fencing (kafka/src/producer.rs:236-290). Batch-id fencing
    rides the existing ledger, one ledger partition per Spark partition:
    offset ``batch_id + 1`` for (``BATCH_LEDGER_TOPIC``, partition_id)
    commits atomically with the data, so a replayed (batch, partition) whose
    ledger is already past is a no-op.

    Atomicity contract — the deliberate difference from the driver path:
    the transaction unit is the PARTITION, not the batch. ``read_committed``
    consumers never observe a partial partition, but may observe partition
    A's rows while partition B's task is still running (or aborted and
    retried). Pipelines that need whole-batch atomicity keep
    :func:`kafka_txn_foreach_batch`; everything else gets parallel sends
    with no driver materialization.

    Returns ``write_partition(rows, partition_id, batch_id)`` — the body a
    ``foreachPartition`` closure runs per task (partition_id from
    ``TaskContext.get().partitionId()``, batch_id from the enclosing
    ``foreachBatch``); exposed with explicit arguments so tests drive the
    exact per-task code path in-process.
    """

    def write_partition(rows, partition_id: int, batch_id: int) -> None:
        rows = list(rows)
        if not rows:
            return
        producer = producer_factory(f"{group}/{topic}/p{partition_id}")
        committed = producer.broker.committed(
            group, BATCH_LEDGER_TOPIC, partition_id
        )
        if committed is not None and batch_id < committed:
            return  # this (batch, partition) already committed: replay no-op
        producer.begin_transaction()
        try:
            _send_rows(
                producer, rows, topic, timestamp_col, value_col, key_col,
                partition_col,
            )
            producer.send_offsets_to_transaction(
                group, {(BATCH_LEDGER_TOPIC, partition_id): batch_id + 1}
            )
        except Exception:
            producer.abort_transaction()  # partition all-or-nothing
            raise
        producer.commit_transaction()
        return

    return write_partition


def kafka_txn_foreach_partition(
    producer_factory,
    topic: str,
    group: str,
    timestamp_col: str = "timestamp",
    value_col: str = "payload",
    key_col: str | None = "stream_key",
    partition_col: str | None = None,
):
    """foreachBatch wrapper over :func:`kafka_txn_partition_writer`: fans
    the batch out with ``foreachPartition`` so every task runs its own
    transaction (no ``toLocalIterator``, no driver materialization).
    ``producer_factory`` must be picklable and create the producer ON THE
    EXECUTOR (a broker-connected client; the in-memory test model cannot
    cross process boundaries — its executor-path coverage is the direct
    ``kafka_txn_partition_writer`` tests)."""
    body = kafka_txn_partition_writer(
        producer_factory, topic, group, timestamp_col, value_col, key_col,
        partition_col,
    )

    def write(batch_df, batch_id: int) -> None:
        def run(rows) -> None:
            from pyspark import TaskContext

            ctx = TaskContext.get()
            body(rows, ctx.partitionId() if ctx is not None else 0, batch_id)

        batch_df.foreachPartition(run)

    return write
