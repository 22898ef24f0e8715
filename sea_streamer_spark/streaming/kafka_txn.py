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
    transaction is bound to ONE producer instance, so a per-partition
    executor fan-out would need one txn per task and lose batch atomicity.
    The reference producer is likewise a single background task
    (producer.rs:296-572). For throughput-over-atomicity, use the
    non-transactional executor-side sink.
    """

    def write(batch_df, batch_id: int) -> None:
        committed = producer.broker.committed(group, BATCH_LEDGER_TOPIC, 0)
        if committed is not None and batch_id < committed:
            return  # this batch's txn already committed: replay no-op
        producer.begin_transaction()
        try:
            for row in batch_df.toLocalIterator():
                ts = getattr(row, timestamp_col, None)
                key = getattr(row, key_col, None) if key_col else None
                # partition_col pins placement per row (send_message's
                # explicit-partition mode, kafka/src/producer.rs:171-185);
                # None keeps the broker's key-hash default partitioner.
                part = None
                if partition_col is not None:
                    raw = getattr(row, partition_col, None)
                    if raw is None:
                        raise ValueError(
                            f"partition pin column {partition_col!r} is "
                            "missing or NULL for a row in this batch; "
                            "drop the pin or backfill the column"
                        )
                    part = int(raw)
                producer.send(
                    topic,
                    bytes(getattr(row, value_col) or b""),
                    key=key.encode() if key is not None else None,
                    partition=part,
                    timestamp_ms=int(ts.timestamp() * 1000) if ts else 0,
                )
            producer.send_offsets_to_transaction(
                group, {(BATCH_LEDGER_TOPIC, 0): batch_id + 1}
            )
        except Exception:
            producer.abort_transaction()  # all-or-nothing: nothing visible
            raise
        producer.commit_transaction()

    return write
