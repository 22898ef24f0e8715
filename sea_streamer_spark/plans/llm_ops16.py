"""Round-12 operator waves.

Wave 1 — streaming curation e2e (r11 VERDICT task #1): the §2 streaming
layer and the curation ops layer, each deeply verified on its own, had
never been proven TOGETHER. ``curation_streaming_e2e`` drives the
documents corpus through the registered file replay backend
(``streaming/consumer.create_consumer`` — the same envelope/offset/
checkpoint machinery every S-row uses) as a PII-bearing JSON firehose:
micro-batches decode (``from_json``, P6), redact (the llm_ops14 chain
as a map stage), and claim exact-dedup keys incrementally
(first-writer-wins state over the redacted-text md5,
``streaming/curation.py``), sinking per-doc flags idempotently
(overwrite-by-batch-path + batch-id ledger — the S21/D9 recipe). The
funnel downstream of exact dedup is llm_ops15's ``_e2e_funnel_tail``
VERBATIM, and the oracle is the batch pipeline's oracle VERBATIM — so
a driver-green hash on this row IS the batch/stream equivalence proof:
the streamed survivor flags reproduce the batch funnel bit-for-bit.
Checkpoint-resume and crash-replay variants of the same path are pinned
in tests/test_streaming_curation.py (the Structured-Streaming analog of
the reference's loopback tests, e.g. file/tests/loopback.rs).

House rules (llm_ops.py): integer fixed-point for every ranked
comparison, deterministic tie-breaks, every aggregate aliased
identically in Spark and the oracle.

Reference basis: the reference engine (sea-streamer, Rust) has no ops
layer — this family exists for the 100 TB training-data pipeline
mandate; the streaming substrate maps its S/D/T rows (SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_tables
from .registry import query

# ---------------------------------------------------------------- wave 1
# Streaming curation e2e: stream front (redact + incremental exact
# dedup) + batch funnel tail, oracle = the batch funnel's.

#: fixture segments (micro-batches) for the streamed corpus; six
#: segments exercises multi-batch state handoff at every sf without
#: making the bounded replay slow at sf0.1.
_STREAM_SEGMENTS = 6


def _stream_transform(df: DataFrame) -> DataFrame:
    """The in-stream map stages: redact the (PII-injected) firehose
    text, derive the had_pii flag and the exact-dedup key — all JVM
    expressions, zero Python in the per-row path."""
    from .llm_ops14 import _redact_chain_spark

    r = _redact_chain_spark(F.col("text"))
    return df.select(
        "doc_id",
        "source",
        (r != F.col("text")).alias("had_pii"),
        F.md5(r).alias("dedup_key"),
    )


def _streamed_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run (once per machine+sf; flock-serialized, .done-marked like the
    broker roundtrip fixtures) the streaming front over ``sf_dir``'s
    documents and return the accumulated per-doc flag state. The
    envelope log carries the SAME PII-injected text the batch pipeline
    derives (injection is corpus fixture, redaction is the pipeline),
    so the two fronts see identical inputs."""
    import fcntl
    import hashlib
    import os
    import tempfile

    from ..streaming.curation import (
        read_flags,
        run_curation_stream,
        write_documents_envelope,
    )
    from .llm_ops14 import _pii_injected_col

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    root = os.path.join(
        tempfile.gettempdir(), f"sea_curation_stream_v1_{tag}"
    )
    os.makedirs(root, exist_ok=True)
    done = os.path.join(root, ".done")
    with open(os.path.join(root, ".lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if not os.path.exists(done):
            docs = load_tables(spark, sf_dir, "documents").documents
            dirty = docs.select(
                "doc_id", "source", _pii_injected_col().alias("text")
            )
            write_documents_envelope(
                dirty,
                os.path.join(root, "src"),
                n_segments=_STREAM_SEGMENTS,
            )
            run_curation_stream(
                spark,
                os.path.join(root, "src"),
                os.path.join(root, "work"),
                _stream_transform,
            )
            with open(done, "w"):
                pass
    return read_flags(spark, os.path.join(root, "work", "flags"))


def _build_streaming_e2e_oracle() -> str:
    from .llm_ops15 import _build_e2e_oracle

    return _build_e2e_oracle()


@query(
    "curation_streaming_e2e",
    oracle=_build_streaming_e2e_oracle(),
    tags=("llm", "curation", "streaming", "dedup", "privacy"),
)
def curation_streaming_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch/stream equivalence, driver-checked: the curation funnel
    computed from STREAMED exact-dedup flags (file replay backend →
    micro-batch redact → first-writer-wins key claim → idempotent flag
    sink) must hash-match the batch pipeline's DuckDB oracle — the same
    oracle string as ``curation_e2e_pipeline``, embedded stage oracles
    and all. First-seen-wins equals the batch min-doc_id-per-key
    because the file backend replays segments in sequence order (the
    log-ordering contract; streaming/curation.py module docstring).
    Plan shape: the streamed front adds one keyed window + one state
    equi-join per micro-batch; the funnel tail is the shared
    ``_e2e_funnel_tail`` (zero Python, no cartesian)."""
    from .llm_ops15 import _e2e_funnel_tail

    flags = _streamed_flags(spark, sf_dir)
    ex = flags.select(
        "doc_id", "source", "had_pii", F.col("keep").alias("keep2")
    )
    return _e2e_funnel_tail(spark, sf_dir, ex)
