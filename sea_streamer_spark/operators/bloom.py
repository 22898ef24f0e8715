"""Bloom-filter incremental deduplication — the new-shard-vs-existing-corpus
gate a continuously-ingesting training-data pipeline needs.

Problem shape: a 100 TB historical corpus, a (comparatively small) fresh
batch. Joining the batch against the full corpus shuffles the corpus; what
scales is a *broadcastable summary* of corpus membership that filters the
batch map-side, with the exact join reserved for the few rows the summary
cannot clear. A Bloom filter is that summary: no false negatives ever, so

- ``might_contain == false`` ⇒ the row is **definitely new** — emitted with
  zero further work;
- ``might_contain == true``  ⇒ *maybe* duplicate — only this sliver (true
  dups + the fp_rate of genuinely-new rows) is verified by a real semi/anti
  join against the corpus keys.

The composition is therefore **exact** end-to-end (the filter is purely a
work-pruning device), which keeps it DuckDB-oracle-checkable: the result
always equals the plain anti-join. Spark's own runtime uses the same trick
internally (InjectRuntimeFilter's bloom on shuffle joins); this operator
makes it explicit and *persistent* — the packed filter is a few hundred KB
of longs that can be saved and reused across ingest runs without touching
the corpus again, which the runtime filter cannot.

Determinism: hashes are ``xxhash64`` (JVM-side, seeded) with double hashing
``h_i = h1 + i*h2`` (Kirsch–Mitzenmacher 2006 — g independent probes from
two hashes, no accuracy loss). The build aggregates **packed 64-bit words**
(``groupBy(bit div 64) → bit_or``), so the driver collects at most
``m_bits/64`` longs regardless of corpus size — the collect is bounded by
the filter geometry, never by the data.

No reference analog (sea-streamer has no relational/dedup layer); this is
part of the beyond-reference LLM-pipeline block (BASELINE.json north star).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEED1 = 0x9E3779B1
_SEED2 = 0x85EBCA77


@dataclass(frozen=True)
class BloomModel:
    """A built filter: ``m_bits`` bit positions packed into ``words``
    (little-endian within each long), probed by ``g`` double-hash probes."""

    m_bits: int
    g: int
    words: tuple[int, ...]  # len == m_bits // 64

    @property
    def set_bits(self) -> int:
        return sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in self.words)

    def fp_rate(self) -> float:
        """Expected false-positive probability at the current load:
        (set_bits / m) ** g — the standard occupancy bound."""
        return (self.set_bits / self.m_bits) ** self.g


def _probe_bits(col: Column, m_bits: int, g: int) -> list[Column]:
    """g probe positions in [0, m_bits) via Kirsch–Mitzenmacher double
    hashing. Both hashes are reduced mod m_bits BEFORE the ``h1 + i*h2``
    combination (ANSI mode would overflow-long otherwise, and the combined
    value mod m is identical either way); ``pmod`` absorbs xxhash64's sign,
    and h2 is forced odd so it is a generator mod the power-of-two m_bits."""
    h1 = F.pmod(F.xxhash64(col, F.lit(_SEED1)), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(_SEED2)), F.lit(m_bits)).bitwiseOR(
        F.lit(1).cast("long")
    )
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(g)]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 20, g: int = 5
) -> BloomModel:
    """Aggregate the corpus into a :class:`BloomModel`.

    One explode (g rows per key) into a two-level packed-word aggregate:
    ``groupBy(word_idx).agg(bit_or(1 << bit_in_word))`` — map-side partial
    ``bit_or`` means the shuffle carries at most ``m_bits/64`` rows *per
    map task*, and the driver collect is exactly the filter's word count.
    Size m_bits ≈ 10 bits/key for ~1% fp at g=5 (the classic sizing)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    probes = _probe_bits(F.col(key_col), m_bits, g)
    words = (
        df.select(F.explode(F.array(*probes)).alias("bit"))
        .select(
            (F.col("bit") / 64).cast("long").alias("w"),
            F.call_function("shiftleft", F.lit(1).cast("long"), (F.col("bit") % 64).cast("int")).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    packed = [0] * (m_bits // 64)
    for r in words:
        packed[int(r.w)] = int(r.word)
    return BloomModel(m_bits=m_bits, g=g, words=tuple(packed))


def bloom_might_contain(model: BloomModel, col: Column) -> Column:
    """Map-side membership probe: AND over g packed-word bit tests. The
    word array rides into the plan as ONE array literal (m_bits/64 longs —
    ~128 KB at m=2^20), evaluated JVM-side in whole-stage codegen; no
    Python, no shuffle, no join. r12: the literal is built by one SQL
    parse (litexpr.lit_longs) — ``F.lit(16k-element list)`` cost ~8 s of
    py4j round-trips per plan build; values fold identically."""
    from .litexpr import lit_longs

    words = lit_longs(model.words)
    cond = F.lit(True)
    for bit in _probe_bits(col, model.m_bits, model.g):
        word = F.element_at(words, ((bit / 64).cast("long") + 1).cast("int"))
        mask = F.call_function("shiftleft", F.lit(1).cast("long"), (bit % 64).cast("int"))
        cond = cond & ((word.bitwiseAND(mask)) != 0)
    return cond


def bloom_incremental_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    g: int = 5,
    model: BloomModel | None = None,
) -> DataFrame:
    """Rows of ``new_df`` whose ``key_col`` does NOT appear in the corpus —
    exactly (equivalent to ``new_df EXCEPT-keys corpus``), but the corpus
    anti-join only ever sees the maybe-duplicate sliver:

    1. probe the (prebuilt or freshly built) filter map-side;
    2. ``might_contain == false`` rows pass through join-free (no false
       negatives ⇒ provably new);
    3. ``might_contain == true`` rows — true dups plus ~fp_rate of the new
       rows — are anti-joined against the corpus keys for the exact verdict.

    Pass ``model`` to reuse a filter persisted from a previous ingest run
    (the steady-state path: the 100 TB corpus is never re-read)."""
    model = model or bloom_build(corpus_df, key_col, m_bits, g)
    flagged = new_df.withColumn("__maybe", bloom_might_contain(model, F.col(key_col)))
    definite = flagged.filter(~F.col("__maybe")).drop("__maybe")
    verified = (
        flagged.filter(F.col("__maybe"))
        .drop("__maybe")
        .join(corpus_df.select(key_col).distinct(), key_col, "left_anti")
    )
    return definite.unionByName(verified)


# -------------------------------------------------- streaming / incremental


def save_model(model: BloomModel, path: str) -> None:
    """Persist a filter atomically — m/64 longs, ~128 KB at m=2^20
    (functions/statefile.py owns the tmp+rename contract)."""
    from ..functions.statefile import save_json

    save_json(path, {"m_bits": model.m_bits, "g": model.g, "words": list(model.words)})


def load_model(path: str) -> BloomModel | None:
    from ..functions.statefile import load_json

    d = load_json(path)
    if d is None:
        return None
    return BloomModel(m_bits=d["m_bits"], g=d["g"], words=tuple(d["words"]))


def merge_models(a: BloomModel, b: BloomModel) -> BloomModel:
    """Union of two filters over the same geometry — the property that makes
    the filter *incrementally updatable*: OR-ing each batch's word deltas
    into the persisted filter is exactly a rebuild over corpus ∪ batch."""
    if (a.m_bits, a.g) != (b.m_bits, b.g):
        raise ValueError("bloom geometries differ")
    return BloomModel(
        m_bits=a.m_bits, g=a.g, words=tuple(x | y for x, y in zip(a.words, b.words))
    )


def streaming_bloom_dedup_sink(
    out_dir: str,
    state_dir: str,
    key_col: str = "fp",
    m_bits: int = 1 << 18,
    g: int = 5,
    n_buckets: int = 64,
):
    """A ``foreachBatch`` sink deduplicating a document firehose against
    ALL history — the streaming face of :func:`bloom_incremental_dedup`.

    Per micro-batch: (1) probe the persisted filter map-side — rows it
    cannot clear are verified against the key ledger; (2) batch-internal
    dups collapse via ``dropDuplicates`` on the key; (3) survivors append
    to ``out_dir`` and the ledger, and their bits OR into the filter
    (:func:`merge_models` — an incremental update IS a rebuild, so the
    filter never re-scans history).

    The ledger is **bucket-partitioned** by a key hash (``n_buckets``
    hive-style partitions inside each batch directory), so the per-batch
    verification reads only the buckets the maybe-dup sliver actually
    touches — partition pruning bounds the history scanned per batch by
    ``(corpus / n_buckets) × |distinct maybe buckets|`` instead of the full
    corpus. Size ``n_buckets`` so a bucket fits an executor's working set
    (thousands at 100 TB); with a well-sized filter the sliver is tiny, so
    most batches read a handful of buckets or none.

    Crash contract: the batch-id marker is written only after data, ledger
    and filter all publish (atomic renames). A replayed batch is a no-op at
    the marker; a crash mid-batch re-runs it — the data/ledger writes are
    overwrite-by-batch-path (idempotent), re-OR-ing bits is idempotent by
    construction, and verification excludes the batch's own ledger
    partition (a replay must not see its first attempt as history). Wrap
    with ``sink.idempotent_foreach_batch`` for the marker ledger."""
    import os

    from pyspark.sql import functions as F

    os.makedirs(state_dir, exist_ok=True)
    model_path = os.path.join(state_dir, "bloom.json")
    ledger_dir = os.path.join(state_dir, "keys")

    def bucket_of(col):
        return F.pmod(F.xxhash64(col, F.lit(0x42)), F.lit(n_buckets))

    def write(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch.sparkSession
        # batch-internal dedup with a DETERMINISTIC representative (the
        # row whose JSON serialization sorts first) — dropDuplicates keeps
        # an arbitrary row per key, so a crash-replayed batch could write
        # different content than its first attempt and break the
        # overwrite-by-batch-path replay contract
        batch = (
            batch.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy(key_col).orderBy(
                        F.to_json(F.struct(*batch.columns))
                    )
                ),
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        model = load_model(model_path)
        if model is None:
            model = BloomModel(m_bits=m_bits, g=g, words=(0,) * (m_bits // 64))
        flagged = batch.withColumn("__maybe", bloom_might_contain(model, F.col(key_col)))
        definite = flagged.filter(~F.col("__maybe")).drop("__maybe")
        maybe = (
            flagged.filter(F.col("__maybe"))
            .drop("__maybe")
            .withColumn("__bucket", bucket_of(F.col(key_col)))
            .localCheckpoint(eager=True)  # probed twice (bucket set + join)
        )
        if os.path.exists(ledger_dir) and os.listdir(ledger_dir):
            buckets = [r[0] for r in maybe.select("__bucket").distinct().collect()]
            if buckets:
                seen = (
                    spark.read.parquet(ledger_dir)
                    # partition pruning: only the sliver's buckets are read,
                    # and never this batch's own partition (crash-replay
                    # must not see its first attempt as history)
                    .filter(
                        (F.col("batch_id") != batch_id)
                        & F.col("bucket").isin(buckets)
                    )
                    .select(key_col)
                )
                maybe = maybe.join(seen, key_col, "left_anti")
        new = definite.unionByName(maybe.drop("__bucket")).localCheckpoint(eager=True)
        # overwrite-by-batch-path: replay rewrites identical content
        new.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        new.select(
            key_col, bucket_of(F.col(key_col)).alias("bucket")
        ).write.partitionBy("bucket").mode("overwrite").parquet(
            os.path.join(ledger_dir, f"batch_id={batch_id}")
        )
        delta = bloom_build(new, key_col, m_bits=model.m_bits, g=model.g)
        save_model(merge_models(model, delta), model_path)

    return write
