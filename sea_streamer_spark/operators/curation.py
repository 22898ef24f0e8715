"""Dataset-curation operators for training pipelines: deterministic splits
and sequence packing.

Beyond the reference's surface (it has no relational/curation layer), these
are the two ops every large-scale training-data pipeline needs between
"corpus" and "training run":

- :func:`hash_split` — assign each document to train/val/test by a
  *deterministic* content-independent hash of its id. Properties that matter
  at 100 TB: pure per-row projection (zero shuffle, no global sampling
  state), stable under re-runs and re-partitioning, and portable — the hash
  is the same explicit polynomial fold over ``md5(id)`` used by the text
  operators, reproducible bit-for-bit in any engine (the DuckDB oracle runs
  the identical fold).
- :func:`pack_token_budget` — concat-and-chunk sequence packing: documents
  fill fixed token-budget chunks in a deterministic order; a document whose
  first token lands in chunk *k* belongs to chunk *k* (chunks may overflow by
  at most one document's tail — the standard streaming-concat semantic).
  Packing is inherently sequential *within* a pack group, so the operator
  packs per ``by`` group (e.g. ``source``): one window shuffle, parallel
  across groups. At scale, pick the group granularity (source × date × ...)
  so a group's documents fit one task; groups never interact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import char_fold_hash, tokens

#: Number of hash buckets the split thresholds quantize over.
SPLIT_BUCKETS = 10_000

DEFAULT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def split_bucket(id_col: str, buckets: int = SPLIT_BUCKETS) -> F.Column:
    """Deterministic bucket in ``[0, buckets)`` from a row id: polynomial
    char fold over ``md5(cast(id as string))`` — engine-portable."""
    return char_fold_hash(F.md5(F.col(id_col).cast("string"))) % buckets


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    buckets: int = SPLIT_BUCKETS,
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` assigning each row to a named split with the given
    weights (must sum to ~1). Assignment depends only on ``id_col``."""
    weights = weights or DEFAULT_WEIGHTS
    b = split_bucket(id_col, buckets)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def pack_token_budget(
    df: DataFrame,
    budget: int,
    by: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document a ``chunk_id`` within its ``by`` group: documents
    are laid out in ``order_col`` order and a document belongs to the chunk
    where its first token lands (``floor(tokens_before / budget)``).

    Adds ``n_tokens`` and ``chunk_id``. Exactly-once, deterministic, one
    window shuffle on ``by``.
    """
    n_tok = F.size(tokens(text_col)).cast("long")
    w = (
        Window.partitionBy(by)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("chunk_id", F.floor(cum_before / budget).cast("long"))
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    buckets: int = SPLIT_BUCKETS,
) -> DataFrame:
    """Deterministic stratified sample: keep a row iff its id bucket falls
    under its stratum's rate threshold. Unlike ``sampleBy`` this is exactly
    reproducible (no RNG, no seed-per-partition coupling) and pure per-row —
    zero shuffle at any scale; re-running or repartitioning yields the
    identical sample."""
    b = split_bucket(id_col, buckets)
    thresh = None
    for stratum, rate in rates.items():
        cond = F.col(strata_col) == stratum
        lim = F.lit(int(round(rate * buckets)))
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    thresh = thresh.otherwise(int(round(default_rate * buckets)))
    return df.filter(b < thresh)


def shuffle_rank(id_col: str = "doc_id", salt: str = "shuf") -> F.Column:
    """Deterministic global shuffle key: the portable fold over
    ``md5(salt || id)``. Ordering by it is a reproducible permutation;
    at scale Spark range-partitions the sort — fully parallel, and
    different ``salt`` values give independent epoch orders."""
    return char_fold_hash(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))))


def contamination(
    df: DataFrame,
    split_col: str = "split",
    train: str = "train",
    val: str = "val",
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decontamination check: for each ``val`` document, how many of its
    k-gram shingles also occur anywhere in ``train``. A nonzero count flags
    train/eval leakage — the standard n-gram overlap test run before every
    training launch.

    Plan: one shingle explode per side, distinct train shingles, equi-join
    on the shingle, count per val doc — shuffles scale with shingle volume,
    not |train|×|val|. Hot shingles (stopword runs) skew the join; AQE
    skew-splitting handles it here, and production contamination checks use
    larger k (8-grams), which this parameterizes.
    """
    from .dedup import shingle_sets

    ds = shingle_sets(df, text_col, id_col, k).join(
        df.select(id_col, split_col), id_col
    )
    val_sh = ds.filter(F.col(split_col) == val).select(id_col, "sh")
    train_sh = ds.filter(F.col(split_col) == train).select("sh").distinct()
    return (
        val_sh.join(train_sh, "sh")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("sh")).alias("n_shared"))
    )


def duck_split_bucket(id_expr: str, buckets: int = SPLIT_BUCKETS) -> str:
    """DuckDB SQL fragment equivalent to :func:`split_bucket`."""
    from .text import duck_char_fold

    return f"({duck_char_fold(f'md5(CAST({id_expr} AS VARCHAR))')} % {buckets})"


def mixture_thresholds(
    weights: dict[str, float],
    default_weight: float = 1.0,
    buckets: int = SPLIT_BUCKETS,
) -> dict[str | None, tuple[int, int]]:
    """Per-source ``(base_copies, extra_bucket_threshold)`` integer pairs for
    :func:`mixture_resample` (``None`` key = the default weight). The single
    source of truth for the weight→integer quantization, shared by the Spark
    operator and the DuckDB oracle so the boundary can never disagree."""
    import math

    def pair(w: float) -> tuple[int, int]:
        base = int(math.floor(w))
        return base, int(round((w - base) * buckets))

    out: dict[str | None, tuple[int, int]] = {s: pair(w) for s, w in weights.items()}
    out[None] = pair(default_weight)
    return out


def duck_mixture_copies(
    weights: dict[str, float],
    default_weight: float = 1.0,
    id_expr: str = "doc_id",
    source_col: str = "source",
    buckets: int = SPLIT_BUCKETS,
) -> str:
    """DuckDB SQL fragment computing :func:`mixture_resample`'s ``n_copies``
    with the same precomputed integer thresholds as the operator."""
    thr = mixture_thresholds(weights, default_weight, buckets)
    dbase, dthr = thr[None]
    base_cases = " ".join(
        f"WHEN '{s}' THEN {b}" for s, (b, _) in thr.items() if s is not None
    )
    thr_cases = " ".join(
        f"WHEN '{s}' THEN {t}" for s, (_, t) in thr.items() if s is not None
    )
    if not base_cases:  # weights={}: a zero-WHEN CASE is a parse error
        base_expr, thr_expr = str(dbase), str(dthr)
    else:
        base_expr = f"CASE {source_col} {base_cases} ELSE {dbase} END"
        thr_expr = f"CASE {source_col} {thr_cases} ELSE {dthr} END"
    return (
        f"(CAST({base_expr} AS BIGINT)"
        f" + CASE WHEN {duck_split_bucket(id_expr, buckets)} < "
        f"({thr_expr}) THEN 1 ELSE 0 END)"
    )


def mixture_resample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    buckets: int = SPLIT_BUCKETS,
) -> DataFrame:
    """Deterministic mixture resampling: replicate each document
    ``floor(w)`` times plus one more iff its salted hash bucket falls under
    ``frac(w)`` — so a source with weight 2.5 contributes every doc twice
    and half the docs (a deterministic, re-run-stable half) a third time,
    while weight 0.25 keeps a quarter of the docs. The standard
    epochs-per-source mixture weighting step of a training-data pipeline.

    Pure map-side: weight lookup and bucket are projections and the
    replication is ``explode(sequence)`` — zero shuffle at any scale; adds
    ``copy_idx`` (0-based) to distinguish replicas downstream.
    """
    b = split_bucket(id_col, buckets)
    # Integer thresholds are precomputed driver-side (weights are known):
    # comparing bucket < int(round(frac * buckets)) instead of the per-row
    # double expression (w - floor(w)) * buckets removes the float boundary
    # hazard — 0.1 is not binary-representable, so the double product is
    # 1000.0000000000002 while an engine evaluating in DECIMAL gets 1000,
    # flipping the comparison for bucket == 1000. Integers on both engines
    # can never disagree.
    thr = mixture_thresholds(weights, default_weight, buckets)
    base = None
    extra_thr = None
    for s, (base_s, thr_s) in thr.items():
        if s is None:
            continue
        cond = F.col(source_col) == s
        base = F.when(cond, base_s) if base is None else base.when(cond, base_s)
        extra_thr = F.when(cond, thr_s) if extra_thr is None else extra_thr.when(cond, thr_s)
    dbase, dthr = thr[None]
    base = (F.lit(dbase) if base is None else base.otherwise(dbase)).cast("long")
    extra_thr = F.lit(dthr) if extra_thr is None else extra_thr.otherwise(dthr)
    extra = (b < extra_thr).cast("long")
    n_copies = (base + extra).alias("n_copies")
    return (
        df.withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)))
        .drop("n_copies")
    )
