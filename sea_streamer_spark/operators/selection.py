"""Data selection via importance resampling (DSIR, Xie et al. 2023,
arXiv:2302.03169) — the standard pretraining-corpus selection recipe:
score every raw document by how target-like its hashed-n-gram profile is,
then keep the highest-importance slice.

Shape, 100 TB-first:

- **Features** are hashed token n-grams (unigrams + bigrams) folded into
  ``m`` buckets with the repo's portable polynomial hash
  (:func:`..operators.text.char_fold_hash` — replayable bit-for-bit in
  DuckDB SQL, so the registered query's oracle can rebuild the identical
  feature space).
- **Fit** is two bag-of-buckets distributions (target corpus vs raw
  corpus): one explode + ONE ``groupBy(bucket)`` count shuffle each, whose
  shuffle volume AND driver collect are capped at ``m`` rows regardless of
  corpus size — the bloom/CMS geometry-bounded-model shape.
- The per-bucket Laplace-smoothed log-likelihood ratios
  ``ln(p_target(b) / p_raw(b))`` are computed driver-side on the
  ``m``-bounded grid and micro-rounded to BIGINT **once**, then shipped to
  executors as a literal array. Scoring is therefore engine-exact integer
  arithmetic: no float summation order, no ln() parity concerns between
  engines — the registered query's driver hash is deterministic by
  construction (the char-LM/BM25 fixed-point convention).
- **Score** is a pure projection (bucket = fold % m inside whole-stage
  codegen, ratio lookup = ``element_at`` on the broadcast literal grid)
  plus ONE doc-keyed sum shuffle. Nothing joins; nothing scales beyond the
  n-gram explode itself.
- **Select** is a deterministic top-k on ``(logw desc, id)`` —
  TakeOrdered, no full sort at any scale.

The reference engine has no corpus-selection operator (this module is part
of the beyond-reference LLM-pipeline surface, like operators/dedup.py and
operators/quality.py); the method itself is the public DSIR recipe.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import char_fold_hash, tokens

__all__ = [
    "token_ngrams",
    "hashed_ngram_buckets",
    "fit_bucket_counts",
    "dsir_logratio_grid",
    "dsir_score",
    "dsir_select",
]

DEFAULT_M = 512


def token_ngrams(text_col: Column | str) -> Column:
    """Array of token unigrams + space-joined bigrams for one document.

    Bigrams via two shifted slices zipped together (no positional
    ``element_at`` — safe under ANSI mode for single-token docs, where both
    slices are empty).
    """
    tk = tokens(text_col)
    n1 = F.size(tk) - 1
    bigrams = F.zip_with(
        F.slice(tk, F.lit(1), n1),
        F.slice(tk, F.lit(2), n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(tk, bigrams)


def hashed_ngram_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = DEFAULT_M,
) -> DataFrame:
    """(id, bucket) with one row per n-gram occurrence — the shared feature
    relation for both fitting and scoring. Pure projection + explode; the
    fold and the mod stay inside whole-stage codegen. fan_out first: the
    explode multiplies volume ~tokens-per-doc, so its parallelism must not
    inherit a small scan's split count (no-op at production scale)."""
    from .scale import fan_out

    df = fan_out(df, key=id_col)
    return df.select(
        F.col(id_col), F.explode(token_ngrams(text_col)).alias("ng")
    ).select(
        id_col, (char_fold_hash(F.col("ng")) % m).cast("int").alias("bucket")
    )


def fit_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = DEFAULT_M,
) -> list[int]:
    """Dense m-vector of n-gram-occurrence counts per hash bucket.

    ONE count shuffle keyed by bucket; map-side combine caps the shuffle at
    ``m`` rows per task and the collect at ``m`` rows total — bounded by
    feature geometry at any corpus size (the bloom_build contract).
    """
    rows = (
        hashed_ngram_buckets(df, text_col, id_col, m)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out = [0] * m
    for r in rows:
        out[r["bucket"]] = r["n"]
    return out


def dsir_logratio_grid(
    target_counts: list[int], raw_counts: list[int], m: int | None = None
) -> list[int]:
    """Per-bucket importance-weight contributions, micro-rounded BIGINT:
    ``round(1e6 * ln(p_hat_target(b) / p_hat_raw(b)))`` with Laplace
    smoothing ``(c_b + 1) / (n + m)``. Computed once, driver-side, on the
    m-bounded grids — the only float math in the whole operator, so the
    distributed scoring stays engine-exact integer arithmetic."""
    m = m if m is not None else len(target_counts)
    if len(target_counts) != len(raw_counts):
        raise ValueError("target/raw grids differ in length")
    nt, nr = sum(target_counts), sum(raw_counts)
    return [
        int(
            round(
                1_000_000
                * (
                    math.log((target_counts[b] + 1) / (nt + m))
                    - math.log((raw_counts[b] + 1) / (nr + m))
                )
            )
        )
        for b in range(m)
    ]


def dsir_score(
    df: DataFrame,
    grid: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance log-weight: Σ grid[bucket(ngram)] over the
    document's n-grams, plus the n-gram count. Bucket assignment and grid
    lookup are pure projections (the grid is an ``m``-int literal array in
    the task binary); the only shuffle is the doc-keyed sum. Documents with
    zero n-grams keep a 0 score via the left join back to the id relation.
    """
    m = len(grid)
    bk = hashed_ngram_buckets(df, text_col, id_col, m)
    scored = bk.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_ngrams"),
        F.sum(F.element_at(F.lit(grid), (F.col("bucket") + 1).cast("int")))
        .cast("long")
        .alias("logw_micro"),
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_ngrams", F.lit(0).cast("long")).alias("n_ngrams"),
        F.coalesce("logw_micro", F.lit(0).cast("long")).alias("logw_micro"),
    )


def dsir_select(
    df: DataFrame,
    grid: list[int],
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic top-k by importance weight, ties broken by id: the
    resampling step's hard-threshold variant (DSIR §3 samples
    Gumbel-perturbed; the deterministic cut is the oracle-checkable
    contract and the paper's ablation baseline). Plans as TakeOrdered —
    never a global sort."""
    return (
        dsir_score(df, grid, text_col, id_col)
        .orderBy(F.col("logw_micro").desc(), F.col(id_col))
        .limit(k)
    )
