"""Fold-composition pin: ``positional_shingle_hashes`` must be
bit-identical to ``positional_shingles`` + ``char_fold_hash`` — it is the
cross-engine determinism contract (the DuckDB oracles replay the same
per-character polynomial fold), so the composed form is only admissible
if it matches the string fold on EVERY corpus, including non-ASCII,
astral-plane codepoints, empty tokens from whitespace runs, and tokens
long enough to overrun the power table (the per-doc fallback branch)."""

import pytest
from pyspark.sql import functions as F

from sea_streamer_spark.operators.dedup import (
    _POW31_MAX,
    positional_shingle_hashes,
    positional_shingles,
)
from sea_streamer_spark.operators.text import char_fold_hash

ADVERSARIAL = [
    "hello world foo bar baz",
    "a  b   c d",  # whitespace runs -> empty tokens
    " leading and trailing ",
    "tab\tsep\nnewline mix here",
    "é ü ñ 中文 русский عربى",
    "emoji 😀🎉 astral 𝔘𝔫𝔦 pair x",
    "😀😀😀 😀 😀😀 y z",
    "one two",  # shorter than k=3
    "solo",
    "",
    "exact three токена",
    "ascii and ünïcode mixed tokens everywhere now",
    # fallback trigger: a token long enough that the k-1 trailing tokens
    # cannot index the power table ((k-1)*(len+1) > _POW31_MAX-1)
    "short " + "Q" * (_POW31_MAX // 2 + 10) + " tail tokens here",
    "x " + "😀" * (_POW31_MAX // 2 + 5) + " astral overflow y",
]


@pytest.mark.parametrize("k", [2, 3])
def test_fold_composition_matches_string_fold(spark, k):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "doc_id long, text string"
    )
    want = (
        positional_shingles(df, k=k)
        .select("doc_id", "pos", char_fold_hash(F.col("sh")).alias("h"))
        .collect()
    )
    got = positional_shingle_hashes(df, k=k).select("doc_id", "pos", "h").collect()
    key = lambda r: (r.doc_id, r.pos)  # noqa: E731
    assert sorted(map(tuple, got), key=lambda t: t[:2]) == sorted(
        map(tuple, want), key=lambda t: t[:2]
    )


def test_fold_composition_n_pos_matches(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "doc_id long, text string"
    )
    want = positional_shingles(df, k=3).groupBy("doc_id").count().collect()
    got = (
        positional_shingle_hashes(df, k=3)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("count"), F.max("n_pos").alias("n_pos"))
        .collect()
    )
    want_m = {r.doc_id: r["count"] for r in want}
    for r in got:
        assert r["count"] == want_m[r.doc_id]
        assert r["n_pos"] == want_m[r.doc_id]


def test_fold_composition_arrays_built_below_barrier(spark):
    """The token-hash arrays must be materialized below the Generate
    barrier — if CollapseProject ever re-inlines the ``transform(...,
    char_fold_hash)`` build into the per-position lambda, each position
    re-folds the whole document (the documented O(k·n²) trap)."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = (
        positional_shingle_hashes(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    gen_at = plan.find("Generate explode")
    assert gen_at != -1
    above = plan[:gen_at]
    # above the barrier the arrays are attribute reads (_tk/_th/_tl) —
    # the tokenize of the raw text column must never be re-inlined there
    assert "split(text" not in above.replace("\n", " ")
