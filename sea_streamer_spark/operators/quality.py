"""Document-quality operators: Gopher-style rule filters, repetition
detection, and PII redaction — the standard pre-training corpus gates
(Rae et al. 2021 "Scaling Language Models" C.2; public Dolma/RefinedWeb
pipelines run the same family of rules).

Scale design: every operator here is a pure per-row projection built from
JVM-side expressions (regexp, higher-order array lambdas) — zero shuffle,
whole-stage codegen, linear in corpus size. Repetition's mode-of-array
computation is O(distinct x tokens) per row, bounded by document length —
row-local work that never touches the shuffle system. The portable-hash /
rational-arithmetic determinism contract from operators/text.py applies:
every number an oracle engine can reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import STOPWORDS, tokens

#: Gopher-style rule thresholds (tuned to the synthetic corpus's 10-99 token
#: range so each rule actually discriminates; the shape, not the constants,
#: is the operator).
MIN_WORDS = 30
MAX_WORDS = 80
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_DISTINCT_STOPWORDS = 2
MAX_SYMBOL_RATIO = 0.1

#: PII patterns: category -> (regex, replacement token). Deliberately the
#: classic conservative trio; swap in production-grade patterns freely —
#: the operator shape (chained JVM regexp_replace + per-category counts)
#: is what scales.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
}


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style quality rules as boolean flag columns plus the combined
    ``passes`` verdict: word-count bounds, mean-word-length bounds, minimum
    distinct-stopword evidence, and symbol-to-char ratio. Keeping the flags
    (not just the filter) is deliberate — at 100 TB you audit rule hit-rates
    per source before committing to a filter."""
    t = tokens(text_col)
    n = F.size(t)
    mean_len = (
        F.aggregate(t, F.lit(0).cast("long"), lambda a, w: a + F.length(w)).cast("double") / n
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop_distinct = F.size(
        F.array_intersect(F.array_distinct(t), stop_arr)
    )
    symbols = F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z0-9 ]", ""))
    symbol_ratio = symbols.cast("double") / F.length(text_col)
    ok_words = (n >= MIN_WORDS) & (n <= MAX_WORDS)
    ok_mean = (mean_len >= MIN_MEAN_WORD_LEN) & (mean_len <= MAX_MEAN_WORD_LEN)
    ok_stop = n_stop_distinct >= MIN_DISTINCT_STOPWORDS
    ok_symbol = symbol_ratio <= MAX_SYMBOL_RATIO
    return df.select(
        id_col,
        n.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        n_stop_distinct.cast("long").alias("n_distinct_stopwords"),
        ok_words.alias("ok_word_count"),
        ok_mean.alias("ok_mean_word_len"),
        ok_stop.alias("ok_stopwords"),
        ok_symbol.alias("ok_symbol_ratio"),
        (ok_words & ok_mean & ok_stop & ok_symbol).alias("passes"),
    )


def _bigrams(t: Column) -> Column:
    # zip_with over shifted slices, NOT transform+element_at: element_at
    # inside a lambda re-inlines the tokenize expression per element after
    # project-collapse (O(n^2) per doc, measured 8x on this op alone).
    n = F.size(t)
    grams = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(n >= 2, grams).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition detection: distinct-token ratio, the most-frequent token's
    share, and the most-frequent bigram's share — the "fraction of characters
    in the top n-gram" family of Gopher repetition rules. All row-local array
    arithmetic; no shuffle.

    The mode count is a single run-length pass over the *sorted* array
    (O(n log n) per row). The tempting alternative — ``transform(distinct,
    g -> size(filter(arr, = g)))`` — is O(distinct x n) AND Catalyst's
    project-collapse re-inlines the whole array expression at every lambda
    reference: measured 80x slower at sf0.1.

    The sort+fold is the one quality op heavy enough that its parallelism
    must not be pinned to the scan's split count — ``fan_out`` pays one
    cheap doc shuffle only when the input is under-parallel (a small-file
    artifact; a no-op at production split counts)."""
    from .scale import fan_out

    df = fan_out(df, key=id_col)
    t = tokens(text_col)
    n = F.size(t)

    def mode_count(arr: Column) -> Column:
        return F.aggregate(
            F.array_sort(arr),
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc.getField("prev"), acc.getField("run") + 1)
                .otherwise(F.lit(1).cast("long"))
                .alias("run"),
                F.greatest(
                    acc.getField("best"),
                    F.when(x == acc.getField("prev"), acc.getField("run") + 1).otherwise(
                        F.lit(1).cast("long")
                    ),
                ).alias("best"),
            ),
            lambda acc: acc.getField("best"),
        )

    grams = _bigrams(t)
    return df.select(
        id_col,
        (F.size(F.array_distinct(t)).cast("double") / n).alias("distinct_token_ratio"),
        (mode_count(t).cast("double") / n).alias("top_token_frac"),
        F.when(
            F.size(grams) > 0, mode_count(grams).cast("double") / F.size(grams)
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction: chained JVM-side ``regexp_replace`` over the pattern
    table, with a per-category match count (``regexp_extract_all`` + size)
    so the pipeline can report redaction rates per source. Adds
    ``redacted`` text and ``n_<category>`` counts."""
    out = F.col(text_col)
    counts = []
    for cat, (pat, repl) in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{cat}")
        )
        out = F.regexp_replace(out, pat, repl)
    return df.select(id_col, *counts, out.alias("redacted"))


# ------------------------------------------- character-LM quality scoring


def char_bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus character-bigram counts: one explode over character positions
    → one count shuffle. The model table is at most |alphabet|² rows —
    broadcastable at any corpus size (the CCNet/Gopher-style perplexity
    filter's statistics, with a char-bigram LM standing in for KenLM)."""
    pos = F.sequence(F.lit(0), F.greatest(F.length(text_col) - 2, F.lit(-1)))
    bg = df.select(
        F.explode(
            F.filter(
                F.transform(pos, lambda i: F.col(text_col).substr(i + 1, F.lit(2))),
                lambda s: F.length(s) == 2,
            )
        ).alias("bigram")
    )
    return bg.groupBy("bigram").agg(F.count(F.lit(1)).cast("long").alias("n"))


def char_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha_v: int = 256,
) -> DataFrame:
    """Per-document mean character-bigram log-likelihood under a Laplace-
    smoothed LM trained on the corpus itself — the classic LM quality
    signal: natural prose scores high, mojibake/boilerplate/random bytes
    score low. ln p(b|a) = ln((c(ab)+1) / (c(a·)+V)), V=``alpha_v``.

    Plan: ONE bigram explode feeding both the model (bigram-count shuffle;
    prefix counts derived by a window over it, not a second scan) and the
    per-doc means (doc-key shuffle); the model table joins back broadcast.
    The output is fixed-point BIGINT micro-units; ``sum_logp_micro`` sums
    per-bigram micro-rounded contributions (the BM25/TF-IDF fixed-point
    convention — order-independent, so the driver hash is immune to float
    summation order; it is what the registered query ``quality_char_lm``
    exposes), ``mean_logp_micro`` is the float mean for human use.
    """
    from pyspark.sql import Window

    pos = F.sequence(F.lit(0), F.greatest(F.length(text_col) - 2, F.lit(-1)))
    doc_bg = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.transform(pos, lambda i: F.col(text_col).substr(i + 1, F.lit(2))),
                lambda s: F.length(s) == 2,
            )
        ).alias("bigram"),
    )
    model = (
        doc_bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .withColumn(
            "n_a",
            F.sum("n_ab").over(Window.partitionBy(F.substring("bigram", 1, 1))).cast("long"),
        )
        .withColumn(
            "logp",
            F.log((F.col("n_ab") + 1).cast("double") / (F.col("n_a") + alpha_v)),
        )
    )
    scored = (
        doc_bg.join(F.broadcast(model.select("bigram", "logp")), "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg("logp") * 1_000_000).cast("long").alias("mean_logp_micro"),
            F.sum(F.round(F.col("logp") * 1_000_000).cast("long"))
            .cast("long")
            .alias("sum_logp_micro"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("mean_logp_micro", F.lit(0)).alias("mean_logp_micro"),
        F.coalesce("sum_logp_micro", F.lit(0).cast("long")).alias("sum_logp_micro"),
    )
