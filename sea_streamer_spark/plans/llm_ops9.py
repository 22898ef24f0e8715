"""Round-6 operator wave 1: exact-substring dedup at suffix-array grain.

- ``dedup_exact_substring_spans`` — the reference-quality finisher of the
  Lee et al. exact-substring family (r5 judge task #7): extract every
  MAXIMAL duplicated token span of length >= L, with provably exact
  boundaries, so removal can cut at duplication edges instead of k-gram
  granularity. The spans themselves are the deliverable (start, length,
  weakest corpus-wide occurrence count, md5 of the span text) — the
  artifact a 100 TB dedup pass persists and audits.

House rules (llm_ops.py): integer fixed-point only, deterministic
ordering, every aggregate aliased identically in Spark and the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_tables
from .registry import query

#: Lee et al. use 50 BPE tokens as the duplication threshold; 10 words is
#: the analogous grain for the synthetic corpus (which carries ~1k
#: duplicated 10-grams at every sf, so the query is non-trivial at all
#: test scales).
_SPAN_L = 10


@query(
    "dedup_exact_substring_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS tk FROM documents
    ), sh AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+{_SPAN_L - 1}], ' ') AS sh
      FROM toks, unnest(generate_series(1, len(tk) - {_SPAN_L - 1})) AS u(i)
      WHERE len(tk) >= {_SPAN_L}
    ), dup AS (
      SELECT sh, COUNT(*) AS n_occ FROM sh GROUP BY sh HAVING COUNT(*) >= 2
    ), starts AS (
      SELECT s.doc_id, s.pos, d.n_occ FROM sh s JOIN dup d USING (sh)
    ), isl AS (
      SELECT doc_id, pos, n_occ,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM starts
    ), spans AS (
      SELECT doc_id, MIN(pos) AS span_start,
             MAX(pos) + {_SPAN_L - 1} AS span_end,
             CAST(MIN(n_occ) AS BIGINT) AS n_occ_min
      FROM isl GROUP BY doc_id, grp
    )
    SELECT s.doc_id,
           CAST(s.span_start AS BIGINT) AS span_start,
           CAST(s.span_end - s.span_start + 1 AS BIGINT) AS span_len,
           s.n_occ_min,
           md5(array_to_string(t.tk[s.span_start + 1 : s.span_end + 1], ' '))
             AS span_fp
    FROM spans s JOIN toks t USING (doc_id)
    ORDER BY s.doc_id, s.span_start
    """,
    tags=("llm", "dedup"),
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-span extraction at suffix-array grain (Lee et
    al. arXiv:2107.06499's suffix-array half, which the k=3-gram coverage
    queries approximate at k-gram grain): every maximal run of positions
    whose L=10-gram occurs >= 2 times corpus-wide is one span — it cannot
    extend left or right because the flanking L-gram is NOT duplicated
    and any longer substring would contain it. One map-side-partial
    L-gram count + salted join-back + a per-doc gaps-and-islands window
    over duplicated start positions only (operators/dedup.py
    maximal_duplicate_spans; volume scales with duplicated text, never
    corpus²). tests/test_dedup_spans.py proves boundary exactness on a
    crafted corpus, including the adjacent-self-repeat case where the
    wrap-around grams are unique so the two copies correctly do NOT
    merge."""
    from ..operators.dedup import maximal_duplicate_spans

    docs = load_tables(spark, sf_dir, "documents").documents
    return maximal_duplicate_spans(docs, min_len=_SPAN_L).orderBy(
        "doc_id", "span_start"
    )


@query(
    "dedup_span_removal_exact",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS tk FROM documents
    ), sh AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+{_SPAN_L - 1}], ' ') AS sh
      FROM toks, unnest(generate_series(1, len(tk) - {_SPAN_L - 1})) AS u(i)
      WHERE len(tk) >= {_SPAN_L}
    ), dup AS (
      SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) >= 2
    ), cov AS (
      SELECT DISTINCT doc_id, idx FROM (
        SELECT s.doc_id, s.pos + unnest(generate_series(0, {_SPAN_L - 1})) AS idx
        FROM sh s JOIN dup USING (sh)
      )
    ), tp AS (
      SELECT t.doc_id, i - 1 AS idx, t.tk[i] AS tok
      FROM toks t, unnest(generate_series(1, len(t.tk))) AS u(i)
    ), kept AS (
      SELECT tp.doc_id, tp.idx, tp.tok
      FROM tp LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.idx = tp.idx
      WHERE cov.doc_id IS NULL
    ), rebuilt AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             md5(string_agg(tok, ' ' ORDER BY idx)) AS clean_fp
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.tk) AS BIGINT) AS n_tokens,
           CAST(len(t.tk) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(r.clean_fp, md5('')) AS clean_fp
    FROM toks t LEFT JOIN rebuilt r USING (doc_id)
    ORDER BY t.doc_id
    """,
    tags=("llm", "dedup"),
)
def dedup_span_removal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span removal at EXACT duplication boundaries — the cut
    ``dedup_span_removal`` (k=3-gram grain, removes any token under a
    duplicated 3-gram) was always meant to converge to: only tokens
    inside a maximal duplicated span of length >= L=10 are removed, so
    short incidental 3-gram echoes survive and long boilerplate is cut
    precisely at its edges (Lee et al. arXiv:2107.06499 §4.1 semantics —
    their suffix-array threshold, here the L-gram island equivalent).
    Plan: the maximal_duplicate_spans relation (map-side-partial count +
    salted join-back + per-doc islands) exploded back to covered (doc,
    idx) pairs, one (doc, idx)-keyed anti-join, one doc-keyed positional
    reassembly — identical economics to dedup_span_removal with the
    grain knob moved from 3 to 10. The driver hash-checks every
    rewritten document byte-for-byte (md5 of the rebuilt text)."""
    from pyspark.sql import functions as F

    from ..operators.dedup import maximal_duplicate_spans
    from ..operators.text import tokens

    docs = load_tables(spark, sf_dir, "documents").documents
    spans = maximal_duplicate_spans(docs, min_len=_SPAN_L)
    covered = spans.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.col("span_start"),
                F.col("span_start") + F.col("span_len") - 1,
            )
        ).alias("idx"),
    ).distinct()
    toks_pos = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("idx", "tok")
    )
    kept = toks_pos.join(covered, ["doc_id", "idx"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            )
        ).alias("clean_fp"),
    )
    base = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    return (
        base.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("clean_fp"), F.md5(F.lit(""))).alias("clean_fp"),
        )
        .orderBy("doc_id")
    )
