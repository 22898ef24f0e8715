"""LLM-pipeline queries, part 5 (round-3 continuation wave; ranked in
`plans/queries.py:_POST_BUDGET` behind the frozen 50-query driver backlog,
like llm_ops4's tail).

Determinism conventions as parts 3/4: integer arithmetic wherever a value
feeds the driver hash; models trained from fixed module-source seeds or the
gate corpus and shipped as literals to both engines; identical total-order
tie-breaks on every ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import langid as L
from ..sources.tables import load_tables
from .registry import query


def _langid_oracle() -> str:
    """DuckDB replay of the Cavnar-Trenkle classifier: identical
    normalization regex, trigram extraction, (count DESC, gram) doc
    ranking, profile literals, out-of-place distance, and first-achiever
    argmin."""
    prof_rows = ",\n      ".join(
        "('" + g.replace("'", "''") + "'," + ",".join(str(r) for r in ranks) + ")"
        for g, *ranks in (list(row) for row in L.profile_rows())
    )
    rank_cols = ", ".join(f"rank_{lang}" for lang in L.LANGS)
    dist_exprs = ",\n             ".join(
        f"CAST(SUM(ABS(rk - COALESCE(rank_{lang}, {L.MISS_PENALTY}))) AS BIGINT)"
        f" AS dist_{lang}"
        for lang in L.LANGS
    )
    least = "LEAST(" + ", ".join(f"dist_{lang}" for lang in L.LANGS) + ")"
    pred_case = (
        "CASE "
        + " ".join(
            f"WHEN dist_{lang} = {least} THEN '{lang}'" for lang in L.LANGS
        )
        + " END"
    )
    zero_dists = ", ".join(f"CAST(0 AS BIGINT) AS dist_{lang}" for lang in L.LANGS)
    return f"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS nrm
      FROM documents
    ), tri AS (
      SELECT doc_id, substr(nrm, CAST(i AS INTEGER), 3) AS gram
      FROM norm, LATERAL unnest(generate_series(1, len(nrm) - 2)) AS t(i)
      WHERE len(nrm) >= 3
    ), cnt AS (
      SELECT doc_id, gram, COUNT(*) AS cnt FROM tri GROUP BY doc_id, gram
    ), dp AS (
      SELECT doc_id, gram, rk FROM (
        SELECT doc_id, gram,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, gram) AS rk
        FROM cnt
      ) WHERE rk <= {L.DOC_K}
    ), prof(gram, {rank_cols}) AS (
      VALUES {prof_rows}
    ), dist AS (
      SELECT dp.doc_id,
             {dist_exprs}
      FROM dp LEFT JOIN prof USING (gram)
      GROUP BY dp.doc_id
    ), scored AS (
      SELECT doc_id, {', '.join('dist_' + lang for lang in L.LANGS)},
             {pred_case} AS pred_lang
      FROM dist
    ), missing AS (
      SELECT doc_id, {zero_dists}, 'unknown' AS pred_lang
      FROM norm WHERE len(nrm) < 3
    )
    SELECT * FROM scored
    UNION ALL
    SELECT * FROM missing
    ORDER BY doc_id
    """


@query("text_lang_id_ngram", oracle=_langid_oracle())
def text_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID (Cavnar-Trenkle rank-distance,
    operators/langid.py): out-of-place distance to each seed-trained
    language profile + first-achiever argmin — upgrade over the
    stopword-marker heuristic `text_lang_id`, all-integer so the driver
    hash checks real predictions. One doc-keyed explode/count/window +
    a broadcast profile join; geometry-bounded everywhere."""
    docs = load_tables(spark, sf_dir, "documents").documents
    return L.lang_id_ngram(docs)
