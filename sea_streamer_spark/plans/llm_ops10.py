"""Round-7 operator waves.

Wave 1 — the two curation gates every public LLM pipeline runs before
training (r6 judge tasks #1 and #6):

- ``quality_perplexity_buckets`` — CCNet-style perplexity quality
  filtering (Wenzek et al. arXiv:1911.00359): a Stupid-Backoff trigram LM
  (Brants et al. EMNLP 2007) trained distributed on the clean half of the
  corpus, every document scored in fixed-point integer log-space, then
  bucketed head/middle/tail by score tercile. The DuckDB oracle replays
  the exact backoff arithmetic end-to-end.
- ``curation_eval_decontaminate`` — benchmark decontamination by 13-gram
  overlap against a held-out eval set (the GPT-3 appendix-C / Llama-2
  rule): broadcast the eval set's n-grams, probe map-side, report the
  contaminated training docs.

House rules (llm_ops.py): integer fixed-point only, deterministic
ordering, every aggregate aliased identically in Spark and the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_tables
from .registry import query

#: Stupid Backoff discount (Brants et al. 2007 use 0.4 at every level).
_SB_ALPHA = 0.4

#: GPT-3/Llama decontamination gram size (13 consecutive tokens).
_DECON_K = 13


def _build_perplexity_oracle() -> str:
    """DuckDB replay of the full Stupid-Backoff pipeline: train counts on
    the even-doc_id half, score trigram positions of every doc, bucket by
    tercile. Arithmetic is kept operand-for-operand identical to the
    Spark side (CAST to DOUBLE before every divide, ln of the assembled
    score, micro-round per position, FLOOR of the mean for the tercile
    key)."""
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    ),
    train_uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
      FROM (SELECT unnest(t) AS w FROM toks WHERE doc_id % 2 = 0)
      GROUP BY w
    ),
    tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS v_size
      FROM train_uni
    ),
    train_bi AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2g FROM (
        SELECT t[i-1] AS w1, t[i] AS w2
        FROM (SELECT t, unnest(generate_series(2, len(t))) AS i
              FROM toks WHERE doc_id % 2 = 0)
      ) GROUP BY w1, w2
    ),
    train_tri AS (
      SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c3g FROM (
        SELECT t[i-2] AS w1, t[i-1] AS w2, t[i] AS w3
        FROM (SELECT t, unnest(generate_series(3, len(t))) AS i
              FROM toks WHERE doc_id % 2 = 0)
      ) GROUP BY w1, w2, w3
    ),
    pos3 AS (
      SELECT doc_id, t[i-2] AS w1, t[i-1] AS w2, t[i] AS w3
      FROM (SELECT doc_id, t, unnest(generate_series(3, len(t))) AS i
            FROM toks WHERE len(t) >= 3)
    ),
    scored_pos AS (
      SELECT p.doc_id,
        CASE
          WHEN tri.c3g IS NOT NULL
            THEN CAST(tri.c3g AS DOUBLE) / CAST(b12.c2g AS DOUBLE)
          WHEN b23.c2g IS NOT NULL
            THEN {_SB_ALPHA} * CAST(b23.c2g AS DOUBLE) / CAST(u2.c1 AS DOUBLE)
          ELSE {_SB_ALPHA} * {_SB_ALPHA}
               * CAST(COALESCE(u3.c1, 0) + 1 AS DOUBLE)
               / CAST(tot.n_total + tot.v_size AS DOUBLE)
        END AS s
      FROM pos3 p
      LEFT JOIN train_tri tri
        ON tri.w1 = p.w1 AND tri.w2 = p.w2 AND tri.w3 = p.w3
      LEFT JOIN train_bi b12 ON b12.w1 = p.w1 AND b12.w2 = p.w2
      LEFT JOIN train_bi b23 ON b23.w1 = p.w2 AND b23.w2 = p.w3
      LEFT JOIN train_uni u2 ON u2.w = p.w2
      LEFT JOIN train_uni u3 ON u3.w = p.w3
      CROSS JOIN tot
    ),
    doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
             CAST(SUM(CAST(ROUND(ln(s) * 1000000.0) AS BIGINT)) AS BIGINT)
               AS sum_logp_micro
      FROM scored_pos GROUP BY doc_id
    ),
    ranked AS (
      SELECT doc_id, n_scored, sum_logp_micro,
             NTILE(3) OVER (
               ORDER BY CAST(FLOOR(sum_logp_micro * 1.0 / n_scored) AS BIGINT)
                 DESC, doc_id
             ) AS nt
      FROM doc
    )
    SELECT doc_id, n_scored, sum_logp_micro,
           CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS ppl_bucket
    FROM ranked ORDER BY doc_id
    """


@query(
    "quality_perplexity_buckets",
    oracle=_build_perplexity_oracle(),
    tags=("llm", "quality"),
)
def quality_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity quality filter (Wenzek et al.
    arXiv:1911.00359 §4.3): train a Stupid-Backoff trigram LM (Brants et
    al. EMNLP 2007 — S(w3|w1w2) = c123/c12, backing off through
    0.4·c23/c2 to a Laplace unigram floor 0.16·(c3+1)/(N+V)) on the
    clean half of the corpus (even doc_id — CCNet's Wikipedia proxy),
    score EVERY document's full-context trigram positions in fixed-point
    micro log-space, and bucket head/middle/tail by mean-score tercile —
    the gate that decides which third of a crawl is worth training on.

    Plan, 100 TB-first: the trainer IS three aggregations (uni/bi/tri
    count tables — map-side-partial combine, never a collect; the
    production path prunes low-count tails before the join, same shape).
    Scoring is a chain of keyed LEFT equi-joins from the position
    relation to the count tables — heavy-hitter context keys (stopwords)
    are exactly what AQE skew-join splits. Per-position log-probs are
    micro-rounded BEFORE the per-doc sum (order-independent, hash-stable
    under any partitioning). The tercile NTILE runs over the DOCUMENTS
    dimension only (one narrow row per doc, the customer_spend_quartiles
    posture), never over token positions; at production scale CCNet
    replaces it with fixed thresholds from a calibration sample — the
    bucket rule is one comparison either way."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ..operators.dedup import positional_shingles
    from ..operators.text import tokens

    docs = load_tables(spark, sf_dir, "documents").documents
    train = docs.filter(F.col("doc_id") % 2 == 0)

    uni = (
        train.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    totals = uni.agg(
        F.sum("c1").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("v_size"),
    )

    # n-gram relations via the shingle-array build (zip_with folds over
    # shifted slices, operators/dedup._shingle_array) — NOT element_at
    # over an exploded position index, which Catalyst's project-collapse
    # re-inlines into a per-position re-tokenize (the O(k*n^2) trap the
    # _shingle_array docstring documents; measured as a sweep timeout on
    # the first draft of this query). Tokens contain no whitespace (the
    # \\s+ split guarantees it), so the space-joined gram string is an
    # injective key: joining on "w1 w2 w3" == joining on (w1, w2, w3).
    bi = (
        positional_shingles(train, k=2)
        .groupBy("sh")
        .agg(F.count(F.lit(1)).cast("long").alias("c2g"))
    )
    tri = (
        positional_shingles(train, k=3)
        .groupBy("sh")
        .agg(F.count(F.lit(1)).cast("long").alias("c3g"))
    )

    # One row per full-context trigram position of EVERY doc; the backoff
    # keys (prefix/suffix bigram, unigrams) are rebuilt by splitting the
    # gram string — an exact roundtrip of the zip_with space-join.
    pos3 = (
        positional_shingles(docs, k=3)
        .select("doc_id", F.split("sh", " ").alias("ws"), F.col("sh").alias("g3"))
        .select(
            "doc_id",
            "g3",
            F.array_join(F.slice("ws", 1, 2), " ").alias("g12"),
            F.array_join(F.slice("ws", 2, 2), " ").alias("g23"),
            F.element_at("ws", 2).alias("w2"),
            F.element_at("ws", 3).alias("w3"),
        )
    )
    j = (
        pos3.join(tri.withColumnRenamed("sh", "g3"), "g3", "left")
        .join(
            bi.select(F.col("sh").alias("g12"), F.col("c2g").alias("c12")),
            "g12",
            "left",
        )
        .join(
            bi.select(F.col("sh").alias("g23"), F.col("c2g").alias("c23")),
            "g23",
            "left",
        )
        .join(uni.select(F.col("w").alias("w2"), F.col("c1").alias("c2")), "w2", "left")
        .join(uni.select(F.col("w").alias("w3"), F.col("c1").alias("c3")), "w3", "left")
        .crossJoin(F.broadcast(totals))
    )
    s = (
        F.when(
            F.col("c3g").isNotNull(),
            F.col("c3g").cast("double") / F.col("c12").cast("double"),
        )
        .when(
            F.col("c23").isNotNull(),
            F.lit(_SB_ALPHA) * F.col("c23").cast("double") / F.col("c2").cast("double"),
        )
        .otherwise(
            F.lit(_SB_ALPHA * _SB_ALPHA)
            * (F.coalesce(F.col("c3"), F.lit(0)) + 1).cast("double")
            / (F.col("n_total") + F.col("v_size")).cast("double")
        )
    )
    doc = (
        j.select("doc_id", F.round(F.log(s) * 1_000_000).cast("long").alias("lp_micro"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored"),
            F.sum("lp_micro").cast("long").alias("sum_logp_micro"),
        )
    )
    mean_key = F.floor(F.col("sum_logp_micro") * 1.0 / F.col("n_scored")).cast("long")
    w = Window.orderBy(mean_key.desc(), F.col("doc_id"))
    nt = F.ntile(3).over(w)
    return (
        doc.select(
            "doc_id",
            "n_scored",
            "sum_logp_micro",
            F.when(nt == 1, "head").when(nt == 2, "middle").otherwise("tail")
            .alias("ppl_bucket"),
        )
        .orderBy("doc_id")
    )


@query(
    "curation_eval_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, i,
             list_aggregate(t[i:i+{_DECON_K}-1], 'string_agg', ' ') AS g
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-{_DECON_K}+1)) AS i
            FROM toks WHERE len(t) >= {_DECON_K})
    ),
    ev AS (SELECT DISTINCT g, doc_id AS eval_doc FROM grams WHERE doc_id % 10 = 7),
    tr AS (SELECT doc_id, i, g FROM grams WHERE doc_id % 10 <> 7),
    hits AS (
      SELECT tr.doc_id,
             CAST(COUNT(DISTINCT tr.i) AS BIGINT) AS hit_positions,
             CAST(COUNT(DISTINCT ev.eval_doc) AS BIGINT) AS n_eval_docs
      FROM tr JOIN ev USING (g)
      GROUP BY tr.doc_id
    ),
    sizes AS (
      SELECT doc_id, CAST(len(t) - {_DECON_K} + 1 AS BIGINT) AS n_grams
      FROM toks WHERE len(t) >= {_DECON_K} AND doc_id % 10 <> 7
    )
    SELECT h.doc_id, s.n_grams, h.hit_positions, h.n_eval_docs,
           CAST(FLOOR(1000.0 * h.hit_positions / s.n_grams) AS BIGINT)
             AS contam_permille
    FROM hits h JOIN sizes s USING (doc_id)
    ORDER BY h.doc_id
    """,
    tags=("llm", "curation"),
)
def curation_eval_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / Llama-2 13-gram
    rule): a training document is contaminated when any 13 consecutive
    tokens also appear in the held-out eval set (docs with doc_id % 10 =
    7 stand in for the benchmark). Reports, per contaminated doc, its
    gram count, how many gram positions hit, how many distinct eval docs
    it collides with, and the contamination permille — the audit table a
    pipeline publishes before every training run.

    Plan, 100 TB-first: the eval side of the join is the BENCHMARK, not
    the corpus — thousands of docs, a bounded distinct (gram, eval_doc)
    relation — so it is built once and broadcast; the corpus side is a
    map-side probe of its positional 13-grams with NO shuffle of corpus
    text (the per-doc aggregation shuffles only hit rows, whose volume
    is bounded by eval-set size × duplication, never corpus size). The
    production swap is gram → 64-bit hash pair to shrink the broadcast;
    exact strings keep the oracle comparison collision-free here."""
    from pyspark.sql import functions as F

    from ..operators.dedup import positional_shingles
    from ..operators.text import tokens

    k = _DECON_K
    docs = load_tables(spark, sf_dir, "documents").documents
    # Shingle-array build (zip_with folds), not slice-after-explode —
    # the O(k*n^2) element_at re-inlining trap (see _shingle_array).
    grams = positional_shingles(docs, k=k)
    ev = (
        grams.filter(F.col("doc_id") % 10 == 7)
        .select(F.col("sh").alias("g"), F.col("doc_id").alias("eval_doc"))
        .distinct()
    )
    tr = grams.filter(F.col("doc_id") % 10 != 7).withColumnRenamed("sh", "g")
    hits = (
        tr.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("pos").cast("long").alias("hit_positions"),
            F.countDistinct("eval_doc").cast("long").alias("n_eval_docs"),
        )
    )
    sizes = docs.filter(F.col("doc_id") % 10 != 7).select(
        "doc_id", (F.size(tokens("text")) - k + 1).cast("long").alias("n_grams")
    ).filter(F.col("n_grams") >= 1)
    return (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "hit_positions",
            "n_eval_docs",
            F.floor(F.lit(1000.0) * F.col("hit_positions") / F.col("n_grams"))
            .cast("long")
            .alias("contam_permille"),
        )
        .orderBy("doc_id")
    )
