"""Round-9 operator waves.

Wave 1 — SemDeDup-style semantic (embedding-cluster) dedup (r8 judge task
#3: "the one missing dedup modality"): cluster embeddings with the
k-means/IVF coarse quantizer that already powers the ANN queries, then
drop within-cluster near-duplicates by cosine above threshold, keeping
one representative per duplicate group — Abbas et al., "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication"
(arXiv:2303.09540). Two queries:

- ``dedup_semantic_cluster`` — the operator: per vector, its cell, its
  micro-rounded cosine-to-centroid, and the keep/drop verdict. The
  representative that survives a duplicate group is the member with the
  LOWEST cosine to its centroid (the paper's choice — keeping the
  cluster's outliers preserves diversity), tie-broken by vec_id.
- ``dedup_semantic_recall_eval`` — the calibration row (the
  dedup_winnowing_recall_eval posture): recall/precision of the
  cluster-bucketed candidate pairs against the EXACT all-pairs cosine
  truth (recall measures what cell-splitting loses — SemDeDup's actual
  approximation), plus the overlap between semantically-dropped docs and
  exact-Jaccard(≥0.5) text near-dup membership. On this corpus the
  embeddings are synthetic and do NOT track text similarity — the
  overlap column measures (and is expected to show) exactly that;
  nothing here is pinned, the oracle recomputes every side.

House rules (llm_ops.py): integer fixed-point for every ranked
comparison (one float — the cosine — then micro-rounding), deterministic
tie-breaks, every aggregate aliased identically in Spark and the oracle.

Reference basis: the reference engine (sea-streamer, Rust) has no ops
layer — this family exists for the 100 TB training-data pipeline
mandate, not for parity with a reference file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..operators import text as T
from ..sources.tables import load_tables
from .llm_ops import DUCK_SHINGLE_SETS, _duck_cosine, cell_structs_sql, lit_vec
from .llm_ops3 import _SEM_CELLS, _SEM_THRESHOLD
from .registry import query

# ---------------------------------------------------------------- wave 1
# SemDeDup. The quantizer, cell-assignment SQL and 0.45 threshold are
# single-sourced with dedup_semantic_ivf (llm_ops3) so the two semantic
# queries can never disagree about what a cell or a near-dup is.


def _semantic_scored(
    spark: SparkSession, sf_dir: str, n_cells: int = _SEM_CELLS
) -> DataFrame:
    """(vec_id, embedding, cell, cos_c_micro): cell assignment is the
    map-side argmax projection (never shuffles); the cosine-to-centroid
    rides in on a broadcast join against the n_cells-row centroid table,
    then micro-rounds to a BIGINT — the ONE float op, rounded per row
    before any cross-row comparison (the one-float-then-fixed-point
    rule). ``n_cells`` defaults to the gate-pinned 16 (llm_ops3); the
    round-10 scale-aware variant (llm_ops14) passes the
    ``semantic_cells_for`` rung instead."""
    from .llm_ops import gate_ivf_centroids

    from ..operators.scale import fan_out

    t = load_tables(spark, sf_dir, "embeddings")
    cents = gate_ivf_centroids(n_cells=n_cells)
    if cents is None:
        cents = S.ivf_centroids(t.embeddings, n_cells=n_cells)
    cent_df = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in cents],
        "cell long, cvec array<double>",
    )
    # r12: fan_out before the argmax projection — the n_cells × dim
    # distance fold is the expensive per-row stage, and the embeddings
    # scan is one small-file split locally, so without the fan-out the
    # whole quantization ran in a single task (guide §2.5 input-parallelism
    # note; no-op at production scale where splits ≫ cores).
    assigned = fan_out(t.embeddings, key="vec_id").select(
        "vec_id", "embedding", S.ivf_cell_expr(cents).alias("cell")
    )
    return assigned.join(F.broadcast(cent_df), "cell").select(
        "vec_id",
        "embedding",
        "cell",
        F.floor(
            S.cosine(F.col("embedding"), F.col("cvec")) * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cos_c_micro"),
    )


def _semantic_dropped(scored: DataFrame) -> DataFrame:
    """vec_ids that lose to a better-ranked same-cell near-duplicate.

    A vector is dropped iff some same-cell neighbor with cosine ≥ the
    threshold ranks STRICTLY better — rank = (cos_c_micro ASC, vec_id
    ASC), so exactly one member of every duplicate group survives and
    it is the least-central one (SemDeDup's keep-the-outlier rule). The
    join is cell-keyed (equi-join on cell, never all-pairs); candidate
    volume is Σ cell_pop² — at production scale the cell count is the
    knob (thousands of cells keeps populations √N-ish), here it is the
    gate-pinned 16-cell quantizer shared with the ANN queries.

    r12: per-vector norms are precomputed ONCE before the pair join —
    ``S.cosine`` per candidate pair is 3 array folds (dot + both
    norms); hoisting ``nrm = sqrt(dot(v, v))`` to a projection makes it
    1 fold per pair. Bit-identical (the r9 recall_eval precedent,
    pinned by test_exact_cosine_pairs_matches_jvm_fold's fold-equality
    family): the norm VALUE is the same double (same fold), and the
    comparison keeps cosine's ``dot / (na * nb)`` association."""
    s = scored.withColumn(
        "nrm", F.sqrt(S.dot(F.col("embedding"), F.col("embedding")))
    )
    a, b = s.alias("a"), s.alias("b")
    better = (F.col("b.cos_c_micro") < F.col("a.cos_c_micro")) | (
        (F.col("b.cos_c_micro") == F.col("a.cos_c_micro"))
        & (F.col("b.vec_id") < F.col("a.vec_id"))
    )
    cos_ab = S.dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(b, (F.col("a.cell") == F.col("b.cell")) & better)
        .filter(cos_ab >= F.lit(_SEM_THRESHOLD))
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )


def _semantic_scored_sql(n_cells: int = _SEM_CELLS) -> str:
    """The shared oracle CTE chain (cent → assigned → scored) — cell
    assignment SQL single-sourced via cell_structs_sql, centroid literals
    via the same gate-pinned quantizer the Spark side uses."""
    from .llm_ops import oracle_ivf_centroids

    C = oracle_ivf_centroids(n_cells=n_cells, iters=8)
    if C is None:  # gate data absent: oracle never runs, placeholder
        return "cent(cell, cvec) AS (VALUES (0, [0.0]))," \
               " assigned AS (SELECT 0 AS vec_id, [0.0] AS embedding, 0 AS cell)," \
               " scored AS (SELECT 0 AS vec_id, [0.0] AS embedding," \
               " 0 AS cell, 0 AS cos_c_micro)"
    cent_rows = ", ".join(
        f"({i}, {lit_vec(C[i])})" for i in range(len(C))
    )
    structs = cell_structs_sql(C)
    return f"""cent(cell, cvec) AS (VALUES {cent_rows}),
    assigned AS (
      SELECT vec_id, embedding,
             CAST(-(list_aggregate([{structs}], 'max').negcell) AS BIGINT)
               AS cell
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, a.embedding, a.cell,
             CAST(FLOOR({_duck_cosine('a.embedding', 'c.cvec')} * 1000000
                        + 0.5) AS BIGINT) AS cos_c_micro
      FROM assigned a JOIN cent c ON c.cell = a.cell
    )"""


_SEM_BETTER = (
    "(b.cos_c_micro < a.cos_c_micro OR "
    "(b.cos_c_micro = a.cos_c_micro AND b.vec_id < a.vec_id))"
)


def _build_semantic_cluster_oracle() -> str:
    return f"""
    WITH {_semantic_scored_sql()}
    SELECT a.vec_id, a.cell, a.cos_c_micro,
           NOT EXISTS (
             SELECT 1 FROM scored b
             WHERE b.cell = a.cell AND {_SEM_BETTER}
               AND {_duck_cosine('a.embedding', 'b.embedding')}
                   >= {_SEM_THRESHOLD}
           ) AS kept
    FROM scored a
    ORDER BY vec_id
    """


@query(
    "dedup_semantic_cluster",
    oracle=_build_semantic_cluster_oracle(),
    tags=("llm", "dedup", "similarity"),
)
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): k-means-cell-bucketed semantic dedup
    with keep-one-representative. Every vector gets its cell (map-side
    argmax against broadcast centroid literals — zero shuffle), its
    micro-rounded cosine-to-centroid (broadcast join against the 16-row
    centroid table), and a verdict: dropped iff a same-cell neighbor
    with cosine ≥ 0.45 ranks strictly better (lower cos_c_micro, then
    lower vec_id) — so each duplicate group keeps exactly its
    least-central member, the paper's diversity-preserving choice.
    Candidate pairs are bounded by cell population (the cluster-pruned
    shape that makes this feasible where all-pairs is quadratic);
    deterministic end-to-end, so the oracle value-hash checks it
    exactly at every sf (gate-pinned quantizer, llm_ops3 convention)."""
    scored = _semantic_scored(spark, sf_dir)
    dropped = _semantic_dropped(scored)
    return (
        scored.join(dropped.withColumn("hit", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            "cos_c_micro",
            F.coalesce(~F.col("hit"), F.lit(True)).alias("kept"),
        )
        .orderBy("vec_id")
    )


def _build_semantic_recall_oracle() -> str:
    return f"""
    WITH {DUCK_SHINGLE_SETS},
    {_semantic_scored_sql()},
    sem_pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM scored a JOIN scored b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {_duck_cosine('a.embedding', 'b.embedding')} >= {_SEM_THRESHOLD}
    ),
    true_pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM assigned a JOIN assigned b ON a.vec_id < b.vec_id
      WHERE {_duck_cosine('a.embedding', 'b.embedding')} >= {_SEM_THRESHOLD}
    ),
    dropped AS (
      SELECT a.vec_id FROM scored a
      WHERE EXISTS (
        SELECT 1 FROM scored b
        WHERE b.cell = a.cell AND {_SEM_BETTER}
          AND {_duck_cosine('a.embedding', 'b.embedding')}
              >= {_SEM_THRESHOLD}
      )
    ),
    exact AS (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM ds a JOIN ds b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) p
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
    ),
    jdocs AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM exact
        UNION ALL SELECT doc_b FROM exact
      )
    ),
    m AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM true_pairs) AS t,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM sem_pairs) AS s,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM sem_pairs JOIN true_pairs USING (va, vb)) AS c,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM dropped) AS d,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM jdocs) AS j,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM dropped JOIN jdocs ON vec_id = doc_id) AS o
    )
    SELECT t AS n_true_pairs, s AS n_sem_pairs, c AS n_common,
           CAST(CASE WHEN t > 0 THEN 1000 * c // t ELSE 1000 END AS BIGINT)
             AS recall_permille,
           CAST(CASE WHEN s > 0 THEN 1000 * c // s ELSE 1000 END AS BIGINT)
             AS precision_permille,
           d AS n_sem_dropped, j AS n_jaccard_dup_docs, o AS n_overlap_docs
    FROM m
    """


@query(
    "dedup_semantic_recall_eval",
    oracle=_build_semantic_recall_oracle(),
    tags=("llm", "dedup", "eval"),
)
def dedup_semantic_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall/precision of SemDeDup's cluster-bucketed candidate
    pairs against the EXACT all-pairs cosine-≥-threshold truth — recall
    quantifies what cell-splitting loses (a true near-dup pair lands in
    two different cells and is never compared; the paper accepts this as
    the price of tractability), precision is structurally 1000: every
    candidate is verified by the bit-identical cosine, so sem_pairs is
    exactly truth ∩ same-cell — derived that way (r12), with the
    independent oracle recomputing both sides as the honest check.
    The second half measures agreement with TEXT ground truth: dropped
    vec_ids vs membership in an exact Jaccard-≥0.5 near-dup pair — on
    this corpus the synthetic embeddings don't track text similarity,
    and the overlap column says so with a number instead of a claim.
    All-pairs truth is quadratic BY DESIGN (it is the eval's ground
    truth, same as dedup_lsh_recall_eval); the operator itself never
    leaves cell-bucketed joins."""
    from ..operators import dedup as D

    # Truth side via the blocked numpy tile sweep (r9 VERDICT task #4:
    # the JVM all-pairs fold was 54 s at sf0.1 — 62% of the new_ops
    # bench wall). exact_cosine_pairs accumulates dots and norms one
    # dimension at a time (the identical left fold), so every cosine is
    # bit-identical to the JVM per-pair fold and to the oracle; pinned
    # by tests/test_llm_ops14.py::test_exact_cosine_pairs_matches_jvm_
    # fold.
    #
    # r12 restructure (guide §8: decide with small rows): the previous
    # shape ALSO paid two Σ pop_c² cell-bucketed joins with a per-pair
    # JVM cosine fold (sem_pairs + _semantic_dropped) — recomputing
    # cosines the truth side had already computed for every one of those
    # pairs. Because a same-cell pair with cosine ≥ t is BY DEFINITION a
    # truth pair (bit-identical cosine, pinned above), sem_pairs ==
    # truth ∩ same-cell, and the dropped set is exactly the worse-ranked
    # endpoint ((cos_c_micro ASC, vec_id ASC) — _SEM_BETTER) of each
    # same-cell truth pair. Both now derive from the truth table via
    # vec_id-keyed equi-joins against the 1-row-per-vector cell/rank
    # metadata: zero quadratic JVM work, and the six driver count()
    # actions fuse into two aggregates (13.1 s → measured in
    # OPTIMIZATION_r12.md). n_common == n_sem by the same set inclusion
    # (the old join-count, retained as an identity); the oracle still
    # computes every side independently, so the cross-engine equality
    # remains the honest check.
    t = load_tables(spark, sf_dir, "documents", "embeddings")
    truth_df, _n = S.exact_cosine_pairs_n(t.embeddings, _SEM_THRESHOLD)
    truth = truth_df.select(
        F.col("id_a").alias("va"), F.col("id_b").alias("vb")
    )
    meta = _semantic_scored(spark, sf_dir).select(
        "vec_id", "cell", "cos_c_micro"
    )
    ma = meta.select(
        F.col("vec_id").alias("va"),
        F.col("cell").alias("cell_a"),
        F.col("cos_c_micro").alias("mu_a"),
    )
    mb = meta.select(
        F.col("vec_id").alias("vb"),
        F.col("cell").alias("cell_b"),
        F.col("cos_c_micro").alias("mu_b"),
    )
    ann = (
        truth.join(ma, "va")
        .join(mb, "vb")
        .select(
            "va",
            "vb",
            (F.col("cell_a") == F.col("cell_b")).alias("same_cell"),
            # the worse-ranked endpoint (the one _SEM_BETTER drops):
            # va < vb always, so ties on cos_c_micro drop vb.
            F.when(
                (F.col("mu_a") < F.col("mu_b"))
                | (
                    (F.col("mu_a") == F.col("mu_b"))
                    & (F.col("va") < F.col("vb"))
                ),
                F.col("vb"),
            )
            .otherwise(F.col("va"))
            .alias("worse"),
        )
        .cache()
    )
    try:
        agg = ann.agg(
            F.count(F.lit(1)).cast("long").alias("t"),
            F.sum(F.when(F.col("same_cell"), 1).otherwise(0))
            .cast("long")
            .alias("s"),
        ).collect()[0]
        n_true, n_sem = int(agg["t"] or 0), int(agg["s"] or 0)
        n_common = n_sem  # sem_pairs ⊆ true_pairs (set inclusion above)
        dropped = (
            ann.filter("same_cell")
            .select(F.col("worse").alias("doc_id"))
            .distinct()
        )
        jpairs = D.jaccard_pairs(t.documents, threshold=0.5).select(
            "doc_a", "doc_b"
        )
        jdocs = (
            jpairs.select(F.col("doc_a").alias("doc_id"))
            .unionAll(jpairs.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        # one full-outer join aggregates the three remaining counts in a
        # single job (dropped / jaccard-dup docs / their overlap)
        ov = dropped.withColumn("d", F.lit(1)).join(
            jdocs.withColumn("j", F.lit(1)), "doc_id", "full_outer"
        )
        row = ov.agg(
            F.sum(F.coalesce(F.col("d"), F.lit(0))).cast("long").alias("nd"),
            F.sum(F.coalesce(F.col("j"), F.lit(0))).cast("long").alias("nj"),
            F.sum(
                F.when(F.col("d").isNotNull() & F.col("j").isNotNull(), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("no"),
        ).collect()[0]
        n_dropped = int(row["nd"] or 0)
        n_jdocs = int(row["nj"] or 0)
        n_overlap = int(row["no"] or 0)
    finally:
        ann.unpersist()
    recall = (1000 * n_common) // n_true if n_true else 1000
    precision = (1000 * n_common) // n_sem if n_sem else 1000
    return spark.createDataFrame(
        [
            (
                n_true,
                n_sem,
                n_common,
                recall,
                precision,
                n_dropped,
                n_jdocs,
                n_overlap,
            )
        ],
        "n_true_pairs long, n_sem_pairs long, n_common long, "
        "recall_permille long, precision_permille long, "
        "n_sem_dropped long, n_jaccard_dup_docs long, n_overlap_docs long",
    )


# ---------------------------------------------------------------- wave 2
# Readability scoring (Flesch reading-ease / Flesch-Kincaid grade) — the
# classic text-quality covariate a curation stack reports beside the
# Gopher gates (Flesch 1948; Kincaid et al. 1975). Counts are integers
# (words, sentence-terminator runs, vowel-group syllable heuristic with
# the standard >=1-per-word floor); the two formulas are evaluated once
# per SOURCE over pooled integer sums with identical double arithmetic
# in both engines, then milli-floored — the one-float-then-fixed-point
# rule. On this synthetic corpus no document carries sentence
# terminators, so sentences degenerate to one per document (stated here,
# measured by the n_sentences == n_docs column equality, and harmless:
# the operator is the deliverable, the corpus is the fixture).


@query(
    "text_readability_scores",
    oracle="""
    WITH per_doc AS (
      SELECT source,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  w -> len(w) > 0)) AS BIGINT) AS n_words,
             CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sentences,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(
                      list_filter(string_split_regex(lower(text), '\\s+'),
                                  w -> len(w) > 0),
                      w -> CAST(GREATEST(
                             len(regexp_extract_all(w, '[aeiouy]+')), 1)
                           AS BIGINT))),
                    (a, b) -> a + b) AS BIGINT) AS n_syllables
      FROM documents
    ),
    pooled AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_words) AS BIGINT) AS n_words,
             CAST(SUM(n_sentences) AS BIGINT) AS n_sentences,
             CAST(SUM(n_syllables) AS BIGINT) AS n_syllables
      FROM per_doc GROUP BY source
    )
    SELECT source, n_docs, n_words, n_sentences, n_syllables,
           CAST(FLOOR(390.0 * n_words / n_sentences
                      + 11800.0 * n_syllables / n_words
                      - 15590.0) AS BIGINT) AS fk_grade_milli,
           CAST(FLOOR(206835.0 - 1015.0 * n_words / n_sentences
                      - 84600.0 * n_syllables / n_words) AS BIGINT)
             AS fre_milli
    FROM pooled ORDER BY source
    """,
    tags=("llm", "text", "quality"),
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per source, pooled:
    FK = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59,
    FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    both reported milli-floored. Syllables use the vowel-group heuristic
    (runs of [aeiouy], floored at 1 per word — the standard public
    approximation); sentences are terminator runs ([.!?]+), floored at 1
    per document. Pure projection + one groupBy(source): two map-side
    aggregable sums, no joins, no Python — the shape survives any corpus
    size (the formulas touch only the 20-row pooled relation)."""
    t = load_tables(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda w: F.length(w) > 0
    )
    syl = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(F.regexp_count(w, F.lit("[aeiouy]+")), F.lit(1)).cast(
            "long"
        ),
    )
    per_doc = t.documents.select(
        "source",
        F.size(words).cast("long").alias("n_words"),
        F.greatest(F.regexp_count("text", F.lit("[.!?]+")), F.lit(1))
        .cast("long")
        .alias("n_sentences"),
        syl.alias("n_syllables"),
    )
    pooled = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_sentences").cast("long").alias("n_sentences"),
        F.sum("n_syllables").cast("long").alias("n_syllables"),
    )
    w_s = F.lit(390.0) * F.col("n_words") / F.col("n_sentences")
    y_w = F.lit(11800.0) * F.col("n_syllables") / F.col("n_words")
    fre = (
        F.lit(206835.0)
        - F.lit(1015.0) * F.col("n_words") / F.col("n_sentences")
        - F.lit(84600.0) * F.col("n_syllables") / F.col("n_words")
    )
    return pooled.select(
        "source",
        "n_docs",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.floor(w_s + y_w - F.lit(15590.0)).cast("long").alias("fk_grade_milli"),
        F.floor(fre).cast("long").alias("fre_milli"),
    ).orderBy("source")


# ---------------------------------------------------------------- wave 3
# t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) — completes the
# privacy-audit trio beside privacy_k_anonymity and privacy_l_diversity:
# a QI class can be k-large and l-diverse yet still leak when its
# SENSITIVE-attribute distribution differs sharply from the table-wide
# one. For an ORDERED sensitive attribute the paper's distance is the
# ordered EMD = (1/(m-1)) * sum_i |CumP_i - CumQ_i|. Everything is exact
# integer until one final double division of integer products (< 2^53,
# double-exact in both engines) — no NTILE: the ordered buckets are
# fixed-width bands (pure projection), so the audit never global-sorts.


@query(
    "privacy_t_closeness_audit",
    oracle="""
    WITH bands AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(FLOOR(CAST(c_acctbal AS DECIMAL(12,2)) / 1000) AS BIGINT)
               AS band
      FROM customer
    ),
    gq AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS q FROM bands GROUP BY band),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
                   CAST(COUNT(DISTINCT band) AS BIGINT) AS m FROM bands),
    cls AS (
      SELECT nation, segment, CAST(COUNT(*) AS BIGINT) AS class_size
      FROM bands GROUP BY nation, segment
    ),
    ph AS (
      SELECT nation, segment, band, CAST(COUNT(*) AS BIGINT) AS p
      FROM bands GROUP BY nation, segment, band
    ),
    dense AS (
      SELECT c.nation, c.segment, c.class_size, g.band, g.q,
             COALESCE(ph.p, 0) AS p
      FROM cls c CROSS JOIN gq g
      LEFT JOIN ph ON ph.nation = c.nation AND ph.segment = c.segment
                  AND ph.band = g.band
    ),
    cum AS (
      SELECT nation, segment, class_size, band,
             SUM(p) OVER (PARTITION BY nation, segment ORDER BY band)
               AS cum_p,
             SUM(q) OVER (PARTITION BY nation, segment ORDER BY band)
               AS cum_q
      FROM dense
    ),
    emd AS (
      SELECT nation, segment, class_size,
             CAST(SUM(ABS(cum_p * (SELECT n_total FROM tot)
                          - cum_q * class_size)) AS BIGINT) AS s
      FROM cum GROUP BY nation, segment, class_size
    )
    SELECT nation, segment, class_size,
           CAST(FLOOR(1000.0 * s / (((SELECT m FROM tot) - 1)
                 * class_size * (SELECT n_total FROM tot))) AS BIGINT)
             AS emd_milli,
           CAST(FLOOR(1000.0 * s / (((SELECT m FROM tot) - 1)
                 * class_size * (SELECT n_total FROM tot))) > 200 AS BIGINT)
             AS at_risk
    FROM emd ORDER BY nation, segment
    """,
    tags=("llm", "quality", "privacy"),
)
def privacy_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (ICDE 2007): per QI class (nation, market
    segment), the ordered earth-mover's distance between the class's
    account-balance-band distribution and the table-wide one, milli-
    floored; at_risk flags EMD > 0.2 (the paper's running-example t).
    Bands are fixed-width projections (never a global NTILE sort); the
    EMD is computed on integer cumulative counts cross-multiplied to a
    common denominator, with ONE double division of < 2^53 products at
    the end — identical in both engines. Plan: two keyed aggregates over
    the scan, then all arithmetic on dimension-sized relations
    (classes × bands); scales as the aggregate, not the audit."""
    cust = load_tables(spark, sf_dir, "customer").customer
    from pyspark.sql.window import Window

    bands = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal").cast("decimal(12,2)") / 1000)
        .cast("long")
        .alias("band"),
    )
    gq = bands.groupBy("band").agg(F.count("*").cast("long").alias("q"))
    tot = bands.agg(
        F.count("*").cast("long").alias("n_total"),
        F.countDistinct("band").cast("long").alias("m"),
    )
    cls = bands.groupBy("nation", "segment").agg(
        F.count("*").cast("long").alias("class_size")
    )
    ph = bands.groupBy("nation", "segment", "band").agg(
        F.count("*").cast("long").alias("p")
    )
    dense = (
        cls.crossJoin(F.broadcast(gq))
        .join(ph, ["nation", "segment", "band"], "left")
        .select(
            "nation",
            "segment",
            "class_size",
            "band",
            "q",
            F.coalesce(F.col("p"), F.lit(0)).alias("p"),
        )
    )
    w = Window.partitionBy("nation", "segment").orderBy("band")
    cum = dense.select(
        "nation",
        "segment",
        "class_size",
        F.sum("p").over(w).alias("cum_p"),
        F.sum("q").over(w).alias("cum_q"),
    )
    emd = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("nation", "segment", "class_size", "n_total", "m")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_p") * F.col("n_total")
                    - F.col("cum_q") * F.col("class_size")
                )
            )
            .cast("long")
            .alias("s")
        )
    )
    emd_milli = F.floor(
        F.lit(1000.0)
        * F.col("s")
        / ((F.col("m") - 1) * F.col("class_size") * F.col("n_total"))
    ).cast("long")
    return emd.select(
        "nation",
        "segment",
        "class_size",
        emd_milli.alias("emd_milli"),
        (emd_milli > 200).cast("long").alias("at_risk"),
    ).orderBy("nation", "segment")


# ---------------------------------------------------------------- wave 4
# Local clustering coefficient (Watts & Strogatz 1998) over the near-dup
# graph — the graph family's cohesion-per-node companion to the triangle
# counts: local CC = 2*tri(v) / (deg(v)*(deg(v)-1)) separates template
# families (cliquish neighborhoods, CC -> 1) from borderline-match
# chains (CC -> 0) per NODE, where the raw triangle count conflates
# cohesion with degree. Integer counts + one double division of exact
# integers, permille-floored; deg < 2 reports -1 (undefined, flagged,
# never NULL-ambiguous).


@query(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH {DUCK_SHINGLE_SETS},
    pairs AS (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM ds a JOIN ds b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) p
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT doc_a AS node FROM pairs
        UNION ALL SELECT doc_b FROM pairs
      ) GROUP BY node
    ),
    tri AS (
      SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.doc_a = e1.doc_b
      JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    ),
    pertri AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT d.node, d.degree,
           COALESCE(t.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree < 2 THEN CAST(-1 AS BIGINT)
                ELSE CAST(FLOOR(2000.0 * COALESCE(t.n_triangles, 0)
                                / (d.degree * (d.degree - 1))) AS BIGINT)
           END AS local_cc_permille
    FROM deg d LEFT JOIN pertri t ON t.node = d.node
    ORDER BY d.node
    """,
    tags=("llm", "dedup", "graph"),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the near-dup pair graph
    (MinHash-LSH threshold-exact pairs, the dedup_clusters convention;
    oracle recomputes from exact-Jaccard pairs). Triangles via the
    oriented-edge join (counted once, volume ~ sum of deg^2); degrees via
    one endpoint-exploded count; CC = 2*tri/(deg*(deg-1)) permille-
    floored from exact integers, -1 when deg < 2. Everything after the
    pair relation is graph-sized."""
    from ..operators import dedup as D

    docs = load_tables(spark, sf_dir, "documents").documents
    # r12: pairs feeds the degree union (×2) AND the three-way oriented
    # triangle join — one eager checkpoint, one LSH build (guide §3.3)
    pairs = (
        D.minhash_lsh_dedup(docs, threshold=0.5)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    deg = (
        pairs.select(F.col("doc_a").alias("node"))
        .unionAll(pairs.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.doc_a") == F.col("e1.doc_b"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .select(
            F.col("e1.doc_a").alias("a"),
            F.col("e1.doc_b").alias("b"),
            F.col("e2.doc_b").alias("c"),
        )
    )
    pertri = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    joined = deg.join(pertri, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
    )
    cc = F.floor(
        F.lit(2000.0)
        * F.col("n_triangles")
        / (F.col("degree") * (F.col("degree") - 1))
    ).cast("long")
    return joined.select(
        "node",
        "degree",
        "n_triangles",
        F.when(F.col("degree") < 2, F.lit(-1).cast("long"))
        .otherwise(cc)
        .alias("local_cc_permille"),
    ).orderBy("node")


# ---------------------------------------------------------------- wave 5
# AMS F2 sketch (Alon, Matias & Szegedy, STOC 1996) — the second-moment
# estimator that completes the sketch family (CMS point queries, HLL
# cardinality, KMV similarity, bottom-k quantiles): F2 = sum(f_v^2) is
# the self-join size, the quantity a planner wants BEFORE running a
# skewed join. Each estimator X_i = sum_v f_v * s_i(v) with 4-wise-
# independent signs from a degree-3 polynomial hash mod the Mersenne
# prime 2^31-1 (products stay < 2^62 via stepwise reduction — BIGINT
# overflow is a CHECKED error in DuckDB); E[X_i^2] = F2 exactly. The
# query reports the measured relative error of the plain mean AND the
# median-of-means (the paper's boosting), both against exact F2 —
# entirely integer arithmetic (signs, counts, squares; medians of three
# integers as sum-max-min).

_AMS_P = (1 << 31) - 1
_AMS_D = 12  # estimators: 3 groups x 4 for the median-of-means
#: degree-3 coefficients per estimator (golden-ratio spread, the
#: MINHASH_AB convention) — shared verbatim by the Spark expressions and
#: the oracle SQL below, so the sign streams cannot drift.
_AMS_COEF = [
    (
        (0x9E3779B1 * (4 * i + 1)) % _AMS_P,
        (0x85EBCA77 * (4 * i + 2)) % _AMS_P,
        (0xC2B2AE35 * (4 * i + 3)) % _AMS_P,
        (0x27D4EB2F * (4 * i + 4)) % _AMS_P,
    )
    for i in range(_AMS_D)
]


def _ams_sign_sql(v: str, c: tuple[int, int, int, int]) -> str:
    """±1 sign from the degree-3 hash, stepwise mod (SQL)."""
    a3, a2, a1, a0 = c
    h = (
        f"((((({a3} * (({v} * {v}) % {_AMS_P})) % {_AMS_P}) * {v}) % {_AMS_P}"
        f" + ({a2} * (({v} * {v}) % {_AMS_P})) % {_AMS_P}"
        f" + ({a1} * {v}) % {_AMS_P} + {a0}) % {_AMS_P})"
    )
    return f"(CASE WHEN {h} % 2 = 1 THEN 1 ELSE -1 END)"


def _ams_sign_col(v, c: tuple[int, int, int, int]):
    """±1 sign from the degree-3 hash, stepwise mod (Spark column)."""
    a3, a2, a1, a0 = c
    v2 = (v * v) % _AMS_P
    h = (
        (F.lit(a3) * v2) % _AMS_P * v % _AMS_P
        + (F.lit(a2) * v2) % _AMS_P
        + (F.lit(a1) * v) % _AMS_P
        + F.lit(a0)
    ) % _AMS_P
    return F.when(h % 2 == 1, F.lit(1)).otherwise(F.lit(-1))


def _build_ams_oracle() -> str:
    xs = ", ".join(
        f"CAST(SUM(f * {_ams_sign_sql('user_id', c)}) AS BIGINT) AS x{i}"
        for i, c in enumerate(_AMS_COEF)
    )
    x2_sum = " + ".join(f"x{i} * x{i}" for i in range(_AMS_D))
    g = [
        " + ".join(f"x{i} * x{i}" for i in range(4 * k, 4 * k + 4))
        for k in range(3)
    ]
    return f"""
    WITH freq AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f
      FROM events GROUP BY user_id
    ),
    est AS (
      SELECT CAST(SUM(f * f) AS BIGINT) AS f2_exact, {xs} FROM freq
    ),
    grouped AS (
      SELECT f2_exact,
             ({x2_sum}) AS sum_x2,
             ({g[0]}) AS g0, ({g[1]}) AS g1, ({g[2]}) AS g2
      FROM est
    ),
    final AS (
      SELECT f2_exact,
             sum_x2 // {_AMS_D} AS f2_est_mean,
             (g0 + g1 + g2 - GREATEST(g0, g1, g2)
                           - LEAST(g0, g1, g2)) // 4 AS f2_est_mom
      FROM grouped
    )
    SELECT CAST({_AMS_D} AS BIGINT) AS n_estimators, f2_exact,
           CAST(f2_est_mean AS BIGINT) AS f2_est_mean,
           CAST(f2_est_mom AS BIGINT) AS f2_est_mom,
           CAST(ABS(f2_est_mean - f2_exact) * 1000 // f2_exact AS BIGINT)
             AS err_mean_permille,
           CAST(ABS(f2_est_mom - f2_exact) * 1000 // f2_exact AS BIGINT)
             AS err_mom_permille
    FROM final
    """


@query(
    "sketch_ams_f2_estimate",
    oracle=_build_ams_oracle(),
    tags=("llm", "sketch", "eval"),
)
def sketch_ams_f2_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment estimate vs exact F2 over event user
    frequencies, with the measured relative error of the plain mean and
    the median-of-means (STOC 1996's boosting step) — the self-join-size
    sketch a planner consults before a skewed join. One user-keyed count
    (map-side partials), then 13 integer aggregates over the
    150-row frequency relation (12 sign-sums + exact F2); the sketch
    state is d integers regardless of stream size and merges by
    addition, so the shape is stream-scale-proof. Entirely integer
    arithmetic end-to-end — the oracle hash-matches exactly."""
    t = load_tables(spark, sf_dir, "events")
    freq = t.events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    aggs = [F.sum(F.col("f") * F.col("f")).cast("long").alias("f2_exact")]
    for i, c in enumerate(_AMS_COEF):
        aggs.append(
            F.sum(F.col("f") * _ams_sign_col(F.col("user_id"), c))
            .cast("long")
            .alias(f"x{i}")
        )
    est = freq.agg(*aggs)
    sum_x2 = sum(
        (F.col(f"x{i}") * F.col(f"x{i}") for i in range(_AMS_D)),
        F.lit(0).cast("long"),
    )
    gs = [
        sum(
            (F.col(f"x{i}") * F.col(f"x{i}") for i in range(4 * k, 4 * k + 4)),
            F.lit(0).cast("long"),
        )
        for k in range(3)
    ]
    g0, g1, g2 = gs
    mom_sum = g0 + g1 + g2 - F.greatest(g0, g1, g2) - F.least(g0, g1, g2)
    def _idiv(a, b):
        # exact integer floor division for non-negative operands: the
        # numerator is made exactly divisible before the double divide,
        # so no double-rounding boundary can disagree with DuckDB's //
        return ((a - (a % b)) / b).cast("long")

    grouped = est.select(
        "f2_exact",
        _idiv(sum_x2, F.lit(_AMS_D)).alias("f2_est_mean"),
        _idiv(mom_sum, F.lit(4)).alias("f2_est_mom"),
    )
    return grouped.select(
        F.lit(_AMS_D).cast("long").alias("n_estimators"),
        "f2_exact",
        "f2_est_mean",
        "f2_est_mom",
        _idiv(
            F.abs(F.col("f2_est_mean") - F.col("f2_exact")) * 1000,
            F.col("f2_exact"),
        ).alias("err_mean_permille"),
        _idiv(
            F.abs(F.col("f2_est_mom") - F.col("f2_exact")) * 1000,
            F.col("f2_exact"),
        ).alias("err_mom_permille"),
    )


# ---------------------------------------------------------------- wave 6
# Query-likelihood retrieval with Dirichlet smoothing (Zhai & Lafferty,
# SIGIR 2001) — the language-modeling ranker beside BM25/TF-IDF/Rocchio/
# RRF: score(q,d) = sum_t ln((tf + mu*p(t|C)) / (dl + mu)). Unlike BM25
# a query term ABSENT from the document still contributes (the smoothed
# background mass), so the score relation is docs x query-terms dense —
# bounded by |q| (a broadcast-sized constant), never corpus^2. Same
# float contract as search_bm25_topk: per-term float64 from identical
# operands, micro-rounded, summed as BIGINT.

_QL_MU = 2000.0


def _build_ql_oracle() -> str:
    toks = "list_filter(string_split_regex(text, '\\s+'), w -> len(w) > 0)"
    return f"""
    WITH corpus AS (
      SELECT doc_id, {toks} AS toks FROM documents WHERE doc_id <> 0
    ), qt AS (
      SELECT DISTINCT unnest({toks}) AS term
      FROM documents WHERE doc_id = 0
    ), dl AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM corpus
    ), tot AS (
      SELECT CAST(SUM(dl) AS BIGINT) AS t_tokens FROM dl
    ), cf AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS cf
      FROM (SELECT unnest(toks) AS term FROM corpus) JOIN qt USING (term)
      GROUP BY term
    ), tfq AS (
      SELECT c.doc_id, c.term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM corpus) c
      JOIN qt USING (term)
      GROUP BY c.doc_id, c.term
    ), dense AS (
      SELECT dl.doc_id, dl.dl, q.term,
             COALESCE(cf.cf, 0) AS cf, COALESCE(tfq.tf, 0) AS tf
      FROM dl CROSS JOIN qt q
      LEFT JOIN cf ON cf.term = q.term
      LEFT JOIN tfq ON tfq.doc_id = dl.doc_id AND tfq.term = q.term
    ), contrib AS (
      SELECT doc_id,
             CAST(ROUND(
               ln((tf + CAST({_QL_MU!r} AS DOUBLE) * cf
                        / (SELECT t_tokens FROM tot))
                  / (dl + CAST({_QL_MU!r} AS DOUBLE)))
               * 1000000) AS BIGINT) AS micro
      FROM dense
      WHERE cf > 0
    )
    SELECT doc_id, CAST(SUM(micro) AS BIGINT) AS ql_micro
    FROM contrib GROUP BY doc_id
    ORDER BY ql_micro DESC, doc_id LIMIT 15
    """


@query(
    "search_query_likelihood_topk",
    oracle=_build_ql_oracle(),
    tags=("llm", "text", "search"),
)
def search_query_likelihood_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood top-15 (SIGIR 2001), query =
    doc 0's distinct terms against the rest of the corpus (the
    search_bm25_topk convention — compare the two rankers' heads
    side-by-side). Per-(doc, term) ln contribution micro-rounded then
    summed as BIGINT (order-free); the dense doc x term relation rides a
    broadcast of the query terms + collection frequencies, so the plan
    is one corpus token aggregate + one broadcast-joined projection —
    no corpus self-join anywhere. Collection-unseen query terms are
    dropped for every document alike (zero background mass; standard)."""
    docs = load_tables(spark, sf_dir, "documents").documents
    toks = F.filter(T.tokens("text"), lambda w: F.length(w) > 0)
    corpus = docs.filter("doc_id <> 0").select("doc_id", toks.alias("toks"))
    qt = (
        docs.filter("doc_id = 0")
        .select(F.explode(toks).alias("term"))
        .distinct()
    )
    dl = corpus.select("doc_id", F.size("toks").cast("long").alias("dl"))
    tok = corpus.select("doc_id", F.explode("toks").alias("term"))
    tfq = (
        tok.join(F.broadcast(qt), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    cf = (
        tok.join(F.broadcast(qt), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cf"))
    )
    tot = dl.agg(F.sum("dl").cast("long").alias("t_tokens"))
    dense = (
        dl.crossJoin(F.broadcast(qt.join(cf, "term", "left").select(
            "term", F.coalesce("cf", F.lit(0)).alias("cf")
        )))
        .join(tfq, ["doc_id", "term"], "left")
        .select(
            "doc_id",
            "dl",
            "term",
            "cf",
            F.coalesce("tf", F.lit(0)).cast("long").alias("tf"),
        )
        .filter(F.col("cf") > 0)
        .crossJoin(F.broadcast(tot))
    )
    micro = F.round(
        F.log(
            (F.col("tf") + F.lit(_QL_MU) * F.col("cf") / F.col("t_tokens"))
            / (F.col("dl") + F.lit(_QL_MU))
        )
        * 1000000
    ).cast("long")
    return (
        dense.select("doc_id", micro.alias("micro"))
        .groupBy("doc_id")
        .agg(F.sum("micro").cast("long").alias("ql_micro"))
        .orderBy(F.desc("ql_micro"), F.asc("doc_id"))
        .limit(15)
    )


# ---------------------------------------------------------------- wave 7
# nDCG@10 of the query-likelihood ranking (Järvelin & Kekäläinen, TOIS
# 2002) — the eval row for the retrieval family: graded relevance =
# number of distinct query terms a document contains (the synthetic
# judgment this corpus supports; stated, not hidden). The log2 discounts
# are PYTHON-PRECOMPUTED micro literals shared by both engines, so the
# whole metric is integer arithmetic — no cross-engine log at all.

import math as _math

_NDCG_K = 10
#: discount weights w_i = round(1e6 / log2(i+1)), i = 1..K
_NDCG_W = [round(1_000_000 / _math.log2(i + 1)) for i in range(1, _NDCG_K + 1)]


def _idiv_col(a, b, scale: int = 1):
    """Exact integer division (truncation toward zero on signed inputs,
    matching DuckDB ``//``'s verified behavior — the wave-13 note).

    Routed through DECIMAL(38,0): the original ``(a - a%b)/b`` modulo
    trick did its final division in DOUBLE, which is exact only while
    operands stay under 2^53 — above that, an exactly-integral quotient
    can land one ulp BELOW the integer and truncate down (caught by the
    arrival-uniformity KS wave: 1000·d_num // (n·span) flipped 7 → 6 at
    sf0.1 where n·span ≈ 5.3e16). Decimal subtraction, modulo and the
    exactly-divisible final division are all exact at 38 digits, far
    past any BIGINT operand.

    ``scale`` multiplies the numerator INSIDE decimal space (the r9
    ADVICE class: ``F.lit(1000) * a`` in the caller runs in BIGINT and
    silently wraps once a > 2^63/1000, while the DuckDB oracle errors
    loudly — the engines diverge exactly on the extreme inputs the
    diagnostic exists to flag). Callers that fixed-point-scale a
    quotient must pass the factor here, never pre-multiply in long."""
    ad = a.cast("decimal(38,0)")
    if scale != 1:
        ad = (ad * F.lit(scale)).cast("decimal(38,0)")
    bd = b.cast("decimal(38,0)")
    return ((ad - (ad % bd)) / bd).cast("long")


def _imod_col(a, b, scale: int = 1):
    """Exact integer remainder ``(scale * a) % b`` — the modulo twin of
    :func:`_idiv_col`, multiplying INSIDE ``DECIMAL(38,0)`` space for the
    same reason (r11 VERDICT task #8: ``F.lit(K) * col % n`` runs the
    product in BIGINT, which silently wraps once ``col > 2^63/K`` while
    the DuckDB oracle errors loudly). Non-negative operands only, like
    every Hamilton-remainder call site (DuckDB ``%`` and Spark decimal
    ``%`` agree on those; signed remainders differ by convention and are
    deliberately out of contract here)."""
    ad = a.cast("decimal(38,0)")
    if scale != 1:
        ad = (ad * F.lit(scale)).cast("decimal(38,0)")
    return (ad % b.cast("decimal(38,0)")).cast("long")


def _build_ndcg_oracle() -> str:
    ql = _build_ql_oracle().strip().rstrip()
    # weights as a VALUES relation (rank -> micro weight)
    wrows = ", ".join(f"({i + 1}, {w})" for i, w in enumerate(_NDCG_W))
    toks = "list_filter(string_split_regex(text, '\\s+'), w -> len(w) > 0)"
    return f"""
    WITH w(rank, w_micro) AS (VALUES {wrows}),
    ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY ql_micro DESC, doc_id)
               AS rank
      FROM ({ql})
    ),
    qt AS (
      SELECT DISTINCT unnest({toks}) AS term
      FROM documents WHERE doc_id = 0
    ),
    rel AS (
      SELECT c.doc_id, CAST(COUNT(DISTINCT c.term) AS BIGINT) AS rel
      FROM (SELECT doc_id, unnest({toks}) AS term
            FROM documents WHERE doc_id <> 0) c
      JOIN qt USING (term)
      GROUP BY c.doc_id
    ),
    dcg AS (
      SELECT CAST(SUM(COALESCE(rel.rel, 0) * w.w_micro) AS BIGINT) AS dcg_micro,
             CAST(SUM(CAST(COALESCE(rel.rel, 0) > 0 AS BIGINT)) AS BIGINT)
               AS n_rel_topk
      FROM ranked JOIN w ON w.rank = ranked.rank
      LEFT JOIN rel ON rel.doc_id = ranked.doc_id
      WHERE ranked.rank <= {_NDCG_K}
    ),
    ideal AS (
      SELECT CAST(SUM(rel * w_micro) AS BIGINT) AS idcg_micro FROM (
        SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rank
        FROM rel
      ) r JOIN w ON w.rank = r.rank
      WHERE r.rank <= {_NDCG_K}
    )
    SELECT dcg.n_rel_topk, dcg.dcg_micro, ideal.idcg_micro,
           CAST(1000 * dcg.dcg_micro // ideal.idcg_micro AS BIGINT)
             AS ndcg_permille
    FROM dcg, ideal
    """


@query(
    "search_ndcg_eval",
    oracle=_build_ndcg_oracle(),
    tags=("llm", "search", "eval"),
)
def search_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 + hit count of the Dirichlet query-likelihood ranking
    against graded term-overlap relevance (distinct query terms present;
    a synthetic judgment, stated as such — the metric machinery is the
    deliverable). Discounts are import-time micro literals, relevance
    and DCG sums are BIGINTs, the final normalization is exact integer
    floor division — no engine computes a float anywhere. Plan: the QL
    top-15 relation (already broadcast-shaped) + one corpus term
    aggregate for relevance; ideal ranking via TakeOrdered over the
    judged-docs relation. One output row."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents").documents
    toks = F.filter(T.tokens("text"), lambda w: F.length(w) > 0)
    qt = (
        docs.filter("doc_id = 0")
        .select(F.explode(toks).alias("term"))
        .distinct()
    )
    rel = (
        docs.filter("doc_id <> 0")
        .select("doc_id", F.explode(toks).alias("term"))
        .join(F.broadcast(qt), "term")
        .groupBy("doc_id")
        .agg(F.countDistinct("term").cast("long").alias("rel"))
    )
    w_df = spark.createDataFrame(
        [(i + 1, w) for i, w in enumerate(_NDCG_W)], "rank long, w_micro long"
    )
    ranked = search_query_likelihood_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("ql_micro"), F.asc("doc_id")))
        .cast("long")
        .alias("rank"),
    )
    dcg = (
        ranked.filter(F.col("rank") <= _NDCG_K)
        .join(F.broadcast(w_df), "rank")
        .join(rel, "doc_id", "left")
        .agg(
            F.sum(F.coalesce(F.col("rel"), F.lit(0)) * F.col("w_micro"))
            .cast("long")
            .alias("dcg_micro"),
            F.sum((F.coalesce(F.col("rel"), F.lit(0)) > 0).cast("long"))
            .cast("long")
            .alias("n_rel_topk"),
        )
    )
    ideal = (
        rel.orderBy(F.desc("rel"), F.asc("doc_id"))
        .limit(_NDCG_K)
        .select(
            "rel",
            F.row_number()
            .over(Window.orderBy(F.desc("rel"), F.asc("doc_id")))
            .cast("long")
            .alias("rank"),
        )
        .join(F.broadcast(w_df), "rank")
        .agg(F.sum(F.col("rel") * F.col("w_micro")).cast("long").alias("idcg_micro"))
    )
    return dcg.crossJoin(F.broadcast(ideal)).select(
        "n_rel_topk",
        "dcg_micro",
        "idcg_micro",
        _idiv_col(F.lit(1000) * F.col("dcg_micro"), F.col("idcg_micro")).alias(
            "ndcg_permille"
        ),
    )


# ---------------------------------------------------------------- wave 8
# Benford first-digit audit (Benford 1938; Nigrini's forensic usage) —
# the data-QA gate that flags fabricated or truncated numeric columns
# before they poison training features: observed first-significant-digit
# counts vs the log10(1+1/d) law, with per-digit chi-square
# contributions. Digit extraction is string-based over an exact BIGINT
# cents rendering (both engines print integers identically — no
# log10-near-power-of-ten edge cases); the law's probabilities are
# import-time micro literals, so the only floats are identically-formed
# ratios of exact integers, micro-rounded per digit.

#: Benford P(d) in micro units, d = 1..9 (python-computed literals).
_BENFORD_P = [round(1_000_000 * _math.log10(1 + 1 / d)) for d in range(1, 10)]


def _build_benford_oracle() -> str:
    prows = ", ".join(f"({d + 1}, {p})" for d, p in enumerate(_BENFORD_P))
    return f"""
    WITH p(digit, p_micro) AS (VALUES {prows}),
    cents AS (
      SELECT CAST(ABS(ROUND(value * 100)) AS BIGINT) AS n FROM events
      WHERE CAST(ABS(ROUND(value * 100)) AS BIGINT) >= 1
    ),
    obs AS (
      SELECT CAST(SUBSTRING(CAST(n AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS observed
      FROM cents GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM obs),
    dense AS (
      SELECT p.digit, p.p_micro, COALESCE(obs.observed, 0) AS observed,
             (SELECT n FROM tot) AS n
      FROM p LEFT JOIN obs ON obs.digit = p.digit
    )
    SELECT digit, observed,
           CAST(n * p_micro // 1000000 AS BIGINT) AS expected_floor,
           CAST(ROUND(
             CAST(observed * 1000000 - n * p_micro AS DOUBLE)
             * CAST(observed * 1000000 - n * p_micro AS DOUBLE)
             / (CAST(n AS DOUBLE) * p_micro * 1000000) * 1000000
           ) AS BIGINT) AS chi_micro
    FROM dense ORDER BY digit
    """


@query(
    "events_benford_audit",
    oracle=_build_benford_oracle(),
    tags=("llm", "events", "quality"),
)
def events_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of event values against
    Benford's law, with per-digit chi-square contributions (micro units;
    the order-free per-digit rounding makes any downstream total an
    integer sum). Zero-cent values are excluded (no first digit). Plan:
    one projection + one 9-bucket aggregate + a broadcast of the 9-row
    law table — nothing after the scan exceeds nine rows."""
    t = load_tables(spark, sf_dir, "events")
    cents = t.events.select(
        F.abs(F.round(F.col("value") * 100)).cast("long").alias("n")
    ).filter(F.col("n") >= 1)
    obs = (
        cents.select(
            F.substring(F.col("n").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    p_df = spark.createDataFrame(
        [(d + 1, p) for d, p in enumerate(_BENFORD_P)],
        "digit long, p_micro long",
    )
    tot = obs.agg(F.sum("observed").cast("long").alias("n"))
    dense = (
        F.broadcast(p_df)
        .join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "p_micro",
            F.coalesce("observed", F.lit(0)).cast("long").alias("observed"),
            "n",
        )
    )
    diff = (F.col("observed") * 1000000 - F.col("n") * F.col("p_micro")).cast(
        "double"
    )
    chi = F.round(
        diff * diff / (F.col("n").cast("double") * F.col("p_micro") * 1000000)
        * 1000000
    ).cast("long")
    return dense.select(
        "digit",
        "observed",
        _idiv_col(F.col("n") * F.col("p_micro"), F.lit(1000000)).alias(
            "expected_floor"
        ),
        chi.alias("chi_micro"),
    ).orderBy("digit")


# ---------------------------------------------------------------- wave 9
# Johnson-Lindenstrauss distortion audit (JL 1984; Achlioptas 2003's
# ±1 database-friendly projections) — measures what the cheap
# dimensionality reduction actually does to pairwise distances BEFORE a
# pipeline adopts it for ANN prefiltering: project 64-dim embeddings to
# k=16 with a deterministic ±1 sign matrix (import-time literals, the
# centroid-literal convention), compute the squared-distance ratio
# (d_proj^2/k) / d^2 per sampled pair, and histogram the milli-ratios.
# Pair sample = consecutive even/odd vec_ids (deterministic, linear).
# The difference-vector formulation (project a-b once) is used in BOTH
# engines so the fold order and roundings are identical.

_JL_K = 16
_JL_DIM = 64
_JL_P = (1 << 31) - 1


def _jl_sign(j: int, i: int) -> int:
    h = (0x9E3779B1 * (j * _JL_DIM + i + 1) + 0x85EBCA77) % _JL_P
    return 1 if h % 2 == 1 else -1


#: k x dim ±1 matrix as python literals shared by both engines.
_JL_R = [[float(_jl_sign(j, i)) for i in range(_JL_DIM)] for j in range(_JL_K)]


def _build_jl_oracle() -> str:
    from .llm_ops import _duck_dot

    dvec = (
        "list_transform(list_zip(a.embedding, b.embedding), "
        "s -> CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))"
    )
    proj_sq = " + ".join(
        f"({_duck_dot('dv', lit_vec(r))}) * ({_duck_dot('dv', lit_vec(r))})"
        for r in _JL_R
    )
    return f"""
    WITH pairs AS (
      SELECT {dvec} AS dv
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 2 = 0
    ),
    ratios AS (
      SELECT CAST(FLOOR(1000.0 * (({proj_sq}) / {_JL_K})
                        / ({_duck_dot('dv', 'dv')}) + 0.5) AS BIGINT)
               AS ratio_milli
      FROM pairs
      WHERE {_duck_dot('dv', 'dv')} > 0
    )
    SELECT CAST(ratio_milli // 100 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM ratios GROUP BY 1 ORDER BY 1
    """


@query(
    "embedding_jl_distortion_audit",
    oracle=_build_jl_oracle(),
    tags=("llm", "similarity", "eval"),
)
def embedding_jl_distortion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-distortion histogram of a ±1 JL projection 64 -> 16
    (Achlioptas 2003): per deterministic even/odd vec_id pair, the ratio
    (d_proj^2/k) / d^2 milli-floored and bucketed 0.1-wide. A ratio of
    1000 is distortion-free; the histogram width IS the measured epsilon
    a pipeline accepts when prefiltering ANN candidates at k=16. All
    arithmetic is identical doubles from the shared difference-vector
    formulation + integer bucketing; zero-distance pairs (exact
    duplicate vectors exist in this corpus) are excluded in both
    engines. Plan: one self-join on an arithmetic key (no shuffle skew
    — consecutive ids), 16 literal dots per pair, 11-bucket aggregate."""
    t = load_tables(spark, sf_dir, "embeddings")
    emb = t.embeddings.select("vec_id", "embedding")
    a = emb.alias("a")
    b = emb.alias("b")
    dv = F.zip_with(
        F.col("a.embedding"),
        F.col("b.embedding"),
        lambda x, y: x.cast("double") - y.cast("double"),
    )
    pairs = (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .filter(F.col("a.vec_id") % 2 == 0)
        .select(dv.alias("dv"))
    )
    # r13: one-parse literals for the 16×64 ±1 rows — F.lit(list) marshals
    # per element through py4j at plan-build time (the r12 litexpr class;
    # this site was missed), and each row is referenced twice below.
    from ..operators.litexpr import lit_doubles

    jl_rows = [lit_doubles(r) for r in _JL_R]
    proj_sq = sum(
        (S.dot(F.col("dv"), r) * S.dot(F.col("dv"), r) for r in jl_rows),
        F.lit(0.0),
    )
    d2 = S.dot(F.col("dv"), F.col("dv"))
    ratios = (
        pairs.filter(d2 > 0)
        .select(
            F.floor(F.lit(1000.0) * (proj_sq / _JL_K) / d2 + F.lit(0.5))
            .cast("long")
            .alias("ratio_milli")
        )
    )
    return (
        ratios.select(_idiv_col(F.col("ratio_milli"), F.lit(100)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------- wave 10
# Lexical-richness profile per source (Yule 1944; the stylometric
# vocabulary-diversity battery beside Burrows' Delta and the JSD
# matrix): type-token ratio, hapax-legomena share, and Yule's K — the
# repetitiveness characteristic K = 10^4 * (sum_r r^2*S_r - N) / N^2
# that is length-robust where raw TTR is not. Everything derives from
# the per-(source, word) count relation: N = sum c, V = count types,
# V1 = count(c=1), S2 = sum c^2 — one keyed aggregate, all integers,
# exact floor divisions at the end.


@query(
    "text_lexical_richness",
    oracle="""
    WITH wc AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT source, unnest(list_filter(
          string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS w
        FROM documents
      ) GROUP BY source, w
    ),
    per AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(CAST(c = 1 AS BIGINT)) AS BIGINT) AS n_hapax,
             CAST(SUM(c * c) AS BIGINT) AS s2
      FROM wc GROUP BY source
    )
    SELECT source, n_tokens, n_types, n_hapax,
           CAST(1000 * n_types // n_tokens AS BIGINT) AS ttr_permille,
           CAST(1000 * n_hapax // n_types AS BIGINT) AS hapax_permille,
           CAST(10000000 * (s2 - n_tokens) // (n_tokens * n_tokens)
                AS BIGINT) AS yule_k_milli
    FROM per ORDER BY source
    """,
    tags=("llm", "text", "quality"),
)
def text_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical richness: type-token ratio, hapax share, and
    Yule's K (milli) — the vocabulary-diversity fingerprint a curation
    stack reads beside readability and the stylometric matrices (a
    template-stamped source shows low K-variance and a collapsed hapax
    share). One (source, word)-keyed count with map-side partials, then
    a source-keyed integer aggregate; divisions are exact integer
    floors. Linear in tokens, dimension-sized after the word table."""
    docs = load_tables(spark, sf_dir, "documents").documents
    toks = F.filter(T.tokens("text"), lambda w: F.length(w) > 0)
    wc = (
        docs.select("source", F.explode(toks).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per = wc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("n_hapax"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    return per.select(
        "source",
        "n_tokens",
        "n_types",
        "n_hapax",
        _idiv_col(F.lit(1000) * F.col("n_types"), F.col("n_tokens")).alias(
            "ttr_permille"
        ),
        _idiv_col(F.lit(1000) * F.col("n_hapax"), F.col("n_types")).alias(
            "hapax_permille"
        ),
        _idiv_col(
            F.lit(10000000) * (F.col("s2") - F.col("n_tokens")),
            F.col("n_tokens") * F.col("n_tokens"),
        ).alias("yule_k_milli"),
    ).orderBy("source")


# --------------------------------------------------------------- wave 11
# Good-Turing frequency spectrum (Good 1953) — the unseen-mass estimate
# that completes the LM-smoothing story beside Kneser-Ney and the
# unigram trainer: from the frequency-of-frequencies table S_r of
# 3-token SHINGLES (the corpus's word vocabulary is fixture-tiny and
# saturates — every word occurs far more than 10 times — so the word
# grain has an empty spectrum; shingles carry the real tail), the
# smoothed count r* = (r+1) S_{r+1} / S_r and the Turing unseen mass
# p0 = S_1 / N. Counts and exact rationals of counts only; rows where
# the estimator is undefined (S_{r+1} = 0) report -1, never NULL.


@query(
    "quality_good_turing_spectrum",
    oracle=f"""
    WITH {DUCK_SHINGLE_SETS},
    sc AS (SELECT sh, CAST(COUNT(*) AS BIGINT) AS c FROM shing GROUP BY sh),
    fof AS (
      SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS s_r FROM sc GROUP BY c
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM sc),
    s1 AS (SELECT COALESCE((SELECT s_r FROM fof WHERE r = 1), 0) AS s_1),
    grid AS (SELECT unnest(generate_series(1, 10)) AS r)
    SELECT CAST(g.r AS BIGINT) AS r,
           COALESCE(f.s_r, 0) AS s_r,
           CASE WHEN COALESCE(f.s_r, 0) = 0 OR COALESCE(f1.s_r, 0) = 0
                THEN CAST(-1 AS BIGINT)
                ELSE CAST(1000 * (g.r + 1) * f1.s_r // f.s_r AS BIGINT)
           END AS r_star_milli,
           CAST(1000 * (SELECT s_1 FROM s1) // (SELECT n FROM tot)
                AS BIGINT) AS unseen_mass_permille
    FROM grid g
    LEFT JOIN fof f ON f.r = g.r
    LEFT JOIN fof f1 ON f1.r = g.r + 1
    ORDER BY r
    """,
    tags=("llm", "quality", "text"),
)
def quality_good_turing_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing spectrum rows r = 1..10 over 3-token shingle
    occurrences: the frequency-of-frequencies S_r, the smoothed count
    r* = (r+1)S_{r+1}/S_r (milli; -1 where the raw estimator is
    undefined), and the Turing unseen-mass estimate S_1/N (permille,
    repeated per row for a stable schema) — the number that says how
    much novel-text mass the corpus still hides, read before trusting
    contamination or novelty rates. Plan: one shingle-keyed count, one
    count-keyed count (both map-side-combinable), then arithmetic on a
    10-row grid against the spectrum — the corpus is touched once."""
    from ..operators.dedup import _shingle_array

    docs = load_tables(spark, sf_dir, "documents").documents
    sc = (
        docs.select(F.explode(_shingle_array("text")).alias("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    fof = sc.groupBy(F.col("c").alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("s_r")
    )
    tot = sc.agg(F.sum("c").cast("long").alias("n"))
    s1 = (
        fof.filter(F.col("r") == 1)
        .select(F.col("s_r").alias("s_1"))
        .unionAll(spark.createDataFrame([(0,)], "s_1 long"))
        .limit(1)
    )
    grid = spark.range(1, 11).select(F.col("id").cast("long").alias("r"))
    f1 = fof.select((F.col("r") - 1).alias("r"), F.col("s_r").alias("s_r1"))
    dense = (
        grid.join(F.broadcast(fof), "r", "left")
        .join(F.broadcast(f1), "r", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(s1))
        .select(
            "r",
            F.coalesce("s_r", F.lit(0)).cast("long").alias("s_r"),
            F.coalesce("s_r1", F.lit(0)).cast("long").alias("s_r1"),
            "n",
            F.coalesce("s_1", F.lit(0)).cast("long").alias("s_1"),
        )
    )
    r_star = F.when(
        (F.col("s_r") == 0) | (F.col("s_r1") == 0), F.lit(-1).cast("long")
    ).otherwise(
        _idiv_col(F.lit(1000) * (F.col("r") + 1) * F.col("s_r1"), F.col("s_r"))
    )
    return dense.select(
        "r",
        "s_r",
        r_star.alias("r_star_milli"),
        _idiv_col(F.lit(1000) * F.col("s_1"), F.col("n")).alias(
            "unseen_mass_permille"
        ),
    ).orderBy("r")


# --------------------------------------------------------------- wave 12
# Weighted reservoir sampling, A-Res keys (Efraimidis & Spirakis, IPL
# 2006) — THE distributed weighted-sample primitive: assign each item
# the key u^(1/w) (equivalently ln(u)/w) with u a deterministic uniform
# from its id, and take the top-k by key. Keys are independent per item,
# so the sample is one TakeOrdered (per-partition heaps, mergeable) —
# no sequential reservoir state, which is exactly why it scales where
# Vitter's Algorithm R does not. Deterministic u from an integer hash
# (reproducible pipelines re-draw the SAME sample); the single float
# (ln of an identical double ratio) is micro-rounded per row before the
# rank — the BM25 float contract.

_RES_P = (1 << 31) - 1
_RES_A = 0x9E3779B1 % _RES_P
_RES_B = 0x85EBCA77 % _RES_P
_RES_K = 20


@query(
    "curation_weighted_reservoir",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
             CAST(ROUND(1000000.0 * ln(
               ((({_RES_A} * doc_id + {_RES_B}) % {_RES_P}) + 1.0)
               / ({_RES_P} + 1.0)
             ) / n_chars) AS BIGINT) AS key_micro
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, weight, key_micro FROM keyed
    ORDER BY key_micro DESC, doc_id LIMIT {_RES_K}
    """,
    tags=("llm", "curation"),
)
def curation_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 weighted sample by A-Res key (IPL 2006), weight = document
    length: key_micro = round(1e6 * ln(u)/w) with u a deterministic
    uniform from the doc id — longer documents are proportionally more
    likely, the draw is reproducible across runs and engines, and the
    sample is ONE TakeOrdered over a pure projection (per-partition
    heaps, no shuffle beyond the k-row merge; the canonical distributed
    reservoir). Zero-weight docs are excluded in both engines."""
    docs = load_tables(spark, sf_dir, "documents").documents
    u = (
        ((F.lit(_RES_A) * F.col("doc_id") + F.lit(_RES_B)) % _RES_P) + 1.0
    ) / F.lit(float(_RES_P + 1))
    key = F.round(F.lit(1000000.0) * F.log(u) / F.col("n_chars")).cast("long")
    return (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            key.alias("key_micro"),
        )
        .orderBy(F.desc("key_micro"), F.asc("doc_id"))
        .limit(_RES_K)
    )


# --------------------------------------------------------------- wave 13
# Spearman rank-correlation matrix between per-document quality signals
# (Spearman 1904) — the cross-signal agreement diagnostic a curation
# stack reads before stacking filters: two signals that rank documents
# identically are one filter, not two. rho = 1 - 6*sum(d^2)/(n(n^2-1))
# is an EXACT rational of integers once ranks are total — ranks here
# are row_number over (signal, doc_id), the deterministic-tie-break
# convention (stated; average-rank Spearman differs under heavy ties).
# Division is truncated-toward-zero in BOTH engines (DuckDB // and the
# Spark modulo-trick agree on negatives — verified).

_SPEAR_SIGNALS = ("n_chars", "n_tokens", "n_types", "n_syllables")


def _build_spearman_oracle() -> str:
    toks = "list_filter(string_split_regex(lower(text), '\\s+'), w -> len(w) > 0)"
    syl = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        + toks
        + ", w -> CAST(GREATEST(len(regexp_extract_all(w, '[aeiouy]+')), 1)"
        " AS BIGINT))), (a, b) -> a + b)"
    )
    ranks = ", ".join(
        f"ROW_NUMBER() OVER (ORDER BY {s}, doc_id) AS rk_{s}"
        for s in _SPEAR_SIGNALS
    )
    pairs = []
    for i, a in enumerate(_SPEAR_SIGNALS):
        for b in _SPEAR_SIGNALS[i + 1 :]:
            pairs.append(
                f"SELECT '{a}' AS signal_a, '{b}' AS signal_b,"
                f" CAST(SUM((rk_{a} - rk_{b}) * (rk_{a} - rk_{b}))"
                f" AS BIGINT) AS sum_d2, CAST(COUNT(*) AS BIGINT) AS n"
                f" FROM ranked"
            )
    unions = " UNION ALL ".join(pairs)
    return f"""
    WITH sig AS (
      SELECT doc_id,
             CAST(n_chars AS BIGINT) AS n_chars,
             CAST(len({toks}) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct({toks})) AS BIGINT) AS n_types,
             CAST({syl} AS BIGINT) AS n_syllables
      FROM documents
    ),
    ranked AS (SELECT doc_id, {ranks} FROM sig),
    cells AS ({unions})
    SELECT signal_a, signal_b,
           CAST((1000 * n * (n * n - 1) - 6000 * sum_d2)
                // (n * (n * n - 1)) AS BIGINT) AS rho_milli
    FROM cells ORDER BY signal_a, signal_b
    """


@query(
    "quality_signal_rank_correlation",
    oracle=_build_spearman_oracle(),
    tags=("llm", "quality", "eval"),
)
def quality_signal_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Spearman rho (milli) between four per-document signals
    (chars, tokens, distinct tokens, syllables): the filter-redundancy
    matrix — rho ~ 1000 means the second signal adds nothing. Ranks are
    row_number over (signal, doc_id) so the statistic is exact integer
    arithmetic end-to-end. The rank windows are global sorts over the
    doc dimension (the NTILE/selection_tradeoff precedent — presentation
    grain, n(n^2-1) needs exact n anyway); everything after is six
    integers."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents").documents
    words = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: F.length(w) > 0)
    syl = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(F.regexp_count(w, F.lit("[aeiouy]+")), F.lit(1)).cast("long"),
    )
    sig = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(words).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("long").alias("n_types"),
        syl.alias("n_syllables"),
    )
    ranked = sig.select(
        "doc_id",
        *[
            F.row_number()
            .over(Window.orderBy(F.col(s), F.col("doc_id")))
            .cast("long")
            .alias(f"rk_{s}")
            for s in _SPEAR_SIGNALS
        ],
    )
    # ONE aggregate computes all six sum(d^2) cells + n (a union of six
    # per-pair aggs would scan the rank relation six times), then the
    # single row explodes into the matrix.
    pair_names = [
        (a, b)
        for i, a in enumerate(_SPEAR_SIGNALS)
        for b in _SPEAR_SIGNALS[i + 1 :]
    ]
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for a, b in pair_names:
        d = F.col(f"rk_{a}") - F.col(f"rk_{b}")
        aggs.append(F.sum(d * d).cast("long").alias(f"sd2_{a}__{b}"))
    onerow = ranked.agg(*aggs)
    cells = onerow.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("signal_a"),
                        F.lit(b).alias("signal_b"),
                        F.col(f"sd2_{a}__{b}").alias("sum_d2"),
                    )
                    for a, b in pair_names
                ]
            )
        ).alias("p"),
    ).select("p.signal_a", "p.signal_b", "p.sum_d2", "n")
    nn = F.col("n") * (F.col("n") * F.col("n") - 1)
    return cells.select(
        "signal_a",
        "signal_b",
        _idiv_col(F.lit(1000) * nn - F.lit(6000) * F.col("sum_d2"), nn).alias(
            "rho_milli"
        ),
    ).orderBy("signal_a", "signal_b")


# --------------------------------------------------------------- wave 14
# Markov transition entropy per antecedent (Shannon 1948 over the
# events_transition_matrix relation) — the predictability audit of the
# behavioral bigram table: H(next | prev) near zero means the next
# event is scripted (bot traffic / instrumentation echo), near ln(K)
# means uniform. Per-cell p*ln(p) is the one float, micro-rounded per
# CELL (order-free integer sum), the probabilities are exact integer
# ratios first — the JSD-matrix recipe applied to the Markov row.


@query(
    "events_transition_entropy",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    cells AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    rows_ AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_n,
             CAST(COUNT(*) AS BIGINT) AS n_next
      FROM cells GROUP BY prev_type
    ),
    contrib AS (
      SELECT c.prev_type,
             CAST(ROUND(-ln(CAST(c.n AS DOUBLE) / r.row_n)
                        * c.n * 1000000 / r.row_n) AS BIGINT) AS micro
      FROM cells c JOIN rows_ r USING (prev_type)
    )
    SELECT r.prev_type, r.row_n AS n_transitions, r.n_next,
           CAST(SUM(co.micro) AS BIGINT) AS entropy_micro_nats
    FROM rows_ r JOIN contrib co USING (prev_type)
    GROUP BY r.prev_type, r.row_n, r.n_next
    ORDER BY r.prev_type
    """,
    tags=("llm", "events", "sequence"),
)
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-event entropy per antecedent event type (micro
    nats): H(next|prev) = -sum p ln p over the first-order Markov row,
    with p an exact integer ratio and each cell's contribution
    micro-rounded before the (order-free) integer sum. One user-keyed
    window + one (prev, next) count; everything after is
    event-type-dimension-sized."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, "events")
    seq = t.events.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    cells = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rows_ = cells.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("row_n"),
        F.count(F.lit(1)).cast("long").alias("n_next"),
    )
    contrib = cells.join(rows_, "prev_type").select(
        "prev_type",
        F.round(
            -F.log(F.col("n").cast("double") / F.col("row_n"))
            * F.col("n")
            * 1000000
            / F.col("row_n")
        )
        .cast("long")
        .alias("micro"),
    )
    return (
        rows_.join(contrib, "prev_type")
        .groupBy("prev_type", F.col("row_n").alias("n_transitions"), "n_next")
        .agg(F.sum("micro").cast("long").alias("entropy_micro_nats"))
        .orderBy("prev_type")
    )


# --------------------------------------------------------------- wave 15
# IVF cell label purity (the clustering-evaluation classic: majority
# share + Gini impurity per cluster against an external label) — the
# quantizer-quality audit the ANN family was missing: recall evals say
# whether neighbors are FOUND, purity says whether the cells MEAN
# anything w.r.t. the labels the corpus carries. Integer counts; Gini
# = 1 - sum((n_l/n)^2) as one exact-rational permille floor.


@query(
    "embedding_cell_label_purity",
    oracle=f"""
    WITH {{scored_sql}},
    cl AS (
      SELECT a.cell, e.label, CAST(COUNT(*) AS BIGINT) AS n_l
      FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id
      GROUP BY a.cell, e.label
    ),
    per AS (
      SELECT cell, CAST(SUM(n_l) AS BIGINT) AS n,
             CAST(MAX(n_l) AS BIGINT) AS n_major,
             CAST(SUM(n_l * n_l) AS BIGINT) AS sum_sq,
             CAST(COUNT(*) AS BIGINT) AS n_labels
      FROM cl GROUP BY cell
    )
    SELECT cell, n, n_labels,
           CAST(1000 * n_major // n AS BIGINT) AS majority_permille,
           CAST((1000 * n * n - 1000 * sum_sq) // (n * n) AS BIGINT)
             AS gini_permille
    FROM per ORDER BY cell
    """.format(scored_sql=_semantic_scored_sql()),
    tags=("llm", "similarity", "eval"),
)
def embedding_cell_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-IVF-cell label purity: majority-label share and Gini impurity
    (permille) against the embeddings' label column — the external-
    validity audit of the same gate-pinned quantizer the ANN and
    SemDeDup queries ride. Cell assignment is the shared map-side argmax
    projection; everything after is one (cell, label) count and
    cell-dimension arithmetic. Exact integer floors; majority ties
    resolve identically in both engines because MAX over counts is
    tie-free by value."""
    t = load_tables(spark, sf_dir, "embeddings")
    from .llm_ops import gate_ivf_centroids

    cents = gate_ivf_centroids(n_cells=_SEM_CELLS)
    if cents is None:
        cents = S.ivf_centroids(t.embeddings, n_cells=_SEM_CELLS)
    assigned = t.embeddings.select(
        "vec_id", "label", S.ivf_cell_expr(cents).alias("cell")
    )
    cl = assigned.groupBy("cell", "label").agg(
        F.count(F.lit(1)).cast("long").alias("n_l")
    )
    per = cl.groupBy("cell").agg(
        F.sum("n_l").cast("long").alias("n"),
        F.max("n_l").cast("long").alias("n_major"),
        F.sum(F.col("n_l") * F.col("n_l")).cast("long").alias("sum_sq"),
        F.count(F.lit(1)).cast("long").alias("n_labels"),
    )
    return per.select(
        "cell",
        "n",
        "n_labels",
        _idiv_col(F.lit(1000) * F.col("n_major"), F.col("n")).alias(
            "majority_permille"
        ),
        _idiv_col(
            F.lit(1000) * F.col("n") * F.col("n")
            - F.lit(1000) * F.col("sum_sq"),
            F.col("n") * F.col("n"),
        ).alias("gini_permille"),
    ).orderBy("cell")


# --------------------------------------------------------------- wave 16
# Mann-Whitney U per source vs the rest (Mann & Whitney 1947) — the
# nonparametric drift test a curation stack runs per source: does this
# source's document-length distribution differ from everything else,
# without assuming normality? U = R_1 - n_1(n_1+1)/2 from rank sums
# under ONE global ranking; ranks are row_number over (n_chars, doc_id)
# — the deterministic-total-order convention (classic average-rank tie
# handling differs under ties; stated). The z normal approximation is
# the one float (sqrt of an exact integer ratio), milli-rounded.


@query(
    "profile_mann_whitney_drift",
    oracle="""
    WITH ranked AS (
      SELECT source, CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id)
             AS BIGINT) AS rk
      FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
    per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(SUM(rk) AS BIGINT) AS r1
      FROM ranked GROUP BY source
    )
    SELECT source, n1,
           CAST(r1 - n1 * (n1 + 1) // 2 AS BIGINT) AS u_stat,
           CAST(ROUND(
             (CAST(r1 - n1 * (n1 + 1) // 2 AS DOUBLE)
              - CAST(n1 * ((SELECT n FROM tot) - n1) AS DOUBLE) / 2)
             / SQRT(CAST(n1 * ((SELECT n FROM tot) - n1) AS DOUBLE)
                    * ((SELECT n FROM tot) + 1) / 12) * 1000
           ) AS BIGINT) AS z_milli
    FROM per ORDER BY source
    """,
    tags=("llm", "quality", "eval"),
)
def profile_mann_whitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Mann-Whitney U of document length vs the complement
    (one-vs-rest), with the normal-approximation z in milli — the
    distribution-free source-drift screen. One global rank window (the
    statistic needs a total order over the pooled sample by definition)
    + one source-keyed integer aggregate; U is exact integers, z is a
    single identically-formed sqrt of exact ratios, milli-rounded."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents").documents
    ranked = docs.select(
        "source",
        F.row_number()
        .over(Window.orderBy("n_chars", "doc_id"))
        .cast("long")
        .alias("rk"),
    )
    tot = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    per = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n1"),
        F.sum("rk").cast("long").alias("r1"),
    )
    u = F.col("r1") - _idiv_col(
        F.col("n1") * (F.col("n1") + 1), F.lit(2)
    )
    n2 = F.col("n") - F.col("n1")
    z = F.round(
        (u.cast("double") - (F.col("n1") * n2).cast("double") / 2)
        / F.sqrt(
            (F.col("n1") * n2).cast("double") * (F.col("n") + 1) / 12
        )
        * 1000
    ).cast("long")
    return (
        per.crossJoin(F.broadcast(tot))
        .select("source", "n1", u.alias("u_stat"), z.alias("z_milli"))
        .orderBy("source")
    )


# --------------------------------------------------------------- wave 17
# Reliability (calibration) curve of the distilled NB quality classifier
# (the Niculescu-Mizil & Caruana 2005 diagnostic): bucket held-out docs
# by the classifier's integer log-odds margin and report the empirical
# pass rate per decile — a monotone curve means the margin is usable as
# a soft score (e.g. for temperature sampling); a flat one means only
# the argmax is trustworthy. Reuses quality_nb_distill_fidelity's score
# relation verbatim (module helper on the Spark side, shared CTE chain
# in the oracle) so the curve can never disagree with the confusion
# matrix published beside it. Margins stay integer micro log-odds —
# no sigmoid, so no new float surface.


def _build_nb_calibration_oracle() -> str:
    from .llm_ops11 import _nb_chain_sql

    return f"""
    WITH {_nb_chain_sql()},
    binned AS (
      SELECT truth, score_pass - score_fail AS margin,
             NTILE(10) OVER (ORDER BY score_pass - score_fail DESC, doc_id)
               AS decile
      FROM scored
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(1000 * SUM(CASE WHEN truth THEN 1 ELSE 0 END) // COUNT(*)
                AS BIGINT) AS pass_rate_permille,
           CAST(MIN(margin) AS BIGINT) AS margin_min,
           CAST(MAX(margin) AS BIGINT) AS margin_max
    FROM binned GROUP BY decile ORDER BY decile
    """


@query(
    "quality_nb_calibration_curve",
    oracle=_build_nb_calibration_oracle(),
    tags=("llm", "quality", "eval"),
)
def quality_nb_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability curve of the NB-distilled Gopher gate: held-out docs
    deciled by integer log-odds margin (best margin = decile 1, doc_id
    tie-break), with per-decile empirical pass rate and the margin
    range — read before using the margin as a soft quality score. The
    NTILE rides the held-out doc dimension (the selection_tradeoff
    precedent); every number is an exact integer."""
    from pyspark.sql.window import Window

    from .llm_ops11 import _nb_scored

    scored = _nb_scored(spark, sf_dir).select(
        "doc_id", "truth", (F.col("score_pass") - F.col("score_fail")).alias("margin")
    )
    binned = scored.select(
        "truth",
        "margin",
        F.ntile(10)
        .over(Window.orderBy(F.desc("margin"), F.asc("doc_id")))
        .cast("long")
        .alias("decile"),
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("truth"), 1).otherwise(0))
            .cast("long")
            .alias("n_pass"),
            F.min("margin").cast("long").alias("margin_min"),
            F.max("margin").cast("long").alias("margin_max"),
        )
        .select(
            "decile",
            "n_docs",
            "n_pass",
            _idiv_col(F.lit(1000) * F.col("n_pass"), F.col("n_docs")).alias(
                "pass_rate_permille"
            ),
            "margin_min",
            "margin_max",
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------- wave 18
# PageRank convergence curve — the measured justification for the
# family's iters=4 choice (graph_neardup_pagerank): per synchronous
# round, the L1 residual of the integer-fixed-point scores and the
# count of nodes that moved at all. Integer scores make "converged"
# EXACT (n_changed = 0 is a fixpoint, not an epsilon): the curve shows
# geometric decay and the exact round where the dup-graph ranking
# stops moving. Same update rule, seed, and floor as
# operators/graph.pagerank_fixed — (s*17) div (20*deg), seed 1e6,
# floor 150000 — so the curve describes exactly the shipped operator.

_PRC_ITERS = 6


def _build_pr_convergence_oracle() -> str:
    rounds = []
    for k in range(1, _PRC_ITERS + 1):
        rounds.append(f"""
    c{k} AS MATERIALIZED (
      SELECT e.v AS node, SUM((p.s * 17) // (20 * d.deg)) AS inc
      FROM e JOIN it{k - 1} p ON p.node = e.u JOIN deg d ON d.u = e.u
      GROUP BY e.v
    ), it{k} AS MATERIALIZED (
      SELECT n.node, CAST(150000 + COALESCE(c.inc, 0) AS BIGINT) AS s
      FROM n LEFT JOIN c{k} c USING (node)
    )""")
    residuals = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS iteration,"
        f" CAST(SUM(ABS(b.s - a.s)) AS BIGINT) AS l1_residual_micro,"
        f" CAST(SUM(CAST(b.s <> a.s AS BIGINT)) AS BIGINT) AS n_changed"
        f" FROM it{k - 1} a JOIN it{k} b USING (node)"
        for k in range(1, _PRC_ITERS + 1)
    )
    return f"""
    WITH {DUCK_SHINGLE_SETS},
    pairs AS MATERIALIZED (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM ds a JOIN ds b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) p
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
    ),
    e AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
    deg AS MATERIALIZED (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY u),
    n AS (SELECT doc_id AS node FROM documents),
    it0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS s FROM n),
    {",".join(rounds)}
    SELECT * FROM ({residuals}) ORDER BY iteration
    """


@query(
    "graph_pagerank_convergence",
    oracle=_build_pr_convergence_oracle(),
    tags=("llm", "dedup", "graph", "eval"),
)
def graph_pagerank_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-round L1 residual + moved-node count for the integer
    fixed-point PageRank over the near-dup graph (6 rounds). Isolated
    nodes are handled in closed form — they fall to the floor in round
    1 (residual 850000 each) and never move again — so the iteration
    itself stays graph-sized exactly like the shipped operator; only
    the active set shuffles per round. Expect geometric decay; the
    round where n_changed reaches zero is the exact fixpoint."""
    from ..operators import dedup as D

    t = load_tables(spark, sf_dir, "documents")
    docs = t.documents
    pairs = D.minhash_lsh_dedup(docs, threshold=0.5).select("doc_a", "doc_b")
    e = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")),
                F.struct(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")),
            )
        ).alias("p")
    ).select("p.u", "p.v")
    e = e.repartition("u")
    deg = e.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    ed = e.join(deg, "u").select("u", "v", "deg").cache()
    base = docs.select(F.col("doc_id").alias("node"))
    act = base.join(
        deg.withColumnRenamed("u", "node"), "node", "left_semi"
    ).localCheckpoint(eager=True)
    n_total = docs.count()
    n_active = act.count()
    n_isolated = n_total - n_active
    s = act.select("node", F.lit(1_000_000).cast("long").alias("s"))
    stats: list[tuple[int, int, int]] = []
    per_round = []
    try:
        for k in range(1, _PRC_ITERS + 1):
            contrib = (
                ed.join(s.withColumnRenamed("node", "u"), "u")
                .select(
                    F.col("v").alias("node"),
                    F.expr("(s * 17) div (20 * deg)").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").cast("long").alias("inc"))
            )
            # r13: LAZY checkpoint (the pagerank_fixed round pattern,
            # guide §5): s_next is referenced 3× (next round, residual
            # vs prev, residual vs next) so the checkpoint itself is
            # structurally required — but materializing it EAGERLY made
            # every round its own blocking driver job. Lazy, the whole
            # 6-round chain plus all residual aggregates evaluate in
            # the ONE collect below; each s_next still persists (and
            # its lineage truncates) at first materialization inside
            # that job, and round-k residuals overlap round-k+1 stages.
            s_next = (
                act.join(contrib, "node", "left")
                .select(
                    "node",
                    (F.lit(150_000) + F.coalesce(F.col("inc"), F.lit(0)))
                    .cast("long")
                    .alias("s"),
                )
                .localCheckpoint(eager=False)
            )
            # residual aggregates are DEFERRED: both inputs are
            # checkpointed, so the per-round join+agg is a cheap replay
            # — one unioned collect at the end instead of one driver
            # round-trip per iteration (r12, guide §5: 6 jobs → 1)
            per_round.append(
                s.withColumnRenamed("s", "s_prev")
                .join(s_next, "node")
                .agg(
                    F.sum(F.abs(F.col("s") - F.col("s_prev")))
                    .cast("long")
                    .alias("resid"),
                    F.sum((F.col("s") != F.col("s_prev")).cast("long"))
                    .cast("long")
                    .alias("moved"),
                )
                .select(F.lit(k).cast("long").alias("k"), "resid", "moved")
            )
            s = s_next
        allstats = per_round[0]
        for d in per_round[1:]:
            allstats = allstats.unionByName(d)
        by_k = {int(r["k"]): r for r in allstats.collect()}
        for k in range(1, _PRC_ITERS + 1):
            row = by_k[k]
            resid, moved = int(row["resid"] or 0), int(row["moved"] or 0)
            if k == 1:  # isolated nodes: 1e6 -> floor, closed form
                resid += n_isolated * 850_000
                moved += n_isolated
            stats.append((k, resid, moved))
    finally:
        ed.unpersist()
    return spark.createDataFrame(
        stats, "iteration long, l1_residual_micro long, n_changed long"
    )


# --------------------------------------------------------------- wave 19
# LSH banding-curve calibration (Leskovec/Rajaraman/Ullman's S-curve,
# ch. 3): per exact-Jaccard bucket, the fraction of true pairs the
# banded MinHash-LSH actually surfaced as candidates, beside the
# theoretical 1-(1-J^r)^b at the bucket midpoint. dedup_lsh_recall_eval
# pins the J>=0.5 aggregate; this is the full calibration curve — where
# the measured recall leaves the theory, the permutation family (not
# the banding math) is what drifted. Theory values are import-time
# python literals (no engine float); the measured side is pure counts;
# the one shared float is the exact-Jaccard ratio both engines already
# agree on everywhere else.

_LSH_J_FLOOR = 0.3  # curve floor: below this the S-curve is ~0 by design


def _lsh_theory_micro(j_mid: float) -> int:
    from ..operators.dedup import LSH_BANDS, LSH_ROWS

    p_band = j_mid**LSH_ROWS
    return round(1_000_000 * (1.0 - (1.0 - p_band) ** LSH_BANDS))


_LSH_THEORY = {b: _lsh_theory_micro((b + 0.5) / 10) for b in range(3, 10)}


def _build_lsh_curve_oracle() -> str:
    from ..operators.dedup import LSH_BANDS, LSH_ROWS, MINHASH_AB, N_MINHASH
    from ..operators.text import MOD, duck_char_fold

    mh = ", ".join(
        f"CAST(MIN(({a} * h + {b}) % {MOD}) AS BIGINT) AS mh_{j}"
        for j, (a, b) in enumerate(MINHASH_AB)
    )
    band_rows = []
    for bi in range(LSH_BANDS):
        cols = [f"mh_{bi * LSH_ROWS + r}" for r in range(LSH_ROWS)]
        sig = " || '-' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_rows.append(f"SELECT doc_id, {bi} AS band, {sig} AS key FROM sigs")
    bands = " UNION ALL ".join(band_rows)
    theory = ", ".join(f"({b}, {m})" for b, m in _LSH_THEORY.items())
    return f"""
    WITH {DUCK_SHINGLE_SETS},
    hashed AS MATERIALIZED (
      SELECT doc_id, {duck_char_fold('sh')} AS h FROM ds
    ),
    sigs AS MATERIALIZED (SELECT doc_id, {mh} FROM hashed GROUP BY doc_id),
    bands AS MATERIALIZED ({bands}),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    exact AS MATERIALIZED (
      SELECT doc_a, doc_b,
             CAST(FLOOR(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) * 10)
                  AS BIGINT) AS j_bucket
      FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM ds a JOIN ds b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) p
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {_LSH_J_FLOOR}
    ),
    theory(j_bucket, p_theory_micro) AS (VALUES {theory})
    SELECT t.j_bucket,
           CAST(COALESCE(COUNT(e.doc_a), 0) AS BIGINT) AS n_true_pairs,
           CAST(COALESCE(SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS n_candidates,
           CAST(CASE WHEN COUNT(e.doc_a) > 0
                THEN 1000 * SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0
                                END) // COUNT(e.doc_a)
                ELSE -1 END AS BIGINT) AS recall_permille,
           CAST(t.p_theory_micro AS BIGINT) AS p_theory_micro
    FROM theory t
    LEFT JOIN exact e ON e.j_bucket = t.j_bucket
    LEFT JOIN cand c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
    GROUP BY t.j_bucket, t.p_theory_micro
    ORDER BY t.j_bucket
    """


@query(
    "dedup_lsh_band_curve",
    oracle=_build_lsh_curve_oracle(),
    tags=("llm", "dedup", "eval"),
)
def dedup_lsh_band_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH S-curve, measured: per exact-Jaccard decile bucket
    (J >= 0.3), how many true pairs exist, how many the banded MinHash
    surfaced as candidates, the measured recall, and the theoretical
    1-(1-J^r)^b at the bucket midpoint (import-time literal). Empty
    buckets report -1 recall rather than a silent omission. The exact
    side is the duplication-bounded shingle self-join (the recall-eval
    convention — ground truth is allowed to be exact); the candidate
    side is the production banding. This is the table that says whether
    the 12x2 banding matches its own math on a REAL corpus."""
    from ..operators import dedup as D

    t = load_tables(spark, sf_dir, "documents")
    docs = t.documents
    ds = D.shingle_sets(docs).cache()
    try:
        sigs = D.minhash_signatures(docs, shingle_df=ds)
        cand = D.lsh_candidate_pairs(sigs).withColumn("hit", F.lit(True))
        exact = D.jaccard_pairs(
            docs, threshold=_LSH_J_FLOOR, shingle_df=ds
        ).select(
            "doc_a",
            "doc_b",
            F.floor(F.col("jaccard") * 10).cast("long").alias("j_bucket"),
        )
        theory_df = spark.createDataFrame(
            sorted(_LSH_THEORY.items()), "j_bucket long, p_theory_micro long"
        )
        joined = exact.join(cand, ["doc_a", "doc_b"], "left")
        per = joined.groupBy("j_bucket").agg(
            F.count(F.lit(1)).cast("long").alias("n_true_pairs"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0))
            .cast("long")
            .alias("n_candidates"),
        )
        out = (
            F.broadcast(theory_df)
            .join(per, "j_bucket", "left")
            .select(
                "j_bucket",
                F.coalesce("n_true_pairs", F.lit(0)).cast("long").alias(
                    "n_true_pairs"
                ),
                F.coalesce("n_candidates", F.lit(0)).cast("long").alias(
                    "n_candidates"
                ),
                F.when(
                    F.coalesce(F.col("n_true_pairs"), F.lit(0)) > 0,
                    _idiv_col(
                        F.lit(1000) * F.coalesce(F.col("n_candidates"), F.lit(0)),
                        F.coalesce(F.col("n_true_pairs"), F.lit(1)),
                    ),
                )
                .otherwise(F.lit(-1).cast("long"))
                .alias("recall_permille"),
                "p_theory_micro",
            )
            .orderBy("j_bucket")
        )
        out = out.localCheckpoint(eager=True)
    finally:
        ds.unpersist()
    return out


# --------------------------------------------------------------- wave 20
# Kolmogorov-Smirnov two-sample drift per source (Kolmogorov 1933;
# Smirnov 1939) — the ECDF companion to the Mann-Whitney screen: MW
# detects location shift, KS detects ANY distribution difference. The
# supremum is attained just after/before a jump of the source's own
# ECDF, so per source only its own points need evaluating (the scipy
# evaluation trick): with p_k the pooled rank of the source's k-th
# point, D = max_k max(k*n2 - (p_k-k)*n1, (p_k-k)*n1 - (k-1)*n2)
# / (n1*n2) — integer numerators, one final exact division, and the
# asymptotic z = sqrt(n1*n2/N)*D as the single milli-rounded float.


@query(
    "profile_ks_source_drift",
    oracle="""
    WITH ranked AS (
      SELECT source,
             CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
               AS p,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS BIGINT)
               AS k
      FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
    per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(MAX(GREATEST(
               k * ((SELECT n FROM tot) - (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM ranked r2 WHERE r2.source = ranked.source))
                 - (p - k) * (SELECT CAST(COUNT(*) AS BIGINT) FROM ranked r2
                              WHERE r2.source = ranked.source),
               (p - k) * (SELECT CAST(COUNT(*) AS BIGINT) FROM ranked r2
                          WHERE r2.source = ranked.source)
                 - (k - 1) * ((SELECT n FROM tot)
                              - (SELECT CAST(COUNT(*) AS BIGINT) FROM ranked
                                 r2 WHERE r2.source = ranked.source))
             )) AS BIGINT) AS d_num
      FROM ranked GROUP BY source
    )
    SELECT source, n1,
           CAST(1000 * d_num // (n1 * ((SELECT n FROM tot) - n1)) AS BIGINT)
             AS d_milli,
           CAST(ROUND(SQRT(CAST(n1 AS DOUBLE)
                           * ((SELECT n FROM tot) - n1)
                           / (SELECT n FROM tot))
                      * d_num / (n1 * ((SELECT n FROM tot) - n1))
                      * 1000) AS BIGINT) AS z_milli
    FROM per ORDER BY source
    """,
    tags=("llm", "quality", "eval"),
)
def profile_ks_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source two-sample KS statistic of document length vs the
    complement: D (milli) from exact-integer ECDF extremes and the
    asymptotic z = sqrt(n1*n2/N)*D (milli, the one float). One global
    rank + one per-source rank over the same sort order, then a keyed
    integer max — the supremum needs only the source's own jump points,
    so nothing materializes beyond the doc relation."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents").documents
    ranked = docs.select(
        "source",
        F.row_number()
        .over(Window.orderBy("n_chars", "doc_id"))
        .cast("long")
        .alias("p"),
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .cast("long")
        .alias("k"),
    )
    tot = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    sizes = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n1")
    )
    joined = ranked.join(F.broadcast(sizes), "source").crossJoin(
        F.broadcast(tot)
    )
    n2 = F.col("n") - F.col("n1")
    d_plus = F.col("k") * n2 - (F.col("p") - F.col("k")) * F.col("n1")
    d_minus = (F.col("p") - F.col("k")) * F.col("n1") - (
        F.col("k") - 1
    ) * n2
    per = joined.groupBy("source", "n1", "n").agg(
        F.max(F.greatest(d_plus, d_minus)).cast("long").alias("d_num")
    )
    denom = F.col("n1") * (F.col("n") - F.col("n1"))
    z = F.round(
        F.sqrt(
            F.col("n1").cast("double")
            * (F.col("n") - F.col("n1"))
            / F.col("n")
        )
        * F.col("d_num")
        / denom
        * 1000
    ).cast("long")
    return per.select(
        "source",
        "n1",
        _idiv_col(F.lit(1000) * F.col("d_num"), denom).alias("d_milli"),
        z.alias("z_milli"),
    ).orderBy("source")
