"""Round-11 operator waves.

Wave 1 — Adamic-Adar hub cap, measured (r10 VERDICT task #4): the
registered ``graph_adamic_adar_linkpred`` (llm_ops14) is exact and
uncapped; its wedge volume is Σ deg(w)², which hub parts dominate at
production scale. The standard mitigation (Liben-Nowell & Kleinberg,
CIKM 2003 practice): drop wedge CENTERS with degree above a cap D —
each dropped center contributes only 1/ln(deg) per wedge (the smallest
terms in the score, by Adamic-Adar's own design), and per-center
fan-out becomes bounded at C(D,2). ``graph_adamic_adar_hubcapped``
REGISTERS the capped shape and measures exactly what the cap costs on
this corpus: wedge volume kept, AA mass kept, and top-20 agreement with
the uncapped registered row — the same measure-the-caveat discipline as
the CDC explode row and the SemDeDup cell sweep. Both engines
single-source the graph from llm_ops14 (``_aa_graph`` /
``_AA_GRAPH_CTES``), so the comparison can never drift from the row it
names.

House rules (llm_ops.py): integer fixed-point for every ranked
comparison, deterministic tie-breaks, every aggregate aliased
identically in Spark and the oracle.

Reference basis: the reference engine (sea-streamer, Rust) has no ops
layer — this family exists for the 100 TB training-data pipeline
mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..sources.tables import load_tables
from .llm_ops import cell_structs_sql, oracle_ivf_centroids, _duck_cosine
from .llm_ops3 import _SEM_THRESHOLD
from .registry import query

# ---------------------------------------------------------------- wave 1
# Hub-capped Adamic-Adar: the production posture of llm_ops14's
# registered AA row, with the cap's cost MEASURED in-row.

#: wedge-center degree cap. deg > 8 centers contribute < 1/ln(8) ≈ 0.48
#: per wedge but C(deg,2) wedges each — the classic volume/information
#: inversion the cap exploits. At the test scales the cap genuinely
#: bites (sf0.001's dense co-purchase graph keeps only ~2‰ of wedges;
#: sf0.1 keeps ~930‰), so the measured columns span both regimes.
_AA_DEG_CAP = 8

#: AA term: micro-rounded 1/ln(deg) — identical expression in both
#: engines (single float per term, rounded before the order-free sum),
#: exactly as the registered uncapped row computes it.
_AA_TERM_SQL = "CAST(ROUND(1000000 / ln(CAST(dw.d AS DOUBLE))) AS BIGINT)"


def _build_aa_hubcap_oracle() -> str:
    from .llm_ops14 import _AA_GRAPH_CTES

    return f"""
    WITH {_AA_GRAPH_CTES},
    cand AS (
      SELECT wg.u, wg.v,
             CAST(SUM({_AA_TERM_SQL}) AS BIGINT) AS aa_micro,
             CAST(SUM(CASE WHEN dw.d <= {_AA_DEG_CAP}
                      THEN {_AA_TERM_SQL} ELSE 0 END) AS BIGINT) AS aa_cap
      FROM wedges wg JOIN deg dw ON dw.u = wg.w
      WHERE NOT EXISTS (SELECT 1 FROM pairs p
                        WHERE p.pa = wg.u AND p.pb = wg.v)
      GROUP BY wg.u, wg.v
    ),
    wvol AS (
      SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges_total,
             CAST(SUM(CASE WHEN d <= {_AA_DEG_CAP}
                      THEN d * (d - 1) // 2 ELSE 0 END) AS BIGINT)
               AS n_wedges_kept
      FROM deg
    ),
    mass AS (
      SELECT CAST(SUM(aa_micro) AS BIGINT) AS m_all,
             CAST(SUM(aa_cap) AS BIGINT) AS m_cap
      FROM cand
    ),
    top_u AS (
      SELECT u, v FROM cand
      ORDER BY aa_micro DESC, u, v LIMIT 20
    ),
    top_c AS (
      SELECT u, v FROM cand WHERE aa_cap > 0
      ORDER BY aa_cap DESC, u, v LIMIT 20
    ),
    ovl AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_top20_overlap
      FROM top_u JOIN top_c USING (u, v)
    )
    SELECT CAST({_AA_DEG_CAP} AS BIGINT) AS d_cap,
           wvol.n_wedges_total, wvol.n_wedges_kept,
           CAST(1000 * wvol.n_wedges_kept // wvol.n_wedges_total AS BIGINT)
             AS wedge_share_permille,
           CAST(1000 * mass.m_cap // mass.m_all AS BIGINT)
             AS aa_mass_kept_permille,
           ovl.n_top20_overlap
    FROM wvol, mass, ovl
    """


@query(
    "graph_adamic_adar_hubcapped",
    oracle=_build_aa_hubcap_oracle(),
    tags=("relational", "graph", "eval"),
)
def graph_adamic_adar_hubcapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the degree-D hub cap costs Adamic-Adar on this corpus — one
    measured row: wedge volume kept (the cap's whole point: per-center
    fan-out bounded at C(D,2), so total volume is ≤ N·C(D,2)/ something
    linear in nodes instead of Σ deg²), AA score mass kept (the dropped
    terms are the 1/ln(deg)-smallest), and top-20 agreement with the
    registered uncapped row. The graph and the AA term are
    single-sourced from llm_ops14 (``_aa_graph``; same micro-rounded
    float), so this row measures the CAP, not a reimplementation.

    Shape: the wedge join runs ONCE (both sums in one keyed aggregate
    via F.when); rankings and overlap run on the already-aggregated
    candidate relation; the five scalars ride broadcast crossJoins."""
    from .llm_ops12 import _idiv_col
    from .llm_ops14 import _aa_graph

    pairs, e, deg, wedges = _aa_graph(spark, sf_dir)
    unlinked = wedges.join(
        pairs.select(F.col("pa").alias("u"), F.col("pb").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    term = F.round(
        F.lit(1_000_000) / F.log(F.col("d").cast("double"))
    ).cast("long")
    cand = (
        unlinked.join(deg.withColumnRenamed("u", "w"), "w")
        .groupBy("u", "v")
        .agg(
            F.sum(term).cast("long").alias("aa_micro"),
            F.sum(
                F.when(F.col("d") <= F.lit(_AA_DEG_CAP), term).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("aa_cap"),
        )
    )
    # d·(d−1) is even, so long-space `div 2` is exact (no double division)
    wedge_n = F.expr("(d * (d - 1)) div 2").cast("long")
    wvol = deg.agg(
        F.sum(wedge_n).cast("long").alias("n_wedges_total"),
        F.sum(
            F.when(F.col("d") <= F.lit(_AA_DEG_CAP), wedge_n).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("n_wedges_kept"),
    )
    mass = cand.agg(
        F.sum("aa_micro").cast("long").alias("m_all"),
        F.sum("aa_cap").cast("long").alias("m_cap"),
    )
    top_u = cand.orderBy(F.desc("aa_micro"), "u", "v").limit(20).select(
        "u", "v"
    )
    top_c = (
        cand.filter(F.col("aa_cap") > 0)
        .orderBy(F.desc("aa_cap"), "u", "v")
        .limit(20)
        .select("u", "v")
    )
    ovl = top_u.join(top_c, ["u", "v"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_top20_overlap")
    )
    return (
        wvol.crossJoin(F.broadcast(mass))
        .crossJoin(F.broadcast(ovl))
        .select(
            F.lit(_AA_DEG_CAP).cast("long").alias("d_cap"),
            "n_wedges_total",
            "n_wedges_kept",
            _idiv_col(
                F.col("n_wedges_kept"), F.col("n_wedges_total"), scale=1000
            ).alias("wedge_share_permille"),
            _idiv_col(F.col("m_cap"), F.col("m_all"), scale=1000).alias(
                "aa_mass_kept_permille"
            ),
            "n_top20_overlap",
        )
    )


# ---------------------------------------------------------------- wave 2
# Planted-near-dup SemDeDup recall (r10 VERDICT task #1): the r10 cell
# sweep proved candidate-volume LINEARITY of the scaled cell count, but
# its recall column is measured on synthetic embeddings that do not
# cluster semantically, so recall falls monotonically with cells
# (229‰ → 111‰) and the sweep cannot show the operating point SemDeDup's
# regime (arXiv:2303.09540: near-dups are ε-perturbations of shared
# content) actually buys. This wave PLANTS that regime deterministically
# in BOTH engines, derived from the embeddings table itself: every
# vec_id ≡ 0 (mod 10) base spawns 3 replicas, replica j scaling
# dimension j−1 by ×1.25 (within-cluster cosine ≈ 0.999 ≥ the 0.45
# threshold — measured, every planted pair is in the exact truth at all
# three sfs). The sweep below then measures, per quantizer size, recall
# over PLANTED pairs (true near-dups) separately from overall truth
# recall (dominated by the organic random-cosine pairs the r10 sweep
# measured): at the `semantic_cells_for(N)` rung, planted recall stays
# ≥ ~900‰ (measured: 970/1000/946‰ at sf0.001/0.01/0.1) while candidate
# volume stays well under 32·N — the missing half of the r9/r10
# evidence. Fixture generator: tools/gen_planted_fixture.py; schema:
# FIXTURES.md §4.

_PLANTED_STRIDE = 10
_PLANTED_REPS = 3
_PLANTED_FACTOR = 1.25
_PLANTED_ID_BASE = 1_000_000
#: swept quantizer sizes: 16 = the r9 fixed pin, 32/128 = the
#: semantic_cells_for rungs the planted corpus sizes (650 / 2600) hit.
_PLANTED_SWEEP = (16, 32, 128)
_SEM_TARGET_POP = 32


def planted_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planted-near-dup corpus: base embeddings (widened to double)
    plus, for every base with ``vec_id % 10 == 0``, replicas j = 1..3
    with dimension j−1 scaled ×1.25. Replica id = 1_000_000 +
    base·100 + j, so ``base_key = (id − 1_000_000) // 100 if id ≥ 10^6
    else id`` recovers the planted cluster. Both engines derive the
    corpus from the same expression (Spark ``F.transform`` with 0-based
    index; DuckDB indexed lambda, 1-based) — identical IEEE doubles, no
    side files."""
    emb = load_tables(spark, sf_dir, "embeddings").embeddings
    js = spark.range(1, _PLANTED_REPS + 1).select(
        F.col("id").cast("int").alias("j")
    )
    reps = (
        emb.filter(F.col("vec_id") % _PLANTED_STRIDE == 0)
        .crossJoin(F.broadcast(js))
        .select(
            (
                F.lit(_PLANTED_ID_BASE)
                + F.col("vec_id") * 100
                + F.col("j")
            )
            .cast("long")
            .alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    i == F.col("j") - 1,
                    x.cast("double") * F.lit(_PLANTED_FACTOR),
                ).otherwise(x.cast("double")),
            ).alias("embedding"),
        )
    )
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    return base.unionByName(reps)


_PLANTED_CORPUS_SQL = f"""corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
      FROM embeddings
      UNION ALL
      SELECT {_PLANTED_ID_BASE} + e.vec_id * 100 + j.j AS vec_id,
             list_transform(CAST(e.embedding AS DOUBLE[]),
                            (x, i) -> CASE WHEN i = j.j
                                      THEN x * {_PLANTED_FACTOR}
                                      ELSE x END) AS embedding
      FROM embeddings e
      CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) j
      WHERE e.vec_id % {_PLANTED_STRIDE} = 0
    )"""

_BASE_KEY_SQL = (
    "CASE WHEN {id} >= " + str(_PLANTED_ID_BASE) + " THEN ({id} - "
    + str(_PLANTED_ID_BASE) + ") // 100 ELSE {id} END"
)


def _build_planted_sweep_oracle() -> str:
    assigns = []
    rows = []
    for k in _PLANTED_SWEEP:
        C = oracle_ivf_centroids(n_cells=k, iters=8)
        if C is None:  # gate data absent: oracle never runs, placeholder
            return "SELECT 1 AS n_cells"
        structs = cell_structs_sql(C)
        assigns.append(
            f"""assign{k} AS (
      SELECT vec_id,
             CAST(-(list_aggregate([{structs}], 'max').negcell) AS BIGINT)
               AS cell
      FROM corpus
    )"""
        )
        rows.append(
            f"""
      SELECT CAST({k} AS BIGINT) AS n_cells,
             (SELECT n FROM nv) AS n_vectors,
             (SELECT t FROM nt) AS n_true_pairs,
             (SELECT pl FROM nt) AS n_planted_pairs,
             (SELECT CAST(COALESCE(SUM(pop * (pop - 1)), 0) // 2 AS BIGINT)
              FROM (SELECT CAST(COUNT(*) AS BIGINT) AS pop
                    FROM assign{k} GROUP BY cell)) AS n_candidate_pairs,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM truth p
                JOIN assign{k} x ON x.vec_id = p.va
                JOIN assign{k} y ON y.vec_id = p.vb
              WHERE x.cell = y.cell) AS n_true_colocated,
             (SELECT CAST(COALESCE(SUM(CASE WHEN p.planted THEN 1 ELSE 0
                                        END), 0) AS BIGINT) FROM truth p
                JOIN assign{k} x ON x.vec_id = p.va
                JOIN assign{k} y ON y.vec_id = p.vb
              WHERE x.cell = y.cell) AS n_planted_colocated"""
        )
    assigns_sql = ",\n    ".join(assigns)
    union_sql = "\n      UNION ALL".join(rows)
    key_a = _BASE_KEY_SQL.format(id="a.vec_id")
    key_b = _BASE_KEY_SQL.format(id="b.vec_id")
    return f"""
    WITH {_PLANTED_CORPUS_SQL},
    truth AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             ({key_a}) = ({key_b}) AS planted
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE {_duck_cosine('a.embedding', 'b.embedding')} >= {_SEM_THRESHOLD}
    ),
    nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM corpus),
    nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t,
                  CAST(COALESCE(SUM(CASE WHEN planted THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS pl
           FROM truth),
    {assigns_sql},
    raw AS ({union_sql}
    )
    SELECT n_cells, n_vectors, n_true_pairs, n_planted_pairs,
           n_candidate_pairs, n_true_colocated, n_planted_colocated,
           CAST(CASE WHEN n_true_pairs > 0
                THEN 1000 * n_true_colocated // n_true_pairs
                ELSE 1000 END AS BIGINT) AS recall_permille,
           CAST(CASE WHEN n_planted_pairs > 0
                THEN 1000 * n_planted_colocated // n_planted_pairs
                ELSE 1000 END AS BIGINT) AS planted_recall_permille,
           CAST(CASE WHEN n_vectors > 1
                THEN CAST(1000 AS HUGEINT) * n_candidate_pairs
                     // (CAST(n_vectors AS HUGEINT) * (n_vectors - 1) // 2)
                ELSE 0 END AS BIGINT) AS candidate_share_permille,
           (n_cells >= (n_vectors + {_SEM_TARGET_POP - 1})
                       // {_SEM_TARGET_POP}
            AND n_cells // 2 < (n_vectors + {_SEM_TARGET_POP - 1})
                               // {_SEM_TARGET_POP}) AS recommended
    FROM raw ORDER BY n_cells
    """


@query(
    "dedup_semantic_recall_planted",
    oracle=_build_planted_sweep_oracle(),
    tags=("llm", "dedup", "eval"),
)
def dedup_semantic_recall_planted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SemDeDup recall where true near-dups actually exist (r10 VERDICT
    task #1): the cell sweep re-run on the planted-near-dup corpus
    (``planted_embeddings`` — every 10th base + 3 deterministic ×1.25
    single-dimension replicas, within-cluster cosine ≈ 0.999), with
    recall over PLANTED pairs reported beside overall truth recall. The
    r10 sweep's falling recall column (229‰ → 111‰) measured organic
    random-cosine pairs on non-clustering noise; here the planted
    column shows the paper's operating point: at the recommended
    ``semantic_cells_for(N)`` rung the ε-perturbation clusters land in
    one cell (planted recall ≥ ~900‰ at every sf) while candidate
    volume stays under 32·N — linearity and recall TOGETHER. Truth side
    is the blocked numpy tile sweep (exact all-pairs BY DESIGN); the
    counting side never leaves vec_id/cell-keyed equi-joins; quantizers
    are the gate-trained k-means family (train-once-apply-at-any-scale,
    so each size matches its centroid-literal oracle at every sf)."""
    from .llm_ops import gate_ivf_centroids

    corpus = planted_embeddings(spark, sf_dir)
    n_vec = corpus.count()
    key_a = _BASE_KEY_SQL.format(id="va")
    key_b = _BASE_KEY_SQL.format(id="vb")
    truth = (
        S.exact_cosine_pairs(corpus, _SEM_THRESHOLD)
        .select(
            F.col("id_a").alias("va"),
            F.col("id_b").alias("vb"),
        )
        .withColumn(
            "planted",
            F.expr(key_a.replace("//", "div")) == F.expr(
                key_b.replace("//", "div")
            ),
        )
        .cache()
    )
    per_k = []
    for k in _PLANTED_SWEEP:
        cents = gate_ivf_centroids(n_cells=k)
        if cents is None:
            cents = S.ivf_centroids(corpus, n_cells=k)
        per_k.append(
            corpus.select(
                F.lit(k).cast("long").alias("k"),
                "vec_id",
                S.ivf_cell_expr(cents).alias("cell"),
            )
        )
    cells_all = per_k[0]
    for d in per_k[1:]:
        cells_all = cells_all.unionByName(d)
    cells_all = cells_all.cache()
    out = []
    try:
        tstats = truth.agg(
            F.count(F.lit(1)).cast("long").alias("t"),
            F.coalesce(
                F.sum(F.when(F.col("planted"), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("pl"),
        ).collect()[0]
        n_true, n_planted = tstats["t"], tstats["pl"]
        pair2 = {
            r["k"]: r["p2"]
            for r in cells_all.groupBy("k", "cell")
            .agg(F.count(F.lit(1)).cast("long").alias("pop"))
            .groupBy("k")
            .agg(
                F.coalesce(
                    F.sum(F.col("pop") * (F.col("pop") - 1)), F.lit(0)
                )
                .cast("long")
                .alias("p2")
            )
            .collect()
        }
        xa = cells_all.select(
            "k", F.col("vec_id").alias("va"), F.col("cell").alias("cell_a")
        )
        xb = cells_all.select(
            "k", F.col("vec_id").alias("vb"), F.col("cell").alias("cell_b")
        )
        coloc = {
            r["k"]: (r["n"], r["npl"])
            for r in truth.join(xa, "va")
            .join(xb, ["k", "vb"])
            .filter(F.col("cell_a") == F.col("cell_b"))
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.coalesce(
                    F.sum(F.when(F.col("planted"), 1).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias("npl"),
            )
            .collect()
        }
        for k in _PLANTED_SWEEP:
            n_cand = pair2.get(k, 0) // 2
            n_coloc, n_pl_coloc = coloc.get(k, (0, 0))
            c = (n_vec + _SEM_TARGET_POP - 1) // _SEM_TARGET_POP
            out.append(
                (
                    k,
                    n_vec,
                    n_true,
                    n_planted,
                    n_cand,
                    n_coloc,
                    n_pl_coloc,
                    (1000 * n_coloc) // n_true if n_true else 1000,
                    (1000 * n_pl_coloc) // n_planted if n_planted else 1000,
                    (1000 * n_cand) // (n_vec * (n_vec - 1) // 2)
                    if n_vec > 1
                    else 0,
                    bool(k >= c and k // 2 < c),
                )
            )
    finally:
        truth.unpersist()
        cells_all.unpersist()
    return spark.createDataFrame(
        out,
        "n_cells long, n_vectors long, n_true_pairs long, "
        "n_planted_pairs long, n_candidate_pairs long, "
        "n_true_colocated long, n_planted_colocated long, "
        "recall_permille long, planted_recall_permille long, "
        "candidate_share_permille long, recommended boolean",
    ).orderBy("n_cells")
