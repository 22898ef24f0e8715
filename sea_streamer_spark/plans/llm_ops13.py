"""Round-9 operator waves, part 2 (waves 21+).

Wave 21 — exact ROC-AUC of the NB quality classifier via the rank-sum
identity (Hanley & McNeil 1982; AUC = U/(n⁺n⁻) with the Mann-Whitney U
from midranks): the threshold-free companion to the calibration curve
(llm_ops12 wave 17) and the fidelity table (llm_ops11 wave 13). All
integer: doubled midranks keep tie averages exact, one final integer
floor division emits micro units.

Wave 22 — Mann-Kendall trend test + Sen's slope over daily event counts
(Mann 1945; Kendall 1975; Sen 1968): the standard nonparametric
monotone-trend screen a pipeline runs on its ingest volumes. S and the
tie-corrected 18·Var(S) are exact integers; z is the single
milli-rounded float; Sen's slope is the lower-median pairwise slope
(median convention documented — no fraction averaging, so the statistic
stays exactly representable).

House rules (llm_ops.py): integer fixed-point for every ranked
comparison, deterministic tie-breaks, every aggregate aliased
identically in Spark and the oracle.

Reference basis: the reference engine (sea-streamer, Rust) has no ops
layer — this family exists for the 100 TB training-data pipeline
mandate, not for parity with a reference file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.curation import duck_split_bucket
from ..sources.tables import load_tables
from .llm_ops import DUCK_SHINGLE_SETS
from .llm_ops11 import _nb_chain_sql, _nb_scored
from .llm_ops12 import _idiv_col
from .registry import query

# ---------------------------------------------------------------- wave 21
# Exact AUC. The ranking is over the NB log-odds margin
# (score_pass - score_fail, already exact integer micro-nats from the
# distillation chain). Midranks handle ties exactly when doubled:
# 2·midrank = 2·RANK() + |tie group| - 1 (RANK is the competition rank =
# the smallest rank in the tie group; the largest is RANK()+|group|-1,
# and the midrank is their mean). Then with R⁺ the positive midrank sum,
# U = R⁺ - n⁺(n⁺+1)/2 and AUC = U/(n⁺n⁻); doubling both sides keeps
# every intermediate an integer: u_stat_x2 = 2R⁺ - n⁺(n⁺+1),
# auc_micro = 10⁶·u_stat_x2 // (2·n⁺·n⁻).


@query(
    "quality_nb_auc_eval",
    oracle=f"""
    WITH {_nb_chain_sql()},
    mr AS (
      SELECT truth,
             2 * RANK() OVER (ORDER BY score_pass - score_fail)
               + COUNT(*) OVER (PARTITION BY score_pass - score_fail) - 1
               AS mr2
      FROM scored
    ),
    t AS (
      SELECT CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN truth THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
             CAST(SUM(CASE WHEN truth THEN mr2 ELSE 0 END) AS BIGINT) AS r2p
      FROM mr
    )
    SELECT n_pos, n_neg,
           CAST(r2p - n_pos * (n_pos + 1) AS BIGINT) AS u_stat_x2,
           CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1
                ELSE (r2p - n_pos * (n_pos + 1)) * 1000000
                     // (2 * n_pos * n_neg) END AS BIGINT) AS auc_micro
    FROM t
    """,
    tags=("llm", "quality", "eval"),
)
def quality_nb_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free ROC-AUC of the distilled NB quality gate on the
    held-out docs, computed exactly from doubled midranks over the
    integer log-odds margin (no floats anywhere — the final value is an
    exact integer floor division in micro units). -1 flags a degenerate
    single-class eval set rather than a silent NULL. The global rank
    window is the registry's rank-statistic convention (KS/MW posture);
    the 100 TB swap is a two-pass histogram rank (count-by-margin,
    prefix-sum the dimension-sized histogram, broadcast back)."""
    scored = _nb_scored(spark, sf_dir).select(
        "truth", (F.col("score_pass") - F.col("score_fail")).alias("m")
    )
    mr = scored.select(
        "truth",
        (
            F.lit(2) * F.rank().over(Window.orderBy("m"))
            + F.count(F.lit(1)).over(Window.partitionBy("m"))
            - 1
        )
        .cast("long")
        .alias("mr2"),
    )
    t = mr.agg(
        F.sum(F.when(F.col("truth"), 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(F.col("truth"), 0).otherwise(1)).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("truth"), F.col("mr2")).otherwise(0))
        .cast("long")
        .alias("r2p"),
    )
    u2 = F.col("r2p") - F.col("n_pos") * (F.col("n_pos") + 1)
    return t.select(
        "n_pos",
        "n_neg",
        u2.cast("long").alias("u_stat_x2"),
        F.when((F.col("n_pos") == 0) | (F.col("n_neg") == 0), F.lit(-1))
        .otherwise(
            _idiv_col(
                u2 * 1_000_000, F.lit(2) * F.col("n_pos") * F.col("n_neg")
            )
        )
        .cast("long")
        .alias("auc_micro"),
    )


# ---------------------------------------------------------------- wave 22
# Mann-Kendall + Sen. Day-pair relations are dimension-bounded (the
# fixture spans 30 days → 435 pairs per event type; a year is 66k pairs
# — never event-grain). S and 18·Var(S) stay exact integers (the tie
# correction subtracts Σ t(t-1)(2t+5) over tied daily-count values);
# z = (S∓1)/√(Var) is the single milli-rounded float. Sen's slope is
# the LOWER median of the 435 pairwise slopes (c_j-c_i)/(d_j-d_i) —
# picking an order statistic instead of averaging the middle two keeps
# the reported value an actually-attained slope; each pair's slope is
# milli-rounded once (one float per pair, same IEEE divide both
# engines), then the order statistic is exact with a (slope, gap, day)
# tie-break.


@query(
    "events_mann_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    n AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1
                  ELSE 0 END AS sgn,
             CAST(ROUND(1000.0 * (b.c - a.c)
                        / (b.day - a.day)) AS BIGINT) AS slope_milli,
             CAST(b.day - a.day AS BIGINT) AS gap,
             a.day AS day_a
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    ),
    s AS (
      SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY 1
    ),
    ties AS (
      SELECT event_type,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
      FROM (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
        FROM daily GROUP BY event_type, c
      ) GROUP BY 1
    ),
    sen AS (
      SELECT event_type, slope_milli AS sen_slope_milli
      FROM (
        SELECT event_type, slope_milli,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY slope_milli, gap, day_a) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS np
        FROM pairs
      ) WHERE rn = (np + 1) // 2
    )
    SELECT n.event_type, n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - ties.tie18 AS BIGINT) AS var18,
           CAST(CASE WHEN s.s_stat = 0 OR
                     n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                       - ties.tie18 = 0 THEN 0
                ELSE ROUND((s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
                                            ELSE -1 END)
                     / SQRT((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                             - ties.tie18) / 18.0) * 1000)
                END AS BIGINT) AS z_milli,
           sen.sen_slope_milli
    FROM n JOIN s USING (event_type) JOIN ties USING (event_type)
    JOIN sen USING (event_type)
    ORDER BY event_type
    """,
    tags=("streaming", "events", "stats"),
)
def events_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone-trend screen per event type over daily ingest counts:
    exact-integer Mann-Kendall S and tie-corrected 18·Var(S), the
    continuity-corrected z (milli, the one float), and Sen's slope as
    the lower-median pairwise slope in events/day (milli). Plan: one
    daily rollup (event-grain touched once, cached day-dimension-sized),
    then every further relation — pairs, ties, medians — lives on the
    day dimension."""
    out, daily = _mann_kendall_frame(spark, sf_dir)
    out = out.localCheckpoint(eager=True)
    daily.unpersist()
    return out


def _mann_kendall_frame(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(result, cached daily rollup) pre-checkpoint — split out so the
    plan pins can inspect the real DAG (the registered query checkpoints
    to release the cache, which hides the plan)."""
    ev = load_tables(spark, sf_dir, "events").events
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .cache()
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.when(F.col("b.c") > F.col("a.c"), 1)
        .when(F.col("b.c") < F.col("a.c"), -1)
        .otherwise(0)
        .alias("sgn"),
        F.round(
            F.lit(1000.0)
            * (F.col("b.c") - F.col("a.c"))
            / F.datediff(F.col("b.day"), F.col("a.day"))
        )
        .cast("long")
        .alias("slope_milli"),
        F.datediff(F.col("b.day"), F.col("a.day")).cast("long").alias("gap"),
        F.col("a.day").alias("day_a"),
    )
    n = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    s = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("long").alias("s_stat")
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie18")
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope_milli", "gap", "day_a")
    wc = Window.partitionBy("event_type")
    sen = (
        pairs.select(
            "event_type",
            "slope_milli",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("np"),
        )
        .filter(F.col("rn") == F.floor((F.col("np") + 1) / 2))
        .select("event_type", F.col("slope_milli").alias("sen_slope_milli"))
    )
    var18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie18")
    ).cast("long")
    out = (
        n.join(s, "event_type")
        .join(ties, "event_type")
        .join(sen, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            var18.alias("var18"),
            F.when((F.col("s_stat") == 0) | (var18 == 0), F.lit(0))
            .otherwise(
                F.round(
                    (
                        F.col("s_stat")
                        - F.when(F.col("s_stat") > 0, 1).otherwise(-1)
                    )
                    / F.sqrt(var18 / F.lit(18.0))
                    * 1000
                )
            )
            .cast("long")
            .alias("z_milli"),
            "sen_slope_milli",
        )
        .orderBy("event_type")
    )
    return out, daily


# ---------------------------------------------------------------- wave 23
# Dunning log-likelihood-ratio collocations (Dunning, "Accurate Methods
# for the Statistics of Surprise and Coincidence", Computational
# Linguistics 1993): the classic significance test for bigram
# collocations, far better calibrated than PMI at low counts (the
# paper's whole point). G² over the 2×2 contingency table of
# (w1-first?, w2-second?) per adjacent bigram, in the entropy form
#     G² = 2·[Σ xlx(O) - Σ xlx(row) - Σ xlx(col) + xlx(N)]
# where xlx(x) = x·ln(x), xlx(0) = 0 — every argument an exact integer
# count, one double expression in a fixed association order, one
# milli-rounding (the F.log/ROUND(ln) parity recipe the NB/JSD/KN waves
# proved). Marginals are windows over the bigram-type relation (the
# df-as-window discipline), never re-derived aggregates joined back.

#: minimum observed bigram count for a reported collocation (Dunning's
#: test is exact at low counts but sub-5 pairs are noise at corpus
#: scale; the filter runs AFTER the marginal windows so R/C/N are the
#: true corpus marginals).
_G2_MIN_PAIR = 5
_G2_TOPK = 25


def _xlx_sql(x: str) -> str:
    return f"CASE WHEN {x} > 0 THEN CAST({x} AS DOUBLE) * ln(CAST({x} AS DOUBLE)) ELSE 0.0 END"


def _xlx_col(x):
    return F.when(
        x > 0, x.cast("double") * F.log(x.cast("double"))
    ).otherwise(F.lit(0.0))


@query(
    "text_collocation_llr",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    ),
    bi AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair FROM (
        SELECT t[i-1] AS w1, t[i] AS w2
        FROM (SELECT t, unnest(generate_series(2, len(t))) AS i FROM toks)
      ) GROUP BY w1, w2
    ),
    marg AS (
      SELECT w1, w2, n_pair,
             CAST(SUM(n_pair) OVER (PARTITION BY w1) AS BIGINT) AS n_w1,
             CAST(SUM(n_pair) OVER (PARTITION BY w2) AS BIGINT) AS n_w2,
             CAST(SUM(n_pair) OVER () AS BIGINT) AS n_tot
      FROM bi
    )
    SELECT w1, w2, n_pair, n_w1, n_w2,
           CAST(ROUND(2000.0 * (
             {_xlx_sql('n_pair')}
             + {_xlx_sql('(n_w1 - n_pair)')}
             + {_xlx_sql('(n_w2 - n_pair)')}
             + {_xlx_sql('(n_tot - n_w1 - n_w2 + n_pair)')}
             - {_xlx_sql('n_w1')}
             - {_xlx_sql('(n_tot - n_w1)')}
             - {_xlx_sql('n_w2')}
             - {_xlx_sql('(n_tot - n_w2)')}
             + {_xlx_sql('n_tot')}
           )) AS BIGINT) AS g2_milli
    FROM marg
    WHERE n_pair >= {_G2_MIN_PAIR}
    ORDER BY g2_milli DESC, w1, w2 LIMIT {_G2_TOPK}
    """,
    tags=("llm", "text", "stats"),
)
def text_collocation_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{25} bigram collocations by Dunning's G² log-likelihood ratio
    (entropy form over exact-integer contingency counts; one double
    expression, milli-rounded once). Plan: corpus tokenized once into
    the bigram-type relation; both marginals and the total are windows
    over that already-aggregated relation (vocab²-bounded, never
    event-grain); the report is a TakeOrdered top-k, not a global
    sort."""
    from ..operators.dedup import positional_shingles

    docs = load_tables(spark, sf_dir, "documents").documents
    bi = (
        positional_shingles(docs, k=2)
        .groupBy("sh")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .select(
            F.element_at(F.split("sh", " "), 1).alias("w1"),
            F.element_at(F.split("sh", " "), 2).alias("w2"),
            "n_pair",
        )
    )
    marg = bi.select(
        "w1",
        "w2",
        "n_pair",
        F.sum("n_pair").over(Window.partitionBy("w1")).cast("long").alias("n_w1"),
        F.sum("n_pair").over(Window.partitionBy("w2")).cast("long").alias("n_w2"),
        F.sum("n_pair").over(Window.partitionBy()).cast("long").alias("n_tot"),
    )
    o11 = F.col("n_pair")
    r1 = F.col("n_w1")
    c1 = F.col("n_w2")
    n = F.col("n_tot")
    g2_half = (
        _xlx_col(o11)
        + _xlx_col(r1 - o11)
        + _xlx_col(c1 - o11)
        + _xlx_col(n - r1 - c1 + o11)
        - _xlx_col(r1)
        - _xlx_col(n - r1)
        - _xlx_col(c1)
        - _xlx_col(n - c1)
        + _xlx_col(n)
    )
    return (
        marg.filter(F.col("n_pair") >= _G2_MIN_PAIR)
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            F.round(F.lit(2000.0) * g2_half).cast("long").alias("g2_milli"),
        )
        .orderBy(F.desc("g2_milli"), "w1", "w2")
        .limit(_G2_TOPK)
    )


# ---------------------------------------------------------------- wave 24
# CUPED variance reduction (Deng, Xu, Kohavi & Walker, "Improving the
# Sensitivity of Online Controlled Experiments by Utilizing Pre-
# Experiment Data", WSDM 2013): the industry-standard A/B variance
# reducer. Y = per-user post-period value sum, X = the pre-period
# covariate, θ = cov(X,Y)/var(X) pooled across arms, Ŷ = Y - θ(X - X̄);
# the achievable variance reduction is exactly ρ²(X,Y). Per-row values
# are milli-fixed-point BIGINTs (the rollup-restatement recipe: explicit
# ROUND before CAST — bare casts split the engines), so every moment sum
# is an exact integer; θ/ρ²/means are one double expression each over
# those sums, rounded once. Arms reuse the registry's portable bucket
# hash (events_ab_conversion/_srm_check — the three A/B queries can
# never disagree about assignment).

#: pre-period length in days from the corpus' first event day.
_CUPED_PRE_DAYS = 15


@query(
    "events_ab_cuped",
    oracle=f"""
    WITH base AS (
      SELECT user_id,
             CAST(ROUND(value * 1000, 0) AS BIGINT) AS v,
             CAST(ts AS DATE)
               - (SELECT MIN(CAST(ts AS DATE)) FROM events)
               < {_CUPED_PRE_DAYS} AS pre
      FROM events
    ),
    users AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN pre THEN v ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN pre THEN 0 ELSE v END) AS BIGINT) AS y,
             {duck_split_bucket('user_id', 2)} AS arm
      FROM base GROUP BY user_id
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
             CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
             CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b
      FROM users
    )
    SELECT n AS n_users, n_a, n_b,
           CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                ELSE ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                           * 1000000) END AS BIGINT) AS theta_micro,
           CAST(ROUND((CAST(sy_a AS DOUBLE) / n_a
                       - CAST(sy_b AS DOUBLE) / n_b) * 1000) AS BIGINT)
             AS diff_micro,
           CAST(CASE WHEN n * sxx - sx * sx = 0
                THEN ROUND((CAST(sy_a AS DOUBLE) / n_a
                            - CAST(sy_b AS DOUBLE) / n_b) * 1000)
                ELSE ROUND((CAST(sy_a AS DOUBLE) / n_a
                            - CAST(sy_b AS DOUBLE) / n_b
                            - (CAST(n AS DOUBLE) * sxy
                               - CAST(sx AS DOUBLE) * sy)
                              / (CAST(n AS DOUBLE) * sxx
                                 - CAST(sx AS DOUBLE) * sx)
                              * (CAST(sx_a AS DOUBLE) / n_a
                                 - CAST(sx_b AS DOUBLE) / n_b)) * 1000)
                END AS BIGINT) AS adj_diff_micro,
           CAST(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                THEN 0
                ELSE ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                           * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                           / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                              * (CAST(n AS DOUBLE) * syy
                                 - CAST(sy AS DOUBLE) * sy))
                           * 1000) END AS BIGINT) AS var_reduction_permille
    FROM t
    """,
    tags=("streaming", "events", "stats"),
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED readout for the registry's hash-split A/B experiment: the
    pooled θ (micro), the raw and CUPED-adjusted arm mean differences of
    post-period user value (micro, value units), and the achievable
    variance reduction ρ²(X,Y) (permille). Every moment is an exact
    integer sum of milli-fixed-point values; each reported number is one
    double expression over those sums rounded once. Plan: one user-keyed
    conditional aggregate (events touched once), then a 1-row moment
    rollup — nothing after the first groupBy exceeds the user dimension.
    The 15-day pre-period anchors to the corpus' first event day (one
    broadcast scalar), so the split is reproducible at any sf."""
    from ..operators.curation import split_bucket

    ev = load_tables(spark, sf_dir, "events").events
    first_day = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    base = ev.crossJoin(F.broadcast(first_day)).select(
        "user_id",
        F.expr("CAST(ROUND(value * 1000, 0) AS BIGINT)").alias("v"),
        (F.datediff(F.to_date("ts"), F.col("d0")) < _CUPED_PRE_DAYS).alias(
            "pre"
        ),
    )
    users = (
        base.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("pre"), F.col("v")).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("pre"), 0).otherwise(F.col("v")))
            .cast("long")
            .alias("y"),
        )
        .withColumn("arm", split_bucket("user_id", 2))
    )
    t = users.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0))
        .cast("long")
        .alias("sx_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sy_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0))
        .cast("long")
        .alias("sx_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sy_b"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_n = nd * F.col("sxy") - sxd * F.col("sy")
    varx_n = nd * F.col("sxx") - sxd * F.col("sx")
    vary_n = nd * F.col("syy") - syd * F.col("sy")
    theta = cov_n / varx_n
    dy = (
        F.col("sy_a").cast("double") / F.col("n_a")
        - F.col("sy_b").cast("double") / F.col("n_b")
    )
    dx = (
        F.col("sx_a").cast("double") / F.col("n_a")
        - F.col("sx_b").cast("double") / F.col("n_b")
    )
    degenerate_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") == 0
    degenerate_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") == 0
    return t.select(
        F.col("n").alias("n_users"),
        "n_a",
        "n_b",
        F.when(degenerate_x, F.lit(0))
        .otherwise(F.round(theta * 1_000_000))
        .cast("long")
        .alias("theta_micro"),
        F.round(dy * 1000).cast("long").alias("diff_micro"),
        F.when(degenerate_x, F.round(dy * 1000))
        .otherwise(F.round((dy - theta * dx) * 1000))
        .cast("long")
        .alias("adj_diff_micro"),
        F.when(degenerate_x | degenerate_y, F.lit(0))
        .otherwise(F.round(cov_n * cov_n / (varx_n * vary_n) * 1000))
        .cast("long")
        .alias("var_reduction_permille"),
    )


# ---------------------------------------------------------------- wave 25
# Prefix-filtering for exact set-similarity join (Chaudhuri, Ganti &
# Kaushik, ICDE 2006; Bayardo, Ma & Srikant, WWW 2007 "All-Pairs"; Xiao
# et al., WWW 2008 "PPJoin"): order every doc's shingle set by a global
# canonical order (ascending document frequency, shingle tie-break) and
# index only the first |x| - ceil(t·|x|) + 1 shingles — any pair with
# Jaccard >= t MUST collide inside those prefixes (the prefix-filtering
# principle), so candidate volume collapses to the rare-shingle mass
# while recall stays exactly 1. This wave makes the theorem measurable:
# the all-share candidate count, the prefix candidate count, the true
# J >= 1/2 pairs, how many the prefix join found (all, or the theorem is
# broken — n_missed is emitted and pinned 0), and the realized candidate
# reduction. t = 1/2 keeps every similarity comparison in integers:
# J >= 1/2  <=>  2·inter >= |a| + |b| - inter.


@query(
    "dedup_prefix_filter_eval",
    oracle=f"""
    WITH {DUCK_SHINGLE_SETS},
    dfreq AS MATERIALIZED (
      SELECT sh, CAST(COUNT(*) AS BIGINT) AS df FROM ds GROUP BY sh
    ),
    ranked AS MATERIALIZED (
      SELECT ds.doc_id, ds.sh, s.n,
             ROW_NUMBER() OVER (PARTITION BY ds.doc_id
                                ORDER BY d.df, ds.sh) AS rk
      FROM ds JOIN dfreq d USING (sh) JOIN sizes s USING (doc_id)
    ),
    pre AS MATERIALIZED (
      SELECT doc_id, sh FROM ranked WHERE rk <= n - (n + 1) // 2 + 1
    ),
    inter AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS i
      FROM ds a JOIN ds b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    exact AS MATERIALIZED (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE 2 * i >= sa.n + sb.n - i
    ),
    cand_pre AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM pre a JOIN pre b ON a.sh = b.sh AND a.doc_id < b.doc_id
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM sizes) AS n_docs,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM inter) AS n_candidates_allshare,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_pre) AS n_candidates_prefix,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_true_pairs,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM exact e
       JOIN cand_pre c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b)
        AS n_verified,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM exact e
       LEFT JOIN cand_pre c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
       WHERE c.doc_a IS NULL) AS n_missed,
      (SELECT CAST(CASE WHEN COUNT(*) = 0 THEN 0
                   ELSE 1000 * (COUNT(*) - (SELECT COUNT(*) FROM cand_pre))
                        // COUNT(*) END AS BIGINT)
       FROM inter) AS reduction_permille
    """,
    tags=("llm", "dedup", "eval"),
)
def dedup_prefix_filter_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtering calibration for the exact Jaccard(>=1/2) join:
    candidates under the naive share-any-shingle inverted index vs under
    the canonical-order prefix index, true-pair count, verified count
    through the prefix candidates, the theorem's miss count (always 0 —
    emitted, not assumed), and the realized candidate reduction
    (permille). Plan: one shingle explode; df and prefix ranks are
    windows over it; both pair joins are shingle-keyed equi-joins whose
    volume is Sum(df^2) over the indexed shingles — the prefix index
    drops exactly the high-df mass, which is the 100 TB point."""
    from ..operators import dedup as D

    docs = load_tables(spark, sf_dir, "documents").documents
    ds = D.shingle_sets(docs).cache()
    try:
        ranked = ds.select(
            "doc_id",
            "sh",
            F.count(F.lit(1))
            .over(Window.partitionBy("doc_id"))
            .cast("long")
            .alias("n"),
            F.count(F.lit(1))
            .over(Window.partitionBy("sh"))
            .cast("long")
            .alias("df"),
        ).select(
            "doc_id",
            "sh",
            "n",
            F.row_number()
            .over(Window.partitionBy("doc_id").orderBy("df", "sh"))
            .alias("rk"),
        )
        pre = ranked.filter(
            F.col("rk") <= F.col("n") - F.expr("(n + 1) div 2") + 1
        ).select("doc_id", "sh")
        a = ds.select(F.col("doc_id").alias("doc_a"), "sh")
        b = ds.select(F.col("doc_id").alias("doc_b"), "sh")
        inter = (
            a.join(b, "sh")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).cast("long").alias("i"))
        )
        sizes = ds.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        exact = (
            inter.join(
                sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
                "doc_a",
            )
            .join(
                sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
                "doc_b",
            )
            .filter(2 * F.col("i") >= F.col("na") + F.col("nb") - F.col("i"))
            .select("doc_a", "doc_b")
        )
        pa = pre.select(F.col("doc_id").alias("doc_a"), "sh")
        pb = pre.select(F.col("doc_id").alias("doc_b"), "sh")
        cand_pre = (
            pa.join(pb, "sh")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        exact_c = exact.cache()
        cand_c = cand_pre.cache()
        try:
            n_docs = sizes.count()
            n_all = inter.count()
            n_pre = cand_c.count()
            n_true = exact_c.count()
            n_verified = exact_c.join(cand_c, ["doc_a", "doc_b"], "left_semi").count()
            n_missed = exact_c.join(cand_c, ["doc_a", "doc_b"], "left_anti").count()
        finally:
            exact_c.unpersist()
            cand_c.unpersist()
    finally:
        ds.unpersist()
    reduction = 1000 * (n_all - n_pre) // n_all if n_all else 0
    return spark.createDataFrame(
        [(n_docs, n_all, n_pre, n_true, n_verified, n_missed, reduction)],
        "n_docs long, n_candidates_allshare long, n_candidates_prefix long,"
        " n_true_pairs long, n_verified long, n_missed long,"
        " reduction_permille long",
    )


# ---------------------------------------------------------------- wave 26
# TextRank keyword extraction (Mihalcea & Tarau, "TextRank: Bringing
# Order into Texts", EMNLP 2004): PageRank over the word co-occurrence
# graph. The standard implementation shape (gensim/summa): filter the
# token stream (here: drop the corpus' top-K most frequent tokens, the
# same data-driven stop rule RAKE uses), take adjacency in the FILTERED
# sequence as the co-occurrence window, build the weighted undirected
# graph, and run the weighted PageRank. K matches RAKE's corpus-aware
# choice (_RAKE_STOPS = 5): this fixture's vocabulary is 31 words, so a
# web-scale K would empty the graph.
#     WS(v) = (1-d) + d·Σ_u  w_uv / strength(u) · WS(u),  d = 0.85
# as the registry's exact-integer fixpoint (graph_pagerank_convergence's
# recipe: micro-unit scores, 17/20 rational damping, per-edge floor
# division — both engines reproduce every round bit-for-bit).

_TR_STOPS = 5
_TR_ITERS = 6
_TR_TOPK = 20


def _build_textrank_oracle() -> str:
    from ..operators.text import duck_tokens

    toks = duck_tokens("text")
    rounds = []
    for k in range(1, _TR_ITERS + 1):
        rounds.append(f"""
    c{k} AS MATERIALIZED (
      SELECT e.v AS node,
             CAST(SUM((p.s * 17 * e.wt) // (20 * st.strength)) AS BIGINT)
               AS inc
      FROM e JOIN it{k - 1} p ON p.node = e.u JOIN st ON st.u = e.u
      GROUP BY e.v
    ), it{k} AS MATERIALIZED (
      SELECT st.u AS node, CAST(150000 + COALESCE(c.inc, 0) AS BIGINT) AS s
      FROM st LEFT JOIN c{k} c ON c.node = st.u
    )""")
    return f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, pos, w FROM (
        SELECT doc_id, generate_subscripts({toks}, 1) AS pos,
               unnest({toks}) AS w
        FROM documents)
    ),
    stop AS MATERIALIZED (
      SELECT w FROM (
        SELECT w, COUNT(*) AS c FROM tok GROUP BY w
        ORDER BY c DESC, w LIMIT {_TR_STOPS})
    ),
    seq AS MATERIALIZED (
      SELECT w, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok WHERE w NOT IN (SELECT w FROM stop)
    ),
    pairs AS MATERIALIZED (
      SELECT least(w, w2) AS wa, greatest(w, w2) AS wb,
             CAST(COUNT(*) AS BIGINT) AS wt
      FROM seq WHERE w2 IS NOT NULL AND w <> w2 GROUP BY 1, 2
    ),
    e AS MATERIALIZED (
      SELECT wa AS u, wb AS v, wt FROM pairs
      UNION ALL SELECT wb, wa, wt FROM pairs
    ),
    st AS MATERIALIZED (
      SELECT u, CAST(SUM(wt) AS BIGINT) AS strength FROM e GROUP BY u
    ),
    it0 AS MATERIALIZED (
      SELECT u AS node, CAST(1000000 AS BIGINT) AS s FROM st
    ),
    {",".join(rounds)}
    SELECT p.node AS word, p.s AS score_micro, st.strength
    FROM it{_TR_ITERS} p JOIN st ON st.u = p.node
    ORDER BY p.s DESC, p.node LIMIT {_TR_TOPK}
    """


@query(
    "text_textrank_keywords",
    oracle=_build_textrank_oracle(),
    tags=("llm", "text", "graph"),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 TextRank keywords: weighted-PageRank scores (micro, after
    6 exact-integer rounds) over the filtered-adjacency word
    co-occurrence graph, with each word's edge strength. Plan: one
    tokenize explode; the stop list is a bounded top-K broadcast
    anti-join; the graph relations are vocab-bounded; each round is one
    keyed join+agg over the edge relation with a localCheckpoint lineage
    break (the graph-op discipline); the report is a TakeOrdered."""
    from ..operators.text import tokens

    docs = load_tables(spark, sf_dir, "documents").documents
    tok = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "w")
    )
    stop = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(_TR_STOPS)
        .select("w")
    )
    seq = tok.join(F.broadcast(stop), "w", "left_anti").select(
        "w",
        F.lead("w").over(
            Window.partitionBy("doc_id").orderBy("pos")
        ).alias("w2"),
    )
    pairs = (
        seq.filter(F.col("w2").isNotNull() & (F.col("w") != F.col("w2")))
        .groupBy(
            F.least("w", "w2").alias("wa"), F.greatest("w", "w2").alias("wb")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("wt"))
    )
    e = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("wa").alias("u"), F.col("wb").alias("v"), F.col("wt")
                ),
                F.struct(
                    F.col("wb").alias("u"), F.col("wa").alias("v"), F.col("wt")
                ),
            )
        ).alias("p")
    ).select("p.u", "p.v", "p.wt")
    st = e.groupBy("u").agg(F.sum("wt").cast("long").alias("strength"))
    ed = e.join(st, "u").select("u", "v", "wt", "strength").cache()
    nodes = st.select(F.col("u").alias("node"), "strength").localCheckpoint(
        eager=True
    )
    s = nodes.select("node", F.lit(1_000_000).cast("long").alias("s"))
    try:
        for _k in range(_TR_ITERS):
            contrib = (
                ed.join(s.withColumnRenamed("node", "u"), "u")
                .select(
                    F.col("v").alias("node"),
                    F.expr("(s * 17 * wt) div (20 * strength)").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").cast("long").alias("inc"))
            )
            s = (
                nodes.select("node")
                .join(contrib, "node", "left")
                .select(
                    "node",
                    (F.lit(150_000) + F.coalesce(F.col("inc"), F.lit(0)))
                    .cast("long")
                    .alias("s"),
                )
                .localCheckpoint(eager=True)
            )
        out = (
            s.join(nodes, "node")
            .select(
                F.col("node").alias("word"),
                F.col("s").alias("score_micro"),
                "strength",
            )
            .orderBy(F.desc("score_micro"), "word")
            .limit(_TR_TOPK)
            .localCheckpoint(eager=True)
        )
    finally:
        ed.unpersist()
    return out


# ---------------------------------------------------------------- wave 27
# Poisson bootstrap confidence interval (Efron's bootstrap in the
# streaming-friendly form: Oza & Russell 2001's online bagging;
# Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
# Google TR 2012): instead of resampling n-out-of-n (which needs a
# global pass per replicate), every row independently receives a
# Poisson(1) weight per replicate — the ONLY bootstrap that
# map-side-aggregates at 100 TB. Weights are deterministic and cheap:
# ONE portable char-fold md5 hash per EVENT (not per replicate — the
# per-replicate fold measured 26 s at sf0.1), then per-replicate
# uniforms u_r = cube((h_base + (r+1)·2654435761) mod p) mod p where
# cube(x) = x³ mod p is a PERMUTATION of [0, p) because
# gcd(3, p-1) = 1 for p = 1e9+7 (Fermat) — the nonlinearity kills the
# affine-in-r lattice a multiply-add derivation alone would leave.
# Poisson(1) inverse-CDF thresholds are import-time integer literals
# scaled to p (tail capped at w=8, P ~ 1e-5, documented). Every
# replicate sum is an exact integer; each replicate mean is ONE double
# division, micro-rounded; the CI is an order statistic over the R
# replicate means (rank 2 and rank R-1 at R=40 — the floor(0.025R)+1
# convention, stated, not interpolated).

_BOOT_R = 40
#: floor(MOD * P(Poisson(1) <= k)) for k = 0..7; weight = #thresholds
#: the hash clears (so P(w=k) is exact to 1/MOD).
_BOOT_T = (367879443, 735758887, 919698609, 981011849,
           996340160, 999405822, 999916765, 999989757)
_BOOT_LO = 2          # floor(0.025 * 40) + 1
_BOOT_HI = _BOOT_R - 1  # 40 - floor(0.025 * 40)


_BOOT_MOD = 1_000_000_007
_BOOT_STEP = 2_654_435_761


def _build_boot_oracle() -> str:
    from ..operators.text import duck_char_fold

    hb = duck_char_fold("md5(CAST(event_id AS VARCHAR))")
    w = " + ".join(f"(CASE WHEN h >= {t} THEN 1 ELSE 0 END)" for t in _BOOT_T)
    return f"""
    WITH ev AS MATERIALIZED (
      SELECT {hb} AS hb, CAST(ROUND(value * 1000, 0) AS BIGINT) AS v
      FROM events
    ),
    reps AS (SELECT unnest(generate_series(0, {_BOOT_R - 1})) AS r),
    hashed AS (
      SELECT r, v,
             ((u * u) % {_BOOT_MOD}) * u % {_BOOT_MOD} AS h
      FROM (SELECT r, v,
                   (hb + (r + 1) * {_BOOT_STEP}) % {_BOOT_MOD} AS u
            FROM ev CROSS JOIN reps)
    ),
    weighted AS (
      SELECT r, v, CAST({w} AS BIGINT) AS w FROM hashed
    ),
    per_rep AS (
      SELECT r, CAST(SUM(w * v) AS BIGINT) AS num,
             CAST(SUM(w) AS BIGINT) AS den
      FROM weighted GROUP BY r
    ),
    means AS (
      SELECT r,
             CAST(CASE WHEN den = 0 THEN 0
                  ELSE ROUND(1000.0 * num / den) END AS BIGINT) AS m
      FROM per_rep
    ),
    ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m, r) AS rn FROM means
    ),
    pt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(ROUND(1000.0 * SUM(v) / COUNT(*)) AS BIGINT) AS point_micro
      FROM ev
    )
    SELECT pt.n_events, CAST({_BOOT_R} AS BIGINT) AS n_replicates,
           pt.point_micro,
           (SELECT m FROM ranked WHERE rn = {_BOOT_LO}) AS ci_lo_micro,
           (SELECT m FROM ranked WHERE rn = {_BOOT_HI}) AS ci_hi_micro,
           (SELECT m FROM ranked WHERE rn = {_BOOT_HI})
             - (SELECT m FROM ranked WHERE rn = {_BOOT_LO}) AS width_micro
    FROM pt
    """


@query(
    "events_poisson_bootstrap_ci",
    oracle=_build_boot_oracle(),
    tags=("streaming", "events", "stats"),
)
def events_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap CI for the mean event value: 40
    deterministic hash-weighted replicates, each an exact-integer
    (Sum w·v, Sum w) pair, one micro-rounded division per replicate,
    order-statistic CI (ranks 2 and 39). Plan: the replicate axis is a
    JVM-side sequence explode (no shuffle to fan out); everything
    aggregates map-side into a 40-row relation — the reason Poisson
    bootstrap is THE bootstrap that survives 100 TB."""
    from ..operators.text import char_fold_hash

    ev = load_tables(spark, sf_dir, "events").events.select(
        char_fold_hash(F.md5(F.col("event_id").cast("string"))).alias("hb"),
        F.expr("CAST(ROUND(value * 1000, 0) AS BIGINT)").alias("v"),
    )
    u = (F.col("hb") + (F.col("r") + 1) * F.lit(_BOOT_STEP)) % _BOOT_MOD
    rep = ev.select(
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r"),
        F.col("hb"),
    ).select(
        "v",
        "r",
        (((u * u) % _BOOT_MOD) * u % _BOOT_MOD).alias("h"),
    )
    w = None
    for t_ in _BOOT_T:
        term = F.when(F.col("h") >= t_, 1).otherwise(0)
        w = term if w is None else w + term
    per_rep = (
        rep.select("r", "v", w.cast("long").alias("w"))
        .groupBy("r")
        .agg(
            F.sum(F.col("w") * F.col("v")).cast("long").alias("num"),
            F.sum("w").cast("long").alias("den"),
        )
    )
    means = per_rep.select(
        "r",
        F.when(F.col("den") == 0, F.lit(0))
        .otherwise(F.round(F.lit(1000.0) * F.col("num") / F.col("den")))
        .cast("long")
        .alias("m"),
    )
    ranked = means.select(
        "m", F.row_number().over(Window.orderBy("m", "r")).alias("rn")
    )
    ci = ranked.agg(
        F.max(F.when(F.col("rn") == _BOOT_LO, F.col("m"))).alias("lo"),
        F.max(F.when(F.col("rn") == _BOOT_HI, F.col("m"))).alias("hi"),
    )
    pt = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.lit(1000.0) * F.sum("v") / F.count(F.lit(1)))
        .cast("long")
        .alias("point_micro"),
    )
    return pt.crossJoin(F.broadcast(ci)).select(
        "n_events",
        F.lit(_BOOT_R).cast("long").alias("n_replicates"),
        "point_micro",
        F.col("lo").cast("long").alias("ci_lo_micro"),
        F.col("hi").cast("long").alias("ci_hi_micro"),
        (F.col("hi") - F.col("lo")).cast("long").alias("width_micro"),
    )


# ---------------------------------------------------------------- wave 28
# Isotonic (PAV) calibration of the NB margin (Zadrozny & Elkan, KDD
# 2002; Robertson/Wright/Dykstra's minimax characterization): the
# reliability curve (llm_ops12 wave 17) shows per-decile pass rates;
# isotonic regression is what production calibrators fit on top. Pool
# Adjacent Violators has a closed form per bin — the minimax identity
#     g(i) = min_{j<=i} max_{k>=i} weightedmean(rate[j..k])
# (antitonic orientation: decile 1 = best margin, so the calibrated
# rate must be non-increasing in the decile index). Over 10 bins every
# segment mean is an exact rational with denominator <= n_eval; scaling
# to nano (1e9·dp // dn) preserves order AND equality exactly
# (distinct fractions with denominators <= n differ by >= 1/n² >> 1e-9
# at this n), so min/max run on integers and both engines agree
# bit-for-bit. The python pin runs REAL pooling PAV and asserts the
# minimax identity reproduces it.


def _build_isotonic_oracle() -> str:
    from .llm_ops11 import _nb_chain_sql

    return f"""
    WITH {_nb_chain_sql()},
    binned AS (
      SELECT truth,
             NTILE(10) OVER (ORDER BY score_pass - score_fail DESC, doc_id)
               AS decile
      FROM scored
    ),
    bins AS MATERIALIZED (
      SELECT CAST(decile AS BIGINT) AS i, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      FROM binned GROUP BY decile
    ),
    cum AS (
      SELECT i, n_docs, n_pass,
             SUM(n_docs) OVER (ORDER BY i) AS nn,
             SUM(n_pass) OVER (ORDER BY i) AS pp
      FROM bins
    ),
    seg AS (
      SELECT j.i AS j, k.i AS k,
             CAST(1000000000 * (k.pp - COALESCE(jm.pp, 0))
                  // (k.nn - COALESCE(jm.nn, 0)) AS BIGINT) AS r
      FROM cum j JOIN cum k ON j.i <= k.i
      LEFT JOIN cum jm ON jm.i = j.i - 1
    ),
    mx AS (
      SELECT b.i, s.j, CAST(MAX(s.r) AS BIGINT) AS mxr
      FROM bins b JOIN seg s ON s.j <= b.i AND s.k >= b.i
      GROUP BY b.i, s.j
    ),
    iso AS (SELECT i, CAST(MIN(mxr) AS BIGINT) AS iso_nano FROM mx GROUP BY i)
    SELECT b.i AS decile, b.n_docs, b.n_pass,
           CAST(1000 * b.n_pass // b.n_docs AS BIGINT) AS raw_rate_permille,
           iso.iso_nano AS iso_rate_nano,
           CAST(iso.iso_nano // 1000000 AS BIGINT) AS iso_rate_permille
    FROM bins b JOIN iso ON iso.i = b.i
    ORDER BY b.i
    """


@query(
    "quality_isotonic_calibration",
    oracle=_build_isotonic_oracle(),
    tags=("llm", "quality", "eval"),
)
def quality_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the NB reliability curve: per
    margin decile, the raw pass rate and the pooled-adjacent-violators
    fit via the exact-integer minimax identity (nano fixed-point).
    Plan: the decile table is the calibration curve's aggregation; all
    pooling relations live on the 10-row bin dimension (j<=i<=k segment
    triples — 220 rows), broadcast-joined; nothing touches doc grain
    after the first aggregate."""
    from pyspark.sql.window import Window as W

    scored = _nb_scored(spark, sf_dir).select(
        "doc_id", "truth", (F.col("score_pass") - F.col("score_fail")).alias("margin")
    )
    bins = (
        scored.select(
            "truth",
            F.ntile(10)
            .over(W.orderBy(F.desc("margin"), F.asc("doc_id")))
            .cast("long")
            .alias("i"),
        )
        .groupBy("i")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("truth"), 1).otherwise(0))
            .cast("long")
            .alias("n_pass"),
        )
    )
    cum = bins.select(
        "i",
        "n_docs",
        "n_pass",
        F.sum("n_docs").over(W.orderBy("i")).alias("nn"),
        F.sum("n_pass").over(W.orderBy("i")).alias("pp"),
    )
    j = cum.select(
        F.col("i").alias("j"),
        (F.col("pp") - F.col("n_pass")).alias("pp_jm"),
        (F.col("nn") - F.col("n_docs")).alias("nn_jm"),
    )
    k = cum.select(F.col("i").alias("k"), "pp", "nn")
    seg = (
        j.join(k, F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            _idiv_col(
                F.lit(1_000_000_000) * (F.col("pp") - F.col("pp_jm")),
                F.col("nn") - F.col("nn_jm"),
            ).alias("r"),
        )
    )
    mx = (
        bins.select(F.col("i"))
        .join(seg, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.max("r").cast("long").alias("mxr"))
    )
    iso = mx.groupBy("i").agg(F.min("mxr").cast("long").alias("iso_nano"))
    return (
        bins.join(iso, "i")
        .select(
            F.col("i").alias("decile"),
            "n_docs",
            "n_pass",
            _idiv_col(F.lit(1000) * F.col("n_pass"), F.col("n_docs")).alias(
                "raw_rate_permille"
            ),
            F.col("iso_nano").alias("iso_rate_nano"),
            _idiv_col(F.col("iso_nano"), F.lit(1_000_000)).alias(
                "iso_rate_permille"
            ),
        )
        .orderBy("decile")
    )
