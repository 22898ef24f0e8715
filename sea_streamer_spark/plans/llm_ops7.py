"""Round-5 operator wave: engagement decay, percentile winsorization, and
rolling-window actives — three shapes a training-data/analytics pipeline
leans on at 100 TB, each with an engine-exact integer (or boundary-row)
formulation so the DuckDB oracle hashes bit-for-bit.

House rules: integer fixed-point wherever a float sum's addition ORDER
could differ between engines; percentile boundaries via the spillable
sort-window pattern (relational3.agg_percentile_cont), never an in-memory
per-group buffer; bounded explodes only (a 7-day rolling window costs
exactly 7x row volume, not a self-join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_tables
from .registry import query

#: Decay anchor: the day after the corpus's last event (TESTDATA events span
#: 2024-01-01..2024-01-30) — a fixed literal so the weight is a pure
#: projection, no global-max pre-pass.
_ANCHOR = "2024-01-31"


@query(
    "events_decayed_engagement",
    oracle=f"""
    SELECT user_id,
           CAST(SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)
                    * CAST(FLOOR(1000000 / POWER(2,
                          DATE_DIFF('day', CAST(ts AS DATE), DATE '{_ANCHOR}')))
                      AS BIGINT))
                AS BIGINT) AS decayed_micro,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
    tags=("llm", "events", "decay"),
)
def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-decayed engagement (half-life = 1 day), the
    recency weighting recommendation/feed pipelines rank with — in integer
    fixed-point so it is engine-exact: weight = floor(1e6 / 2^age_days)
    (dividing the exactly-representable 1e6 by a power of two only shifts
    the float exponent, so FLOOR sees an exact value in both engines) and
    value rides as DECIMAL-derived cents. score_micro = Σ cents·weight as
    BIGINT — no float summation order anywhere.

    Plan: pure projection (age, weight, cents) → one user-keyed partial-agg
    shuffle. Linear at any corpus size."""
    t = load_tables(spark, sf_dir, "events")
    age = F.datediff(F.lit(_ANCHOR).cast("date"), F.to_date("ts"))
    weight = F.floor(
        F.lit(1_000_000) / F.pow(F.lit(2.0), age.cast("double"))
    ).cast("long")
    cents = (F.col("value").cast("decimal(10,2)") * 100).cast("long")
    return (
        t.events.groupBy("user_id")
        .agg(
            F.sum(cents * weight).cast("long").alias("decayed_micro"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "quality_winsorize",
    oracle="""
    WITH ranked AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), bounds AS (
      -- nearest-rank (Hyndman-Fan type 1) fences: rank = CEIL(p * n), an
      -- integer cents value — no interpolation, so no float arithmetic
      -- whose FMA fusion could drift between engines (the agg_corr_exact
      -- lesson; an interpolated-fence draft lost 1 ulp exactly that way)
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(CEIL(0.05 * n) AS BIGINT) THEN cents END) AS lo_cents,
             MAX(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT) THEN cents END) AS hi_cents
      FROM ranked
      WHERE rn IN (CAST(CEIL(0.05 * n) AS BIGINT),
                   CAST(CEIL(0.95 * n) AS BIGINT))
      GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           b.lo_cents, b.hi_cents,
           CAST(SUM(LEAST(GREATEST(r.cents, b.lo_cents), b.hi_cents)) AS BIGINT)
             AS sum_clipped_cents,
           CAST(SUM(CASE WHEN r.cents < b.lo_cents OR r.cents > b.hi_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM ranked r JOIN bounds b USING (event_type)
    GROUP BY r.event_type, b.lo_cents, b.hi_cents
    """,
    tags=("llm", "quality", "percentile"),
)
def quality_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping at the p05/p95 fences) — the robust
    preprocessing step quality/reward pipelines apply before averaging.
    Everything integer: values ride as cents, the fence is the
    NEAREST-RANK percentile (Hyndman-Fan type 1: the cents value at rank
    ceil(p·n) — an actual group member, no interpolation, so no float
    product whose FMA fusion could drift between engines), and the clipped
    sum is a BIGINT Σ, immune to float addition order.

    Plan (the spillable percentile pattern of agg_percentile_cont): one
    type-keyed sort window ranks each group on disk-spillable state, the
    ≤ 2 fence rows per group aggregate to the bounds, and the bounds join
    back BROADCAST (one row per event_type) onto the ranked relation —
    two passes over events, zero per-group memory."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, "events")
    g = "event_type"
    cents = (F.col("value").cast("decimal(10,2)") * 100).cast("long")
    w_sort = Window.partitionBy(g).orderBy("value")
    w_all = Window.partitionBy(g)
    ranked = t.events.select(
        F.col(g),
        cents.alias("cents"),
        F.row_number().over(w_sort).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )

    def rank_at(p: float):
        return F.ceil(F.lit(p) * F.col("n")).cast("long")

    def fence(p: float, name: str):
        return F.max(
            F.when(F.col("rn") == rank_at(p), F.col("cents"))
        ).alias(name)

    bounds = (
        ranked.filter(
            (F.col("rn") == rank_at(0.05)) | (F.col("rn") == rank_at(0.95))
        )
        .groupBy(g)
        .agg(fence(0.05, "lo_cents"), fence(0.95, "hi_cents"))
    )
    clipped = F.least(F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents"))
    out_of_fence = (F.col("cents") < F.col("lo_cents")) | (
        F.col("cents") > F.col("hi_cents")
    )
    return (
        ranked.join(F.broadcast(bounds), g)
        .groupBy(g, "lo_cents", "hi_cents")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(clipped).cast("long").alias("sum_clipped_cents"),
            F.sum(out_of_fence.cast("long")).cast("long").alias("n_clipped"),
        )
        .select(g, "n", "lo_cents", "hi_cents", "sum_clipped_cents", "n_clipped")
    )


@query(
    "events_rolling_7d_actives",
    oracle="""
    WITH days AS (
      SELECT CAST(ts AS DATE) AS d, user_id FROM events
    ), contrib AS (
      SELECT DISTINCT d + CAST(offs AS INTEGER) AS window_end, user_id
      FROM days, (SELECT unnest(generate_series(0, 6)) AS offs)
    ), span AS (
      SELECT MIN(d) AS d0, MAX(d) AS d1 FROM days
    )
    SELECT CAST(window_end AS TIMESTAMP) AS window_end,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
    FROM contrib, span
    WHERE window_end BETWEEN d0 AND d1
    GROUP BY window_end
    """,
    tags=("llm", "events", "window"),
)
def events_rolling_7d_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the retention/health
    metric every event pipeline reports. COUNT(DISTINCT) over a *sliding*
    window cannot merge partial states, so instead each (day, user) pair is
    exploded to the ≤ 7 window-ends it contributes to (a BOUNDED fan-out —
    7x the daily-distinct relation, never an event self-join) and one
    window_end-keyed distinct count finishes the job. Window-ends outside
    the observed day span are trimmed to match the oracle's bounded frame.

    Plan: map-side (day,user) dedup → ×7 projection explode →
    one (window_end, user)-keyed distinct + count. Linear in events."""
    t = load_tables(spark, sf_dir, "events")
    days = t.events.select(
        F.to_date("ts").alias("d"), F.col("user_id")
    ).distinct()
    span = days.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    contrib = days.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("offs"),
        F.col("d"),
        F.col("user_id"),
    ).select(F.date_add(F.col("d"), F.col("offs")).alias("window_end"), "user_id")
    return (
        contrib.crossJoin(F.broadcast(span))
        .filter(F.col("window_end").between(F.col("d0"), F.col("d1")))
        .groupBy(F.col("window_end").cast("timestamp").alias("window_end"))
        .agg(F.countDistinct("user_id").cast("long").alias("active_users"))
    )


@query(
    "privacy_l_diversity",
    oracle="""
    WITH classes AS (
      SELECT c_nationkey AS nation,
             CAST(FLOOR(CAST(c_acctbal AS DECIMAL(12,2)) / 2000) AS BIGINT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS class_size,
             CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct
      FROM customer GROUP BY 1, 2
    )
    SELECT nation, bal_band, class_size, l_distinct,
           CAST(l_distinct < 3 AS BIGINT) AS at_risk
    FROM classes
    ORDER BY nation, bal_band
    """,
    tags=("llm", "quality", "privacy"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the companion gate to privacy_k_anonymity
    (Machanavajjhala et al. 2007): a quasi-identifier class is at risk when
    its SENSITIVE attribute (market segment) has fewer than l=3 distinct
    values, even if the class itself is large (k-anonymity alone leaks by
    homogeneity). QI = (nation, account-balance band); band edges in exact
    DECIMAL so both engines bucket identically. One grouped
    distinct-aggregate; class cardinality bounds everything post-scan."""
    cust = load_tables(spark, sf_dir, "customer").customer
    band = F.floor(
        F.col("c_acctbal").cast("decimal(12,2)") / 2000
    ).cast("long")
    return (
        cust.groupBy(
            F.col("c_nationkey").alias("nation"), band.alias("bal_band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            F.countDistinct("c_mktsegment").cast("long").alias("l_distinct"),
        )
        .select(
            "nation",
            "bal_band",
            "class_size",
            "l_distinct",
            (F.col("l_distinct") < 3).cast("long").alias("at_risk"),
        )
        .orderBy("nation", "bal_band")
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("llm", "events", "sequence"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event sequence
    — the behavioral bigram table session-modeling / next-event-prediction
    pipelines train on. LAG over (ts, event_id) (the id tie-break makes the
    sequence total, so both engines see identical bigrams) then one
    (prev, next)-keyed count.

    Plan: one user-keyed window shuffle + one keyed partial-agg shuffle of
    the |types|² transition relation. Linear in events; the result is
    bounded by the type-vocabulary square, not the corpus."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@query(
    "agg_mode_exact",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                   ORDER BY n DESC, o_orderpriority) AS rn
      FROM counts
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_count
    FROM ranked WHERE rn = 1
    ORDER BY o_orderstatus
    """,
    tags=("relational", "agg", "mode"),
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MODE per group (most frequent order priority per status),
    deterministic tie-break by value — the categorical summary SQL's
    ANY_VALUE/approx paths don't give. Two keyed aggregations: counts are
    map-side combined to one row per (group, value) — so the rank window
    sees the value-vocabulary relation, never raw rows — then one
    group-keyed top-1 window. Skew-safe at any corpus size because the
    heavy lifting happens in the partial aggregate."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, "orders")
    counts = t.orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("o_orderstatus")
    )
