"""Round-12 operator waves.

Wave 1 — streaming curation e2e (r11 VERDICT task #1): the §2 streaming
layer and the curation ops layer, each deeply verified on its own, had
never been proven TOGETHER. ``curation_streaming_e2e`` drives the
documents corpus through the registered file replay backend
(``streaming/consumer.create_consumer`` — the same envelope/offset/
checkpoint machinery every S-row uses) as a PII-bearing JSON firehose:
micro-batches decode (``from_json``, P6), redact (the llm_ops14 chain
as a map stage), and claim exact-dedup keys incrementally
(first-writer-wins state over the redacted-text md5,
``streaming/curation.py``), sinking per-doc flags idempotently
(overwrite-by-batch-path + batch-id ledger — the S21/D9 recipe). The
funnel downstream of exact dedup is llm_ops15's ``_e2e_funnel_tail``
VERBATIM, and the oracle is the batch pipeline's oracle VERBATIM — so
a driver-green hash on this row IS the batch/stream equivalence proof:
the streamed survivor flags reproduce the batch funnel bit-for-bit.
Checkpoint-resume and crash-replay variants of the same path are pinned
in tests/test_streaming_curation.py (the Structured-Streaming analog of
the reference's loopback tests, e.g. file/tests/loopback.rs).

House rules (llm_ops.py): integer fixed-point for every ranked
comparison, deterministic tie-breaks, every aggregate aliased
identically in Spark and the oracle.

Reference basis: the reference engine (sea-streamer, Rust) has no ops
layer — this family exists for the 100 TB training-data pipeline
mandate; the streaming substrate maps its S/D/T rows (SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_tables
from .registry import query

# ---------------------------------------------------------------- wave 1
# Streaming curation e2e: stream front (redact + incremental exact
# dedup) + batch funnel tail, oracle = the batch funnel's.

#: fixture segments (micro-batches) for the streamed corpus; six
#: segments exercises multi-batch state handoff at every sf without
#: making the bounded replay slow at sf0.1.
_STREAM_SEGMENTS = 6


def _stream_transform(df: DataFrame) -> DataFrame:
    """The in-stream map stages: redact the (PII-injected) firehose
    text, derive the had_pii flag and the exact-dedup key — all JVM
    expressions, zero Python in the per-row path."""
    from .llm_ops14 import _redact_chain_spark

    r = _redact_chain_spark(F.col("text"))
    return df.select(
        "doc_id",
        "source",
        (r != F.col("text")).alias("had_pii"),
        F.md5(r).alias("dedup_key"),
    )


def _streamed_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the streaming front over ``sf_dir``'s documents and return
    the accumulated per-doc flag state. The envelope log carries the
    SAME PII-injected text the batch pipeline derives (injection is
    corpus fixture, redaction is the pipeline), so the two fronts see
    identical inputs.

    The envelope log is an INPUT fixture (write-once per machine+sf,
    flock-serialized — the broker-roundtrip-fixture posture); the
    streaming COMPUTATION runs fresh on every invocation into a
    throwaway work dir, so no computed intermediate persists across
    bench/oracle runs (the ``ss_write_roundtrip`` posture; r12
    measurement-honesty fix — previously the flag state was .done-memoized
    with the fixture, which let re-invocations skip the streamed front)."""
    import fcntl
    import hashlib
    import os
    import shutil
    import tempfile

    from ..streaming.curation import (
        read_flags,
        run_curation_stream,
        write_documents_envelope,
    )
    from .llm_ops14 import _pii_injected_col

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    root = os.path.join(
        tempfile.gettempdir(), f"sea_curation_stream_v1_{tag}"
    )
    os.makedirs(root, exist_ok=True)
    done = os.path.join(root, ".done")
    with open(os.path.join(root, ".lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if not os.path.exists(done):
            docs = load_tables(spark, sf_dir, "documents").documents
            dirty = docs.select(
                "doc_id", "source", _pii_injected_col().alias("text")
            )
            write_documents_envelope(
                dirty,
                os.path.join(root, "src"),
                n_segments=_STREAM_SEGMENTS,
            )
            with open(done, "w"):
                pass
        # migrate pre-r12 layouts: the old protocol persisted the stream
        # output under root/work — computed state, remove it
        shutil.rmtree(os.path.join(root, "work"), ignore_errors=True)
    work = tempfile.mkdtemp(prefix="sea_curation_work_")
    try:
        flags_dir = run_curation_stream(
            spark, os.path.join(root, "src"), work, _stream_transform
        )
        # eager materialization so the throwaway dir can be removed
        # before the caller's funnel tail evaluates
        return read_flags(spark, flags_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _build_streaming_e2e_oracle() -> str:
    from .llm_ops15 import _build_e2e_oracle

    return _build_e2e_oracle()


@query(
    "curation_streaming_e2e",
    oracle=_build_streaming_e2e_oracle(),
    tags=("llm", "curation", "streaming", "dedup", "privacy"),
)
def curation_streaming_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch/stream equivalence, driver-checked: the curation funnel
    computed from STREAMED exact-dedup flags (file replay backend →
    micro-batch redact → first-writer-wins key claim → idempotent flag
    sink) must hash-match the batch pipeline's DuckDB oracle — the same
    oracle string as ``curation_e2e_pipeline``, embedded stage oracles
    and all. First-seen-wins equals the batch min-doc_id-per-key
    because the file backend replays segments in sequence order (the
    log-ordering contract; streaming/curation.py module docstring).
    Plan shape: the streamed front adds one keyed window + one state
    equi-join per micro-batch; the funnel tail is the shared
    ``_e2e_funnel_tail`` (zero Python, no cartesian)."""
    from .llm_ops15 import _e2e_funnel_tail

    # r13 (guide §2.6): the streamed front blocks the driver for the
    # whole bounded micro-batch replay while its per-batch jobs leave
    # most cores idle — handed to the funnel tail as a thunk, it runs
    # on a pool thread CONCURRENTLY with the tail's cluster/semantic
    # chain builds (values unchanged; same relations, same joins).
    def _ex() -> DataFrame:
        return _streamed_flags(spark, sf_dir).select(
            "doc_id", "source", "had_pii", F.col("keep").alias("keep2")
        )

    return _e2e_funnel_tail(spark, sf_dir, ex_fn=_ex)


# ---------------------------------------------------------------- wave 2
# ROC AUC of the NB distilled gate, EXACT via the rank-sum identity
# (Hanley & McNeil, Radiology 1982; AUC == U/(n+·n−) with U the
# Mann-Whitney statistic, Mann & Whitney 1947): completes the
# gate-agreement family (fidelity, kappa, McNemar, Youden, MCC,
# precision@k) with the threshold-free view of the SAME single-sourced
# NB score relation. Ties get the standard half credit through average
# ranks, kept integer by working with DOUBLED ranks: for a margin value
# with RANK() m and COUNT() c over the margin ordering,
# 2·avgrank = 2m + c − 1 exactly.


def _build_auc_oracle() -> str:
    from .llm_ops11 import _nb_chain_sql

    return f"""
    WITH {_nb_chain_sql()},
    ranked AS (
      SELECT truth,
             2 * RANK() OVER (ORDER BY score_pass - score_fail)
               + COUNT(*) OVER (PARTITION BY score_pass - score_fail)
               - 1 AS r2
      FROM scored
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT)
               AS np,
             CAST(SUM(CASE WHEN truth THEN 0 ELSE 1 END) AS BIGINT)
               AS nn,
             CAST(SUM(CASE WHEN truth THEN r2 ELSE 0 END) AS BIGINT)
               AS r2p
      FROM ranked
    )
    SELECT np AS n_pos, nn AS n_neg,
           CAST(1000000 * (r2p - np * (np + 1)) // (2 * np * nn)
                AS BIGINT) AS auc_micro,
           CAST((1000000 * (r2p - np * (np + 1)) // (2 * np * nn)) * 2
                - 1000000 AS BIGINT) AS gini_micro
    FROM agg
    """


@query(
    "quality_auc_nb_gate",
    oracle=_build_auc_oracle(),
    tags=("llm", "quality", "eval"),
)
def quality_auc_nb_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC (micro) of the NB gate margin against the Gopher rule
    truth via doubled average ranks — zero floats anywhere (the one
    integer-exact member of the gate-eval family; MCC needs a sqrt,
    AUC does not). One global margin ordering (the registry's ranked-
    comparison posture) + one per-margin tie count."""
    from pyspark.sql.window import Window

    from .llm_ops11 import _nb_scored
    from .llm_ops12 import _idiv_col

    scored = _nb_scored(spark, sf_dir).select(
        "truth", (F.col("score_pass") - F.col("score_fail")).alias("m")
    )
    ranked = scored.select(
        "truth",
        (
            F.lit(2) * F.rank().over(Window.orderBy("m"))
            + F.count(F.lit(1)).over(Window.partitionBy("m"))
            - 1
        )
        .cast("long")
        .alias("r2"),
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("truth"), 1).otherwise(0)).cast("long").alias("np"),
        F.sum(F.when(F.col("truth"), 0).otherwise(1)).cast("long").alias("nn"),
        F.sum(F.when(F.col("truth"), F.col("r2")).otherwise(0))
        .cast("long")
        .alias("r2p"),
    )
    auc = _idiv_col(
        F.col("r2p") - F.col("np") * (F.col("np") + 1),
        F.lit(2) * F.col("np") * F.col("nn"),
        scale=1_000_000,
    )
    return agg.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        auc.alias("auc_micro"),
        (auc * 2 - F.lit(1_000_000)).cast("long").alias("gini_micro"),
    )


# ---------------------------------------------------------------- wave 3
# Mann-Whitney U + Cliff's delta, weekend vs weekday order values
# (Mann & Whitney 1947; Cliff, Psychological Bulletin 1993): the
# nonparametric two-sample location test and its effect size, both
# EXACT integers via the same doubled-average-rank machinery as the
# AUC wave — delta == 2U/(n1·n2) − 1, which is also the rank-biserial
# correlation (Wendt 1972). Complements the weekend odds-ratio wave
# (binary outcome) with the continuous-outcome view.

_MW_WEEKEND_SQL = "(dayofweek(CAST(o_orderdate AS DATE)) + 1) IN (1, 7)"


@query(
    "orders_mannwhitney_weekend",
    oracle=f"""
    WITH vals AS (
      SELECT {_MW_WEEKEND_SQL} AS weekend,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    ranked AS (
      SELECT weekend,
             2 * RANK() OVER (ORDER BY cents)
               + COUNT(*) OVER (PARTITION BY cents) - 1 AS r2
      FROM vals
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN weekend THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN weekend THEN 0 ELSE 1 END) AS BIGINT)
               AS n2,
             CAST(SUM(CASE WHEN weekend THEN r2 ELSE 0 END) AS BIGINT)
               AS r2w
      FROM ranked
    )
    SELECT n1 AS n_weekend, n2 AS n_weekday,
           CAST((r2w - n1 * (n1 + 1)) // 2 AS BIGINT) AS u_weekend,
           CAST(1000000 * (r2w - n1 * (n1 + 1)) // (2 * n1 * n2)
                AS BIGINT) AS auc_micro,
           CAST(1000 * ((r2w - n1 * (n1 + 1)) - n1 * n2)
                // (n1 * n2) AS BIGINT) AS cliffs_delta_milli
    FROM agg
    """,
    tags=("relational", "orders", "stats"),
)
def orders_mannwhitney_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U statistic, common-language effect size (AUC form) and Cliff's
    delta (milli) for weekend vs weekday order totals — doubled ranks
    keep tie-averaging integer-exact; money rides DECIMAL cents. The
    weekend predicate is the registered odds-ratio wave's, verbatim."""
    from pyspark.sql.window import Window

    from ..sources.tables import load_tables
    from .llm_ops12 import _idiv_col

    orders = load_tables(spark, sf_dir, "orders").orders
    vals = orders.select(
        F.dayofweek(F.col("o_orderdate").cast("date")).isin(1, 7).alias(
            "weekend"
        ),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    ranked = vals.select(
        "weekend",
        (
            F.lit(2) * F.rank().over(Window.orderBy("cents"))
            + F.count(F.lit(1)).over(Window.partitionBy("cents"))
            - 1
        )
        .cast("long")
        .alias("r2"),
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("weekend"), 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("weekend"), 0).otherwise(1))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("weekend"), F.col("r2")).otherwise(0))
        .cast("long")
        .alias("r2w"),
    )
    u2 = F.col("r2w") - F.col("n1") * (F.col("n1") + 1)
    return agg.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        _idiv_col(u2, F.lit(2)).alias("u_weekend"),
        _idiv_col(
            u2, F.lit(2) * F.col("n1") * F.col("n2"), scale=1_000_000
        ).alias("auc_micro"),
        _idiv_col(
            u2 - F.col("n1") * F.col("n2"),
            F.col("n1") * F.col("n2"),
            scale=1000,
        ).alias("cliffs_delta_milli"),
    )


# ---------------------------------------------------------------- wave 4
# Kruskal-Wallis H across weekdays on daily event counts (Kruskal &
# Wallis, JASA 1952) — the rank-based one-way analysis completing the
# weekday family: ANOVA (parametric, r?) tests means, the runs test
# tests serial structure, KW tests LOCATION without normality. Doubled
# average ranks keep tie handling integer; each group's Σ R_i²/n_i term
# is micro-truncated INDIVIDUALLY (deterministic order-free integer
# sum), and the single float combine — 12/(N(N+1)) scaling, tie
# correction 1 − Σ(t³−t)/(N³−N) — runs once on exact integers in a
# fixed expression, then half-up milli-rounds.


@query(
    "events_kruskal_wallis_weekday",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    ranked AS (
      SELECT (dayofweek(day) + 1) AS wd, n_events,
             2 * RANK() OVER (ORDER BY n_events)
               + COUNT(*) OVER (PARTITION BY n_events) - 1 AS r2
      FROM daily
    ),
    grp AS (
      SELECT wd, CAST(COUNT(*) AS BIGINT) AS ni,
             CAST(SUM(r2) AS BIGINT) AS r2i
      FROM ranked GROUP BY wd
    ),
    terms AS (
      SELECT CAST(SUM(1000000 * (CAST(r2i AS HUGEINT) * r2i)
                      // (4 * ni)) AS BIGINT) AS s_micro,
             CAST(SUM(ni) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM grp
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(CAST(c AS HUGEINT) * c * c - c), 0)
                  AS BIGINT) AS t3
      FROM (SELECT COUNT(*) AS c FROM daily GROUP BY n_events) tg
    )
    SELECT t.n AS n_days, t.k AS n_groups,
           CAST(t.k - 1 AS BIGINT) AS dof, s.t3 AS tie_correction_t3,
           CAST(FLOOR(1000.0
                * ((12.0 * (CAST(t.s_micro AS DOUBLE) / 1000000.0)
                    / (CAST(t.n AS DOUBLE) * (t.n + 1.0))
                    - 3.0 * (t.n + 1.0))
                   / (1.0 - CAST(s.t3 AS DOUBLE)
                      / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n)))
                + 0.5) AS BIGINT) AS h_milli
    FROM terms t CROSS JOIN ties s
    """,
    tags=("llm", "events", "stats"),
)
def events_kruskal_wallis_weekday(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """H (milli, tie-corrected) for daily event counts grouped by
    weekday. Weekday convention: Spark ``dayofweek`` == DuckDB
    ``dayofweek + 1`` (the registered weekend-odds convention). One
    day-keyed aggregate (the only data-sized reduction), then
    everything is over ≤ |days| rows."""
    from pyspark.sql.window import Window

    from .llm_ops12 import _idiv_col

    t = load_tables(spark, sf_dir, "events")
    daily = t.events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    ranked = daily.select(
        F.dayofweek("day").alias("wd"),
        "n_events",
        (
            F.lit(2) * F.rank().over(Window.orderBy("n_events"))
            + F.count(F.lit(1)).over(Window.partitionBy("n_events"))
            - 1
        )
        .cast("long")
        .alias("r2"),
    )
    grp = ranked.groupBy("wd").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.sum("r2").cast("long").alias("r2i"),
    )
    terms = grp.agg(
        F.sum(
            _idiv_col(
                F.col("r2i") * F.col("r2i"),
                F.lit(4) * F.col("ni"),
                scale=1_000_000,
            )
        )
        .cast("long")
        .alias("s_micro"),
        F.sum("ni").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    ties = (
        daily.groupBy("n_events")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.coalesce(
                F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")),
                F.lit(0),
            )
            .cast("long")
            .alias("t3")
        )
    )
    n = F.col("n").cast("double")
    h = (
        F.lit(12.0)
        * (F.col("s_micro").cast("double") / F.lit(1_000_000.0))
        / (n * (F.col("n") + F.lit(1.0)))
        - F.lit(3.0) * (F.col("n") + F.lit(1.0))
    ) / (
        F.lit(1.0)
        - F.col("t3").cast("double")
        / (n * F.col("n") * F.col("n") - F.col("n"))
    )
    return terms.crossJoin(F.broadcast(ties)).select(
        F.col("n").alias("n_days"),
        F.col("k").alias("n_groups"),
        (F.col("k") - 1).cast("long").alias("dof"),
        F.col("t3").alias("tie_correction_t3"),
        F.floor(F.lit(1000.0) * h + F.lit(0.5)).cast("long").alias(
            "h_milli"
        ),
    )


# ---------------------------------------------------------------- wave 5
# Sequential-pattern support within sessions (Agrawal & Srikant, ICDE
# 1995 — the k=2 contiguous case, i.e. the empirical transition support
# / confidence / lift table the reference's Markov row normalizes):
# consecutive event-type pairs inside the registered 30-minute
# sessionization, with association metrics over the bounded type x type
# dimension. Complements the Markov stationary wave (which models the
# SAME transitions) with the rule-mining view: confidence is
# P(next=b | cur=a), lift is confidence / P(next=b) — both integer
# fixed-point over exact counts.


@query(
    "events_session_bigrams",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                          > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM g
    ), tr AS (
      SELECT event_type AS et_from,
             LEAD(event_type) OVER (PARTITION BY user_id, session_idx
                                    ORDER BY ts, event_id) AS et_to
      FROM s
    ), pairs AS (
      SELECT et_from, et_to, CAST(COUNT(*) AS BIGINT) AS support
      FROM tr WHERE et_to IS NOT NULL GROUP BY et_from, et_to
    ),
    margins AS (
      SELECT CAST(SUM(support) AS BIGINT) AS total FROM pairs
    ),
    fromc AS (
      SELECT et_from, CAST(SUM(support) AS BIGINT) AS nf FROM pairs
      GROUP BY et_from
    ),
    toc AS (
      SELECT et_to, CAST(SUM(support) AS BIGINT) AS nt FROM pairs
      GROUP BY et_to
    )
    SELECT p.et_from, p.et_to, p.support,
           CAST(1000 * p.support // f.nf AS BIGINT) AS confidence_milli,
           CAST(1000000 * p.support * m.total // (f.nf * t.nt)
                AS BIGINT) AS lift_micro
    FROM pairs p
    JOIN fromc f ON f.et_from = p.et_from
    JOIN toc t ON t.et_to = p.et_to
    CROSS JOIN margins m
    ORDER BY p.support DESC, p.et_from, p.et_to
    LIMIT 25
    """,
    tags=("llm", "events", "mining"),
)
def events_session_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 within-session event-type transitions by support, with
    confidence (milli) and lift (micro). One user-keyed window (the
    registered sessionization shape, verbatim ordering ts/event_id) +
    one (user, session)-keyed LEAD window; everything after is over the
    ≤ |types|² pair dimension."""
    from pyspark.sql.window import Window as W

    from .llm_ops12 import _idiv_col

    t = load_tables(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(
        F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1
    ).otherwise(0)
    s = t.events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(new_sess)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_idx"),
    )
    tr = s.select(
        F.col("event_type").alias("et_from"),
        F.lead("event_type")
        .over(
            W.partitionBy("user_id", "session_idx").orderBy("ts", "event_id")
        )
        .alias("et_to"),
    ).filter(F.col("et_to").isNotNull())
    pairs = tr.groupBy("et_from", "et_to").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    total = pairs.agg(F.sum("support").cast("long").alias("total"))
    fromc = pairs.groupBy("et_from").agg(
        F.sum("support").cast("long").alias("nf")
    )
    toc = pairs.groupBy("et_to").agg(
        F.sum("support").cast("long").alias("nt")
    )
    return (
        pairs.join(F.broadcast(fromc), "et_from")
        .join(F.broadcast(toc), "et_to")
        .crossJoin(F.broadcast(total))
        .select(
            "et_from",
            "et_to",
            "support",
            _idiv_col(F.col("support"), F.col("nf"), scale=1000).alias(
                "confidence_milli"
            ),
            _idiv_col(
                F.col("support") * F.col("total"),
                F.col("nf") * F.col("nt"),
                scale=1_000_000,
            ).alias("lift_micro"),
        )
        .orderBy(F.desc("support"), "et_from", "et_to")
        .limit(25)
    )


# ---------------------------------------------------------------- wave 6
# Temperature-scaled mixture weights (Lample & Conneau, NeurIPS 2019;
# Arivazhagan et al., arXiv:1907.05019 — sampling sources with
# p_i ∝ n_i^α flattens the head and upweights the tail, THE standard
# multilingual/multi-source LLM sampling rule): per-source shares at
# α = 1 (proportional), 1/2 and 1/4. α restricted to inverse powers of
# two ON PURPOSE: sqrt is IEEE-correctly-rounded in both engines, so
# sqrt and sqrt∘sqrt are bit-identical cross-engine, while a generic
# pow(x, 0.7) is libm-dependent — the weights stay one-correctly-
# rounded-float-then-micro-round exact.


@query(
    "curation_temperature_mixture",
    oracle="""
    WITH per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents
      GROUP BY source
    ),
    w AS (
      SELECT source, n,
             n AS w1,
             CAST(FLOOR(1000000 * sqrt(CAST(n AS DOUBLE)) + 0.5)
                  AS BIGINT) AS w05,
             CAST(FLOOR(1000000 * sqrt(sqrt(CAST(n AS DOUBLE))) + 0.5)
                  AS BIGINT) AS w025
      FROM per
    ),
    tot AS (
      SELECT CAST(SUM(w1) AS BIGINT) AS t1,
             CAST(SUM(w05) AS BIGINT) AS t05,
             CAST(SUM(w025) AS BIGINT) AS t025
      FROM w
    )
    SELECT w.source, w.n AS n_docs,
           CAST(1000000 * w.w1 // t.t1 AS BIGINT) AS share_prop_micro,
           CAST(1000000 * w.w05 // t.t05 AS BIGINT) AS share_t05_micro,
           CAST(1000000 * w.w025 // t.t025 AS BIGINT) AS share_t025_micro
    FROM w CROSS JOIN tot t
    ORDER BY w.source
    """,
    tags=("llm", "curation"),
)
def curation_temperature_mixture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source sampling shares (micro) at temperature α = 1, 1/2,
    1/4 — the flattening ladder a mixture designer sweeps before
    committing a training mix. One source-keyed aggregate + a broadcast
    scalar; the n^α weights are sqrt-chains (bit-identical IEEE),
    micro-rounded half-up, shares integer-exact."""
    from .llm_ops12 import _idiv_col

    per = load_tables(spark, sf_dir, "documents").documents.groupBy(
        "source"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = per.select(
        "source",
        "n",
        F.col("n").alias("w1"),
        F.floor(
            F.lit(1_000_000.0) * F.sqrt(F.col("n").cast("double"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("w05"),
        F.floor(
            F.lit(1_000_000.0)
            * F.sqrt(F.sqrt(F.col("n").cast("double")))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("w025"),
    )
    tot = w.agg(
        F.sum("w1").cast("long").alias("t1"),
        F.sum("w05").cast("long").alias("t05"),
        F.sum("w025").cast("long").alias("t025"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            _idiv_col(F.col("w1"), F.col("t1"), scale=1_000_000).alias(
                "share_prop_micro"
            ),
            _idiv_col(F.col("w05"), F.col("t05"), scale=1_000_000).alias(
                "share_t05_micro"
            ),
            _idiv_col(F.col("w025"), F.col("t025"), scale=1_000_000).alias(
                "share_t025_micro"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------- wave 7
# Synchronous label propagation communities (Raghavan, Albert & Kumara,
# Phys. Rev. E 2007) on the registered co-purchase graph — near-linear
# community detection, the standard first look before modularity
# optimization (the registered greedy-modularity row). Determinized the
# house way: 8 SYNCHRONOUS rounds (every node updates from the previous
# round's labels), each node takes the most frequent neighbor label
# with ties broken by the SMALLEST label — both engines compute the
# identical fixed sequence, the oracle unrolls the rounds as CTE stages
# (the Markov-stationary pattern). Graph single-sourced from llm_ops14
# (_aa_graph / _AA_GRAPH_CTES), so this row scores the same graph as
# the AA and modularity rows.

_LPA_ROUNDS = 8


def _build_lpa_oracle() -> str:
    from .llm_ops14 import _AA_GRAPH_CTES

    stages = ["l0 AS (SELECT u, u AS lab FROM nodes)"]
    for i in range(1, _LPA_ROUNDS + 1):
        stages.append(f"""c{i} AS (
      SELECT e.u, l.lab, COUNT(*) AS c
      FROM e JOIN l{i - 1} l ON l.u = e.v
      GROUP BY e.u, l.lab
    ),
    l{i} AS (
      SELECT u, lab FROM (
        SELECT u, lab,
               ROW_NUMBER() OVER (PARTITION BY u ORDER BY c DESC, lab)
                 AS rn
        FROM c{i}
      ) WHERE rn = 1
    )""")
    chain = ",\n    ".join(stages)
    return f"""
    WITH {_AA_GRAPH_CTES},
    nodes AS (SELECT DISTINCT u FROM e),
    {chain},
    sized AS (
      SELECT lab AS community, CAST(COUNT(*) AS BIGINT) AS size
      FROM l{_LPA_ROUNDS} GROUP BY lab
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY size DESC, community)
                AS BIGINT) AS rank,
           CAST(community AS BIGINT) AS community, size
    FROM sized
    ORDER BY size DESC, community
    LIMIT 10
    """


@query(
    "graph_label_propagation",
    oracle=_build_lpa_oracle(),
    tags=("llm", "graph"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 LPA communities (size desc, label asc) after 8 synchronous
    min-tie-break rounds on the co-purchase graph. Each round is one
    edge join + one (node, label) aggregate + one node-keyed window —
    rounds are K-bounded plan stages, never data-dependent loops."""
    from pyspark.sql.window import Window

    from .llm_ops14 import _aa_graph

    _pairs, e, _deg, _wedges = _aa_graph(spark, sf_dir)
    labels = e.select("u").distinct().select(
        "u", F.col("u").alias("lab")
    )
    for _ in range(_LPA_ROUNDS):
        counted = (
            e.join(
                labels.select(
                    F.col("u").alias("v"), F.col("lab")
                ),
                "v",
            )
            .groupBy("u", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # r12: the per-round pick is an argmax (max count, min label on
        # ties) — min(struct(-c, lab)) in ONE keyed aggregate with
        # map-side partial aggregation, instead of a row_number window
        # that paid a per-round sort on top of the (u) shuffle
        # (guide §2.3 "aggregate before you shuffle"). Struct order is
        # lexicographic, so min(-c, lab) == (max c, then min lab),
        # exactly the old ORDER BY c DESC, lab ASC rank-1 row.
        labels = (
            counted.groupBy("u")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"), F.col("lab").alias("lab")
                    )
                ).alias("b")
            )
            .select("u", F.col("b.lab").alias("lab"))
        )
    sized = labels.groupBy(F.col("lab").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    return (
        sized.select(
            F.row_number()
            .over(Window.orderBy(F.desc("size"), F.asc("community")))
            .cast("long")
            .alias("rank"),
            F.col("community").cast("long").alias("community"),
            "size",
        )
        .orderBy(F.desc("size"), "community")
        .limit(10)
    )


# ---------------------------------------------------------------- wave 8
# Kaplan-Meier product-limit estimator (Kaplan & Meier, JASA 1958) for
# time-to-second-order: per customer, the event is the SECOND order
# (repurchase), duration = whole months from the first order; customers
# who never reorder are right-censored at the corpus' last order date.
# Survival at each event month is the running product of
# (n_risk − d) / n_risk — kept exact-integer by micro-truncating every
# step IN ORDER (the truncation-ordered product both engines replay
# identically: Spark F.aggregate over the month-sorted factor array,
# DuckDB list_reduce over the same prefix slices). The month dimension
# bounds everything: the O(T²) prefix products run over ≤ ~90 distinct
# event months, never over customers.


@query(
    "orders_km_repurchase",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             MIN(o_orderdate) AS first_dt,
             MIN(CASE WHEN rn = 2 THEN o_orderdate END) AS second_dt
      FROM (
        SELECT o_custkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
      ) GROUP BY o_custkey
    ),
    horizon AS (SELECT MAX(o_orderdate) AS end_dt FROM orders),
    subj AS (
      SELECT CASE WHEN second_dt IS NOT NULL
                  THEN (date_part('year', second_dt)
                        - date_part('year', first_dt)) * 12
                       + date_part('month', second_dt)
                       - date_part('month', first_dt)
                  ELSE (date_part('year', h.end_dt)
                        - date_part('year', first_dt)) * 12
                       + date_part('month', h.end_dt)
                       - date_part('month', first_dt)
             END AS t,
             (second_dt IS NOT NULL) AS event
      FROM per CROSS JOIN horizon h
    ),
    etimes AS (
      SELECT CAST(t AS BIGINT) AS m,
             CAST(SUM(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT)
               AS d
      FROM subj GROUP BY t
      HAVING SUM(CASE WHEN event THEN 1 ELSE 0 END) > 0
    ),
    risk AS (
      SELECT e.m, e.d,
             CAST((SELECT COUNT(*) FROM subj s WHERE s.t >= e.m)
                  AS BIGINT) AS n_risk
      FROM etimes e
    ),
    arr AS (
      SELECT list(1000000 * (n_risk - d) // n_risk ORDER BY m) AS fs,
             list(m ORDER BY m) AS ms,
             list(d ORDER BY m) AS ds,
             list(n_risk ORDER BY m) AS rs
      FROM risk
    ),
    surv AS (
      SELECT unnest(ms) AS month_no, unnest(ds) AS n_events,
             unnest(rs) AS n_risk,
             unnest(list_transform(ms, (x, i) ->
               list_reduce(list_prepend(CAST(1000000 AS BIGINT),
                                        list_slice(fs, 1, i)),
                           (a, b) -> a * b // 1000000))) AS surv_micro
      FROM arr
    )
    SELECT month_no, n_risk, n_events, surv_micro
    FROM surv ORDER BY month_no
    """,
    tags=("relational", "orders", "stats"),
)
def orders_km_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repurchase survival curve: month_no, n_risk, n_events and
    S(t) in micro (truncation-ordered product-limit). One customer
    window + one customer aggregate are the only data-sized steps; the
    at-risk counts join customers against the ≤ ~90-row event-month
    dimension (broadcast), and the prefix products run inside a single
    collected row."""
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders").orders
    rn = F.row_number().over(
        Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    )
    ranked = orders.select(
        "o_custkey", "o_orderdate", rn.alias("rn")
    ).filter(F.col("rn") <= 2)
    per = ranked.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt"),
        F.min(F.when(F.col("rn") == 2, F.col("o_orderdate"))).alias(
            "second_dt"
        ),
    )
    horizon = orders.agg(F.max("o_orderdate").alias("end_dt"))

    def mdiff(a, b):
        return (F.year(a) - F.year(b)) * 12 + F.month(a) - F.month(b)

    subj = per.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("second_dt").isNotNull(),
            mdiff(F.col("second_dt"), F.col("first_dt")),
        )
        .otherwise(mdiff(F.col("end_dt"), F.col("first_dt")))
        .cast("long")
        .alias("t"),
        F.col("second_dt").isNotNull().alias("event"),
    )
    etimes = (
        subj.groupBy(F.col("t").alias("m"))
        .agg(
            F.sum(F.when(F.col("event"), 1).otherwise(0))
            .cast("long")
            .alias("d")
        )
        .filter(F.col("d") > 0)
    )
    risk = (
        subj.crossJoin(F.broadcast(etimes))
        .filter(F.col("t") >= F.col("m"))
        .groupBy("m", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("n_risk"))
    )
    arr = risk.agg(
        F.sort_array(
            F.collect_list(F.struct("m", "d", "n_risk"))
        ).alias("a")
    ).select(
        F.col("a.m").alias("ms"),
        F.col("a.d").alias("ds"),
        F.col("a.n_risk").alias("rs"),
        F.transform(
            "a",
            lambda s: (
                (
                    F.lit(1_000_000)
                    * (s["n_risk"] - s["d"]).cast("decimal(38,0)")
                    - (
                        F.lit(1_000_000)
                        * (s["n_risk"] - s["d"]).cast("decimal(38,0)")
                    )
                    % s["n_risk"].cast("decimal(38,0)")
                )
                / s["n_risk"].cast("decimal(38,0)")
            ).cast("long"),
        ).alias("fs"),
    )

    def _prod_step(acc, x):
        p = (acc * x).cast("decimal(38,0)")
        return ((p - (p % F.lit(1_000_000))) / F.lit(1_000_000)).cast(
            "long"
        )

    surv = arr.select(
        F.arrays_zip(
            "ms",
            "ds",
            "rs",
            F.transform(
                F.sequence(F.lit(1), F.size("fs")),
                lambda i: F.aggregate(
                    F.slice("fs", F.lit(1), i),
                    F.lit(1_000_000).cast("long"),
                    _prod_step,
                ),
            ).alias("sv"),
        ).alias("z")
    ).select(F.explode("z").alias("r"))
    return surv.select(
        F.col("r.ms").alias("month_no"),
        F.col("r.rs").alias("n_risk"),
        F.col("r.ds").alias("n_events"),
        F.col("r.sv").alias("surv_micro"),
    ).orderBy("month_no")


# ---------------------------------------------------------------- wave 9
# One-sided CUSUM mean-shift detection on monthly order volume (Page,
# Biometrika 1954): S_t = max(0, S_{t-1} + (x_t − μ − k)), allowance
# k = μ/10 and decision interval h = 4k (both micro fixed-point,
# derived from exact integer totals — a c-chart-style mean-relative
# parameterization, stated). The recurrence is NOT a window sum (the
# max-clamp resets), so both engines replay it as prefix folds over the
# month-sorted array — the month dimension (≤ ~90) bounds the O(T²)
# prefix work, never the order count.


@query(
    "orders_cusum_monthly",
    oracle="""
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    mu AS (
      SELECT CAST(1000000 * SUM(x) // COUNT(*) AS BIGINT) AS mu_micro,
             CAST((1000000 * SUM(x) // COUNT(*)) // 10 AS BIGINT)
               AS k_micro
      FROM monthly
    ),
    arr AS (
      SELECT list(month ORDER BY month) AS months,
             list(x ORDER BY month) AS xs,
             MAX(m.mu_micro) AS mu_micro, MAX(m.k_micro) AS k_micro
      FROM monthly CROSS JOIN mu m
    ),
    folded AS (
      SELECT unnest(months) AS month, unnest(xs) AS n_orders,
             unnest(list_transform(months, (e, i) ->
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                                        list_slice(xs, 1, i)),
                           (a, b) -> GREATEST(CAST(0 AS BIGINT),
                                a + 1000000 * b - mu_micro - k_micro))))
               AS s_micro
      FROM arr
    )
    SELECT f.month, f.n_orders, f.s_micro,
           (f.s_micro > 4 * m.k_micro) AS alarm
    FROM folded f CROSS JOIN mu m
    ORDER BY f.month
    """,
    tags=("relational", "orders", "stats", "anomaly"),
)
def orders_cusum_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month CUSUM statistic (micro) and alarm flag over monthly
    order counts. One month-keyed aggregate is the only data-sized
    step; the clamped recurrence folds inside a single collected row,
    exactly as the oracle's list_reduce replays it."""
    orders = load_tables(spark, sf_dir, "orders").orders
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    from .llm_ops12 import _idiv_col

    mu = monthly.agg(
        F.sum("x").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("nm"),
    ).select(
        _idiv_col(F.col("tot"), F.col("nm"), scale=1_000_000).alias(
            "mu_micro"
        )
    ).select(
        "mu_micro",
        (F.col("mu_micro") - F.col("mu_micro") % 10).cast("long").alias(
            "k10"
        ),
    ).select(
        "mu_micro", (F.col("k10") / 10).cast("long").alias("k_micro")
    )
    arr = monthly.agg(
        F.sort_array(F.collect_list(F.struct("month", "x"))).alias("a")
    ).select(
        F.col("a.month").alias("months"), F.col("a.x").alias("xs")
    )
    folded = arr.crossJoin(F.broadcast(mu)).select(
        "mu_micro",
        "k_micro",
        F.arrays_zip(
            "months",
            "xs",
            F.transform(
                F.sequence(F.lit(1), F.size("xs")),
                lambda i: F.aggregate(
                    F.slice("xs", F.lit(1), i),
                    F.lit(0).cast("long"),
                    lambda acc, b: F.greatest(
                        F.lit(0).cast("long"),
                        acc
                        + F.lit(1_000_000) * b
                        - F.col("mu_micro")
                        - F.col("k_micro"),
                    ),
                ),
            ).alias("ss"),
        ).alias("z"),
    ).select("k_micro", F.explode("z").alias("r"))
    return folded.select(
        F.col("r.months").alias("month"),
        F.col("r.xs").alias("n_orders"),
        F.col("r.ss").alias("s_micro"),
        (F.col("r.ss") > 4 * F.col("k_micro")).alias("alarm"),
    ).orderBy("month")


# ---------------------------------------------------------------- wave 10
# HITS hubs & authorities (Kleinberg, JACM 1999) on the directed
# supplier-nation → customer-nation trade graph (edge weight = lineitem
# count): which nations CHANNEL trade (hubs: their suppliers ship to
# authoritative buyers) vs ABSORB it (authorities). 8 exact integer
# power iterations in micro fixed-point, each followed by an exact
# idiv normalization to Σ = 1e6 (the same determinized-iteration
# pattern as the Markov-stationary and label-propagation rows — the
# oracle unrolls the identical stages, truncation order and all). The
# nation dimension (25 × 25 edges max) bounds every iteration.

_HITS_ITERS = 8


def _build_hits_oracle() -> str:
    stages = [
        "h0 AS (SELECT u, CAST(1000000 AS BIGINT) AS h FROM "
        "(SELECT DISTINCT u FROM edges))"
    ]
    # each stage references its predecessor exactly ONCE (window-sum
    # normalization, not a scalar subquery): DuckDB inlines CTEs, so a
    # stage read twice doubles the expanded tree per iteration — 2^16
    # scans of the edge relation exhausted the fd limit before the
    # window form made the expansion linear
    for i in range(1, _HITS_ITERS + 1):
        stages.append(f"""ar{i} AS (
      SELECT e.v, CAST(SUM(e.w * h.h) AS BIGINT) AS a
      FROM edges e JOIN h{i - 1} h ON h.u = e.u GROUP BY e.v
    ),
    a{i} AS (
      SELECT v, CAST(1000000 * a // SUM(a) OVER () AS BIGINT) AS a
      FROM ar{i}
    ),
    hr{i} AS (
      SELECT e.u, CAST(SUM(e.w * a.a) AS BIGINT) AS h
      FROM edges e JOIN a{i} a ON a.v = e.v GROUP BY e.u
    ),
    h{i} AS (
      SELECT u, CAST(1000000 * h // SUM(h) OVER () AS BIGINT) AS h
      FROM hr{i}
    )""")
    chain = ",\n    ".join(stages)
    return f"""
    WITH edges AS (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    {chain}
    SELECT n.n_name AS nation,
           COALESCE(h.h, 0) AS hub_micro,
           COALESCE(a.a, 0) AS auth_micro
    FROM nation n
    LEFT JOIN h{_HITS_ITERS} h ON h.u = n.n_nationkey
    LEFT JOIN a{_HITS_ITERS} a ON a.v = n.n_nationkey
    WHERE h.h IS NOT NULL OR a.a IS NOT NULL
    ORDER BY auth_micro DESC, nation
    """


@query(
    "graph_hits_nations",
    oracle=_build_hits_oracle(),
    tags=("llm", "graph", "relational"),
)
def graph_hits_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub and authority scores (micro, Σ = 1e6 each after every
    normalization) per trading nation after 8 iterations. Edge
    construction is the one data-sized step (three broadcast-dimension
    joins + one pair aggregate); every iteration is a ≤ 625-row join."""
    from .llm_ops12 import _idiv_col

    t = load_tables(
        spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation"
    )
    edges = (
        t.lineitem.join(
            F.broadcast(t.supplier),
            t.lineitem.l_suppkey == t.supplier.s_suppkey,
        )
        .join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .join(
            F.broadcast(t.customer),
            t.orders.o_custkey == t.customer.c_custkey,
        )
        .groupBy(
            F.col("s_nationkey").alias("u"),
            F.col("c_nationkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        # materialize the ≤625-row edge relation once: the iteration
        # references it twice per round and each normalization embeds
        # its numerator relation twice, so without truncating lineage
        # the analysis tree doubles per round (the connected-components
        # localCheckpoint rationale, operators/graph.py)
        .localCheckpoint(eager=True)
    )
    h = edges.select("u").distinct().select(
        "u", F.lit(1_000_000).cast("long").alias("h")
    )
    a = None
    for _ in range(_HITS_ITERS):
        ar = (
            edges.join(h, "u")
            .groupBy("v")
            .agg(F.sum(F.col("w") * F.col("h")).cast("long").alias("a"))
            .localCheckpoint(eager=True)
        )
        at = ar.agg(F.sum("a").cast("long").alias("ta"))
        a = ar.crossJoin(F.broadcast(at)).select(
            "v",
            _idiv_col(F.col("a"), F.col("ta"), scale=1_000_000).alias("a"),
        )
        hr = (
            edges.join(a, "v")
            .groupBy("u")
            .agg(F.sum(F.col("w") * F.col("a")).cast("long").alias("h"))
            .localCheckpoint(eager=True)
        )
        ht = hr.agg(F.sum("h").cast("long").alias("th"))
        h = hr.crossJoin(F.broadcast(ht)).select(
            "u",
            _idiv_col(F.col("h"), F.col("th"), scale=1_000_000).alias("h"),
        )
    nation = t.nation.select("n_nationkey", "n_name")
    return (
        nation.join(h, nation.n_nationkey == h.u, "left")
        .join(a, nation.n_nationkey == a.v, "left")
        .filter(F.col("h").isNotNull() | F.col("a").isNotNull())
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias(
                "hub_micro"
            ),
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias(
                "auth_micro"
            ),
        )
        .orderBy(F.desc("auth_micro"), "nation")
    )


# ---------------------------------------------------------------- wave 11
# Precision-recall curve of the NB gate at coverage deciles (Davis &
# Goadrich, ICML 2006 — PR curves are the right view under class
# imbalance; Manning/Raghavan/Schütze IR ch.8 for P@k/R@k): rank the
# held-out docs by margin (desc, doc_id tie-break — total order), cut
# at k = N·d/10 for deciles d = 1..10, and report exact-integer
# precision/recall/F1 (milli) at each cut. Completes the gate-eval
# family's threshold axis: Youden picks ONE cut, AUC integrates over
# all — this row shows the 10-point curve between them, from the SAME
# single-sourced score relation.


def _build_pr_curve_oracle() -> str:
    from .llm_ops11 import _nb_chain_sql

    return f"""
    WITH {_nb_chain_sql()},
    ranked AS (
      SELECT truth,
             ROW_NUMBER() OVER (ORDER BY score_pass - score_fail DESC,
                                doc_id) AS rn
      FROM scored
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT)
               AS p
      FROM ranked
    ),
    deciles AS (SELECT UNNEST(range(1, 11)) AS d),
    cuts AS (
      SELECT d.d, CAST(t.n * d.d // 10 AS BIGINT) AS k, t.p
      FROM deciles d CROSS JOIN tot t
    ),
    curve AS (
      SELECT c.d, c.k, c.p,
             CAST(SUM(CASE WHEN r.truth THEN 1 ELSE 0 END) AS BIGINT)
               AS tp
      FROM cuts c JOIN ranked r ON r.rn <= c.k
      GROUP BY c.d, c.k, c.p
    )
    SELECT d AS decile, k AS n_predicted, tp AS n_tp,
           CAST(1000 * tp // k AS BIGINT) AS precision_milli,
           CAST(1000 * tp // p AS BIGINT) AS recall_milli,
           CAST(CASE WHEN 1000 * tp // k + 1000 * tp // p = 0 THEN 0
                ELSE 2 * (1000 * tp // k) * (1000 * tp // p)
                     // (1000 * tp // k + 1000 * tp // p) END
                AS BIGINT) AS f1_milli
    FROM curve
    ORDER BY decile
    """


@query(
    "quality_pr_curve_nb_gate",
    oracle=_build_pr_curve_oracle(),
    tags=("llm", "quality", "eval"),
)
def quality_pr_curve_nb_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P/R/F1 (milli, exact integers) at the 10 coverage deciles of the
    NB margin ranking. One global ranking window + a broadcast
    10-row decile dimension; the curve join is rank-bounded."""
    from pyspark.sql.window import Window

    from .llm_ops11 import _nb_scored
    from .llm_ops12 import _idiv_col

    scored = _nb_scored(spark, sf_dir).select(
        "doc_id",
        "truth",
        (F.col("score_pass") - F.col("score_fail")).alias("m"),
    )
    ranked = scored.select(
        "truth",
        F.row_number()
        .over(Window.orderBy(F.desc("m"), F.asc("doc_id")))
        .cast("long")
        .alias("rn"),
    )
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("truth"), 1).otherwise(0)).cast("long").alias(
            "p"
        ),
    )
    deciles = spark.range(1, 11).select(F.col("id").alias("d"))
    cuts = deciles.crossJoin(F.broadcast(tot)).select(
        "d", _idiv_col(F.col("n") * F.col("d"), F.lit(10)).alias("k"), "p"
    )
    curve = (
        ranked.crossJoin(F.broadcast(cuts))
        .filter(F.col("rn") <= F.col("k"))
        .groupBy("d", "k", "p")
        .agg(
            F.sum(F.when(F.col("truth"), 1).otherwise(0))
            .cast("long")
            .alias("tp")
        )
    )
    prec = _idiv_col(F.col("tp"), F.col("k"), scale=1000)
    rec = _idiv_col(F.col("tp"), F.col("p"), scale=1000)
    return curve.select(
        F.col("d").alias("decile"),
        F.col("k").alias("n_predicted"),
        F.col("tp").alias("n_tp"),
        prec.alias("precision_milli"),
        rec.alias("recall_milli"),
        F.when(prec + rec == 0, F.lit(0))
        .otherwise(_idiv_col(prec * rec, prec + rec, scale=2))
        .cast("long")
        .alias("f1_milli"),
    ).orderBy("decile")


# ---------------------------------------------------------------- wave 12
# Jaccard-coefficient link prediction (Liben-Nowell & Kleinberg, CIKM
# 2003 — the normalized sibling of the registered common-neighbors/
# Adamic-Adar rows): for non-adjacent pairs, J = |Γu ∩ Γv| / |Γu ∪ Γv|
# with the union via inclusion-exclusion — ALL integers, milli-scaled.
# Graph single-sourced from llm_ops14 (_aa_graph / _AA_GRAPH_CTES), so
# the three link-prediction rows rank the same wedge relation.


def _build_jaccard_lp_oracle() -> str:
    from .llm_ops14 import _AA_GRAPH_CTES

    return f"""
    WITH {_AA_GRAPH_CTES},
    cn AS (
      SELECT wg.u, wg.v, CAST(COUNT(*) AS BIGINT) AS c
      FROM wedges wg
      WHERE NOT EXISTS (SELECT 1 FROM pairs p
                        WHERE p.pa = wg.u AND p.pb = wg.v)
      GROUP BY wg.u, wg.v
    )
    SELECT cn.u, cn.v, cn.c AS n_common,
           CAST(du.d + dv.d - cn.c AS BIGINT) AS n_union,
           CAST(1000 * cn.c // (du.d + dv.d - cn.c) AS BIGINT)
             AS jaccard_milli
    FROM cn
    JOIN deg du ON du.u = cn.u
    JOIN deg dv ON dv.u = cn.v
    ORDER BY jaccard_milli DESC, cn.u, cn.v
    LIMIT 20
    """


@query(
    "graph_jaccard_linkpred",
    oracle=_build_jaccard_lp_oracle(),
    tags=("llm", "graph"),
)
def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 non-edges by neighborhood Jaccard (milli; ties broken by
    (u, v)). One wedge aggregate + two degree joins — the same scale
    shape as the registered AA row (and the same hub caveat its capped
    sibling measures)."""
    from .llm_ops12 import _idiv_col
    from .llm_ops14 import _aa_graph

    pairs, _e, deg, wedges = _aa_graph(spark, sf_dir)
    cn = (
        wedges.join(
            pairs,
            (wedges.u == pairs.pa) & (wedges.v == pairs.pb),
            "left_anti",
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    du = deg.select(F.col("u").alias("ju"), F.col("d").alias("du"))
    dv = deg.select(F.col("u").alias("jv"), F.col("d").alias("dv"))
    uni = F.col("du") + F.col("dv") - F.col("c")
    return (
        cn.join(du, cn.u == du.ju)
        .join(dv, cn.v == dv.jv)
        .select(
            "u",
            "v",
            F.col("c").alias("n_common"),
            uni.cast("long").alias("n_union"),
            _idiv_col(F.col("c"), uni, scale=1000).alias("jaccard_milli"),
        )
        .orderBy(F.desc("jaccard_milli"), "u", "v")
        .limit(20)
    )


# ---------------------------------------------------------------- wave 13
# Atkinson inequality index, ε = 1/2 (Atkinson, J. Economic Theory
# 1970) of order values per customer nation — the welfare-grounded
# member of the inequality family beside the registered Gini / Theil /
# HHI / Lorenz rows. ε = 1/2 keeps the generalized mean a sqrt chain:
# EDE = ((Σ √x)/n)², A = 1 − EDE/μ. Each row's √cents is one
# correctly-rounded sqrt micro-floored to an integer; the sums are
# exact; the final combine is one fixed-order float expression.


@query(
    "agg_atkinson_by_nation",
    oracle="""
    WITH vals AS (
      SELECT n.n_name AS nation,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    agg AS (
      SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total,
             CAST(SUM(CAST(FLOOR(1000000 * sqrt(CAST(cents AS DOUBLE)))
                           AS BIGINT)) AS BIGINT) AS s_micro
      FROM vals GROUP BY nation
    )
    SELECT nation, n AS n_orders,
           CAST(FLOOR(1000.0 * (1.0
                - (CAST(s_micro AS DOUBLE) / n)
                  * (CAST(s_micro AS DOUBLE) / n)
                  / 1e12
                  / (CAST(total AS DOUBLE) / n)) + 0.5) AS BIGINT)
             AS atkinson_milli
    FROM agg
    ORDER BY nation
    """,
    tags=("relational", "agg", "stats"),
)
def agg_atkinson_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A(ε=1/2) in milli per customer nation over order values (cents).
    One data-sized aggregate after two dimension joins; per-row sqrt is
    micro-floored to an integer so the nation sums are exact and
    aggregation-order-free, then one fixed-order float finish."""
    t = load_tables(spark, sf_dir, "orders", "customer", "nation")
    vals = (
        t.orders.join(
            F.broadcast(t.customer),
            t.orders.o_custkey == t.customer.c_custkey,
        )
        .join(
            F.broadcast(t.nation),
            t.customer.c_nationkey == t.nation.n_nationkey,
        )
        .select(
            F.col("n_name").alias("nation"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    agg = vals.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
        F.sum(
            F.floor(
                F.lit(1_000_000.0) * F.sqrt(F.col("cents").cast("double"))
            ).cast("long")
        )
        .cast("long")
        .alias("s_micro"),
    )
    sm = F.col("s_micro").cast("double")
    a = F.lit(1.0) - (sm / F.col("n")) * (sm / F.col("n")) / F.lit(
        1e12
    ) / (F.col("total").cast("double") / F.col("n"))
    return agg.select(
        "nation",
        F.col("n").alias("n_orders"),
        F.floor(F.lit(1000.0) * a + F.lit(0.5)).cast("long").alias(
            "atkinson_milli"
        ),
    ).orderBy("nation")


# ---------------------------------------------------------------- wave 14
# Holt's linear-trend double exponential smoothing (Holt 1957,
# reprinted Int. J. Forecasting 2004) over monthly order volume, micro
# fixed-point with α = β = 1/4: level and trend updates are
# power-of-two divisions, so every step is an exact truncating integer
# operation both engines replay in the same order — the same
# prefix-fold pattern as the CUSUM row, with a (level, trend) STRUCT
# accumulator. One-step-ahead forecast errors come out beside the
# states, so the row doubles as an in-sample forecast-quality readout.


@query(
    "orders_holt_trend",
    oracle="""
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    arr AS (
      SELECT list(month ORDER BY month) AS months,
             list(x ORDER BY month) AS xs
      FROM monthly
    ),
    folded AS (
      -- (level, trend) packed into ONE HUGEINT code = l*2^41 + (b+2^40):
      -- DuckDB evaluates struct-literal lambda fields sequentially with
      -- same-named acc fields SHADOWED by already-computed ones, so a
      -- {'l','b'} accumulator silently reads the new l inside the b
      -- expression — packing sidesteps engine-specific struct-lambda
      -- semantics with plain integer ops both engines define identically
      SELECT unnest(months) AS month, unnest(xs) AS n_orders,
             unnest(list_transform(months, (e, i) ->
               list_reduce(
                 list_prepend(
                   CAST(1000000 AS HUGEINT) * xs[1] * 2199023255552
                     + 1099511627776,
                   list_transform(list_slice(xs, 2, i), v ->
                     CAST(v AS HUGEINT))),
                 (acc, v) ->
                   ((1000000 * v
                     + 3 * ((acc - acc % 2199023255552) // 2199023255552
                            + acc % 2199023255552 - 1099511627776)) // 4)
                   * 2199023255552
                   + ((((1000000 * v
                         + 3 * ((acc - acc % 2199023255552)
                                // 2199023255552
                                + acc % 2199023255552 - 1099511627776))
                        // 4)
                       - (acc - acc % 2199023255552) // 2199023255552
                       + 3 * (acc % 2199023255552 - 1099511627776)) // 4)
                   + 1099511627776))) AS code
      FROM arr
    ),
    states AS (
      SELECT month, n_orders,
             CAST((code - code % 2199023255552) // 2199023255552
                  AS BIGINT) AS level_micro,
             CAST(code % 2199023255552 - 1099511627776 AS BIGINT)
               AS trend_micro
      FROM folded
    )
    SELECT month, n_orders, level_micro, trend_micro,
           CAST(level_micro + trend_micro AS BIGINT)
             AS forecast_next_micro
    FROM states
    ORDER BY month
    """,
    tags=("relational", "orders", "stats", "forecast"),
)
def orders_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month Holt level/trend (micro) and the next-month forecast,
    α = β = 1/4 truncating fixed-point. The fold runs over the
    month-sorted array inside one collected row (month dimension ≤ ~90
    bounds the O(T²) prefix work); the only data-sized step is the
    month aggregate."""
    orders = load_tables(spark, sf_dir, "orders").orders
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    arr = monthly.agg(
        F.sort_array(F.collect_list(F.struct("month", "x"))).alias("a")
    ).select(
        F.col("a.month").alias("months"), F.col("a.x").alias("xs")
    )

    # (level, trend) packed into one DECIMAL(38,0) code = l*2^41 +
    # (b + 2^40) — see the oracle's note: struct-literal lambda field
    # semantics differ across engines (DuckDB shadows same-named acc
    # fields sequentially), so the fold carries a single integer whose
    # unpack/repack is plain truncating arithmetic both engines define
    # identically (% carries the dividend's sign in both).
    P = F.lit(2_199_023_255_552)  # 2^41
    B = F.lit(1_099_511_627_776)  # 2^40
    dec = "decimal(38,0)"

    def _step(acc, v):
        # every intermediate re-cast to DECIMAL(38,0): Spark's decimal
        # division widens the scale, and the quotients here are integral
        # by construction (numerators pre-reduced by their % residue)
        bp = acc % P
        lv = ((acc - bp) / P).cast(dec)
        bv = (bp - B).cast(dec)
        s = ((F.lit(1_000_000) * v).cast(dec) + 3 * (lv + bv)).cast(dec)
        ln = ((s - s % 4) / 4).cast(dec)
        bn_num = (ln - lv + 3 * bv).cast(dec)
        bn = ((bn_num - bn_num % 4) / 4).cast(dec)
        return (ln * P + (bn + B)).cast(dec)

    folded = arr.select(
        F.arrays_zip(
            "months",
            "xs",
            F.transform(
                F.sequence(F.lit(1), F.size("xs")),
                lambda i: F.aggregate(
                    F.slice("xs", F.lit(2), i - 1),
                    (
                        (F.lit(1_000_000) * F.element_at("xs", 1)).cast(
                            dec
                        )
                        * P
                        + B
                    ).cast(dec),
                    _step,
                ),
            ).alias("st"),
        ).alias("z")
    ).select(F.explode("z").alias("r"))
    code = F.col("r.st")
    bp = code % P
    level = ((code - bp) / P).cast("long")
    trend = (bp - B).cast("long")
    return folded.select(
        F.col("r.months").alias("month"),
        F.col("r.xs").alias("n_orders"),
        level.alias("level_micro"),
        trend.alias("trend_micro"),
        (level + trend).cast("long").alias("forecast_next_micro"),
    ).orderBy("month")


# ---------------------------------------------------------------- wave 15
# Resource-allocation link prediction (Zhou, Lü & Zhang, Eur. Phys. J.
# B 2009): RA = Σ_w 1/deg(w) over common neighbors — the fully
# RATIONAL sibling of Adamic-Adar (1/ln needs a float; 1/deg does
# not), so this row is exact-integer end to end and closes the
# link-prediction ladder: common neighbors → Jaccard (normalized) →
# AA (log-damped) → RA (degree-damped). Same single-sourced graph.


def _build_ra_lp_oracle() -> str:
    from .llm_ops14 import _AA_GRAPH_CTES

    return f"""
    WITH {_AA_GRAPH_CTES},
    cand AS (
      SELECT wg.u, wg.v, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(1000000 // dw.d) AS BIGINT) AS ra
      FROM wedges wg JOIN deg dw ON dw.u = wg.w
      WHERE NOT EXISTS (SELECT 1 FROM pairs p
                        WHERE p.pa = wg.u AND p.pb = wg.v)
      GROUP BY wg.u, wg.v
    )
    SELECT u, v, c AS n_common, ra AS ra_micro
    FROM cand
    ORDER BY ra_micro DESC, u, v
    LIMIT 20
    """


@query(
    "graph_resource_allocation_linkpred",
    oracle=_build_ra_lp_oracle(),
    tags=("llm", "graph"),
)
def graph_resource_allocation_linkpred(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-20 non-edges by resource-allocation index (micro; per-wedge
    1/deg micro-truncated then summed — order-free exact integers).
    Identical wedge join shape to the registered AA row; the hub-cap
    posture measured there applies verbatim here."""
    from .llm_ops12 import _idiv_col
    from .llm_ops14 import _aa_graph

    pairs, _e, deg, wedges = _aa_graph(spark, sf_dir)
    dw = deg.select(F.col("u").alias("w"), "d")
    cand = (
        wedges.join(
            pairs,
            (wedges.u == pairs.pa) & (wedges.v == pairs.pb),
            "left_anti",
        )
        .join(dw, "w")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum(_idiv_col(F.lit(1_000_000), F.col("d")))
            .cast("long")
            .alias("ra"),
        )
    )
    return (
        cand.select(
            "u", "v", F.col("c").alias("n_common"), F.col("ra").alias("ra_micro")
        )
        .orderBy(F.desc("ra_micro"), "u", "v")
        .limit(20)
    )


# ---------------------------------------------------------------- wave 16
# Markov-chain entropy rate (Shannon 1948 §7; Cover & Thomas ch.4:
# H(X) = −Σ_i π_i Σ_j p_ij ln p_ij for a stationary chain): how
# predictable the event stream is per step, in nano-nats, with the
# efficiency ratio against ln(k) (the i.i.d.-uniform ceiling). BOTH
# inputs are the registered rows verbatim — π from the 16-iteration
# stationary oracle, p from the transition-matrix oracle — so this row
# cannot drift from the chain it summarizes. Each of the ≤ k² cells
# contributes one float ln micro-product rounded to an integer BEFORE
# the order-free sum (the NB-score determinism recipe).


def _build_entropy_rate_oracle() -> str:
    from .registry import QUERIES

    pi = QUERIES["events_markov_stationary"].oracle.strip()
    tm = QUERIES["events_transition_matrix"].oracle.strip()
    return f"""
    WITH pi AS (
      SELECT state, stationary_micro FROM ({pi})
    ),
    tm AS (SELECT * FROM ({tm})),
    rowt AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS rt FROM tm
      GROUP BY prev_type
    ),
    cells AS (
      SELECT t.prev_type, CAST(1000000 * t.n // r.rt AS BIGINT) AS p
      FROM tm t JOIN rowt r ON r.prev_type = t.prev_type
    ),
    terms AS (
      SELECT CAST(FLOOR(1e9 * (CAST(pi.stationary_micro AS DOUBLE) / 1e6)
                        * (CAST(c.p AS DOUBLE) / 1e6)
                        * (-ln(CAST(c.p AS DOUBLE) / 1e6)) + 0.5)
                  AS BIGINT) AS t_nano
      FROM cells c JOIN pi ON pi.state = c.prev_type
      WHERE c.p > 0
    ),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM pi)
    SELECT k.k AS n_states,
           CAST(SUM(t.t_nano) AS BIGINT) AS entropy_rate_nano,
           CAST(FLOOR(1e9 * ln(CAST(k.k AS DOUBLE)) + 0.5) AS BIGINT)
             AS max_entropy_nano,
           CAST(1000 * SUM(t.t_nano)
                // CAST(FLOOR(1e9 * ln(CAST(k.k AS DOUBLE)) + 0.5)
                        AS BIGINT) AS BIGINT) AS efficiency_milli
    FROM terms t CROSS JOIN k
    GROUP BY k.k
    """


@query(
    "events_markov_entropy_rate",
    oracle=_build_entropy_rate_oracle(),
    tags=("llm", "events", "sequence", "stats"),
)
def events_markov_entropy_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Entropy rate (nano-nats/step) of the registered event Markov
    chain, its ln(k) ceiling, and the efficiency permille. k²-bounded
    cell relation; one ln per cell rounded before the exact sum."""
    from .llm_ops7 import events_transition_matrix
    from .llm_ops12 import _idiv_col
    from .llm_ops15 import events_markov_stationary

    # r12: materialize the k-row stationary vector ONCE — it is
    # referenced twice below (the terms join and the k count), and each
    # reference embeds the full 16-iteration unrolled chain whose
    # PLANNING cost dominates its wall time (the llm_ops15 checkpoint
    # rationale; guide §7.3 "very large plans")
    pi = events_markov_stationary(spark, sf_dir).select(
        "state", "stationary_micro"
    ).localCheckpoint(eager=True)
    tm = events_transition_matrix(spark, sf_dir)
    rowt = tm.groupBy("prev_type").agg(F.sum("n").cast("long").alias("rt"))
    cells = tm.join(rowt, "prev_type").select(
        "prev_type",
        _idiv_col(F.col("n"), F.col("rt"), scale=1_000_000).alias("p"),
    )
    terms = (
        cells.filter(F.col("p") > 0)
        .join(pi, cells.prev_type == pi.state)
        .select(
            F.floor(
                F.lit(1e9)
                * (F.col("stationary_micro").cast("double") / F.lit(1e6))
                * (F.col("p").cast("double") / F.lit(1e6))
                * (-F.log(F.col("p").cast("double") / F.lit(1e6)))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t_nano")
        )
    )
    k = pi.agg(F.count(F.lit(1)).cast("long").alias("k"))
    hmax = F.floor(
        F.lit(1e9) * F.log(F.col("k").cast("double")) + F.lit(0.5)
    ).cast("long")
    return (
        terms.agg(F.sum("t_nano").cast("long").alias("h"))
        .crossJoin(F.broadcast(k))
        .select(
            F.col("k").alias("n_states"),
            F.col("h").alias("entropy_rate_nano"),
            hmax.alias("max_entropy_nano"),
            _idiv_col(F.col("h"), hmax, scale=1000).alias(
                "efficiency_milli"
            ),
        )
    )


# ---------------------------------------------------------------- wave 17
# Welch's unequal-variance t (Welch, Biometrika 1947; the recommended
# default over Student's t — Ruxton 2006) for weekend vs weekday daily
# event volume: the parametric sibling of the Mann-Whitney wave, same
# two groups, so location evidence can be read under both lenses. The
# six sufficient statistics (n, Σx, Σx²) per group are exact integers;
# t and the Welch-Satterthwaite df are ONE fixed-order float expression
# over them, milli-rounded half-up.


@query(
    "events_welch_ttest_weekend",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT (dayofweek(day) + 1) IN (1, 7) AS weekend, x FROM daily
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN weekend THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN weekend THEN x ELSE 0 END) AS BIGINT)
               AS s1,
             CAST(SUM(CASE WHEN weekend THEN x * x ELSE 0 END) AS BIGINT)
               AS q1,
             CAST(SUM(CASE WHEN weekend THEN 0 ELSE 1 END) AS BIGINT)
               AS n2,
             CAST(SUM(CASE WHEN weekend THEN 0 ELSE x END) AS BIGINT)
               AS s2,
             CAST(SUM(CASE WHEN weekend THEN 0 ELSE x * x END) AS BIGINT)
               AS q2
      FROM g
    )
    SELECT n1 AS n_weekend, n2 AS n_weekday,
           CAST(FLOOR(1000.0 * (CAST(s1 AS DOUBLE) / n1
                                - CAST(s2 AS DOUBLE) / n2) + 0.5)
                AS BIGINT) AS mean_diff_milli,
           CAST(FLOOR(1000.0
                * ((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                   / sqrt((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1
                           / n1) / (n1 - 1) / n1
                          + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2
                             / n2) / (n2 - 1) / n2)) + 0.5) AS BIGINT)
             AS t_milli,
           CAST(FLOOR(1000.0
                * (((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                    / (n1 - 1) / n1
                    + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)
                      / (n2 - 1) / n2)
                   * ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                      / (n1 - 1) / n1
                      + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2
                         / n2) / (n2 - 1) / n2)
                   / (((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1
                        / n1) / (n1 - 1) / n1)
                      * ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1
                          / n1) / (n1 - 1) / n1) / (n1 - 1)
                      + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2
                          / n2) / (n2 - 1) / n2)
                        * ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2
                            / n2) / (n2 - 1) / n2) / (n2 - 1))) + 0.5)
                AS BIGINT) AS welch_df_milli
    FROM agg
    """,
    tags=("llm", "events", "stats"),
)
def events_welch_ttest_weekend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Welch t (milli) and Welch-Satterthwaite df (milli) for weekend vs
    weekday daily event counts. One day-keyed aggregate then one 6-int
    reduction; the float finish is a single fixed-order expression."""
    daily = (
        load_tables(spark, sf_dir, "events")
        .events.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    g = daily.select(
        F.dayofweek("day").isin(1, 7).alias("weekend"), "x"
    )
    agg = g.agg(
        F.sum(F.when(F.col("weekend"), 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("weekend"), F.col("x")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(
            F.when(F.col("weekend"), F.col("x") * F.col("x")).otherwise(0)
        )
        .cast("long")
        .alias("q1"),
        F.sum(F.when(F.col("weekend"), 0).otherwise(1))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("weekend"), F.lit(0)).otherwise(F.col("x")))
        .cast("long")
        .alias("s2"),
        F.sum(
            F.when(F.col("weekend"), F.lit(0)).otherwise(
                F.col("x") * F.col("x")
            )
        )
        .cast("long")
        .alias("q2"),
    )
    n1, s1, q1 = (F.col(c) for c in ("n1", "s1", "q1"))
    n2, s2, q2 = (F.col(c) for c in ("n2", "s2", "q2"))
    se1 = (
        (q1.cast("double") - s1.cast("double") * s1 / n1)
        / (n1 - 1)
        / n1
    )
    se2 = (
        (q2.cast("double") - s2.cast("double") * s2 / n2)
        / (n2 - 1)
        / n2
    )
    md = s1.cast("double") / n1 - s2.cast("double") / n2
    t = md / F.sqrt(se1 + se2)
    df = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)
    )

    def _milli(c, alias):
        return (
            F.floor(F.lit(1000.0) * c + F.lit(0.5)).cast("long").alias(alias)
        )

    return agg.select(
        n1.alias("n_weekend"),
        n2.alias("n_weekday"),
        _milli(md, "mean_diff_milli"),
        _milli(t, "t_milli"),
        _milli(df, "welch_df_milli"),
    )


# ---------------------------------------------------------------- wave 18
# Two-sample Kolmogorov-Smirnov separation of the NB gate's score
# distributions (Kolmogorov 1933; Smirnov 1939): D = sup |F_pass −
# F_fail| over the margin axis, EXACT by cross-multiplication — at
# each distinct margin the CDF gap |cp·nn − cn·np| is an integer, so
# the supremum needs no floats at all. The distributional view of the
# same single-sourced relation the AUC wave integrates: AUC measures
# average separation, KS the worst-case gap (and the margin where it
# occurs — the natural threshold, cross-checked against Youden).


def _build_ks_gate_oracle() -> str:
    from .llm_ops11 import _nb_chain_sql

    return f"""
    WITH {_nb_chain_sql()},
    vals AS (
      SELECT score_pass - score_fail AS m,
             CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT)
               AS cp0,
             CAST(SUM(CASE WHEN truth THEN 0 ELSE 1 END) AS BIGINT)
               AS cn0
      FROM scored GROUP BY 1
    ),
    cum AS (
      SELECT m,
             CAST(SUM(cp0) OVER (ORDER BY m) AS BIGINT) AS cp,
             CAST(SUM(cn0) OVER (ORDER BY m) AS BIGINT) AS cn
      FROM vals
    ),
    tot AS (
      SELECT MAX(cp) AS np, MAX(cn) AS nn FROM cum
    ),
    gaps AS (
      SELECT c.m, ABS(c.cp * t.nn - c.cn * t.np) AS gap2, t.np, t.nn
      FROM cum c CROSS JOIN tot t
    )
    SELECT np AS n_pos, nn AS n_neg,
           CAST(MAX(gap2) AS BIGINT) AS gap_num,
           CAST(1000 * MAX(gap2) // (np * nn) AS BIGINT) AS ks_d_milli,
           CAST(MIN(CASE WHEN gap2 = (SELECT MAX(gap2) FROM gaps)
                    THEN m END) AS BIGINT) AS argmax_margin
    FROM gaps GROUP BY np, nn
    """


@query(
    "quality_ks_gate_separation",
    oracle=_build_ks_gate_oracle(),
    tags=("llm", "quality", "eval"),
)
def quality_ks_gate_separation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KS D (milli, exact cross-multiplied integers) between the NB
    margin distributions of truth-pass and truth-fail docs, with the
    smallest argmax margin. One margin-keyed aggregate + one cumulative
    window over distinct margins."""
    from pyspark.sql.window import Window

    from .llm_ops11 import _nb_scored
    from .llm_ops12 import _idiv_col

    scored = _nb_scored(spark, sf_dir).select(
        (F.col("score_pass") - F.col("score_fail")).alias("m"), "truth"
    )
    vals = scored.groupBy("m").agg(
        F.sum(F.when(F.col("truth"), 1).otherwise(0))
        .cast("long")
        .alias("cp0"),
        F.sum(F.when(F.col("truth"), 0).otherwise(1))
        .cast("long")
        .alias("cn0"),
    )
    # r12: one pass over the margin dimension (guide §1.2 / the wave-10
    # order-sensitivity fusion). Previously the gap relation was
    # self-joined against its own max (best) and cross-joined with a
    # separate totals aggregate, so the NB scoring chain upstream was
    # embedded (and its post-exchange compute re-run) up to 6×. The
    # totals now ride the SAME single-partition margin sort as the
    # cumulative sums (an unbounded frame adds no exchange), and the
    # argmax-with-min-margin-tie-break is min(struct(-gap2, m)) — exactly
    # the old max-gap2-then-min-m because struct order is lexicographic.
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("m").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vals.select(
        "m",
        F.sum("cp0").over(w).cast("long").alias("cp"),
        F.sum("cn0").over(w).cast("long").alias("cn"),
        F.sum("cp0").over(wall).cast("long").alias("np"),
        F.sum("cn0").over(wall).cast("long").alias("nn"),
    )
    gaps = cum.select(
        "m",
        "np",
        "nn",
        F.abs(F.col("cp") * F.col("nn") - F.col("cn") * F.col("np")).alias(
            "gap2"
        ),
    )
    res = gaps.agg(
        F.max("np").cast("long").alias("np"),
        F.max("nn").cast("long").alias("nn"),
        F.max("gap2").cast("long").alias("gap_num"),
        F.min(
            F.struct(
                (-F.col("gap2")).alias("ng"), F.col("m").alias("m")
            )
        ).alias("b"),
    )
    return res.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        "gap_num",
        _idiv_col(
            F.col("gap_num"), F.col("np") * F.col("nn"), scale=1000
        ).alias("ks_d_milli"),
        F.col("b.m").cast("long").alias("argmax_margin"),
    )
