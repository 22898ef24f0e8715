"""Round-6 operator waves.

Wave 1 — exact-substring dedup at suffix-array grain (r5 judge task #7):

- ``dedup_exact_substring_spans`` — every MAXIMAL duplicated token span of
  length >= L with provably exact boundaries (start, length, weakest
  corpus-wide occurrence count, md5 of the span text) — the artifact a
  100 TB dedup pass persists and audits.
- ``dedup_span_removal_exact`` — the cut at those exact boundaries; short
  incidental 3-gram echoes survive, long boilerplate is removed edge-true.

Wave 2 — engagement curves, fulfillment bands, value segmentation, graph
cores, weighted sampling:

- ``events_dau_mau_stickiness`` / ``events_cumulative_new_users`` — the
  engagement-health ratio and the acquisition curve (bounded ×28 explode
  for sliding distinct; days-sized running sum).
- ``orders_ship_latency_histogram`` — order-to-ship SLA bands off one
  natural-key join.
- ``customer_spend_quartiles`` — NTILE(4) CLV segmentation, deterministic
  tie-break, window over the customer dimension only.
- ``graph_kcore_peel`` — fixed-round k-core peel over the near-dup graph
  (unrolled MATERIALIZED-CTE oracle; without MATERIALIZED the chain
  re-inlines the all-pairs Jaccard join 3^rounds times and OOMs DuckDB).
- ``curation_quality_weighted_sample`` — per-band deterministic keep via
  the portable md5 bucket (hash_split convention).

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


# ---------------------------------------------------------------------------
# Round-6 wave 2: engagement curves, order-latency bands, value quartiles,
# k-core peel, weighted sampling
# ---------------------------------------------------------------------------


@query(
    "events_dau_mau_stickiness",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), dau AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM days GROUP BY d
    ), contrib AS (
      SELECT DISTINCT d + CAST(offs AS INTEGER) AS window_end, user_id
      FROM days, (SELECT unnest(generate_series(0, 27)) AS offs)
    ), mau AS (
      SELECT window_end AS d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
      FROM contrib GROUP BY 1
    )
    SELECT CAST(dau.d AS TIMESTAMP) AS day, dau.dau, mau.mau,
           CAST(FLOOR(1000.0 * dau.dau / mau.mau) AS BIGINT)
             AS stickiness_permille
    FROM dau JOIN mau ON mau.d = dau.d
    ORDER BY day
    """,
    tags=("llm", "events", "window"),
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — the engagement-health ratio product
    analytics reports next to the active-user curves. MAU uses a trailing
    28-day frame; COUNT(DISTINCT) over a sliding window cannot merge
    partial states, so each (day, user) pair is exploded to the ≤ 28
    window-ends it supports (bounded 28× the daily-distinct relation,
    the events_rolling_7d_actives pattern) and one day-keyed distinct
    count finishes MAU. Days are restricted to observed DAU days (an
    inner join), so no trailing padding appears. Integer permille.

    Plan: map-side (day,user) dedup → one day-keyed count (DAU) + ×28
    projection explode → (day,user)-keyed distinct + count (MAU) → join
    on the ≤ |days| relation. Linear in events; no event self-join."""
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, "events")
    days = t.events.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    dau = days.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    mau = (
        days.select(
            F.explode(F.sequence(F.lit(0), F.lit(27))).alias("offs"), "d", "user_id"
        )
        .select(F.date_add(F.col("d"), F.col("offs")).alias("d"), "user_id")
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("long").alias("mau"))
    )
    return (
        dau.join(mau, "d")
        .select(
            F.col("d").cast("timestamp").alias("day"),
            "dau",
            "mau",
            F.floor(F.lit(1000.0) * F.col("dau") / F.col("mau"))
            .cast("long")
            .alias("stickiness_permille"),
        )
        .orderBy("day")
    )


@query(
    "events_cumulative_new_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events
      GROUP BY user_id
    ), news AS (
      SELECT first_day AS d, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY 1
    )
    SELECT CAST(d AS TIMESTAMP) AS day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY d) AS BIGINT) AS cum_users
    FROM news ORDER BY day
    """,
    tags=("llm", "events", "window"),
)
def events_cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-user acquisition curve: first-seen day per user, daily new-user
    counts, and the cumulative registration curve. The total-order running
    sum runs over the ≤ |distinct days| relation (a few thousand rows at
    ANY corpus size — the events_day_over_day_growth bound), never over
    users or events; the user-keyed min is an ordinary partial-aggregable
    groupBy. Linear in events."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir, "events")
    firsts = t.events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d")
    )
    news = firsts.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return news.select(
        F.col("d").cast("timestamp").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    ).orderBy("day")


@query(
    "orders_ship_latency_histogram",
    oracle="""
    WITH lat AS (
      SELECT date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), banded AS (
      SELECT CASE WHEN days <= 7 THEN '0-7'
                  WHEN days <= 30 THEN '08-30'
                  WHEN days <= 90 THEN '31-90'
                  ELSE '91+' END AS band,
             days
      FROM lat
    ), g AS (
      SELECT band, CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(MIN(days) AS BIGINT) AS min_days,
             CAST(MAX(days) AS BIGINT) AS max_days
      FROM banded GROUP BY band
    )
    SELECT band, n_items, min_days, max_days,
           CAST(FLOOR(1000.0 * n_items / SUM(n_items) OVER ()) AS BIGINT)
             AS share_permille
    FROM g ORDER BY band
    """,
    tags=("relational", "window"),
)
def orders_ship_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution in operational bands — the
    fulfillment-SLA histogram. One orderkey-keyed shuffle join (lineitem ×
    orders, both sides pruned to two columns), a pure-projection banding,
    a 4-row aggregate, and the share window over those 4 rows. The only
    data-sized operation is the join, keyed on the natural key."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir, "lineitem", "orders")
    lat = t.lineitem.select("l_orderkey", "l_shipdate").join(
        t.orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("days")
    )
    banded = lat.select(
        F.when(F.col("days") <= 7, "0-7")
        .when(F.col("days") <= 30, "08-30")
        .when(F.col("days") <= 90, "31-90")
        .otherwise("91+")
        .alias("band"),
        "days",
    )
    g = banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.min("days").cast("long").alias("min_days"),
        F.max("days").cast("long").alias("max_days"),
    )
    return g.select(
        "band",
        "n_items",
        "min_days",
        "max_days",
        F.floor(
            F.lit(1000.0) * F.col("n_items") / F.sum("n_items").over(W.partitionBy())
        )
        .cast("long")
        .alias("share_permille"),
    ).orderBy("band")


@query(
    "customer_spend_quartiles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS spend_cents
      FROM orders GROUP BY o_custkey
    ), q AS (
      SELECT o_custkey, spend_cents,
             NTILE(4) OVER (ORDER BY spend_cents DESC, o_custkey) AS quartile
      FROM spend
    )
    SELECT CAST(quartile AS BIGINT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(spend_cents) AS BIGINT) AS total_cents,
           CAST(MIN(spend_cents) AS BIGINT) AS min_cents,
           CAST(MAX(spend_cents) AS BIGINT) AS max_cents
    FROM q GROUP BY quartile ORDER BY quartile
    """,
    tags=("relational", "window"),
)
def customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value quartiles (the CLV segmentation cut): per-customer
    order spend in integer cents, NTILE(4) over (spend DESC, custkey) —
    fully deterministic tie-break — then per-quartile counts and bounds.
    The NTILE window totally orders the CUSTOMER dimension (the same
    dimension-sized bound the Pareto/Gini/rank-normalize family
    documents); order facts never enter the window, only the one
    custkey-keyed partial-aggregable sum."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    spend = t.orders.groupBy("o_custkey").agg(
        F.sum(cents).cast("long").alias("spend_cents")
    )
    q = spend.select(
        "spend_cents",
        F.ntile(4)
        .over(W.orderBy(F.col("spend_cents").desc(), F.col("o_custkey")))
        .alias("quartile"),
    )
    return (
        q.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("spend_cents").cast("long").alias("total_cents"),
            F.min("spend_cents").cast("long").alias("min_cents"),
            F.max("spend_cents").cast("long").alias("max_cents"),
        )
        .select(
            F.col("quartile").cast("long").alias("quartile"),
            "n_customers",
            "total_cents",
            "min_cents",
            "max_cents",
        )
        .orderBy("quartile")
    )


# ------------------------------------------------------- k-core graph peel

_KCORE_K = 2
_KCORE_ROUNDS = 4


def _build_kcore_oracle() -> str:
    from .llm_ops import DUCK_SHINGLE_SETS

    rounds = []
    for r in range(1, _KCORE_ROUNDS + 1):
        rounds.append(f"""
    keep{r} AS MATERIALIZED (
      SELECT u FROM e{r-1} GROUP BY u HAVING COUNT(*) >= {_KCORE_K}
    ), e{r} AS MATERIALIZED (
      SELECT e.u, e.v FROM e{r-1} e
      JOIN keep{r} ku ON ku.u = e.u
      JOIN keep{r} kv ON kv.u = e.v
    )""")
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
    e0 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs
           UNION ALL SELECT doc_b, doc_a FROM pairs),
    {",".join(rounds)}
    SELECT u AS doc_id, CAST(COUNT(*) AS BIGINT) AS degree
    FROM e{_KCORE_ROUNDS} GROUP BY u ORDER BY doc_id"""


@query(
    "graph_kcore_peel",
    oracle=_build_kcore_oracle(),
    tags=("llm", "dedup", "graph"),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peel over the near-dup graph (k=2, 4 synchronous peel
    rounds): nodes whose degree drops below k are removed each round,
    edges to removed nodes disappear with them — isolating the densely
    interlinked template/boilerplate families that pairwise thresholds
    can't separate from incidental one-off matches (Batagelj & Zaveršnik
    2003's cores algorithm, unrolled to a fixed round count so the
    DuckDB replay is an exact CTE chain, the pagerank_fixed convention).
    Output = surviving (doc_id, degree-in-peeled-graph).

    Plan: the LSH pair list symmetrized with the single-pass explode,
    checkpointed ONCE (graph-sized); each round is one u-keyed count +
    two semi-joins against the ≤ |nodes| keep set — every shuffle is
    graph-sized, the corpus is never touched after candidate
    generation."""
    from pyspark.sql import functions as F

    from ..operators import dedup as D

    docs = load_tables(spark, sf_dir, "documents").documents
    pairs = D.minhash_lsh_dedup(docs, threshold=0.5).select("doc_a", "doc_b")
    e = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")),
                    F.struct(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")),
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .localCheckpoint(eager=True)
    )
    for _ in range(_KCORE_ROUNDS):
        keep = (
            e.groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select("u")
        )
        e = (
            e.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
    return (
        e.groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .select(F.col("u").alias("doc_id"), "degree")
        .orderBy("doc_id")
    )


def _build_weighted_sample_oracle() -> str:
    from ..operators.curation import duck_split_bucket

    return f"""
    WITH banded AS (
      SELECT doc_id, n_chars,
             CASE WHEN n_chars >= 350 THEN 'long'
                  WHEN n_chars >= 200 THEN 'medium'
                  ELSE 'short' END AS band,
             CASE WHEN n_chars >= 350 THEN 8000
                  WHEN n_chars >= 200 THEN 5000
                  ELSE 2000 END AS keep_thresh,
             {duck_split_bucket('doc_id')} AS bucket
      FROM documents
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN bucket < keep_thresh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN bucket < keep_thresh THEN n_chars ELSE 0 END) AS BIGINT)
             AS chars_kept
    FROM banded
    GROUP BY band ORDER BY band
    """


@query(
    "curation_quality_weighted_sample",
    oracle=_build_weighted_sample_oracle(),
    tags=("llm", "curation"),
)
def curation_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: long documents keep at
    80 %, medium at 50 %, short at 20 % — the keep/drop decision is a
    pure projection (portable md5 bucket vs a per-band threshold, the
    curation_hash_split convention), so the sample is reproducible under
    re-runs, repartitioning, and engine swaps, and composes with the
    leakage-safe split. Reports per-band totals, kept counts, and kept
    chars. Zero shuffle before the 3-row aggregate."""
    from pyspark.sql import functions as F

    from ..operators.curation import split_bucket

    docs = load_tables(spark, sf_dir, "documents").documents
    banded = docs.select(
        "doc_id",
        "n_chars",
        F.when(F.col("n_chars") >= 350, "long")
        .when(F.col("n_chars") >= 200, "medium")
        .otherwise("short")
        .alias("band"),
        F.when(F.col("n_chars") >= 350, 8000)
        .when(F.col("n_chars") >= 200, 5000)
        .otherwise(2000)
        .alias("keep_thresh"),
        split_bucket("doc_id").alias("bucket"),
    )
    kept = (F.col("bucket") < F.col("keep_thresh")).cast("long")
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.sum(F.col("n_chars") * kept).cast("long").alias("chars_kept"),
        )
        .orderBy("band")
    )
