"""Relational pack 4: reshaping and generator operators — unpivot/melt,
per-row sequence generation + explode, explicit NULL ordering, and sketch
aggregates (HLL / t-digest — the approximate scale path whose exact
counterparts are oracle-checked in packs 1-3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_tables
from .registry import query


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part WHERE p_partkey < 200
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value
    FROM part WHERE p_partkey < 200
    """,
    tags=("relational", "unpivot"),
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt). Spark plans a single Expand over one scan —
    unlike the UNION-ALL formulation, the input is read once."""
    t = load_tables(spark, sf_dir, "part")
    return (
        t.part.filter(F.col("p_partkey") < 200)
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("p_size"),
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
        )
        .unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")
    )


@query(
    "generate_sequence_explode",
    oracle="""
    SELECT o_orderkey, UNNEST(generate_series(1, CAST(o_orderkey % 5 + 1 AS INT))) AS step
    FROM orders WHERE o_orderkey < 100
    """,
    tags=("relational", "generator", "explode"),
)
def generate_sequence_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated row generation: per-row sequence(1..n) exploded — the
    generator pattern behind calendar spines and retry/backoff schedules.
    Row multiplication happens executor-side after the scan; no shuffle."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t.orders.filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.explode(
                F.sequence(F.lit(1), (F.col("o_orderkey") % 5 + 1).cast("int"))
            ).alias("step"),
        )
    )


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
    FROM customer
    ORDER BY seg NULLS FIRST, c_custkey
    LIMIT 50
    """,
    tags=("relational", "sort", "nulls"),
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST ordering (engines disagree on the default; the
    query pins it) with a total tie-break."""
    t = load_tables(spark, sf_dir, "customer")
    return (
        t.customer.select(
            "c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
        )
        .orderBy(F.col("seg").asc_nulls_first(), F.col("c_custkey").asc())
        .limit(50)
    )


@query("agg_approx_sketches", oracle=None, tags=("relational", "agg", "sketch", "approx"))
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — HyperLogLog++ distinct counts and t-digest
    percentiles per group. These are THE 100 TB substitutes for the exact
    formulations checked elsewhere (agg_multi_distinct, agg_percentile_cont):
    fixed-size state, map-side combinable, single shuffle of sketch bytes.
    Sketch internals differ across engines → rows-only driver check; error
    bounds vs the exact answers are pinned in tests/test_llm_ops.py."""
    t = load_tables(spark, sf_dir, "orders")
    return t.orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
        F.percentile_approx("o_totalprice", 0.5, 10_000).cast("double").alias("approx_median"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "window_hypertable_rollup",
    oracle="""
    WITH e AS (
      SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
             CAST(value AS DECIMAL(14,2)) AS v
      FROM events
    )
    SELECT h, d,
           CAST(GROUPING(h) AS INT) AS g_h, CAST(GROUPING(d) AS INT) AS g_d,
           COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS sum_v
    FROM e GROUP BY GROUPING SETS ((h, d), (d), ())
    """,
    tags=("streaming", "window", "rollup"),
)
def window_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy: hour->day->total
    rollups of the event stream in ONE pass (grouping sets over date_trunc
    buckets). Scale: a single Expand + one shuffle materializes every
    granularity — the batch analog of cascading streaming window aggs."""
    t = load_tables(spark, sf_dir, "events")
    t.events.createOrReplaceTempView("events_htr")
    return spark.sql("""
        WITH e AS (
          SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
                 CAST(value AS DECIMAL(14,2)) AS v
          FROM events_htr
        )
        SELECT h, d,
               CAST(GROUPING(h) AS INT) AS g_h, CAST(GROUPING(d) AS INT) AS g_d,
               COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS sum_v
        FROM e GROUP BY GROUPING SETS ((h, d), (d), ())
    """)


@query(
    "set_except_all_multiset",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
    tags=("relational", "setop"),
)
def set_except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (duplicates preserved by count),
    unlike the distinct EXCEPT in pack 1."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).exceptAll(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "set_intersect_all_multiset",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
    tags=("relational", "setop"),
)
def set_intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (min of per-side counts)."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).intersectAll(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )
