"""Relational query pack — the batch surface of the engine.

The reference has no relational layer (SURVEY §2.3): everything here is what a
sea-streamer user gains by moving to Spark, expressed DataFrame-first so
Catalyst gets pushdown/pruning/join-selection for free. TPC-H-shaped queries
are adapted to the driver's star schema (TESTDATA.md / FIXTURES.md §2).

Scale posture: small dims (region/nation/customer/supplier/part) are
explicitly ``broadcast()`` where they join the ``lineitem``/``orders`` facts —
at 100 TB the fact side never shuffles for those joins; fact-fact joins
(orders⋈lineitem) shuffle on the join key, which AQE re-splits on skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_tables
from .registry import query

# Exact-decimal casts (see registry docstring). Data domains: prices < 1e8
# with 2 decimals, discount/tax in [0,1) with 2 decimals, quantity integral.
QTY = "CAST(l_quantity AS DECIMAL(12,2))"
PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
DISC = "CAST(l_discount AS DECIMAL(3,2))"
TAX = "CAST(l_tax AS DECIMAL(3,2))"
ONE = "CAST(1 AS DECIMAL(3,2))"
DISC_PRICE = f"{PRICE} * ({ONE} - {DISC})"
CHARGE = f"{DISC_PRICE} * ({ONE} + {TAX})"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({QTY}) AS DOUBLE) AS sum_qty,
           CAST(SUM({PRICE}) AS DOUBLE) AS sum_base_price,
           CAST(SUM({DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({CHARGE}) AS DOUBLE) AS sum_charge,
           CAST(SUM({QTY}) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM({PRICE}) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM({DISC}) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "agg", "bench"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan-filter-aggregate over the fact.

    Plan shape to verify with .explain: parquet scan with PushedFilters on
    l_shipdate + partial hash agg (map-side combine) + final agg — one shuffle
    of pre-aggregated rows only (|groups| = 6), safe at any scale.
    """
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t.lineitem.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr(QTY)).cast("double").alias("sum_qty"),
            F.sum(F.expr(PRICE)).cast("double").alias("sum_base_price"),
            F.sum(F.expr(DISC_PRICE)).cast("double").alias("sum_disc_price"),
            F.sum(F.expr(CHARGE)).cast("double").alias("sum_charge"),
            (F.sum(F.expr(QTY)).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(F.expr(PRICE)).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(F.expr(DISC)).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("relational", "join", "topk", "bench"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: dim-filtered fact join + grouped top-k.

    customer is broadcast (dim ≪ fact); orders⋈lineitem shuffles on orderkey.
    Top-k goes through TakeOrderedAndProject — no global sort materialized.
    """
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ord_ = t.orders.filter(F.col("o_orderdate") < cutoff)
    li = t.lineitem.filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(ord_, li.l_orderkey == ord_.o_orderkey)
        .join(F.broadcast(cust), ord_.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.expr(DISC_PRICE)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("relational", "join", "bench"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style six-way join; all dims broadcast, facts shuffle once."""
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    nr = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            t.nation.n_regionkey == t.region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    supp = t.supplier.join(F.broadcast(nr), F.col("s_nationkey") == nr.n_nationkey).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    ord_ = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    return (
        t.lineitem.join(ord_, F.col("l_orderkey") == ord_.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(
            F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(F.expr(DISC_PRICE)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM({PRICE} * {DISC}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "scan", "pushdown", "bench"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style pure scan-filter-agg: every predicate reaches the
    parquet scan (PushedFilters), projection prunes to 3 columns."""
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        ).agg(
            F.sum(F.expr(f"{PRICE} * {DISC}")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS c_acctbal,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "join", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item report; broadcast customer+nation."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    ord_ = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = t.lineitem.filter(F.col("l_returnflag") == "R")
    cust = t.customer.join(
        F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        li.join(ord_, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(F.expr(DISC_PRICE)).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE)").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q18_large_orders",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
           CAST(SUM({QTY}) AS DOUBLE) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM({QTY}) > 150
          )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("relational", "join", "semijoin", "topk", "bench"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: aggregate-driven semi-join (large orders).

    The per-orderkey quantity sum that drives the HAVING filter IS the
    queried sum, so it is computed once and joined through — one lineitem
    scan and one shuffle instead of the literal scan-twice formulation the
    SQL implies (the final re-aggregation the oracle writes is a no-op over
    the already-unique orderkey group)."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.expr(QTY)).alias("sq"))
        .filter(F.col("sq") > 150)
    )
    return (
        big.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t.customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .withColumn("sum_qty", F.col("sq").cast("double"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "join_broadcast_part_brand",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n_items,
           CAST(SUM({PRICE}) AS DOUBLE) AS brand_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey AND p_type = 'PROMO'
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("relational", "join", "broadcast"),
)
def join_broadcast_part_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join of the part dim into the fact — the plan
    must contain BroadcastHashJoin (no fact shuffle)."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    part = t.part.filter(F.col("p_type") == "PROMO").select("p_partkey", "p_brand")
    return (
        t.lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.expr(PRICE)).cast("double").alias("brand_revenue"),
        )
        .orderBy("p_brand")
    )


@query(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("relational", "join", "outer"),
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count = 0)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("n_orders"))
    )


@query(
    "join_semi_customers_with_f_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    tags=("relational", "join", "semijoin"),
)
def join_semi_customers_with_f_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): no row multiplication, no payload columns
    shuffled from the probe side."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    f_orders = t.orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return t.customer.join(
        f_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_totalprice > 300000)
    """,
    tags=("relational", "join", "antijoin"),
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no big-ticket orders —
    the filtered probe keeps the result non-trivial at every SF."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    return t.customer.join(
        t.orders.filter(F.col("o_totalprice") > 300000).select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name")


@query(
    "agg_distinct_suppliers_per_flag",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("relational", "agg", "distinct"),
)
def agg_distinct_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct (expands to expand+two-phase agg in Spark)."""
    t = load_tables(spark, sf_dir, "lineitem")
    return t.lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@query(
    "agg_rollup_flag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) + 2*GROUPING(l_linestatus) AS BIGINT) AS grp,
           CAST(SUM({QTY}) AS DOUBLE) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("relational", "agg", "rollup"),
)
def agg_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers (subtotals + grand total)."""
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus").agg(
            (F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus"))
            .cast("long")
            .alias("grp"),
            F.sum(F.expr(QTY)).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    ).select("l_returnflag", "l_linestatus", "grp", "sum_qty", "n")


@query(
    "agg_cube_priority_status",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
    """,
    tags=("relational", "agg", "cube"),
)
def agg_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    t = load_tables(spark, sf_dir, "orders")
    return t.orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "window_rank_orders_per_customer",
    oracle="""
    SELECT c_custkey, o_orderkey, price_rank FROM (
      SELECT o_custkey AS c_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
      FROM orders) t
    WHERE price_rank <= 3
    """,
    tags=("relational", "window", "topk"),
)
def window_rank_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number window — partitioned by customer, so it
    scales horizontally (no global sort)."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t.orders.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.row_number().over(w).alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
    )


@query(
    "window_running_sum_user_value",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(14,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value
    FROM events
    """,
    tags=("relational", "window", "events"),
)
def window_running_sum_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per user in event-time order."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.events.select(
        "event_id",
        "user_id",
        F.sum(F.expr("CAST(value AS DECIMAL(14,2))")).over(w).cast("double").alias("running_value"),
    )


@query(
    "window_lag_value_delta",
    oracle="""
    SELECT event_id, user_id,
           CAST(CAST(value AS DECIMAL(14,2)) -
                LAG(CAST(value AS DECIMAL(14,2)), 1)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS DOUBLE) AS delta
    FROM events
    """,
    tags=("relational", "window", "events"),
)
def window_lag_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG-based per-user delta (NULL for each user's first event)."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dec = F.expr("CAST(value AS DECIMAL(14,2))")
    return t.events.select(
        "event_id",
        "user_id",
        (dec - F.lag(dec, 1).over(w)).cast("double").alias("delta"),
    )


@query(
    "sort_limit_top_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
           o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
    tags=("relational", "sort", "topk"),
)
def sort_limit_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: per-partition heaps + driver merge, not a full sort."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t.orders.select(
            "o_orderkey",
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)").alias("o_totalprice"),
            "o_orderdate",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


@query(
    "set_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("relational", "setop"),
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of customer and supplier nations."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "set_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_nationkey % 3 = 0
    """,
    tags=("relational", "setop"),
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customer nations minus a supplier-nation subset (the filter
    keeps the difference non-empty at every SF)."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        t.supplier.filter(F.col("s_nationkey") % 3 == 0).select(
            F.col("s_nationkey").alias("nationkey")
        )
    )


@query(
    "set_union_distinct_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("relational", "setop"),
)
def set_union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of nation keys from two tables."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        t.customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(t.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "scalar_string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_name, 1, 4) AS name_prefix,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_name, ' ', '_') AS name_snake,
           REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word
    FROM part
    WHERE p_name LIKE '%wid%'
    """,
    tags=("relational", "scalar", "string"),
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar coverage: upper/length/substring/concat/replace/regexp."""
    t = load_tables(spark, sf_dir, "part")
    return t.part.filter(F.col("p_name").like("%wid%")).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
    )


@query(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
           DATE_TRUNC('month', o_orderdate) AS order_month_start
    FROM orders WHERE o_orderkey < 500
    """,
    tags=("relational", "scalar", "date"),
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part scalar coverage (year/month/day/quarter/trunc)."""
    t = load_tables(spark, sf_dir, "orders")
    return t.orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
    )


@query(
    "scalar_math_functions",
    oracle="""
    SELECT s_suppkey,
           CAST(ABS(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS abs_bal,
           CAST(CEIL(s_acctbal) AS BIGINT) AS ceil_bal,
           CAST(FLOOR(s_acctbal) AS BIGINT) AS floor_bal,
           ROUND(SQRT(ABS(s_acctbal)), 6) AS sqrt_bal,
           ROUND(LN(ABS(s_acctbal) + 1), 6) AS ln_bal,
           CAST(POWER(s_suppkey, 2) AS BIGINT) AS key_squared,
           MOD(s_suppkey, 7) AS key_mod
    FROM supplier
    """,
    tags=("relational", "scalar", "math"),
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar coverage (abs/ceil/floor/sqrt/ln/power/mod)."""
    t = load_tables(spark, sf_dir, "supplier")
    return t.supplier.select(
        "s_suppkey",
        F.expr("CAST(ABS(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE)").alias("abs_bal"),
        F.ceil("s_acctbal").alias("ceil_bal"),
        F.floor("s_acctbal").alias("floor_bal"),
        F.round(F.sqrt(F.abs(F.col("s_acctbal"))), 6).alias("sqrt_bal"),
        F.round(F.log(F.abs(F.col("s_acctbal")) + 1), 6).alias("ln_bal"),
        F.pow(F.col("s_suppkey"), 2).cast("bigint").alias("key_squared"),
        (F.col("s_suppkey") % 7).alias("key_mod"),
    )


@query(
    "case_when_price_bands",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS price_band,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS band_total
    FROM orders GROUP BY 1
    """,
    tags=("relational", "scalar", "agg"),
)
def case_when_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    t = load_tables(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return (
        t.orders.groupBy(band.alias("price_band"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(12,2))")).cast("double").alias("band_total"),
        )
    )


@query(
    "json_extract_event_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
    tags=("relational", "json", "events"),
)
def json_extract_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload decode (P6: payload deserialization — the Spark analog of
    ``Message::deserialize_json``, types/src/message.rs:323-328)."""
    t = load_tables(spark, sf_dir, "events")
    return (
        t.events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )
