"""Relational pack 5: the last TPC-H subquery shapes expressible on this
schema — Q17 (correlated scalar average), Q20 (nested IN chains), Q21
(EXISTS + NOT EXISTS double correlation). Determinism rules as in packs 1-4;
averages are exact decimal sums divided in double with the identical
expression on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_tables
from .registry import query
from .relational import PRICE, QTY


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(CAST(SUM({PRICE}) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM({QTY}) AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    tags=("relational", "join", "subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: rows below 20% of their part's average quantity —
    correlated scalar subquery → per-part aggregate joined back. Scale: the
    per-part averages shuffle once on partkey and broadcast back against the
    brand-filtered probe."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    per_part = t.lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * (F.sum(F.expr(QTY)).cast("double") / F.count(F.lit(1)))).alias("qty_cap")
    )
    brand = t.part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    return (
        t.lineitem.join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg((F.sum(F.expr(PRICE)).cast("double") / F.lit(7.0)).cast("double").alias("avg_yearly"))
    )


@query(
    "q20_potential_promotion_suppliers",
    oracle=f"""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'r%')
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING CAST(SUM({QTY}) AS DOUBLE) > 285.0)
    ORDER BY s_suppkey
    """,
    tags=("relational", "join", "subquery", "semijoin"),
)
def q20_potential_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style nested IN chain: suppliers who shipped >285 units of
    r-named parts in 1997 — two stacked semi-joins with a HAVING between.
    Scale: part-filter broadcast into lineitem, one suppkey shuffle for the
    HAVING aggregate, then a broadcast semi against supplier."""
    t = load_tables(spark, sf_dir, "supplier", "lineitem", "part")
    p_parts = t.part.filter(F.col("p_name").like("r%")).select("p_partkey")
    qualified = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(p_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.expr(QTY)).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 285.0)
        .select("l_suppkey")
    )
    return (
        t.supplier.join(
            F.broadcast(qualified), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_waiting_multi_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    tags=("relational", "join", "semijoin", "antijoin"),
)
def q21_waiting_multi_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style (adapted: lateness = shipped >60 days after the order
    date, standing in for receipt-vs-commit dates the schema lacks): the sole
    late supplier on multi-supplier finalized orders — EXISTS plus correlated
    NOT EXISTS over the same fact table. Spark shapes them as per-orderkey
    aggregates joined back (one shuffle each) rather than nested-loop
    subqueries."""
    t = load_tables(spark, sf_dir, "supplier", "lineitem", "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    li = (
        t.lineitem.join(
            t.orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    waiting = (
        li.filter(F.col("is_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        waiting.join(
            F.broadcast(t.supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


@query(
    "q11_important_stock",
    oracle=f"""
    SELECT l_partkey, CAST(SUM({PRICE}) AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(SUM({PRICE}) AS DOUBLE) > (
      SELECT CAST(SUM({PRICE}) AS DOUBLE) / COUNT(DISTINCT l_partkey)
      FROM lineitem)
    ORDER BY part_value DESC, l_partkey
    """,
    tags=("relational", "agg", "subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style: parts whose aggregate value exceeds the
    per-part average (scale-stable threshold) — grouped HAVING against a scalar-subquery aggregate. The
    schema has no partsupp, so value = lineitem extended price per part.
    Scale: the global total is one broadcast row; the per-part agg is the
    only keyed shuffle."""
    t = load_tables(spark, sf_dir, "lineitem")
    price = F.expr(PRICE)
    total = t.lineitem.agg(
        (F.sum(price).cast("double") / F.countDistinct("l_partkey")).alias("threshold")
    )
    return (
        t.lineitem.groupBy("l_partkey")
        .agg(F.sum(price).cast("double").alias("part_value"))
        .join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%7%')
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("relational", "join", "antijoin", "distinct"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct supplier counts per (brand, type, size)
    bracket, excluding a supplier denylist — NOT-IN rewritten as an anti join
    (the denylist has no NULLs, so the semantics coincide). Scale: denylist
    and part dimension both broadcast; one distinct-agg shuffle."""
    t = load_tables(spark, sf_dir, "part", "lineitem", "supplier")
    parts = t.part.filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    deny = t.supplier.filter(F.col("s_name").like("%7%")).select("s_suppkey")
    return (
        t.lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(deny), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )
