"""Relational pack 2: subquery shapes, statistical aggregates (exact-sum
formulations), pivot, extended window functions, hashing, scalar breadth.

Same determinism rules as pack 1 (see registry): decimal-exact sums cast to
double, total orders on every ranked output, standard algorithms (md5/sha,
levenshtein) where both engines implement the same public spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_tables
from .registry import query
from .relational import DISC_PRICE, PRICE, QTY

VAL = "CAST(value AS DECIMAL(14,2))"
BAL = "CAST(c_acctbal AS DECIMAL(12,2))"


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("relational", "join", "semijoin"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: correlated EXISTS → left-semi join on (key, date)."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    ord_ = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = t.lineitem.select("l_orderkey", "l_shipdate")
    return (
        ord_.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(YEAR(l_shipdate) AS INT) AS l_year,
             {DISC_PRICE} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND n1.n_name < n2.n_name
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("relational", "join"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style nation-pair trade volume (self-joined dim)."""
    t = load_tables(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = t.nation.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = t.nation.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    supp = t.supplier.join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
    cust = t.customer.join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp.select("s_suppkey", "supp_nation")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust.select("c_custkey", "cust_nation")), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(F.expr(DISC_PRICE)).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE}
                                      ELSE CAST(0 AS DECIMAL(3,2)) END) AS DOUBLE)
                / CAST(SUM({DISC_PRICE}) AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("relational", "join", "agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share (conditional aggregation)."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    promo = F.when(F.col("p_type") == "PROMO", F.expr(DISC_PRICE)).otherwise(
        F.expr("CAST(0 AS DECIMAL(3,2))")
    )
    return (
        li.join(F.broadcast(t.part.select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(F.expr(DISC_PRICE)).cast("double")
            ).cast("double").alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({DISC_PRICE}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("relational", "join", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: scalar-subquery max against a derived view."""
    t = load_tables(spark, sf_dir, "supplier", "lineitem")
    revenue = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.expr(DISC_PRICE)).cast("double").alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        t.supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    SELECT p_partkey, p_name, s_suppkey, s_name,
           CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS s_acctbal
    FROM part, supplier,
         (SELECT l_partkey AS mk, MIN(l_suppkey) AS min_supp
          FROM lineitem GROUP BY l_partkey) m
    WHERE p_partkey = mk AND s_suppkey = min_supp AND p_size < 10
    ORDER BY p_partkey
    """,
    tags=("relational", "join", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped min-per-group correlated lookup (adapted: the schema
    has no partsupp, so 'cheapest' = lowest supplier key serving the part)."""
    t = load_tables(spark, sf_dir, "part", "supplier", "lineitem")
    m = t.lineitem.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("l_suppkey").alias("min_supp")
    )
    return (
        t.part.filter(F.col("p_size") < 10)
        .join(m, F.col("p_partkey") == F.col("mk"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("min_supp"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.expr("CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE)").alias("s_acctbal"),
        )
        .orderBy("p_partkey")
    )


@query(
    "agg_variance_exact",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM({VAL}) AS DOUBLE) AS sum_v,
           CAST((CAST(SUM({VAL} * {VAL}) AS DOUBLE)
                 - CAST(SUM({VAL}) AS DOUBLE) * CAST(SUM({VAL}) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1) AS DOUBLE) AS var_v
    FROM events GROUP BY event_type
    """,
    tags=("relational", "agg", "stats"),
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance from exact decimal sums (Σx, Σx²) — engine-portable
    (built-in variance uses streaming formulations that differ numerically
    across engines; this one is bit-reproducible)."""
    t = load_tables(spark, sf_dir, "events")
    s = F.sum(F.expr(VAL)).cast("double")
    s2 = F.sum(F.expr(f"{VAL} * {VAL}")).cast("double")
    n = F.count(F.lit(1))
    return t.events.groupBy("event_type").agg(
        n.alias("n"),
        s.alias("sum_v"),
        ((s2 - s * s / n) / (n - F.lit(1))).cast("double").alias("var_v"),
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT event_type,
           arg_min(event_id, ts ) AS first_event,
           arg_max(event_id, ts) AS last_event,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events GROUP BY event_type
    """,
    tags=("relational", "agg"),
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) aggregates — event timestamps are unique
    per type in this data, so the arg is deterministic."""
    t = load_tables(spark, sf_dir, "events")
    return t.events.groupBy("event_type").agg(
        F.min_by("event_id", "ts").alias("first_event"),
        F.max_by("event_id", "ts").alias("last_event"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "agg_array_collect_sorted",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(c_nationkey)), ',') AS nations,
           COUNT(*) AS n
    FROM (SELECT DISTINCT c_mktsegment, c_nationkey FROM customer)
    GROUP BY c_mktsegment
    """,
    tags=("relational", "agg", "array"),
)
def agg_array_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list → sorted array, serialized for stable comparison."""
    t = load_tables(spark, sf_dir, "customer")
    return (
        t.customer.select("c_mktsegment", "c_nationkey")
        .distinct()
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_nationkey")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational", "pivot"),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional counts) via groupBy().pivot with explicit
    values — map-side combinable, unlike a generic transpose."""
    t = load_tables(spark, sf_dir, "orders")
    p = (
        t.orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


@query(
    "window_rank_variants",
    oracle="""
    SELECT o_orderkey, o_custkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS prnk,
           NTILE(4) OVER w AS quartile
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("relational", "window"),
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile over one window spec."""
    t = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return t.orders.filter(F.col("o_custkey") < 50).select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).cast("double").alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_first_last_frames",
    oracle="""
    SELECT event_id, user_id,
           FIRST_VALUE(event_id) OVER w AS first_id,
           LAST_VALUE(event_id) OVER w_full AS last_id,
           LEAD(event_id, 1, -1) OVER w AS next_id,
           LAG(event_id, 2) OVER w AS prev2_id
    FROM events WHERE user_id < 10
    WINDOW
      w AS (PARTITION BY user_id ORDER BY ts, event_id),
      w_full AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("relational", "window"),
)
def window_first_last_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with explicit frames + lead(default)/lag(n)."""
    t = load_tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t.events.filter(F.col("user_id") < 10).select(
        "event_id",
        "user_id",
        F.first("event_id").over(w).alias("first_id"),
        F.last("event_id").over(w_full).alias("last_id"),
        F.lead("event_id", 1, -1).over(w).alias("next_id"),
        F.lag("event_id", 2).over(w).alias("prev2_id"),
    )


@query(
    "window_range_interval",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS n_last_hour
    FROM events WHERE user_id < 10
    """,
    tags=("relational", "window", "range"),
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over an interval: events per user in the trailing hour."""
    t = load_tables(spark, sf_dir, "events")
    return t.events.filter(F.col("user_id") < 10).select(
        "event_id",
        "user_id",
        F.expr(
            "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ).alias("n_last_hour"),
    )


@query(
    "scalar_hash_functions",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           LENGTH(text) AS n
    FROM documents WHERE doc_id < 50
    """,
    tags=("relational", "scalar", "hash"),
)
def scalar_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard cryptographic digests (identical across engines by spec)."""
    t = load_tables(spark, sf_dir, "documents")
    return t.documents.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
        F.length("text").alias("n"),
    )


@query(
    "scalar_string_functions2",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS padded,
           split_part(p_name, ' ', 1) AS first_word,
           reverse(p_name) AS reversed,
           repeat(p_type, 2) AS doubled,
           ltrim(rtrim('  ' || p_name || '  ')) AS trimmed,
           POSITION('e' IN p_name) AS e_pos,
           levenshtein(p_brand, 'Brand#1') AS lev
    FROM part WHERE p_partkey < 100
    """,
    tags=("relational", "scalar", "string"),
)
def scalar_string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More string scalars: pad/split_part/reverse/repeat/trim/position/
    levenshtein (public algorithm, identical results)."""
    t = load_tables(spark, sf_dir, "part")
    return t.part.filter(F.col("p_partkey") < 100).select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.reverse("p_name").alias("reversed"),
        F.repeat(F.col("p_type"), 2).alias("doubled"),
        F.ltrim(F.rtrim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  ")))).alias("trimmed"),
        F.instr(F.col("p_name"), "e").alias("e_pos"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#1")).alias("lev"),
    )


@query(
    "scalar_date_functions2",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS plus_30d,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
    FROM orders WHERE o_orderkey < 300
    """,
    tags=("relational", "scalar", "date"),
)
def scalar_date_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More date scalars: interval arithmetic, last_day, dayofyear, datediff,
    epoch seconds."""
    t = load_tables(spark, sf_dir, "orders")
    return t.orders.filter(F.col("o_orderkey") < 300).select(
        "o_orderkey",
        (F.to_date("o_orderdate") + F.expr("INTERVAL 30 DAY")).cast("timestamp").alias("plus_30d"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01")))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
    )


@query(
    "scalar_conditional_functions",
    oracle=f"""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
           GREATEST(CAST({BAL} AS DOUBLE), 0.0) AS bal_floor,
           LEAST(CAST({BAL} AS DOUBLE), 1000.0) AS bal_cap,
           IF(c_nationkey % 2 = 0, 'even', 'odd') AS parity
    FROM customer
    """,
    tags=("relational", "scalar", "conditional"),
)
def scalar_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / greatest / least / if."""
    t = load_tables(spark, sf_dir, "customer")
    bal = F.expr(f"CAST({BAL} AS DOUBLE)")
    return t.customer.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap"),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias("parity"),
    )


@query(
    "scalar_bitwise_ops",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS set_bit,
           xor(event_id, 1) AS flip,
           event_id << 2 AS shl,
           event_id >> 3 AS shr
    FROM events WHERE event_id < 200
    """,
    tags=("relational", "scalar", "bitwise"),
)
def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and/or/xor/shifts."""
    t = load_tables(spark, sf_dir, "events")
    e = F.col("event_id")
    return t.events.filter(e < 200).select(
        "event_id",
        e.bitwiseAND(F.lit(255)).alias("low_byte"),
        e.bitwiseOR(F.lit(4096)).alias("set_bit"),
        e.bitwiseXOR(F.lit(1)).alias("flip"),
        F.shiftleft(e, 2).alias("shl"),
        F.shiftright(e, 3).alias("shr"),
    )


@query(
    "limit_offset_pagination",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    ORDER BY o_orderkey LIMIT 25 OFFSET 100
    """,
    tags=("relational", "sort", "limit"),
)
def limit_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination over a total order."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t.orders.select("o_orderkey", "o_custkey").orderBy("o_orderkey").offset(100).limit(25)
    )
