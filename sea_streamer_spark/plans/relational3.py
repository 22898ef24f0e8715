"""Relational pack 3: remaining TPC-H join/subquery shapes (Q8/Q9/Q13/Q19/Q22
adapted to the driver schema), grouping sets, multi-distinct aggregates,
percentiles, exact correlation, array/lambda/explode/regexp scalar breadth,
IN-subqueries, inline-VALUES dimension joins, HAVING.

Same determinism rules as packs 1-2 (registry docstring): exact decimal sums
cast to double at the end, total orders on ranked output, identical explicit
formulas on both engine sides for anything numerically sensitive.

Scale notes are per-query; the common posture: fact-side scans stay pipelined
(filter+project pushed to parquet), dimension sides are broadcast, and the
only shuffles are the keyed aggregations themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_tables
from .registry import query
from .relational import DISC_PRICE

BAL = "CAST(c_acctbal AS DECIMAL(12,2))"
RETAIL = "CAST(p_retailprice AS DECIMAL(12,2))"
LQTY = "CAST(l_quantity AS DECIMAL(12,2))"


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("relational", "join", "outer", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: order-count distribution via outer join + two-level
    aggregation. Scale: both aggs shuffle on keys that are near-uniform
    (custkey, then small-domain c_count); no broadcast needed — orders is the
    fact side and stays partitioned."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    ord_ = t.orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t.customer.join(ord_, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q19_disjunctive_predicate",
    oracle=f"""
    SELECT CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
      (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        AND l_quantity >= 1 AND l_quantity <= 11)
      OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        AND l_quantity >= 10 AND l_quantity <= 20)
      OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        AND l_quantity >= 20 AND l_quantity <= 30))
    """,
    tags=("relational", "join", "predicate"),
)
def q19_disjunctive_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive bracket predicate. The l_quantity
    disjunction's hull (1..30) is pushable below the join; Catalyst derives
    it via constraint propagation, and part stays broadcast."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        t.lineitem.join(
            F.broadcast(t.part.select("p_partkey", "p_brand", "p_size")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(cond)
        .agg(F.sum(F.expr(DISC_PRICE)).cast("double").alias("revenue"))
    )


@query(
    "q22_waiting_customers",
    oracle=f"""
    SELECT cntrycode, COUNT(*) AS numcust, CAST(SUM(bal) AS DOUBLE) AS totacctbal
    FROM (
      SELECT c_nationkey % 10 AS cntrycode, {BAL} AS bal
      FROM customer
      WHERE {BAL} > (
        SELECT CAST(SUM({BAL}) AS DOUBLE) / COUNT(*) FROM customer
        WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    ) waiting
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    tags=("relational", "join", "antijoin", "subquery"),
)
def q22_waiting_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: above-average balance + no urgent orders (scalar
    subquery + anti join). The average is an exact decimal sum / count in double — the
    identical expression on both engines. Scale: the scalar aggregate is a
    broadcast of one row; the anti join shuffles on custkey."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    bal = F.expr(BAL)
    avg_row = t.customer.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(bal).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        t.customer.join(F.broadcast(avg_row))
        .filter(bal > F.col("avg_bal"))
        .join(
            t.orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .select((F.col("c_nationkey") % 10).alias("cntrycode"), bal.alias("bal"))
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_7' THEN volume
                              ELSE CAST(0 AS DECIMAL(3,2)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
             {DISC_PRICE} AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("relational", "join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: NATION_7 suppliers' slice of STANDARD-part
    revenue sold to ASIA customers, per year. Scale: lineitem⋈orders is the
    only big shuffle; part/supplier/customer(+nation/region) reduce to
    broadcast dimension maps."""
    t = load_tables(
        spark, sf_dir, "part", "supplier", "lineitem", "orders", "customer", "nation", "region"
    )
    asia_nations = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey")
    )
    cust = t.customer.join(
        F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    supp = t.supplier.join(
        F.broadcast(t.nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    std_parts = t.part.filter(F.col("p_type") == "STANDARD").select("p_partkey")
    vol = F.expr(DISC_PRICE)
    nation7 = F.when(F.col("nation") == "NATION_7", vol).otherwise(
        F.expr("CAST(0 AS DECIMAL(3,2))")
    )
    return (
        t.lineitem.join(F.broadcast(std_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nation7).cast("double") / F.sum(vol).cast("double"))
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(YEAR(o_orderdate) AS INT) AS o_year,
             {DISC_PRICE} - {RETAIL} * {LQTY} * CAST(0.1 AS DECIMAL(3,2)) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%a%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("relational", "join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style profit by (supplier nation, year). The schema has no
    partsupp, so supply cost is proxied as 10% of retail price x quantity —
    still exercising the 5-way join + decimal arithmetic. Scale: same posture
    as q8 (one fact shuffle, broadcast dims)."""
    t = load_tables(spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation")
    parts = t.part.filter(F.col("p_name").like("%a%")).select("p_partkey", "p_retailprice")
    supp = t.supplier.join(
        F.broadcast(t.nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    amount = F.expr(f"{DISC_PRICE} - {RETAIL} * {LQTY} * CAST(0.1 AS DECIMAL(3,2))")
    return (
        t.lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(t.orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("relational", "agg", "groupingsets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() markers (generalizes the
    rollup/cube queries in pack 1). Expressed in Spark SQL — one Expand +
    one shuffle, partially aggregated map-side."""
    t = load_tables(spark, sf_dir, "lineitem")
    t.lineitem.createOrReplaceTempView("lineitem_gsets")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem_gsets
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational", "agg", "distinct"),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) over different keys in one aggregate —
    planned as Expand + two-phase agg (one shuffle per distinct set)."""
    t = load_tables(spark, sf_dir, "orders")
    return t.orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct(F.to_date("o_orderdate")).alias("n_days"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_percentile_cont",
    oracle="""
    SELECT o_orderpriority,
           CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS median_price,
           CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) AS p90_price
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational", "agg", "percentile"),
)
def agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (linear interpolation over the sorted
    group — the same published definition in both engines), computed
    WITHOUT buffering whole groups: a group-keyed row_number window (Spark's
    sort-based window SPILLS to disk, unlike percentile()'s in-memory
    per-group array) ranks each group once, the two boundary rows per
    percentile are selected by position, and a conditional aggregate
    interpolates — one group-keyed shuffle, O(1) state per group in the
    final agg, disk-bounded (not memory-bounded) group size. approx
    alternatives when tolerance permits: approx_percentile /
    sketch_quantile_bottomk."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, "orders")
    g = "o_orderpriority"
    v = F.col("o_totalprice").cast("double")
    w_sort = Window.partitionBy(g).orderBy("o_totalprice")
    w_all = Window.partitionBy(g)
    ranked = t.orders.select(g, "o_totalprice").select(
        F.col(g),
        v.alias("v"),
        F.row_number().over(w_sort).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )

    def pct(p: float, name: str):
        # target position (0-based) of the interpolated value; lo/hi are the
        # two sorted rows it falls between (equal when target is integral)
        tgt = (F.col("n") - 1) * F.lit(p)
        lo_rn = F.floor(tgt) + 1
        hi_rn = F.ceil(tgt) + 1
        frac = tgt - F.floor(tgt)
        lo = F.max(F.when(F.col("rn") == lo_rn, F.col("v")))
        hi = F.max(F.when(F.col("rn") == hi_rn, F.col("v")))
        f = F.first(frac)
        # lerp as lo*(1-f) + hi*f — the interpolation BOTH engines round to
        # (DuckDB Interpolator; lo + f*(hi-lo) drifts 1 ulp on some groups)
        return (lo * (F.lit(1.0) - f) + hi * f).cast("double").alias(name)

    # keep only rows that can be a percentile boundary (≤ 4 per group) so
    # the final aggregate's input is tiny regardless of group size
    is_boundary = F.lit(False)
    for p in (0.5, 0.9):
        tgt = (F.col("n") - 1) * F.lit(p)
        is_boundary = (
            is_boundary
            | (F.col("rn") == F.floor(tgt) + 1)
            | (F.col("rn") == F.ceil(tgt) + 1)
        )
    return (
        ranked.filter(is_boundary)
        .groupBy(g)
        .agg(pct(0.5, "median_price"), pct(0.9, "p90_price"))
    )


@query(
    "agg_corr_exact",
    oracle="""
    WITH sums AS MATERIALIZED (
      -- DECIMAL(38,·) → DOUBLE through VARCHAR: DuckDB's direct cast
      -- double-rounds (int128→double, then /10^scale) and lands 1 ulp off
      -- the correctly-rounded value the JVM's BigDecimal→double produces
      -- (observed on spp at sf0.001); the string parse rounds once
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(CAST(SUM(q * p) AS VARCHAR) AS DOUBLE) AS sqp,
             CAST(CAST(SUM(q) AS VARCHAR) AS DOUBLE) AS sq,
             CAST(CAST(SUM(p) AS VARCHAR) AS DOUBLE) AS sp,
             CAST(CAST(SUM(q * q) AS VARCHAR) AS DOUBLE) AS sqq,
             CAST(CAST(SUM(p * p) AS VARCHAR) AS DOUBLE) AS spp
      FROM (SELECT l_returnflag,
                   CAST(l_quantity AS DECIMAL(12,2)) AS q,
                   CAST(l_extendedprice AS DECIMAL(12,2)) AS p
            FROM lineitem) x
      GROUP BY l_returnflag
    ), prods AS MATERIALIZED (
      -- each product in its own projection: DuckDB's vectorizer may fuse
      -- a·b − c·d into a single-rounding FMA (the JVM rounds each product),
      -- which flipped corr_qp by 1 ulp at sf0.001; materializing the
      -- products forces the JVM's two-rounding arithmetic
      SELECT l_returnflag, n,
             n * sqp AS t1, sq * sp AS t2,
             n * sqq AS t3, sq * sq AS t4,
             n * spp AS t5, sp * sp AS t6
      FROM sums
    )
    SELECT l_returnflag, n,
           CAST((t1 - t2) / SQRT((t3 - t4) * (t5 - t6)) AS DOUBLE) AS corr_qp
    FROM prods
    """,
    tags=("relational", "agg", "stats"),
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact decimal sums (Σq, Σp, Σqp, Σq², Σp²) —
    bit-reproducible across engines and partition orders, unlike the built-in
    streaming corr(). All five sums ride one map-side-combined shuffle."""
    t = load_tables(spark, sf_dir, "lineitem")
    q = F.expr("CAST(l_quantity AS DECIMAL(12,2))")
    p = F.expr("CAST(l_extendedprice AS DECIMAL(12,2))")
    n = F.count(F.lit(1))
    sq, sp = F.sum(q).cast("double"), F.sum(p).cast("double")
    sqp = F.sum(q * p).cast("double")
    sqq, spp = F.sum(q * q).cast("double"), F.sum(p * p).cast("double")
    corr = ((n * sqp - sq * sp) / F.sqrt((n * sqq - sq * sq) * (n * spp - sp * sp))).cast(
        "double"
    )
    return t.lineitem.groupBy("l_returnflag").agg(n.alias("n"), corr.alias("corr_qp"))


@query(
    "array_lambda_functions",
    oracle="""
    SELECT vec_id,
           CAST(list_reduce(CAST(embedding AS DOUBLE[]), (a, b) -> a + b) AS DOUBLE)
             AS sum_all,
           CAST(list_reduce(list_slice(CAST(embedding AS DOUBLE[]), 1, 8), (a, b) -> a + b)
                AS DOUBLE) AS sum_first8,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           len(embedding) AS n_dims,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           CAST(list_max(embedding) AS DOUBLE) AS max_elem
    FROM embeddings WHERE vec_id < 100
    """,
    tags=("relational", "array", "lambda"),
)
def array_lambda_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array lambdas: aggregate (fold), slice, element_at, size, filter,
    array_max — the vector toolkit the similarity operators build on. Floats
    are cast to double *before* the fold so both engines add in the same
    order from an exact 0.0 start. Pure projection: no shuffle at any
    scale."""
    t = load_tables(spark, sf_dir, "embeddings")
    arrd = F.transform("embedding", lambda x: x.cast("double"))
    fold = lambda col: F.aggregate(col, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return t.embeddings.filter(F.col("vec_id") < 100).select(
        "vec_id",
        fold(arrd).cast("double").alias("sum_all"),
        fold(F.slice(arrd, 1, 8)).cast("double").alias("sum_first8"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.size("embedding").alias("n_dims"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.array_max("embedding").cast("double").alias("max_elem"),
    )


@query(
    "array_explode_stats",
    oracle="""
    SELECT vec_id, COUNT(*) AS n_big, CAST(MAX(v) AS DOUBLE) AS max_big
    FROM (SELECT vec_id, UNNEST(embedding) AS v FROM embeddings) u
    WHERE v > 0.25
    GROUP BY vec_id
    """,
    tags=("relational", "array", "explode"),
)
def array_explode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/UNNEST then re-aggregate per row (count/max are order-safe;
    float re-summation would not be). Scale: the explode multiplies rows 64x
    before the shuffle — the lambda formulation above is preferred at scale;
    this query exists to cover the explode operator itself."""
    t = load_tables(spark, sf_dir, "embeddings")
    return (
        t.embeddings.select("vec_id", F.explode("embedding").alias("v"))
        .filter(F.col("v") > 0.25)
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_big"), F.max("v").cast("double").alias("max_big"))
    )


@query(
    "regexp_functions",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_replace(text, 'data', 'DATA', 'g') AS replaced,
           regexp_matches(text, 'stream|spark') AS has_kw,
           LENGTH(regexp_replace(text, '[aeiou]', '', 'g')) AS n_non_vowel
    FROM documents WHERE doc_id < 40
    """,
    tags=("relational", "scalar", "regexp"),
)
def regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract (group ref), global regexp_replace, rlike — patterns
    restricted to the POSIX-compatible subset where Java and RE2 semantics
    coincide."""
    t = load_tables(spark, sf_dir, "documents")
    return t.documents.filter(F.col("doc_id") < 40).select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace("text", "data", "DATA").alias("replaced"),
        F.col("text").rlike("stream|spark").alias("has_kw"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("n_non_vowel"),
    )


@query(
    "in_subquery_segment",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    ORDER BY o_orderkey LIMIT 100
    """,
    tags=("relational", "join", "subquery"),
)
def in_subquery_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → broadcast left-semi join; top-k per-partition then
    merged on the driver (TakeOrderedAndProject — no global sort)."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    building = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        t.orders.join(
            F.broadcast(building), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
        )
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
        .limit(100)
    )


@query(
    "values_inline_dim_join",
    oracle="""
    SELECT r.r_regionkey, r.r_name, m.code
    FROM region r
    JOIN (VALUES ('ASIA', 'AS'), ('EUROPE', 'EU'), ('AFRICA', 'AF'),
                 ('AMERICA', 'AM'), ('MIDDLE EAST', 'ME')) AS m(name, code)
      ON r.r_name = m.name
    ORDER BY r.r_regionkey
    """,
    tags=("relational", "join", "values"),
)
def values_inline_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES (LocalRelation) dimension joined broadcast-style —
    the lookup-table enrichment pattern; never shuffles the fact side."""
    t = load_tables(spark, sf_dir, "region")
    codes = spark.createDataFrame(
        [("ASIA", "AS"), ("EUROPE", "EU"), ("AFRICA", "AF"),
         ("AMERICA", "AM"), ("MIDDLE EAST", "ME")],
        ["name", "code"],
    )
    return (
        t.region.join(F.broadcast(codes), F.col("r_name") == F.col("name"))
        .select("r_regionkey", "r_name", "code")
        .orderBy("r_regionkey")
    )


@query(
    "agg_having_filter",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 50
    ORDER BY l_suppkey
    """,
    tags=("relational", "agg", "having"),
)
def agg_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — post-aggregation filter, evaluated after the final merge so
    partial aggregation still combines map-side."""
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t.lineitem.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.expr("CAST(l_quantity AS DECIMAL(12,2))")).cast("double").alias("total_qty"),
        )
        .filter(F.col("n_items") > 50)
        .orderBy("l_suppkey")
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_returnflag IN ('R', 'A')
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("relational", "join", "agg"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape adapted to the driver schema (no l_shipmode /
    l_commitdate / l_receiptdate columns): ``l_returnflag`` stands in for the
    ship-mode IN-list and ``l_shipdate > o_orderdate + 60 days`` for the
    late-delivery cross-table predicate. Keeps Q12's distinctive pieces —
    fact-fact equi-join, IN filter, date arithmetic across both tables,
    conditional (CASE) counts.

    Scale: both sides are fact tables, so this is the canonical shuffled
    join; the selective shipdate-year + returnflag filter is pushed to the
    lineitem parquet scan before the exchange, and AQE picks merge vs
    shuffled-hash (and splits skewed orderkeys) at runtime.
    """
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    li = t.lineitem.filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            t.orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
