"""TPC-H-style analytics over the driver's star schema.

The reference's batch analytics layer is four Postgres SQL queries for
Grafana (reference ``sql/queries.sql``) — joins, argmax, pivot, as-of
fill. q_reference.py rebuilds those shapes 1:1 on the events table; this
module exercises the SAME operator classes (multi-way joins, conditional
aggregation, semi/anti joins, rollup, windows) at the scale-substrate
tables (lineitem/orders/...), because that is where 100 TB behavior is
decided. These are also the bench headliners.

Scale design notes (per-query details in docstrings):

* dimension sides (region/nation/customer/supplier/part) get explicit
  ``broadcast()`` hints — at real TPC-H scale customer/part stop being
  broadcastable, but region/nation never do; AQE re-plans the rest;
* aggregates are expressed as native conditional aggs → map-side partial
  aggregation before the shuffle;
* no LIMIT/top-k without a full deterministic ordering key — results must
  be set-stable for the oracle hash;
* doubles rounded to 6 decimals at the boundary (cross-engine fp drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_stream_analyzer_spark.functions.materialize import materialize
from spark_stream_analyzer_spark.functions.scalar import msum6, round6, round6_half_up
from spark_stream_analyzer_spark.operators.rank import (
    global_dense_rank,
    global_ntile,
    global_rank,
)
from spark_stream_analyzer_spark.plans.registry import register
from spark_stream_analyzer_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _msum6_sql(expr: str) -> str:
    """DuckDB twin of ``scalar.msum6`` — split integer micro-unit sum
    (see its docstring for the exactness/overflow argument)."""
    m = f"CAST(FLOOR(({expr}) * 1000000 + 0.5) AS BIGINT)"
    return (
        f"(CAST(SUM({m} // 1000000) AS DOUBLE)"
        f" + CAST(SUM({m} % 1000000) AS DOUBLE) / 1000000.0)"
    )


@register(
    "tpch_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 6) AS sum_qty,
           ROUND({_msum6_sql("l_extendedprice")}, 6) AS sum_base_price,
           ROUND({_msum6_sql("l_extendedprice * (1 - l_discount)")}, 6)
             AS sum_disc_price,
           ROUND({_msum6_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}, 6)
             AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND({_msum6_sql("l_extendedprice")}
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_price,
           ROUND({_msum6_sql("l_discount")}
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan-heavy grouped aggregation; the shipdate "
    "predicate must reach the parquet scan (pushdown check)",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact money sums (msum6) — round6 over a raw double
            # SUM went a last-ulp apart from DuckDB at sf0.1; quantity
            # sums stay plain (integer-valued doubles sum exactly)
            round6(F.sum("l_quantity")).alias("sum_qty"),
            round6(msum6(F.col("l_extendedprice"))).alias("sum_base_price"),
            round6(
                msum6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_price"),
            round6(
                msum6(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            round6(F.avg("l_quantity")).alias("avg_qty"),
            round6(
                msum6(F.col("l_extendedprice")) / F.count(F.lit(1)).cast("double")
            ).alias("avg_price"),
            round6(
                msum6(F.col("l_discount")) / F.count(F.lit(1)).cast("double")
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_revenue_forecast",
    oracle="""
    SELECT ROUND(COALESCE(SUM(l_extendedprice * l_discount), 0), 6) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure filter + global agg — the canonical "
    "predicate-pushdown / whole-stage-codegen showcase",
)
def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            round6(F.coalesce(F.sum(F.col("l_extendedprice") * F.col("l_discount")), F.lit(0.0))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "tpch_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
    doc="TPC-H Q3 shape: 3-way fact join with selective dim filter; "
    "customer side broadcast, orders⋈lineitem shuffle on orderkey",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
    )


@register(
    "tpch_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way snowflake join, region/nation/supplier "
    "broadcast (bounded cardinality at every SF), local-supplier predicate",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            round6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "tpch_order_priority_count",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: LEFT SEMI join (EXISTS decorrelated by Catalyst)",
)
def q_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="LEFT ANTI join (NOT EXISTS) — absent in the reference, listed as "
    "available-native in SURVEY §2.4",
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 6) AS totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="W1 generalized: top-N per group via ranked window "
    "(deterministic tiebreak on orderkey)",
)
def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            round6(F.col("o_totalprice")).alias("totalprice"),
            "rn",
        )
    )


@register(
    "lineitem_status_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 6) AS qty_F,
           ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 6) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="A9: pivot (conditional aggregation) on bounded category columns",
)
def q_lineitem_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = l.groupBy("l_returnflag").pivot("l_linestatus", ["F", "O"]).agg(F.sum("l_quantity"))
    return p.select(
        "l_returnflag",
        round6(F.coalesce(F.col("F"), F.lit(0.0))).alias("qty_F"),
        round6(F.coalesce(F.col("O"), F.lit(0.0))).alias("qty_O"),
    )


@register(
    "revenue_rollup",
    oracle=f"""
    SELECT n.n_name, o.o_orderpriority,
           ROUND({_msum6_sql("o.o_totalprice")}, 6)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY ROLLUP (n.n_name, o.o_orderpriority)
    """,
    doc="grouping-sets family (absent in reference, SURVEY §2.5 'available "
    "if needed'): ROLLUP over nation × priority",
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "o_orderpriority")
        .agg(
            round6(msum6(F.col("o_totalprice"))).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "customer_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_spend
    FROM orders
    """,
    doc="running aggregate window over order history — the batch analog of "
    "the streaming cumulative state (SURVEY §7 step 2a)",
)
def q_customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("orderdate"),
        round6(F.sum("o_totalprice").over(w)).alias("running_spend"),
    )


@register(
    "tpch_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
               / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    doc="TPC-H Q14 shape: ratio-of-conditional-sums over a fact⋈dim join "
    "(part broadcastable at this SF; AQE re-plans at scale)",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            round6(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev)
            ).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "tpch_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: LEFT OUTER join preserving zero-order customers "
    "+ two-level aggregation (count histogram)",
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_supplier_part_variety",
    oracle="""
    SELECT p.p_brand, p.p_type,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type NOT LIKE 'PROMO%' AND p.p_size >= 20
    GROUP BY p.p_brand, p.p_type
    """,
    doc="TPC-H Q16 shape: per-group COUNT(DISTINCT) (two-phase shuffle "
    "agg) with NOT LIKE + range predicates pushed to the part scan",
)
def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (~F.col("p_type").like("PROMO%")) & (F.col("p_size") >= 20)
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_large_volume_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS orderdate,
           ROUND(t.total_qty, 6) AS total_qty
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    ) t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="TPC-H Q18 shape: HAVING over a grouped fact, joined back through "
    "orders to the customer dim",
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    t = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        t.join(o, t.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            round6(F.col("total_qty")).alias("total_qty"),
        )
    )


@register(
    "tpch_rich_inactive_customers",
    oracle="""
    SELECT c.c_custkey, ROUND(c.c_acctbal, 6) AS acctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1998-01-01')
    """,
    doc="TPC-H Q22 shape: scalar-aggregate subquery (broadcast one-row "
    "cross join) + LEFT ANTI join",
)
def q_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", round6(F.col("c_acctbal")).alias("acctbal"))
    )


@register(
    "revenue_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND({_msum6_sql("l_extendedprice")}, 6)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping-sets (all 4 subtotal combinations) — completes the "
    "grouping-sets family next to revenue_rollup",
)
def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        round6(msum6(F.col("l_extendedprice"))).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "price_quartiles_by_flag",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="ordered-set aggregate class: EXACT interpolated percentiles per "
    "group (continuous definition matches DuckDB quantile_cont). r11: "
    "computed by the functions/median.py bisection — 3 l_returnflag "
    "groups means Spark's exact percentile() would buffer a third of "
    "the fact table per reducer; banned by plan lint",
)
def q_price_quartiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.functions.median import (
        grouped_exact_percentiles,
    )

    l = _t(spark, sf_dir, "lineitem")
    pct = grouped_exact_percentiles(
        l, ["l_returnflag"], "l_extendedprice", [0.25, 0.5, 0.75]
    )
    return pct.select(
        "l_returnflag",
        round6(F.col("p0")).alias("p25"),
        round6(F.col("p1")).alias("p50"),
        round6(F.col("p2")).alias("p75"),
    )


@register(
    "customer_spend_ranks",
    oracle="""
    WITH s AS (SELECT o_custkey, SUM(o_totalprice) AS spend
               FROM orders GROUP BY o_custkey)
    SELECT o_custkey,
           ROUND(spend, 6) AS spend,
           CAST(rank() OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (ORDER BY ROUND(spend, 0) DESC) AS BIGINT) AS drnk,
           CAST(ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS quartile
    FROM s
    """,
    doc="ranking window family (rank / dense_rank / ntile) over per-"
    "customer spend — completes SURVEY §2.7's 'available native' row. "
    "(r9) migrated off the single-reducer Window.orderBy: rank over a "
    "TOTAL order (custkey tiebreak) equals row_number, so it and ntile "
    "come from operators.rank.global_rank/global_ntile (range shuffle + "
    "per-partition windows + broadcast offsets); dense_rank over the "
    "rounded spend ranks the DISTINCT value set and joins back "
    "(operators.rank.global_dense_rank). Identical answers, no "
    "Exchange SinglePartition over the customer table at any scale",
)
def q_customer_spend_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    order = [F.desc("spend"), F.asc("o_custkey")]
    d = global_rank(s, order, rank_col="rnk")
    # rnk IS the row_number over this same total order — reuse it so the
    # quartile costs no second range exchange (r9, bench residue fix)
    d = global_ntile(d, order, 4, tile_col="quartile", rank_col="rnk")
    d = global_dense_rank(d, F.round("spend", 0), dense_col="drnk", desc=True)
    return d.select(
        "o_custkey",
        round6(F.col("spend")).alias("spend"),
        F.col("rnk").cast("long").alias("rnk"),
        F.col("drnk").cast("long").alias("drnk"),
        F.col("quartile").cast("long").alias("quartile"),
    )


@register(
    "orders_by_month",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 6) AS revenue
    FROM orders GROUP BY 1, 2
    """,
    doc="calendar extraction (year/month) grouped revenue — datetime "
    "function family over the orders timeline",
)
def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            round6(F.sum("o_totalprice")).alias("revenue"),
        )
    )


@register(
    "tpch_small_qty_revenue",
    oracle="""
    SELECT ROUND(COALESCE(SUM(l.l_extendedprice), 0) / 7.0, 6) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 shape: correlated scalar-aggregate subquery over the "
    "fact table. Decorrelated by hand into a per-part aggregate join "
    "(what Catalyst/DuckDB do internally): the per-part threshold table "
    "is |part|-sized -> broadcast; the fact table is scanned exactly "
    "twice (once for thresholds, once for probes), never per-row",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    cap = l.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cap")
    )
    return (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(cap), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            round6(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_or_brand_revenue",
    oracle=f"""
    SELECT ROUND(COALESCE({_msum6_sql("l.l_extendedprice * (1 - l.l_discount)")},
             0), 6) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive predicate groups "
    "spanning both join sides. The common part of each disjunct that "
    "touches only one table (brand IN (...), quantity <= 30) is "
    "extracted by Catalyst (CNF conversion) and pushed below the join; "
    "the residual OR evaluates post-join inside codegen",
)
def q_or_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    s = F.col("p_size")
    b = F.col("p_brand")
    cond = (
        ((b == "Brand#11") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#22") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 35) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            round6(
                F.coalesce(
                    msum6(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    F.lit(0.0),
                )
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_important_part_value",
    oracle="""
    WITH v AS (SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS part_value
               FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, ROUND(part_value, 6) AS part_value
    FROM v
    WHERE part_value > (SELECT SUM(part_value) * 0.0006 FROM v)
    """,
    doc="TPC-H Q11 shape: HAVING against a global scalar aggregate. The "
    "scalar side is a one-row DataFrame broadcast-cross-joined into the "
    "per-part aggregate — no driver collect, no second fact scan (the "
    "per-part aggregate feeds both the total and the filter; Spark "
    "reuses the exchange)",
)
def q_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    v = l.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("part_value")
    )
    threshold = v.agg((F.sum("part_value") * 0.0006).alias("value_threshold"))
    return (
        v.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("value_threshold"))
        .select("l_partkey", round6(F.col("part_value")).alias("part_value"))
    )


@register(
    "tpch_top_revenue_supplier",
    oracle="""
    WITH r AS (SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                 AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
               GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, ROUND(r.total_revenue, 6) AS total_revenue
    FROM supplier s JOIN r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM r)
    """,
    doc="TPC-H Q15 shape: argmax against a derived revenue view (view -> "
    "global MAX scalar -> equality filter -> dim join). The quarter's "
    "per-supplier aggregate is computed once and feeds both the MAX and "
    "the probe side; supplier dim is broadcast",
)
def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    r = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = r.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        r.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", round6(F.col("total_revenue")).alias("total_revenue"))
    )


@register(
    "tpch_lone_return_supplier",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape: EXISTS + NOT EXISTS on the same self-joined "
    "fact (LEFT SEMI then LEFT ANTI, both hash joins on l_orderkey with "
    "a non-equi residual suppkey<>suppkey). The 'only supplier who "
    "returned items on a finished multi-supplier order' blame query",
)
def q_lone_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = l.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = l.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        l.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    base = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "tpch_dominant_part_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT ps.l_suppkey
      FROM (SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supplier_qty
            FROM lineitem GROUP BY l_partkey, l_suppkey) ps
      JOIN (SELECT l_partkey, SUM(l_quantity) AS part_qty
            FROM lineitem GROUP BY l_partkey) pt
        ON pt.l_partkey = ps.l_partkey
      WHERE ps.supplier_qty > 0.15 * pt.part_qty)
    """,
    doc="TPC-H Q20 shape: IN-subquery against nested aggregates (LEFT "
    "SEMI join of the dim against a two-level rollup of the fact). The "
    "per-(part,supplier) aggregate is the reused building block; its "
    "re-aggregation to per-part totals avoids a second fact scan",
)
def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supplier_qty")
    )
    pt = ps.groupBy("l_partkey").agg(F.sum("supplier_qty").alias("part_qty"))
    dominant = (
        ps.join(pt, "l_partkey")
        .filter(F.col("supplier_qty") > 0.15 * F.col("part_qty"))
        .select("l_suppkey")
    )
    return s.join(dominant, s.s_suppkey == F.col("l_suppkey"), "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "lineitem_unpivot_measures",
    oracle="""
    SELECT l_returnflag, measure,
           ROUND(SUM(val), 6) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
    ) GROUP BY l_returnflag, measure
    """,
    doc="UNPIVOT (wide->long melt) — the inverse of A9's pivot, "
    "completing the reshape family. Spark's unpivot is a zero-shuffle "
    "row expander (Expand node, 3 rows out per row in, still one scan "
    "+ one agg shuffle); the oracle spells it as UNION ALL which is the "
    "same logical expansion",
)
def q_lineitem_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.unpivot(
            ids=["l_returnflag"],
            values=["l_quantity", "l_extendedprice", "l_discount"],
            variableColumnName="measure",
            valueColumnName="val",
        )
        .withColumn("measure", F.regexp_replace("measure", "^l_", ""))
        .groupBy("l_returnflag", "measure")
        .agg(round6(F.sum("val")).alias("total"), F.count("*").alias("n"))
    )


@register(
    "tpch_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    best AS (SELECT l_partkey, MIN(unit_cost) AS min_cost FROM cost GROUP BY l_partkey)
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           floor(c.unit_cost * 1000000 + 0.5) / 1000000 AS unit_cost
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_cost = b.min_cost
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
    """,
    doc="TPC-H Q2 shape: correlated min-subquery ('cheapest supplier per "
    "part within a region'), decorrelated into a per-part MIN aggregate "
    "joined back on (partkey, cost). No partsupp table in this schema, so "
    "the observed unit cost MIN(l_extendedprice/l_quantity) per "
    "(part, supplier) stands in for ps_supplycost. The region restriction "
    "is applied once, before both the candidate and the MIN side, via "
    "broadcast dim joins; the cost aggregate feeds both sides so Spark "
    "reuses the exchange instead of scanning the fact twice",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    euro_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        l.join(F.broadcast(euro_supp.select("s_suppkey")), l.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    return (
        cost.join(best, "l_partkey")
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(p.select("p_partkey", "p_brand")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            # half-up floor rounding: unit costs can land EXACTLY on a
            # 6th-decimal tie (price/qty = x.9078125) where Spark round
            # (HALF_UP) and DuckDB round (half-even) split
            round6_half_up(F.col("unit_cost")).alias("unit_cost"),
        )
    )


@register(
    "tpch_nation_trade_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 6) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair trade volume. The "
    "symmetric OR predicate spans two different dim joins, so it cannot "
    "be pushed into either alone; both nation joins are broadcast and "
    "the disjunction is evaluated post-join, before the grouped agg. "
    "Fact-to-fact (lineitem<->orders) remains the only real shuffle",
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        l.join(F.broadcast(s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key")).select("s_suppkey", "supp_nation")),
               l.l_suppkey == F.col("s_suppkey"))
        .join(o.join(F.broadcast(c.join(F.broadcast(n2), c.c_nationkey == F.col("n2_key")).select("c_custkey", "cust_nation")),
                     o.o_custkey == F.col("c_custkey")).select("o_orderkey", "cust_nation"),
              l.l_orderkey == F.col("o_orderkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(round6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@register(
    "tpch_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: national market share — an 8-relation join "
    "tree (fact + 5 broadcast dims + fact-to-fact) feeding a ratio of "
    "conditional aggregates. All dims broadcast; the only shuffles are "
    "lineitem<->orders on orderkey and the final 2-key agg. The CASE/sum "
    "ratio form keeps it one pass (no self-join on the filtered subset)",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    amer_cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nat = (
        s.join(F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
               s.s_nationkey == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp_nat), l.l_suppkey == F.col("s_suppkey"))
        .join(o.join(F.broadcast(amer_cust), o.o_custkey == F.col("c_custkey"), "left_semi")
               .select("o_orderkey", "o_orderdate"),
              l.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            round6(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol)
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_product_type_profit",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 6) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.5 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape: product-type profit by nation and year. "
    "Substring LIKE filter on the part dim (broadcast after filter), "
    "revenue-minus-cost arithmetic mixing columns from three relations "
    "(0.5*p_retailprice*l_quantity stands in for ps_supplycost — no "
    "partsupp table in this schema), then a 2-key agg. The LIKE filter "
    "cannot be pushed to a parquet min/max zone, but the broadcast semi "
    "shape means only matching partkeys ride the fact scan",
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    supp_nat = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p.select("p_partkey", "p_retailprice")), l.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), l.l_suppkey == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(round6(F.sum(amount)).alias("sum_profit"))
    )


@register(
    "tpch_returned_item_customers",
    oracle="""
    SELECT c_custkey, c_name, revenue, c_acctbal, n_name
    FROM (
      SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ) ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by returned-item revenue — "
    "the global top-k family (Spark plans TakeOrderedAndProject: per- "
    "partition heap + single driver merge of 20-row heads, never a full "
    "sort). Ordering is on the ROUNDED revenue with custkey tiebreak so "
    "the k-boundary is deterministic across engines despite fp drift",
)
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
                          .select("c_custkey", "c_name", "c_acctbal", "n_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(round6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@register(
    "tpch_priority_line_counts",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape: fact-to-fact join feeding complementary "
    "conditional counts (l_shipmode does not exist in this schema; "
    "l_linestatus plays the grouping role). The shipdate range reaches "
    "the lineitem parquet scan; the priority CASE runs post-join inside "
    "one map-side-combined agg",
)
def q_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o.select("o_orderkey", "o_orderpriority"), l.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "orders_global_rank",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 6) AS totalprice,
           CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
    FROM orders
    """,
    doc="fact-sized GLOBAL ranking without a single-reducer sort: range-"
    "repartition on the full ordering key, rank locally per partition, "
    "add broadcast cumulative partition offsets (operators/rank.py). The "
    "only single-partition work is the <=shuffle-partitions-row offset "
    "table — contrast customer_spend_ranks, which documents the naive "
    "Window.orderBy as dim-sized-only",
)
def q_orders_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.operators.rank import global_rank

    o = _t(spark, sf_dir, "orders")
    ranked = global_rank(
        o.select("o_orderkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
    )
    return ranked.select(
        "o_orderkey", round6(F.col("o_totalprice")).alias("totalprice"), "rnk"
    )


@register(
    "order_part_baskets",
    oracle="""
    SELECT l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS basket_size,
           array_to_string(list(l_partkey ORDER BY l_partkey, l_linenumber), ',') AS parts
    FROM lineitem
    GROUP BY l_orderkey
    """,
    doc="array-aggregation family (collect_list): per-order part basket, "
    "emitted as a canonically-sorted joined string so the cross-engine "
    "value hash is representation-independent. One groupBy shuffle; the "
    "array stays executor-side (never a driver collect). Partial "
    "aggregation still applies — lists concatenate associatively",
)
def q_order_part_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("basket_size"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("l_partkey", "l_linenumber"))
                    ),
                    lambda s: s["l_partkey"].cast("string"),
                ),
                ",",
            ).alias("parts"),
        )
    )


@register(
    "part_cooccurrence_pairs",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
    doc="co-occurrence mining (market-basket / association shape): "
    "within-order part pairs via a self-join on the order key over the "
    "DISTINCT (order, part) projection, support-thresholded. Pair count "
    "per order is basket_size², bounded by order width (max 7 lines in "
    "TPC-H), so the self-join is linear in orders — the same "
    "bucket-bounded-blowup argument as LSH candidate pairs. The distinct "
    "projection and both join sides share one exchange (repartition on "
    "the join key)",
)
def q_part_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    op = (
        l.select("l_orderkey", "l_partkey").distinct().repartition("l_orderkey")
    )
    return (
        op.alias("a")
        .join(
            op.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )


@register(
    "customer_name_fuzzy_pairs",
    oracle="""
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a
    JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    doc="fuzzy-matching (entity-resolution) family: ALL pairs within edit "
    "distance 1, found without an n² join via symmetric-delete blocking "
    "(SymSpell): each name emits itself plus every single-character "
    "deletion as candidate keys; any two strings within distance 1 share "
    "at least one key (substitution at p → both drop p to the same "
    "string; indel → the shorter string IS a deletion of the longer). "
    "Key cardinality grows with n (keys are near-full names), so block "
    "sizes stay O(1) and candidates stay linear — unlike a fixed-arity "
    "block such as a 2-char suffix, whose blocks grow O(n) and "
    "candidates O(n²). Levenshtein verifies candidates only (key-sharers "
    "can be at distance 2); the oracle is the clean brute-force "
    "definition, independent of the blocking scheme",
)
def q_customer_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.operators.fuzzy import fuzzy_pairs

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return fuzzy_pairs(c, "c_custkey", "c_name").select(
        F.col("id_a").alias("cust_a"),
        F.col("id_b").alias("cust_b"),
        "dist",
    )


@register(
    "customer_name_fuzzy_pairs_d2",
    oracle="""
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a
    JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE a.c_nationkey = 3 AND b.c_nationkey = 3
      AND levenshtein(a.c_name, b.c_name) <= 2
    """,
    doc="(r9) fuzzy matching at edit distance <= 2 via ORDER-2 symmetric-"
    "delete blocking: each name emits itself, every 1-deletion, and "
    "every 2-deletion (deletions-of-deletions) as candidate keys; any "
    "two strings within distance 2 share a key (align under an optimal "
    "<=2-op edit script and delete the touched positions from each "
    "side — the remaining common subsequence is a shared order-2 "
    "deletion). ~1+L+L(L-1)/2 keys per string — O(L²) in NAME length, "
    "constant in corpus size, so candidates stay linear at 100 TB; "
    "exact levenshtein verifies candidates (key-sharers can be at "
    "distance up to 4). Scoped to one nation because the synthetic "
    "sequential Customer#-names put every same-hundred id pair within "
    "2 substitutions — the FULL-corpus answer is ~4M pairs at sf0.1 "
    "(true output, not blocking waste; measured 53 s), so the registry "
    "row exercises the operator on the realistic within-partition "
    "entity-resolution shape instead. Oracle is the blocking-"
    "independent brute force over the same slice",
)
def q_customer_name_fuzzy_pairs_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.operators.fuzzy import fuzzy_pairs

    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 3)
        .select("c_custkey", "c_name")
    )
    return fuzzy_pairs(c, "c_custkey", "c_name", max_dist=2).select(
        F.col("id_a").alias("cust_a"),
        F.col("id_b").alias("cust_b"),
        "dist",
    )


import math as _math

from spark_stream_analyzer_spark.functions import texthash as _TH

_BOOT_R = 16
#: Poisson(1) CDF cutpoints, python-computed once and embedded as the
#: SAME double literals in both engines (tail mass beyond k=8 ~ 1.1e-6
#: is clamped into the last bucket — a deterministic, documented bias
#: far below the bootstrap's own resolution)
_POIS_CDF = []
_acc = 0.0
for _k in range(0, 9):
    _acc += _math.exp(-1.0) / _math.factorial(_k)
    _POIS_CDF.append(_acc)


def _pois_case(u_expr: str) -> str:
    """Inverse-CDF Poisson(1) draw as a CASE chain over a [0,1) uniform
    — identical SQL text on both engines (e-notation keeps DuckDB in
    DOUBLE, never DECIMAL)."""
    branches = " ".join(
        f"WHEN ({u_expr}) < {c!r}e0 THEN {k}" for k, c in enumerate(_POIS_CDF[:-1])
    )
    return f"(CASE {branches} ELSE 8 END)"


_BENFORD = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {v!r}e0" for d, v in _BENFORD.items()
) + " END"


@register(
    "orders_benford_audit",
    oracle=f"""
    WITH c AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
               FROM orders),
    g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY digit),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
    SELECT digit, n AS n_orders,
       ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS observed_share,
       ROUND({_BENFORD_CASE}, 6) AS expected_share,
       ROUND((CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * ({_BENFORD_CASE}))
             * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * ({_BENFORD_CASE}))
             / (CAST(total AS DOUBLE) * ({_BENFORD_CASE})), 6) AS chi2_term
    FROM g CROSS JOIN t
    """,
    doc="EXT Benford first-digit audit over order totals — the "
    "fraud/fabrication screen a financial ingest gate runs: observed "
    "first-significant-digit shares vs Benford's law "
    "(log10(1 + 1/d)), with the per-digit chi-square contribution so "
    "a drifted digit names itself. The digit comes from the DECIMAL "
    "STRING of exact integer cents (floor(p*100 + 0.5) — the msum6 "
    "quantization step), never from float log10, whose ulp at exact "
    "powers of ten could split the digit between engines; the Benford "
    "expectations are python-computed double literals embedded in "
    "BOTH engines' expressions (e-notation so DuckDB parses DOUBLE, "
    "not DECIMAL). One map-side-combinable groupBy to 9 rows + a "
    "one-row total broadcast; nothing changes at 100 TB",
)
def q_orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    g = (
        o.select(
            F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    t = g.agg(F.sum("n").cast("long").alias("total"))  # one row
    exp = F.element_at(
        F.create_map(
            *[F.lit(x) for d, v in _BENFORD.items() for x in (d, v)]
        ),
        F.col("digit"),
    )
    n_d, tot_d = F.col("n").cast("double"), F.col("total").cast("double")
    return g.crossJoin(F.broadcast(t)).select(
        "digit",
        F.col("n").alias("n_orders"),
        F.round(n_d / tot_d, 6).alias("observed_share"),
        F.round(exp, 6).alias("expected_share"),
        F.round(
            (n_d - tot_d * exp) * (n_d - tot_d * exp) / (tot_d * exp), 6
        ).alias("chi2_term"),
    )


# The seeded per-(row, replicate) uniform.  Built from the ONE hash60
# helper pair (never inlined — same discipline as q_llm's _DP_U): a
# change to the hash convention must reach every oracle through
# texthash, or the two engines silently split (ADVICE r11).
_BOOT_SEED = "concat('boot:', o_orderkey, ':', rep)"
_BOOT_U_DUCK = f"{_TH.duck_hash60(_BOOT_SEED)} / 1152921504606846976.0"
_BOOT_U_SPARK = f"{_TH.spark_hash60(_BOOT_SEED)} / 1152921504606846976.0"


@register(
    "orders_bootstrap_replicates",
    oracle=f"""
    WITH r AS (SELECT o_orderkey, o_totalprice,
                 unnest(generate_series(0, {_BOOT_R - 1})) AS rep
               FROM orders),
    w AS (SELECT rep, {_pois_case(_BOOT_U_DUCK)} AS w, o_totalprice
          FROM r)
    SELECT CAST(rep AS BIGINT) AS replicate,
       CAST(SUM(w) AS BIGINT) AS n_drawn,
       ROUND({{msum}}, 6) AS boot_total
    FROM w GROUP BY rep
    """.replace("{{msum}}", "{msum}").format(msum=_msum6_sql("w * o_totalprice")),
    doc="EXT Poisson(1) bootstrap replicates over total revenue — "
    f"uncertainty quantification at scale: {_BOOT_R} resamples where "
    "each row's multiplicity in replicate j is an independent "
    "Poisson(1) draw (the streaming-safe bootstrap: multinomial "
    "resampling needs the global row count per draw; Poissonization "
    "decouples rows, so the whole thing is ONE scan x R with NO "
    "coordination — the standard scale-out form). The draw is the "
    "inverse CDF over the seeded md5-60 uniform per (row, replicate) "
    "with python-computed CDF cutpoints embedded as identical double "
    "literals in both engines (tail clamped at k=8, ~1.1e-6 mass — "
    "documented bias far below bootstrap resolution); replicate "
    "totals are msum6 (sum-order-exact), so the output is "
    "bit-deterministic. The row emits the R replicate totals "
    "themselves rather than a second-stage mean/stddev — a 16-value "
    "float variance would reintroduce the very summation-order drift "
    "the rest of the pipeline engineers away; consumers derive CIs "
    "from the replicates. R is the cost knob: work is input x R, "
    "output is R rows",
)
def q_orders_bootstrap_replicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    r = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.expr(f"sequence(0, {_BOOT_R - 1})")).alias("rep"),
    )
    w = F.expr(_pois_case(_BOOT_U_SPARK))
    return (
        r.withColumn("w", w)
        .groupBy(F.col("rep").cast("long").alias("replicate"))
        .agg(
            F.sum("w").cast("long").alias("n_drawn"),
            F.round(msum6(F.col("w") * F.col("o_totalprice")), 6).alias(
                "boot_total"
            ),
        )
    )


@register(
    "customer_entity_resolution",
    oracle="""
    WITH RECURSIVE c AS (SELECT c_custkey, c_name, c_acctbal FROM customer
                         WHERE c_nationkey = 3),
    p AS (SELECT a.c_custkey AS pa, b.c_custkey AS pb
          FROM c a JOIN c b ON a.c_custkey < b.c_custkey
          WHERE levenshtein(a.c_name, b.c_name) <= 1),
    edges AS (SELECT pa AS a, pb AS b FROM p UNION SELECT pb, pa FROM p),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (SELECT id, id AS r FROM nodes
              UNION
              SELECT e.b AS id, rr.r FROM reach rr JOIN edges e ON e.a = rr.id),
    lab AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    al AS (SELECT c.c_custkey, c.c_acctbal,
                  COALESCE(lab.cluster_id, c.c_custkey) AS cluster_id
           FROM c LEFT JOIN lab ON lab.id = c.c_custkey),
    canon AS (SELECT cluster_id, c_custkey AS canonical_id FROM (
        SELECT *, row_number() OVER (PARTITION BY cluster_id
              ORDER BY c_acctbal DESC, c_custkey) AS rn FROM al) WHERE rn = 1),
    sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM al GROUP BY cluster_id)
    SELECT al.c_custkey, al.cluster_id, canon.canonical_id,
           sizes.cluster_size,
           CAST(al.c_custkey = canon.canonical_id AS INT) AS is_canonical
    FROM al JOIN canon USING (cluster_id) JOIN sizes USING (cluster_id)
    """,
    doc="EXT entity resolution end-to-end — the MDM pipeline composed "
    "from the registry's own verified stages: symmetric-delete "
    "blocking + exact-levenshtein pair verification "
    "(operators/fuzzy.py, never n²), connected components over the "
    "match pairs (operators/dedup.py min-label propagation with path "
    "doubling — the synthetic sequential names make transitive "
    "closure REAL here: digit-substitution chains merge far-apart "
    "ids), then survivorship: per cluster the max-acctbal record wins "
    "(tie → min custkey) — the 'most valuable record' rule, a "
    "struct-ordered argmax, no per-cluster window over the corpus. "
    "Unmatched customers stay their own singleton cluster via the "
    "left join. Scoped to one nation (the within-partition ER shape, "
    "same rationale as customer_name_fuzzy_pairs_d2); the oracle is "
    "blocking-independent brute force + recursive-CTE closure",
)
def q_customer_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.operators.fuzzy import fuzzy_pairs

    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 3)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    pairs = fuzzy_pairs(c, "c_custkey", "c_name", max_dist=1)
    return _er_resolve(c, pairs)


def _er_resolve(c: DataFrame, pairs: DataFrame) -> DataFrame:
    """Shared ER tail: connected components over the match pairs, then
    survivorship — per cluster the max-acctbal record wins (tie → min
    custkey), a struct-ordered argmax with no per-cluster window.
    Unmatched customers stay their own singleton cluster via the left
    join.  ``c``: (c_custkey, c_acctbal, ...); ``pairs``: (id_a, id_b)."""
    from spark_stream_analyzer_spark.operators import dedup

    lab = dedup.duplicate_clusters(pairs, id_a="id_a", id_b="id_b").select(
        F.col("doc_id").alias("c_custkey"), "cluster_id"
    )
    al = c.join(lab, "c_custkey", "left").select(
        "c_custkey",
        "c_acctbal",
        F.coalesce("cluster_id", F.col("c_custkey")).alias("cluster_id"),
    )
    per_cluster = al.groupBy("cluster_id").agg(
        # struct-ordered argmax: highest balance, then lowest custkey
        F.max(
            F.struct(
                F.col("c_acctbal").alias("b"), (-F.col("c_custkey")).alias("ni")
            )
        ).alias("_m"),
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
    )
    canon = per_cluster.select(
        "cluster_id",
        (-F.col("_m.ni")).cast("long").alias("canonical_id"),
        "cluster_size",
    )
    return al.join(canon, "cluster_id").select(
        "c_custkey",
        "cluster_id",
        "canonical_id",
        "cluster_size",
        (F.col("c_custkey") == F.col("canonical_id")).cast("int").alias(
            "is_canonical"
        ),
    )


#: attribute-agreement window for the UNSCOPED ER rule: a name near-match
#: only counts as the same entity when the balances also agree.  Without
#: it, distance-1 over TPC-H's sequential digit names chains the ENTIRE
#: table into one mega-cluster (measured at sf0.01: 1500 nodes, 1
#: cluster) — formally correct but a useless resolution and a
#: quadratic-ish closure for the oracle.  The composite rule is also the
#: realistic MDM shape: fuzzy key + attribute corroboration.
_ER_BAL_TOL = 100.0


@register(
    "customer_entity_resolution_full",
    oracle=f"""
    WITH RECURSIVE c AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
    p AS (SELECT a.c_custkey AS pa, b.c_custkey AS pb
          FROM c a JOIN c b ON a.c_custkey < b.c_custkey
          WHERE levenshtein(a.c_name, b.c_name) <= 1
            AND abs(a.c_acctbal - b.c_acctbal) <= {_ER_BAL_TOL}),
    edges AS (SELECT pa AS a, pb AS b FROM p UNION SELECT pb, pa FROM p),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (SELECT id, id AS r FROM nodes
              UNION
              SELECT e.b AS id, rr.r FROM reach rr JOIN edges e ON e.a = rr.id),
    lab AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    al AS (SELECT c.c_custkey, c.c_acctbal,
                  COALESCE(lab.cluster_id, c.c_custkey) AS cluster_id
           FROM c LEFT JOIN lab ON lab.id = c.c_custkey),
    canon AS (SELECT cluster_id, c_custkey AS canonical_id FROM (
        SELECT *, row_number() OVER (PARTITION BY cluster_id
              ORDER BY c_acctbal DESC, c_custkey) AS rn FROM al) WHERE rn = 1),
    sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM al GROUP BY cluster_id)
    SELECT al.c_custkey, al.cluster_id, canon.canonical_id,
           sizes.cluster_size,
           CAST(al.c_custkey = canon.canonical_id AS INT) AS is_canonical
    FROM al JOIN canon USING (cluster_id) JOIN sizes USING (cluster_id)
    """,
    doc="EXT entity resolution UNSCOPED — the r11 verdict's ask: the same "
    "MDM pipeline over the FULL customer table, proving the end-to-end "
    "shape does not quietly rely on the nation filter. Blocking is the "
    "published knob (symmetric-delete deletion keys, hash-bucketed by "
    "construction — operators/fuzzy.py); the match rule is composite: "
    "name levenshtein <= 1 AND |acctbal delta| <= 100 (fuzzy key + "
    "attribute corroboration, the realistic MDM rule — and the reason "
    "the graph has real structure instead of one sequential-name "
    "mega-chain; see _ER_BAL_TOL). The balance predicate rides the "
    "blocked candidate pairs (never n²), CC is min-label path doubling, "
    "survivorship the struct-ordered max-balance argmax. The oracle is "
    "blocking-independent brute force + recursive-CTE closure. At "
    "100 TB: candidates stay linear (deletion-key blocks are O(1) — "
    "fuzzy.py's cardinality argument), CC is the bounded-round "
    "path-doubling loop with lineage cuts, survivorship one shuffle",
)
def q_customer_entity_resolution_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.operators.fuzzy import fuzzy_pairs

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    cand = fuzzy_pairs(c, "c_custkey", "c_name", max_dist=1)
    # attribute corroboration on the BLOCKED candidates only: two
    # broadcast-size lookups of (key, balance) — at fact scale these are
    # plain equality joins on the pair ids, still linear in candidates
    bal_a = c.select(F.col("c_custkey").alias("id_a"), F.col("c_acctbal").alias("_ba"))
    bal_b = c.select(F.col("c_custkey").alias("id_b"), F.col("c_acctbal").alias("_bb"))
    pairs = (
        cand.join(bal_a, "id_a")
        .join(bal_b, "id_b")
        .filter(F.abs(F.col("_ba") - F.col("_bb")) <= _ER_BAL_TOL)
        .select("id_a", "id_b")
    )
    return _er_resolve(c, pairs)


@register(
    "part_pagerank",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    half AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             FROM op a JOIN op b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING COUNT(*) >= 3),
    edges AS (SELECT pa AS src, pb AS dst FROM half
              UNION ALL SELECT pb, pa FROM half),
    deg AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n_nodes FROM deg),
    pr0 AS (SELECT src, degree, ROUND(1.0 / n_nodes, 6) AS pr
            FROM deg CROSS JOIN nn),
    c1 AS (SELECT e.dst, SUM(p.pr / p.degree) AS s
           FROM edges e JOIN pr0 p ON e.src = p.src GROUP BY e.dst),
    pr1 AS (SELECT d.src, d.degree,
                   ROUND(0.15 / nn.n_nodes + 0.85 * coalesce(c1.s, 0), 6) AS pr
            FROM deg d CROSS JOIN nn LEFT JOIN c1 ON c1.dst = d.src),
    c2 AS (SELECT e.dst, SUM(p.pr / p.degree) AS s
           FROM edges e JOIN pr1 p ON e.src = p.src GROUP BY e.dst),
    pr2 AS (SELECT d.src, d.degree,
                   ROUND(0.15 / nn.n_nodes + 0.85 * coalesce(c2.s, 0), 6) AS pr
            FROM deg d CROSS JOIN nn LEFT JOIN c2 ON c2.dst = d.src)
    SELECT src AS part_key, CAST(degree AS BIGINT) AS degree, pr FROM pr2
    """,
    doc="iterative graph algorithm, Spark-first: 2 fixed PageRank "
    "iterations (d=0.85) over the part co-occurrence graph. Each "
    "iteration is one equality join (edges x ranks on src) + one "
    "aggregation (contributions by dst) — the standard distributed "
    "PageRank step, no driver loop over data, the node-count constant "
    "rides a one-row broadcast. Ranks are ROUNDED to 6 decimals each "
    "iteration on both engines, so summation-order drift cannot "
    "compound across iterations. At 100 TB: per-iteration cost is one "
    "shuffle of the edge list; convergence loops would wrap the same "
    "step with localCheckpoint lineage cuts like dedup_duplicate_clusters",
)
def q_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    op = l.select("l_orderkey", "l_partkey").distinct()
    half = (
        op.alias("a")
        .join(
            op.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 3)
    )
    edges = half.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionByName(
        half.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    # materialize the edge list ONCE: degree, and both iterations' joins,
    # each consume it — without pinning, the distinct + self-join +
    # co-occurrence filter recomputes per consumer (~5x; measured 9s -> 3s
    # at sf0.1). Cluster-safe persist (functions.materialize) — lineage
    # kept so a lost executor recomputes its blocks; reclaimed by the
    # caller's post-collect sweep (bench.py)
    edges = materialize(edges)
    deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
    nn = deg.agg(F.count("*").alias("n_nodes"))  # one row
    pr = deg.crossJoin(F.broadcast(nn)).select(
        "src",
        "degree",
        "n_nodes",
        F.round(F.lit(1.0) / F.col("n_nodes"), 6).alias("pr"),
    )
    for _ in range(2):
        contrib = (
            edges.join(
                pr.select("src", (F.col("pr") / F.col("degree")).alias("c")), "src"
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            pr.select("src", "degree", "n_nodes")
            .join(contrib, F.col("src") == F.col("dst"), "left")
            .select(
                "src",
                "degree",
                "n_nodes",
                F.round(
                    F.lit(0.15) / F.col("n_nodes")
                    + F.lit(0.85) * F.coalesce("s", F.lit(0.0)),
                    6,
                ).alias("pr"),
            )
        )
    return pr.select(
        F.col("src").alias("part_key"),
        F.col("degree").cast("long").alias("degree"),
        "pr",
    )


# ------------------------------------------------- round-4 additions


@register(
    "tpch_forecast_revenue_q6",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 6) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 (forecasting revenue change): the canonical "
    "scan-only aggregate — every predicate (shipdate range, discount "
    "band, quantity cap) is a plain column comparison that must reach "
    "the parquet scan as PushedFilters, no join, no shuffle beyond the "
    "final 1-row agg merge. The floor for any 100 TB engine: this "
    "query's cost is exactly (bytes scanned after pruning) / "
    "(scan throughput), so it doubles as the io-path benchmark",
)
def q_tpch_forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            round6(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "orders_pareto_share",
    oracle="""
    WITH c AS (
      SELECT o_custkey, ROUND(SUM(o_totalprice), 6) AS spend
      FROM orders GROUP BY o_custkey),
    t AS (SELECT ROUND(SUM(spend), 6) AS total FROM c),
    r AS (
      SELECT o_custkey, spend,
             CAST(row_number() OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS rnk,
             SUM(spend) OVER (ORDER BY spend DESC, o_custkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM c)
    SELECT o_custkey, spend, rnk,
           ROUND(cum / (SELECT total FROM t), 6) AS cum_share
    FROM r WHERE rnk <= 100
    """,
    doc="EXT Pareto / concentration analysis: top-100 customers by "
    "lifetime spend with their CUMULATIVE share of total revenue (the "
    "80/20 curve every revenue team asks for). Shape: fact aggregates "
    "to one row per customer FIRST (map-side partials, one shuffle), "
    "so the global sort + running sum act on the bounded per-customer "
    "table, never the fact. Spend is rounded to 6 BEFORE ranking so "
    "cross-engine partial-sum drift cannot reorder ties (tie-break "
    "custkey); the running sum then adds identical doubles in an "
    "identical order on both engines. At 100 TB the per-customer table "
    "is ~1e8 rows — (r9) the top-100 is an explicit orderBy+limit, which "
    "Spark plans as TakeOrderedAndProject (per-partition top-k, then a "
    "100-row merge on one task — no full sort, no SinglePartition "
    "exchange); rnk and the running sum are windows over THAT bounded "
    "100-row result, and the share denominator is a one-row broadcast",
)
def q_orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(round6(F.sum("o_totalprice")).alias("spend"))
    total = c.agg(round6(F.sum("spend")).alias("total"))
    top = c.orderBy(F.desc("spend"), F.asc("o_custkey")).limit(100)
    w = Window.orderBy(F.desc("spend"), F.asc("o_custkey"))
    r = top.select(
        "o_custkey",
        "spend",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.sum("spend")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    return r.join(F.broadcast(total)).select(
        "o_custkey",
        "spend",
        "rnk",
        round6(F.col("cum") / F.col("total")).alias("cum_share"),
    )


@register(
    "orders_priority_status_contingency",
    oracle="""
    WITH obs AS (
      SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2),
    m AS (
      SELECT o_orderpriority, o_orderstatus, n,
             SUM(n) OVER (PARTITION BY o_orderpriority) AS row_tot,
             SUM(n) OVER (PARTITION BY o_orderstatus)  AS col_tot,
             SUM(n) OVER () AS grand_tot
      FROM obs)
    SELECT o_orderpriority, o_orderstatus, n,
           ROUND(row_tot * col_tot / CAST(grand_tot AS DOUBLE), 6) AS expected,
           ROUND(n / (row_tot * col_tot / CAST(grand_tot AS DOUBLE)), 6) AS lift
    FROM m
    """,
    doc="EXT contingency-table / independence QA: observed counts per "
    "(priority x status) cell vs the expected count under independence "
    "(row_total * col_total / grand_total) and the lift ratio — the "
    "chi-square ingredient every data-QA gate computes to catch "
    "attribute drift. Shape: ONE fact shuffle to the bounded 15-cell "
    "table; the three marginal sums are windows OVER THAT table (15 "
    "rows), never a second pass over the fact. Exact integer counts; "
    "the only doubles are the final two derived columns, rounded",
)
def q_orders_priority_status_contingency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    obs = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n")
    )
    wr = Window.partitionBy("o_orderpriority")
    wc = Window.partitionBy("o_orderstatus")
    wg = Window.partitionBy()
    exp = (
        F.sum("n").over(wr) * F.sum("n").over(wc) / F.sum("n").over(wg).cast("double")
    )
    return obs.select(
        "o_orderpriority",
        "o_orderstatus",
        "n",
        round6(exp).alias("expected"),
        round6(F.col("n") / exp).alias("lift"),
    )


@register(
    "lineitem_shipping_delay_bands",
    oracle="""
    SELECT o.o_orderpriority,
           CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) < 30 THEN '0-29d'
                WHEN datediff('day', o.o_orderdate, l.l_shipdate) < 90 THEN '30-89d'
                ELSE '90d+' END AS delay_band,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(AVG(CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS DOUBLE)), 6)
             AS avg_delay_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
    doc="EXT fulfillment-delay profile: lineitem joined BACK to orders "
    "(the fact-to-fact equi-join on orderkey — the join class that "
    "dominates 100 TB star schemas when the dimension stops fitting in "
    "a broadcast), delay = shipdate - orderdate banded to 3 buckets, "
    "rolled up per priority. At scale both sides shuffle on orderkey "
    "(or better, are bucketed on it at write time — see "
    "sources/layout.py); the band CASE is a scan-side expression so "
    "only (priority, band) pairs reach the final 15-row agg. Integer "
    "datediff — no float drift anywhere until the final avg, rounded",
)
def q_lineitem_shipping_delay_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(delay < 30, "0-29d").when(delay < 90, "30-89d").otherwise("90d+")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "o_orderpriority",
            band.alias("delay_band"),
            delay.cast("double").alias("delay_days"),
        )
        .groupBy("o_orderpriority", "delay_band")
        .agg(
            F.count("*").alias("n_lines"),
            round6(F.avg("delay_days")).alias("avg_delay_days"),
        )
    )


@register(
    "supplier_balance_deciles",
    oracle="""
    WITH d AS (
      SELECT s_acctbal,
             CAST(ntile(10) OVER (ORDER BY s_acctbal, s_suppkey) AS BIGINT) AS decile
      FROM supplier)
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(MIN(s_acctbal), 6) AS min_bal,
           ROUND(MAX(s_acctbal), 6) AS max_bal,
           ROUND(AVG(s_acctbal), 6) AS avg_bal
    FROM d GROUP BY decile
    """,
    doc="EXT equal-frequency decile profile over a dimension: ntile(10) "
    "on account balance (tie-break suppkey so bucket boundaries are "
    "deterministic cross-engine), then per-decile min/max/avg — the "
    "classic risk-banding report. (r9) supplier is 1e4 x SF rows, which "
    "at 100 TB is ~1e9 — not single-reducer territory — so the ntile "
    "runs through operators.rank.global_ntile (range shuffle + "
    "partitioned window + broadcast offsets), identical answers with "
    "no Exchange SinglePartition at any SF",
)
def q_supplier_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    d = global_ntile(
        s.select("s_acctbal", "s_suppkey"),
        [F.asc("s_acctbal"), F.asc("s_suppkey")],
        10,
        tile_col="decile",
    ).select("s_acctbal", F.col("decile").cast("long").alias("decile"))
    return d.groupBy("decile").agg(
        F.count("*").alias("n_suppliers"),
        round6(F.min("s_acctbal")).alias("min_bal"),
        round6(F.max("s_acctbal")).alias("max_bal"),
        round6(F.avg("s_acctbal")).alias("avg_bal"),
    )


@register(
    "customer_order_gap_stats",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             datediff('day',
                      lag(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey),
                      o_orderdate) AS gap_days
      FROM orders),
    k AS (SELECT o_custkey, gap_days FROM g WHERE gap_days IS NOT NULL)
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(AVG(CAST(gap_days AS DOUBLE)), 6) AS avg_gap_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
    FROM k JOIN customer c ON k.o_custkey = c.c_custkey
    GROUP BY 1
    """,
    doc="EXT inter-purchase-interval features: per-customer consecutive "
    "order gaps via lag over (custkey, orderdate, orderkey-tiebreak) — "
    "ONE shuffle+sort keyed on custkey — then the gap rows roll up per "
    "market segment through a broadcast customer join. The purchase-"
    "cadence feature every churn model starts from. Gaps are integer "
    "day counts (no tz, no float) until the final avg, rounded",
)
def q_customer_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "gap_days"
        ),
    ).filter(F.col("gap_days").isNotNull())
    return (
        g.join(F.broadcast(c), g.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_gaps"),
            round6(F.avg(F.col("gap_days").cast("double"))).alias("avg_gap_days"),
            F.max("gap_days").cast("long").alias("max_gap_days"),
        )
    )


@register(
    "part_triangle_count",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    tri AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM e e1
      JOIN e e2 ON e1.pb = e2.pa
      JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    pt AS (
      SELECT a AS part FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT part, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM pt GROUP BY part
    """,
    doc="EXT graph triangle counting (clustering-coefficient numerator) "
    "over the part co-occurrence graph: support-thresholded edges are "
    "oriented part_a < part_b, so each triangle {a<b<c} is enumerated "
    "exactly once by joining wedge (a→b, b→c) against closing edge "
    "(a→c). Orientation is the scale trick — on an oriented graph every "
    "node's out-degree is bounded by its higher-id neighbors, so the "
    "wedge join is Σ out-deg² (the compact-forward algorithm), never "
    "the unoriented Σ deg²; edges themselves come from the same "
    "basket-bounded co-occurrence join as part_cooccurrence_pairs. "
    "Three equality joins on partkeys — all shuffle-hash/sort-merge "
    "friendly, no cartesian anywhere",
)
def q_part_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    op = l.select("l_orderkey", "l_partkey").distinct().repartition("l_orderkey")
    # the oriented edge list joins against itself THREE times below;
    # without materialization each side re-runs the distinct + basket
    # self-join from the raw fact (round-6 plan audit: 18 lineitem
    # scans). Cluster-safe persist (functions.materialize, the
    # pagerank-edges idiom two queries up) pins it to one computation —
    # at 100 TB the edge list is support-thresholded and graph-sized,
    # not fact-sized
    e = materialize(
        op.alias("a")
        .join(
            op.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .select("pa", "pb")
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e.alias("e3"),
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("a"),
            F.col("e1.pb").alias("b"),
            F.col("e2.pb").alias("c"),
        )
    )
    # one explode instead of a 3-way union of tri (which would triple
    # the whole wedge-join subtree): each triangle contributes its three
    # corners from a single enumeration
    pt = tri.select(F.explode(F.array("a", "b", "c")).alias("part"))
    return pt.groupBy("part").agg(F.count("*").alias("n_triangles"))


@register(
    "revenue_grouping_sets",
    oracle=f"""
    WITH l AS (
      SELECT l_returnflag, l_linestatus,
             CAST(floor(l_quantity / 10) AS BIGINT) AS qband,
             l_extendedprice
      FROM lineitem
    )
    SELECT l_returnflag, l_linestatus, qband,
           CAST(GROUPING(l_returnflag, l_linestatus, qband) AS BIGINT) AS gid,
           ROUND({_msum6_sql("l_extendedprice")}, 6)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM l
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag, qband),
                            (qband),
                            ())
    """,
    doc="arbitrary GROUPING SETS (completes the family beyond "
    "ROLLUP/CUBE): four NON-hierarchical slices — (flag,status), "
    "(flag,qband), (qband), grand total — in ONE pass with grouping_id "
    "disambiguating which slice a row belongs to (Spark's bit order "
    "matches DuckDB's GROUPING(): leftmost column = MSB, 1 = "
    "aggregated-away). Physically a single Expand over the scan feeding "
    "one partial+final aggregation — at 100 TB that is 4 slice rows per "
    "input row map-side-combined, versus four separate scans+shuffles "
    "if the slices ran as independent queries",
)
def q_revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.floor(F.col("l_quantity") / 10).alias("qband"),
        "l_extendedprice",
    )
    return l.groupingSets(
        [
            ["l_returnflag", "l_linestatus"],
            ["l_returnflag", "qband"],
            ["qband"],
            [],
        ],
        "l_returnflag",
        "l_linestatus",
        "qband",
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        round6(msum6(F.col("l_extendedprice"))).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "revenue_yoy_growth",
    oracle=f"""
    WITH y AS (
      SELECT year(l_shipdate) AS yr,
             {_msum6_sql("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(yr AS BIGINT) AS yr, ROUND(revenue, 6) AS revenue,
           ROUND(revenue - LAG(revenue) OVER (ORDER BY yr), 6) AS delta,
           ROUND(CASE WHEN LAG(revenue) OVER (ORDER BY yr) > 0
                 THEN (revenue - LAG(revenue) OVER (ORDER BY yr))
                      / LAG(revenue) OVER (ORDER BY yr) END, 6) AS growth
    FROM y
    """,
    doc="year-over-year growth: the fact collapses to a |years|-row "
    "series (partial agg does all the work map-side), then LAG over the "
    "tiny series computes deltas/growth — the standard BI trend shape. "
    "Revenue is an integer-micro-unit exact sum (msum6) so both engines divide "
    "identical operands; year() runs on a TIMESTAMP_NTZ column, which "
    "is wall-clock (session-timezone-free) by construction",
)
def q_revenue_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    y = l.groupBy(F.year("l_shipdate").cast("long").alias("yr")).agg(
        msum6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    w = Window.orderBy("yr")
    prev = F.lag("revenue").over(w)
    return y.select(
        "yr",
        round6(F.col("revenue")).alias("revenue"),
        round6(F.col("revenue") - prev).alias("delta"),
        round6(
            F.when(prev > 0, (F.col("revenue") - prev) / prev)
        ).alias("growth"),
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, frequency, monetary,
             ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r,
             ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f,
             ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m
      FROM base
    )
    SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
           CAST(m AS BIGINT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(monetary) AS DOUBLE), 6) AS segment_monetary
    FROM scored GROUP BY r, f, m
    """,
    doc="RFM segmentation (recency/frequency/monetary quartiles): the "
    "classic customer-value grid every CRM pipeline derives. Per-key "
    "aggregation shrinks the fact to one row per customer; (r9) the "
    "three quartile scores run through operators.rank.global_ntile — "
    "one range shuffle + partitioned window + broadcast offsets each, "
    "never an Exchange SinglePartition over the customer table — so "
    "the same plan survives a 1e9-customer table; monetary stays "
    "DECIMAL through the ranking and custkey tie-breaks are explicit, "
    "so quartile boundaries land identically on both engines at any SF",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # monetary stays DECIMAL through the quartile ranking: a rounded
    # double sum flipped quartile BOUNDARIES at sf0.1 (rank on a value
    # that differs in the last ulp reorders customers)
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    scored = global_ntile(
        base, [F.desc("last_order"), F.asc("o_custkey")], 4, tile_col="r"
    )
    scored = global_ntile(
        scored, [F.desc("frequency"), F.asc("o_custkey")], 4, tile_col="f"
    )
    scored = global_ntile(
        scored, [F.desc("monetary"), F.asc("o_custkey")], 4, tile_col="m"
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").alias("n_customers"),
        round6(F.sum("monetary").cast("double")).alias("segment_monetary"),
    )


# --------------------------------------------------------------------------
# round-6 additions: ingest-integrity + non-equi dim join families
# --------------------------------------------------------------------------

_FK_EDGES = (
    # (edge label, child table, child key, parent table, parent key)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
)


@register(
    "tpch_fk_integrity_audit",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{label}' AS edge,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE p.__pk IS NULL) AS BIGINT) AS n_orphans
    FROM {child} c
    LEFT JOIN (SELECT DISTINCT {pkey} AS __pk FROM {parent}) p
      ON c.{ckey} = p.__pk
    """
        for label, child, ckey, parent, pkey in _FK_EDGES
    ),
    doc="EXT referential-integrity audit (ingest QA): every FK edge of "
    "the star schema checked in one result table — per edge, child "
    "cardinality + orphan count via a left join against the DISTINCT "
    "parent key spine. The operation a 100 TB ingest runs after every "
    "load: each edge is ONE key-projected join (Catalyst/AQE "
    "broadcasts the dim-sized spines — region/nation/supplier — and "
    "shuffle-joins the fact-to-fact edges on the key, the same "
    "physical split as the TPC-H joins themselves); key projection "
    "means only the join column is ever read from the child scan",
)
def q_tpch_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for label, child, ckey, parent, pkey in _FK_EDGES:
        c = _t(spark, sf_dir, child).select(F.col(ckey).alias("__ck"))
        p = _t(spark, sf_dir, parent).select(F.col(pkey).alias("__pk")).distinct()
        parts.append(
            c.join(p, F.col("__ck") == F.col("__pk"), "left").agg(
                F.lit(label).alias("edge"),
                F.count("*").alias("n_rows"),
                F.sum(
                    F.when(F.col("__pk").isNull(), 1).otherwise(0)
                ).cast("long").alias("n_orphans"),
            )
        )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


#: price-tier dimension for the broadcast range join — a literal table,
#: the shape of every band/bucket lookup dim (rate cards, SLA tiers,
#: bucket boundaries) that equality joins cannot express
_PRICE_TIERS = (
    ("budget", 0.0, 10_000.0),
    ("mid", 10_000.0, 30_000.0),
    ("premium", 30_000.0, 60_000.0),
    ("luxury", 60_000.0, 1e18),
)


@register(
    "lineitem_price_tier_rangejoin",
    oracle=f"""
    WITH tiers(tier, lo, hi) AS (VALUES
      {", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in _PRICE_TIERS)})
    SELECT t.tier,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND({_msum6_sql("l.l_extendedprice")}, 6) AS sum_price
    FROM lineitem l
    JOIN tiers t ON l.l_extendedprice >= t.lo AND l.l_extendedprice < t.hi
    GROUP BY t.tier
    """,
    doc="EXT non-equi dim join (range/band join): each fact row joins "
    "the tier whose [lo, hi) interval contains its price. Equality "
    "joins cannot express interval containment; the scale answer for "
    "a BOUNDED band dim is an explicit broadcast nested-loop join — "
    "the fact NEVER shuffles (no exchange on the fact side; each "
    "partition scans the 4-row broadcast per row), unlike a "
    "sort-merge range join which would exchange 100 TB to sort it. "
    "Aggregation then reuses the scan: partial map-side agg on the "
    "tier label, one |tiers|-row merge. Sums are msum6-exact",
)
def q_lineitem_price_tier_rangejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    tiers = F.broadcast(
        li.sparkSession.createDataFrame(
            list(_PRICE_TIERS), "tier string, lo double, hi double"
        )
    )
    joined = li.join(
        tiers,
        (F.col("l_extendedprice") >= F.col("lo"))
        & (F.col("l_extendedprice") < F.col("hi")),
    )
    return joined.groupBy("tier").agg(
        F.count("*").alias("n_items"),
        round6(msum6(F.col("l_extendedprice"))).alias("sum_price"),
    )


@register(
    "orders_salted_customer_join",
    oracle=f"""
    SELECT c_mktsegment AS mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND({_msum6_sql("o_totalprice")}, 6) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
    doc="EXT salted fact⋈dim join as a driver row (r7; previously "
    "tests-only in functions/skew.py): the explicit hot-key fallback "
    "for the case AQE's skew splitting cannot reach — one mega-key "
    "against a broadcast-too-big dim. Each fact row gets ONE salt from "
    "a content hash (task-retry stable), the dim replicates across all "
    "salts, the join runs on (key, salt) so a hot key's rows spread "
    "over n_salt tasks instead of one straggler; results are EXACTLY a "
    "plain join's (the oracle IS the plain join), revenue msum6-exact. "
    "At 100 TB: dim replication costs n_salt×|dim| shuffle rows — "
    "bounded and chosen, vs an unbounded straggler",
)
def q_orders_salted_customer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.functions.skew import salted_join

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = salted_join(o, c, on="o_custkey", n_salt=8)
    return j.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count("*").cast("long").alias("n_orders"),
        round6(msum6(F.col("o_totalprice"))).alias("revenue"),
    )


def _cdc_changes(o: DataFrame) -> DataFrame:
    """Deterministic change log synthesized from the base orders frame:
    upserts (+100.00 on keys %7=0, seq 1), deletes (%11=3, seq 2 — beat
    the update on keys hit by both), inserts (key+1e11, status 'N',
    seq 1). Columns: (k, seq, op, cust, status, price)."""
    k = F.col("o_orderkey")
    upd = o.filter(k % 7 == 0).select(
        k.alias("k"),
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
        (F.col("o_totalprice") + F.lit(100.0)).alias("price"),
    )
    dele = o.filter(k % 11 == 3).select(
        k.alias("k"),
        F.lit(2).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("long").alias("cust"),
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("double").alias("price"),
    )
    ins = o.filter(k % 13 == 5).select(
        (k + F.lit(100_000_000_000)).alias("k"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.col("o_custkey").alias("cust"),
        F.lit("N").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    return upd.unionByName(dele).unionByName(ins)


def _apply_latest_changes(base: DataFrame, changes: DataFrame) -> DataFrame:
    """MERGE INTO semantics over plain frames: compact ``changes``
    (k/seq/op/cust/status/price) to latest-per-key (window over the
    DELTA only — O(delta), never the base), apply in ONE full-outer
    join against ``base`` (o_orderkey/o_custkey/o_orderstatus/
    o_totalprice): coalesce picks changed values, 'D' rows drop,
    unmatched inserts survive the outer side."""
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    latest = (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "seq")
    )
    merged = base.join(latest, base.o_orderkey == latest.k, "full_outer")
    return merged.filter(F.col("op").isNull() | (F.col("op") != "D")).select(
        F.coalesce("k", "o_orderkey").alias("o_orderkey"),
        F.coalesce("cust", "o_custkey").alias("cust"),
        F.coalesce("status", "o_orderstatus").alias("status"),
        F.coalesce("price", "o_totalprice").alias("price"),
    )


def _cdc_merged_snapshot(o: DataFrame) -> DataFrame:
    """The CDC merge shared by the merge-apply and transactional-publish
    rows: synthesized change log → latest-per-key → full-outer apply."""
    return _apply_latest_changes(o, _cdc_changes(o))



@register(
    "orders_cdc_merge_apply",
    oracle=f"""
    WITH changes AS (
      SELECT o_orderkey AS k, 1 AS seq, 'U' AS op, o_custkey AS cust,
             o_orderstatus AS status, o_totalprice + 100.0 AS price
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'D', NULL, NULL, NULL
      FROM orders WHERE o_orderkey % 11 = 3
      UNION ALL
      SELECT o_orderkey + 100000000000, 1, 'I', o_custkey, 'N', o_totalprice
      FROM orders WHERE o_orderkey % 13 = 5
    ),
    latest AS (
      SELECT k, op, cust, status, price
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) rn
            FROM changes)
      WHERE rn = 1
    ),
    merged AS (
      SELECT COALESCE(c.k, b.o_orderkey) AS k,
             COALESCE(c.cust, b.o_custkey) AS cust,
             COALESCE(c.status, b.o_orderstatus) AS status,
             COALESCE(c.price, b.o_totalprice) AS price,
             c.op AS op
      FROM orders b FULL OUTER JOIN latest c ON b.o_orderkey = c.k
    )
    SELECT status AS o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND({{M}}, 6) AS price_msum6
    FROM merged WHERE op IS NULL OR op <> 'D'
    GROUP BY status
    """.format(M=_msum6_sql("price")),
    doc="EXT CDC merge-apply (r7) — MERGE INTO semantics without an ACID "
    "table format, the update path every parquet-based 100 TB lake "
    "needs: a change log carrying multi-version upserts, deletes and "
    "inserts (synthesized deterministically from orders: +100.00 "
    "price updates on keys %7=0, deletes on %11=3 — which BEAT the "
    "seq-1 update on keys hit by both, inserts as key+1e11 (clear of any clone-offset keyspace) with status "
    "'N') is first COMPACTED to latest-change-per-key (row_number "
    "over seq desc — the argmax discipline, window over the delta "
    "only, never the base), then applied in ONE full-outer join "
    "against the base: coalesce picks changed values, 'D' rows drop, "
    "unmatched inserts survive the outer side. At 100 TB the "
    "compaction windows O(delta) rows and the apply is one key-"
    "partitioned shuffle of base+delta (when delta is broadcast-"
    "small the U/D half degenerates to a map-side hash join; the "
    "full-outer form is the general case and what AQE picks from "
    "runtime sizes). Per-status counts + msum6-exact totals pin all "
    "three op paths: status 'N' exists only if inserts landed, "
    "deleted keys shrink counts, updated prices shift the sum",
)

def q_orders_cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    final = _cdc_merged_snapshot(o)
    return final.groupBy(F.col("status").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(msum6(F.col("price")), 6).alias("price_msum6"),
    )


@register(
    "orders_scd2_dimension_history",
    oracle=f"""
    WITH versions AS (
      SELECT o_orderkey, 1 AS version, o_totalprice AS price FROM orders
      UNION ALL
      SELECT o_orderkey, 2, o_totalprice + 100.0
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, 3, o_totalprice + 200.0
      FROM orders WHERE o_orderkey % 11 = 3
    )
    SELECT o_orderkey, CAST(version AS BIGINT) AS version,
           ROUND(price, 6) AS price,
           CAST(version * 1000 AS BIGINT) AS effective_from,
           CAST(LEAD(version) OVER (PARTITION BY o_orderkey ORDER BY version)
                * 1000 AS BIGINT) AS effective_to,
           CAST(CASE WHEN LEAD(version) OVER (PARTITION BY o_orderkey
                                              ORDER BY version) IS NULL
                     THEN 1 ELSE 0 END AS INT) AS is_current
    FROM versions
    WHERE o_orderkey % 5 = 0
    """,
    doc="EXT SCD Type 2 dimension history (r8) — the OTHER lake update "
    "pattern beside MERGE-as-latest (orders_cdc_merge_apply keeps only "
    "the current row; SCD2 keeps every version with validity "
    "intervals): base rows (v1) plus two deterministic change waves "
    "(v2 on keys %7=0, v3 on %11=3 — keys divisible by both get a "
    "3-version chain) are append-unioned, and ONE key-partitioned "
    "lead() window derives effective_from/effective_to/is_current — "
    "interval-close by looking at the NEXT version, never an in-place "
    "update. At 100 TB this is append-only: the window shuffles on "
    "the dimension key (bounded per-key chains, no global sort) and "
    "history rewrites never touch existing files. Full per-row "
    "history emitted for keys %5=0 — a wrong interval edge, a "
    "misordered version, or a double-current key hash-mismatches; "
    "version chains of length 1, 2, and 3 all occur in the slice",
)
def q_orders_scd2_dimension_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    k = F.col("o_orderkey")
    base = o.select(k.alias("o_orderkey"), F.lit(1).alias("version"),
                    F.col("o_totalprice").alias("price"))
    v2 = o.filter(k % 7 == 0).select(
        k.alias("o_orderkey"), F.lit(2).alias("version"),
        (F.col("o_totalprice") + F.lit(100.0)).alias("price"))
    v3 = o.filter(k % 11 == 3).select(
        k.alias("o_orderkey"), F.lit(3).alias("version"),
        (F.col("o_totalprice") + F.lit(200.0)).alias("price"))
    hist = base.unionByName(v2).unionByName(v3).filter(k % 5 == 0)
    w = Window.partitionBy("o_orderkey").orderBy("version")
    nxt = F.lead("version").over(w)
    return hist.select(
        "o_orderkey",
        F.col("version").cast("long").alias("version"),
        F.round("price", 6).alias("price"),
        (F.col("version") * 1000).cast("long").alias("effective_from"),
        (nxt * 1000).cast("long").alias("effective_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )


@register(
    "orders_bucketed_colocated_join",
    oracle=f"""
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND({_msum6_sql("l.l_extendedprice")}, 6) AS revenue,
           1::INT AS bucketed_no_exchange,
           1::INT AS plain_has_exchange
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
    doc="EXT bucketed co-located join (r8) — the pre-shuffle discipline "
    "the repo's scale docs kept citing but never executed: orders and "
    "lineitem are written bucketBy(8, key) + sortBy (one file per "
    "bucket via repartition-by-key first — multi-file buckets disable "
    "the sorted-read path), then joined. Verdict bits come from the "
    "EXECUTED plans (AQE pinned off for the probe, broadcast disabled "
    "so SMJ is forced): the bucketed join must contain ZERO Exchange "
    "nodes (bucket layout satisfies the join's hash requirement), "
    "while the identical plain-parquet join must shuffle BOTH sides. "
    "Per-task Sort nodes remain by design: bucketed scans stopped "
    "reporting output ordering in Spark 3 (multi-file buckets would "
    "interleave; the opt-back-in is the legacy "
    "bucketedTableScan.outputOrdering flag) — the shuffle is the "
    "scale-killer, the in-partition sort is linear and executor-local. "
    "At 100 TB this is the difference between re-shuffling the fact "
    "table on every join and paying the shuffle ONCE at write time, "
    "amortized over every downstream join on that key; per-status "
    "counts + msum6 revenue prove the co-located result is identical "
    "to the oracle's join. sparkPlan() would be vacuous here — "
    "exchange insertion happens in EnsureRequirements, so the bits are "
    "derived from executedPlan()",
)
def q_orders_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    tag = uuid.uuid4().hex[:8]
    t_o, t_l = f"ssa_bkt_o_{tag}", f"ssa_bkt_l_{tag}"
    root = tempfile.mkdtemp(prefix="ssa_bkt_")
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        for df, name in ((o, t_o), (li, t_l)):
            (
                df.repartition(8, "o_orderkey")
                .write.bucketBy(8, "o_orderkey")
                .sortBy("o_orderkey")
                .option("path", f"{root}/{name}")
                .mode("overwrite")
                .saveAsTable(name)
            )
        # force SMJ and freeze the plan so the Exchange/Sort counts are
        # the static planner's verdict, not AQE's runtime rewrite
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        bucketed = spark.table(t_o).join(spark.table(t_l), "o_orderkey")
        plain = o.join(li, "o_orderkey")
        p_b = bucketed._jdf.queryExecution().executedPlan().toString()
        p_p = plain._jdf.queryExecution().executedPlan().toString()
        no_exchange = int(p_b.count("Exchange") == 0)
        has_exchange = int(p_p.count("Exchange") >= 2)
        agg = bucketed.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(msum6(F.col("l_extendedprice")), 6).alias("revenue"),
            F.lit(no_exchange).cast("int").alias("bucketed_no_exchange"),
            F.lit(has_exchange).cast("int").alias("plain_has_exchange"),
        )
        rows = agg.collect()  # bounded: one row per order status
        return spark.createDataFrame(rows, agg.schema)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        for name in (t_o, t_l):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(root, ignore_errors=True)


@register(
    "orders_cdc_transactional_publish",
    oracle=f"""
    WITH changes AS (
      SELECT o_orderkey AS k, 1 AS seq, 'U' AS op, o_custkey AS cust,
             o_orderstatus AS status, o_totalprice + 100.0 AS price
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'D', NULL, NULL, NULL
      FROM orders WHERE o_orderkey % 11 = 3
      UNION ALL
      SELECT o_orderkey + 100000000000, 1, 'I', o_custkey, 'N', o_totalprice
      FROM orders WHERE o_orderkey % 13 = 5
    ),
    latest AS (
      SELECT k, op, cust, status, price
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) rn
            FROM changes)
      WHERE rn = 1
    ),
    merged AS (
      SELECT COALESCE(c.k, b.o_orderkey) AS k,
             COALESCE(c.price, b.o_totalprice) AS price,
             c.op AS op
      FROM orders b FULL OUTER JOIN latest c ON b.o_orderkey = c.k
    ),
    v2 AS (SELECT k, price FROM merged WHERE op IS NULL OR op <> 'D')
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS v1_n,
           (SELECT ROUND({_msum6_sql("o_totalprice")}, 6) FROM orders)
             AS v1_price_msum6,
           1::INT AS uncommitted_invisible,
           CAST(COUNT(*) AS BIGINT) AS v2_n,
           ROUND({_msum6_sql("price")}, 6) AS v2_price_msum6,
           1::INT AS time_travel_ok
    FROM v2
    """,
    doc="EXT transactional parquet publish (r8, verdict task 6) — the "
    "atomic-commit discipline that makes the CDC merge safe to run "
    "against live readers: snapshot v1 (base orders) is written to an "
    "immutable data dir and committed via an fsync'd manifest swap "
    "(sources/txn_publish.py); the merge output is then FULLY WRITTEN "
    "to a second data dir while the job 'dies' before the manifest "
    "swap — the mid-write-failure simulation. The uncommitted_invisible "
    "bit requires ALL of: the reader (manifest-resolving scan) still "
    "returns exactly v1's count+msum6, the orphan dir really contains "
    "data files (the failure left debris to ignore — no vacuous pass), "
    "and the manifest still names version 1. Then the commit completes "
    "(one os.replace) and the reader must see exactly the merged "
    "snapshot — visibility flips all-or-nothing at the manifest swap, "
    "never file-by-file — and v1 stays time-travel-readable through its "
    "retained versioned manifest after v2 is live (VERSION AS OF until "
    "vacuum). v1 and v2 aggregates are both oracle-pinned; "
    "a reader that scans the data/ directory listing instead of the "
    "manifest (the plain-parquet failure mode at 100 TB) double-counts "
    "and flips the row red",
)
def q_orders_cdc_transactional_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from spark_stream_analyzer_spark.sources.txn_publish import (
        committed_version,
        publish,
        read_committed,
        read_version,
        snapshot_dir,
    )

    root = tempfile.mkdtemp(prefix="ssa_txnpub_")
    try:
        o = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        # ---- snapshot v1: write data, then atomic manifest commit
        d1 = snapshot_dir(root)
        o.write.parquet(d1)
        publish(root, d1, 1)

        def _agg(df, price_col):
            r = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.round(msum6(F.col(price_col)), 6).alias("m"),
            ).collect()[0]  # one row
            return int(r.n), float(r.m)

        v1_n, v1_m = _agg(read_committed(spark, root), "o_totalprice")

        # ---- the merge reads the COMMITTED snapshot (not the raw path)
        merged = _cdc_merged_snapshot(
            read_committed(spark, root).select(
                "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
            )
        )
        # ---- phase 1 of snapshot v2: data fully written ... and the
        # job "dies" HERE, before the manifest swap — the worst-case
        # mid-write failure (all debris present, zero of it committed)
        d2 = snapshot_dir(root)
        merged.write.parquet(d2)
        debris = glob.glob(os.path.join(d2, "*.parquet"))
        fail_n, fail_m = _agg(read_committed(spark, root), "o_totalprice")
        uncommitted_invisible = int(
            (fail_n, fail_m) == (v1_n, v1_m)
            and len(debris) > 0
            and committed_version(root) == 1
        )
        # ---- recovery/commit completes: ONE atomic pointer swap
        publish(root, d2, 2)
        v2_n, v2_m = _agg(read_committed(spark, root), "price")
        # time travel: v1's retained manifest must still resolve to the
        # untouched v1 snapshot AFTER v2 is live (immutable data dirs +
        # versioned manifests = VERSION AS OF until vacuum)
        tt_n, tt_m = _agg(read_version(spark, root, 1), "o_totalprice")
        time_travel_ok = int((tt_n, tt_m) == (v1_n, v1_m))
        return spark.createDataFrame(
            [(v1_n, v1_m, uncommitted_invisible, v2_n, v2_m, time_travel_ok)],
            "v1_n long, v1_price_msum6 double, uncommitted_invisible int, "
            "v2_n long, v2_price_msum6 double, time_travel_ok int",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


_VDIFF_CHANGES_SQL = """
    base AS (SELECT o_orderkey AS k, o_custkey AS cust,
                    o_orderstatus AS status, o_totalprice AS price
             FROM orders),
    changes AS (
      SELECT o_orderkey AS k, 1 AS seq, 'U' AS op, o_custkey AS cust,
             o_orderstatus AS status, o_totalprice + 100.0 AS price
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'D', NULL, NULL, NULL
      FROM orders WHERE o_orderkey % 11 = 3
      UNION ALL
      SELECT o_orderkey + 100000000000, 1, 'I', o_custkey, 'N', o_totalprice
      FROM orders WHERE o_orderkey % 13 = 5
    ),
    latest AS (
      SELECT k, op, cust, status, price
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) rn
            FROM changes)
      WHERE rn = 1
    ),
    v2 AS (
      SELECT COALESCE(c.k, b.k) AS k, COALESCE(c.cust, b.cust) AS cust,
             COALESCE(c.status, b.status) AS status,
             COALESCE(c.price, b.price) AS price
      FROM base b FULL OUTER JOIN latest c ON b.k = c.k
      WHERE c.op IS NULL OR c.op <> 'D'
    ),
    d AS (
      SELECT b.k AS ka, b.cust AS ca, b.status AS sa, b.price AS pa,
             v2.k AS kb, v2.cust AS cb, v2.status AS sb, v2.price AS pb
      FROM base b FULL OUTER JOIN v2 ON b.k = v2.k
    )
"""

_VDIFF_NEQ = """(ca IS DISTINCT FROM cb OR sa IS DISTINCT FROM sb
                 OR pa IS DISTINCT FROM pb)"""


@register(
    "orders_version_changes",
    oracle=f"""
    WITH {_VDIFF_CHANGES_SQL}
    SELECT kb AS o_orderkey, cb AS cust, sb AS status,
           ROUND(pb, 6) AS price, 'insert' AS change_type
    FROM d WHERE ka IS NULL
    UNION ALL
    SELECT ka, ca, sa, ROUND(pa, 6), 'delete' FROM d WHERE kb IS NULL
    UNION ALL
    SELECT ka, ca, sa, ROUND(pa, 6), 'update_preimage'
    FROM d WHERE ka IS NOT NULL AND kb IS NOT NULL AND {_VDIFF_NEQ}
    UNION ALL
    SELECT kb, cb, sb, ROUND(pb, 6), 'update_postimage'
    FROM d WHERE ka IS NOT NULL AND kb IS NOT NULL AND {_VDIFF_NEQ}
    """,
    doc="EXT version CHANGE FEED from immutable snapshots (r10 — the "
    "table_changes/Delta-CDF shape, completing the lakehouse read "
    "surface beside time travel and the streaming state CDF): because "
    "every published version's data dir is immutable and "
    "manifest-addressed, the row-level diff between ANY two versions is "
    "reconstructible after the fact with no writer-side change logging. "
    "One full-outer key join + null-safe struct comparison + a <=2-row "
    "explode emits insert / delete / update_preimage / update_postimage "
    "rows; byte-equal rows emit nothing (a rewritten-but-identical file "
    "never pollutes the feed). Driver row publishes v1 = orders, v2 = "
    "the CDC-merged snapshot, diffs through the manifests; oracle "
    "re-derives both versions and the diff independently",
)
def q_orders_version_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from spark_stream_analyzer_spark.sources.txn_publish import (
        publish,
        snapshot_dir,
        version_changes,
    )

    root = tempfile.mkdtemp(prefix="ssa_vdiff_")
    try:
        o = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        v1 = o.select(
            "o_orderkey",
            F.col("o_custkey").alias("cust"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
        )
        d1 = snapshot_dir(root)
        v1.write.parquet(d1)
        publish(root, d1, 1)
        d2 = snapshot_dir(root)
        _cdc_merged_snapshot(o).write.parquet(d2)
        publish(root, d2, 2)
        ch = version_changes(spark, root, 1, 2, ["o_orderkey"])
        out = ch.select(
            "o_orderkey",
            "cust",
            "status",
            round6(F.col("price")).alias("price"),
            "change_type",
        )
        # the diff must materialize before the tempdir vanishes — and
        # the change set is FACT-scale (~3/7 of keys), so it stays on
        # executors: lineage_cut pins the computed blocks and severs the
        # plan's dependency on the deleted snapshot files (no
        # collect/re-parallelize driver round-trip)
        from spark_stream_analyzer_spark.functions.materialize import (
            lineage_cut,
        )

        return lineage_cut(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "orders_time_travel_asof",
    oracle=f"""
    WITH v1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       ROUND({_msum6_sql("o_totalprice")}, 6) AS m
                FROM orders WHERE o_orderkey % 3 = 0),
    v2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  ROUND({_msum6_sql("o_totalprice")}, 6) AS m
           FROM orders WHERE o_orderkey % 3 <= 1)
    SELECT CAST(1500 AS BIGINT) AS asof_ts, CAST(1 AS INT) AS version,
           n AS n_orders, m AS price_msum6, CAST(1 AS INT) AS before_first_rejected
    FROM v1
    UNION ALL
    SELECT CAST(2500 AS BIGINT), CAST(2 AS INT), n, m, CAST(1 AS INT) FROM v2
    """,
    doc="EXT TIMESTAMP AS OF time travel (sources/txn_publish.py "
    "read_as_of) — the other half of the Delta/Iceberg travel surface "
    "beside VERSION AS OF (r8): publish stamps commit_ts in the "
    "manifest; AS OF resolves the HIGHEST version among manifests with "
    "commit_ts <= t (version order decides, timestamps gate — a stale "
    "straggler's later wall time can never shadow the snapshot that "
    "was live). Fixture publishes v1@ts=1000 and v2@ts=2000 with "
    "EXPLICIT commit times (deterministic row), reads AS OF 1500 and "
    "2500, and pins that AS OF 500 (before the first commit) fails "
    "closed with ValueError. Resolution is a manifest-file scan — "
    "O(retained versions), no data read until the chosen snapshot",
)
def q_orders_time_travel_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from spark_stream_analyzer_spark.sources.txn_publish import (
        publish,
        read_as_of,
        snapshot_dir,
    )

    root = tempfile.mkdtemp(prefix="ssa_asof_")
    try:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        d1 = snapshot_dir(root)
        o.filter(F.col("o_orderkey") % 3 == 0).withColumn(
            "version", F.lit(1)
        ).write.parquet(d1)
        publish(root, d1, 1, commit_ts=1000.0)
        d2 = snapshot_dir(root)
        o.filter(F.col("o_orderkey") % 3 <= 1).withColumn(
            "version", F.lit(2)
        ).write.parquet(d2)
        publish(root, d2, 2, commit_ts=2000.0)

        try:
            read_as_of(spark, root, 500.0)
            rejected = 0  # a state that never existed resolved — red
        except ValueError:
            rejected = 1

        rows = []
        for t in (1500.0, 2500.0):
            r = (
                read_as_of(spark, root, t)
                .agg(
                    F.max("version").alias("v"),
                    F.count(F.lit(1)).alias("n"),
                    F.round(msum6(F.col("o_totalprice")), 6).alias("m"),
                )
                .collect()[0]  # one row per AS OF probe — bounded
            )
            rows.append((int(t), int(r.v), int(r.n), float(r.m), rejected))
        return spark.createDataFrame(
            rows,
            "asof_ts long, version int, n_orders long, price_msum6 double,"
            " before_first_rejected int",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "orders_gdpr_erasure",
    oracle=f"""
    WITH k AS (SELECT COUNT(*) AS n_erased FROM orders WHERE o_custkey % 97 = 0),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_after,
                 ROUND({_msum6_sql("o_totalprice")}, 6) AS survivor_msum6
          FROM orders WHERE o_custkey % 97 <> 0)
    SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_before,
           s.n_after, CAST(k.n_erased AS BIGINT) AS n_erased,
           s.survivor_msum6,
           CAST(1 AS INT) AS live_clean,
           CAST(1 AS INT) AS pre_vacuum_leak,
           CAST(1 AS INT) AS post_vacuum_gone
    FROM k, s
    """,
    doc="EXT GDPR right-to-be-forgotten over the transactional table — "
    "the compliance rewrite every lake needs, with its documented "
    "gotcha PINNED rather than papered over: erasing a subject is a "
    "filter-rewrite + atomic republish (v2), after which the LIVE "
    "table is clean (live_clean) — but the subject's rows still exist "
    "in v1's retained snapshot (pre_vacuum_leak pins the leak IS "
    "there: time travel reads them back), so erasure is complete only "
    "after vacuum reclaims pre-erasure versions (post_vacuum_gone "
    "pins both that v1 time travel now fails closed AND that its data "
    "dir is physically gone — the manifest-first deletion order means "
    "a crash mid-vacuum can never leave readable orphaned PII paths "
    "addressable through a manifest). At 100 TB the rewrite is one "
    "filter scan + write (partition pruning scopes it when subjects "
    "are partition-aligned); the erasure audit is the closed-form "
    "count/sum split the oracle recomputes",
)
def q_orders_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from spark_stream_analyzer_spark.sources.txn_publish import (
        publish,
        read_committed,
        read_version,
        snapshot_dir,
        vacuum,
    )

    root = tempfile.mkdtemp(prefix="ssa_gdpr_")
    try:
        o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
        d1 = snapshot_dir(root)
        o.write.parquet(d1)
        publish(root, d1, 1, commit_ts=1000.0)
        subject = F.col("o_custkey") % 97 == 0
        n_before = read_committed(spark, root).count()
        d2 = snapshot_dir(root)
        read_committed(spark, root).filter(~subject).write.parquet(d2)
        publish(root, d2, 2, commit_ts=2000.0)

        live = read_committed(spark, root)
        r = live.agg(
            F.count(F.lit(1)).alias("n_after"),
            F.round(msum6(F.col("o_totalprice")), 6).alias("m"),
            F.sum(subject.cast("long")).alias("n_subject_live"),
        ).collect()[0]  # one row
        live_clean = int(r.n_subject_live == 0)
        # the leak: v1's retained snapshot still carries the subject
        leaked = (
            read_version(spark, root, 1).filter(subject).count()
        )
        pre_vacuum_leak = int(leaked == n_before - r.n_after and leaked > 0)
        # vacuum closes it: manifest first (travel fails closed), dir second
        vacuum(root, keep_last=1)
        try:
            read_version(spark, root, 1)
            travel_gone = False
        except FileNotFoundError:
            travel_gone = True
        post_vacuum_gone = int(travel_gone and not os.path.exists(d1))
        return spark.createDataFrame(
            [
                (
                    n_before,
                    int(r.n_after),
                    int(n_before - r.n_after),
                    float(r.m),
                    live_clean,
                    pre_vacuum_leak,
                    post_vacuum_gone,
                )
            ],
            "n_before long, n_after long, n_erased long, survivor_msum6 double,"
            " live_clean int, pre_vacuum_leak int, post_vacuum_gone int",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
