"""Set operations + approximate aggregates (SURVEY §2.4/§2.5 'absent in
reference, available native' — exercised here so the coverage claim is
oracle-backed).

Approximate operators can't hash-match an oracle value-for-value, so the
queries emit *tolerance verdicts*: Spark computes approx vs exact and
returns pass/fail flags; the oracle asserts the flags are all-pass. A
wrong sketch implementation (or silently-exact fallback) fails the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.plans.registry import register
from spark_stream_analyzer_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _custkeys_of_year(o: DataFrame, year: int) -> DataFrame:
    return o.filter(
        (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
    ).select("o_custkey")


@register(
    "repeat_customers_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
    doc="INTERSECT (distinct): customers ordering in both 1996 and 1997 "
    "— left-semi-style shuffle on the key",
)
def q_repeat_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return _custkeys_of_year(o, 1996).intersect(_custkeys_of_year(o, 1997))


@register(
    "churned_customers_except",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
    doc="EXCEPT (distinct): 1996 customers gone in 1997 (left-anti shape)",
)
def q_churned_customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return _custkeys_of_year(o, 1996).subtract(_custkeys_of_year(o, 1997))


@register(
    "approx_distinct_check",
    oracle="""
    SELECT 'o_custkey' AS col, 1::INT AS within_tol
    UNION ALL SELECT 'l_partkey', 1::INT
    ORDER BY col
    """,
    doc="HyperLogLog++ approx_count_distinct vs exact, 4.5% relative-error "
    "verdict (the oracle-able form of an approximate aggregate). "
    "rsd=0.013 (2^13 registers) sits just below Spark's p=14 register "
    "cliff — rsd<=0.012 quadruples the agg's wall time for accuracy "
    "this verdict doesn't need. Tolerance DERIVED (round 4), not "
    "ratcheted: HLL error is deterministic per value set, so a data "
    "regeneration = one fresh error draw; 30 independent redraws were "
    "simulated by xxhash64-salt-remapping the key space at the same "
    "cardinalities (sf0.01: 1500/2000) giving |rel err| max 0.0147, "
    "mean 0.0063, p95 0.0133. Bound = 0.045 = 3x the observed worst "
    "(~3.5 sigma of rsd): a redraw lands inside it with "
    "P(miss) ~ 2e-4 per column, while a broken sketch (register "
    "merge bug, wrong precision) is far outside",
)
def q_approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    checks = [
        ("o_custkey", o, "o_custkey"),
        ("l_partkey", l, "l_partkey"),
    ]
    out = None
    for name, df, col in checks:
        # dedup-first: combining approx_count_distinct with countDistinct in
        # ONE agg triggers the Expand rewrite (every input row duplicated
        # through the distinct-agg path, and the HLL update leaves codegen).
        # distinct() gets map-side partial dedup before one shuffle of the
        # ~unique keys; count(*) over that is the exact distinct, and HLL
        # over deduped keys produces the bit-identical sketch (HLL updates
        # are idempotent per value).  One scan, no Expand — same plan you
        # would want at 100 TB.
        uniq = df.select(col).distinct()
        verdict = uniq.agg(
            F.approx_count_distinct(col, rsd=0.013).alias("approx"),
            F.count("*").alias("exact"),
        ).select(
            F.lit(name).alias("col"),
            (
                (F.abs(F.col("approx") - F.col("exact")) / F.col("exact")) <= 0.045
            ).cast("int").alias("within_tol"),
        )
        out = verdict if out is None else out.unionByName(verdict)
    return out.orderBy("col")


@register(
    "approx_quantile_check",
    oracle="SELECT 1::INT AS median_ok, 1::INT AS p95_ok",
    doc="percentile_approx (Greenwald-Khanna sketch) vs exact percentile, "
    "0.5% rank-tolerance verdict. r11: the CHECK side is now the "
    "functions/median.py value-domain bisection (grouped_exact_"
    "percentiles over one constant group) — the registry's LAST "
    "single-buffer exact aggregate retired: Spark's exact percentile() "
    "buffered the whole column in ONE aggregation buffer (measured "
    "linear, 10.2x at 10x input, in SCALING_SWEEP); the bisection gets "
    "the same interpolated answer from O(log_B V) map-side-combinable "
    "scans. The two 1-row sides meet in a broadcast join (no "
    "CartesianProduct). Plan lint now BANS exact percentile( in every "
    "registry plan",
)
def q_approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.functions.median import (
        grouped_exact_percentiles,
    )

    l = _t(spark, sf_dir, "lineitem")
    ap = l.agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10_000).alias("ap")
    )
    ex = grouped_exact_percentiles(
        l.withColumn("_g", F.lit(1)),
        ["_g"],
        "l_extendedprice",
        [0.495, 0.505, 0.945, 0.955],
        col_prefix="ex",
    ).drop("_g")
    return ap.join(F.broadcast(ex)).select(
        ((F.col("ap")[0] >= F.col("ex0")) & (F.col("ap")[0] <= F.col("ex1")))
        .cast("int")
        .alias("median_ok"),
        ((F.col("ap")[1] >= F.col("ex2")) & (F.col("ap")[1] <= F.col("ex3")))
        .cast("int")
        .alias("p95_ok"),
    )


@register(
    "part_multiset_diff",
    oracle="""
    WITH r AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
               EXCEPT ALL
               SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS surplus
    FROM r GROUP BY l_partkey
    """,
    doc="BAG-semantics set ops (exceptAll): multiplicity-aware "
    "difference — each part keeps max(0, returned_count − "
    "accepted_count) copies, the semantics DISTINCT-based EXCEPT "
    "destroys (churned_customers_except covers that form). Spark plans "
    "exceptAll as a counted anti-aggregation (Expand + sum of signed "
    "multiplicities), one shuffle on the key — same partial-agg "
    "discipline as a plain GROUP BY at 100 TB",
)
def q_part_multiset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    r = l.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = l.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return (
        r.exceptAll(a)
        .groupBy("l_partkey")
        .agg(F.count("*").alias("surplus"))
    )


@register(
    "part_multiset_common",
    oracle="""
    WITH c AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
               INTERSECT ALL
               SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS common
    FROM c GROUP BY l_partkey
    """,
    doc="BAG-semantics set ops (intersectAll): per-part "
    "min(returned_count, accepted_count) multiplicity — the overlap "
    "measure multiset-diff's twin; same counted-aggregation plan shape",
)
def q_part_multiset_common(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    r = l.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = l.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return (
        r.intersectAll(a)
        .groupBy("l_partkey")
        .agg(F.count("*").alias("common"))
    )


@register(
    "approx_hll_mergeable_rollup",
    oracle="""
    SELECT CAST(COUNT(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT)
             AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           1::INT AS splits_agree,
           1::INT AS within_tol
    FROM events
    """,
    doc="EXT mergeable-sketch rollup (r7) — the 100 TB distinct-count "
    "architecture: per-day HyperLogLog sketches (datasketches "
    "hll_sketch_agg, lgConfigK=12) built in ONE partial-aggregated "
    "pass, then UNION-MERGED (hll_union_agg) to answer the corpus-"
    "wide distinct-user question from 30 sketch blobs instead of a "
    "raw rescan — the pattern where a lake stores per-partition "
    "sketch bytes (~KB each) and any time-range's cardinality is a "
    "merge over its sketches. The verdict bits are BOUNDS, not "
    "equalities, because this round's probe showed the naive pins "
    "are false for datasketches HLL (measured at sf0.1, exact 1500): "
    "a union cannot keep the HIP estimator a directly-fed sketch "
    "answers with (direct 1499 vs merged 1488), and the post-union "
    "raw estimate is even PATH-DEPENDENT — a 30-way day split reads "
    "1488 while a 7-way hash split of the same values reads 1490, "
    "because each input sketch crosses the sparse-to-dense boundary "
    "at a different fill point (SCALING.md r7 records the probe). "
    "So: splits_agree pins two structurally different partitionings "
    "to within 2% of exact of each other (a register-merge BUG is "
    "far outside; benign path noise is ~0.1%), within_tol pins the "
    "merged estimate within 5% of the exact count (~3 sigma of "
    "lgK=12 rsd; at driver sf the sparse-mode union is exact)",
)
def q_approx_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("ts", "user_id")
    day = F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long")
    by_day = ev.groupBy(day.alias("g")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    day_union = by_day.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias(
            "day_est"
        ),
    )
    # a second, structurally different partitioning of the same values
    by_hash = ev.groupBy(F.pmod(F.xxhash64("user_id"), F.lit(7)).alias("g")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    hash_union = by_hash.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias(
            "hash_est"
        )
    )
    exact = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    return day_union.crossJoin(hash_union).crossJoin(exact).select(
        "n_days",
        "exact_users",
        (
            F.abs(F.col("day_est") - F.col("hash_est"))
            <= 0.02 * F.col("exact_users")
        ).cast("int").alias("splits_agree"),
        (
            (F.abs(F.col("day_est") - F.col("exact_users")) / F.col("exact_users"))
            <= 0.05
        ).cast("int").alias("within_tol"),
    )
