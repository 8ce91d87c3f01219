"""Fact-scale EXACT order statistics — iterative value-domain bisection.

Removes the honest asterisk on :mod:`.udafs`: the grouped-agg pandas
UDAF there ships each group's rows through one Arrow batch (no map-side
partial exists for an exact median), so it is only right for
bounded-cardinality groups.  This module computes exact per-group
VALUE-AT-RANK queries — the weighted median, and exact interpolated
percentiles — with NO per-group materialization: O(log_B V) full scans,
each a map-side-combinable aggregate.  The shape survives per-group row
counts of any size AND group counts of any size simultaneously.

Core primitive: for each group and each rank target t (an int64
expression over the group's total weight), find

    value_at(t) = min { x in values : cumw(x) >= t }

(cumw = cumulative weight over values <= x, RANGE-frame tie semantics).
The weighted median is value_at(ceil(total/2)); an interpolated
percentile p combines value_at(k) and value_at(k+1) for
k = floor(1 + (n-1)p).

How a pass works (B-way bisection, exactness never rests on float
arithmetic):

1. join facts to the per-(group, target) ``[minv, maxv]`` candidate
   range and bucket each row by ``floor((v - minv) / ((maxv - minv) /
   B))`` — float math, but only MONOTONICITY in v matters (any
   value-ordered partition of the range is a valid split);
2. aggregate per (group, target, bucket): ``sum(w), min(v), max(v),
   count`` — map-side combinable, output <= B rows per (group, target);
3. find the crossing bucket (first with ``base + cum_before + bw >= t``)
   via a window over <= B rows per (group, target), partitioned BY
   GROUP (never a single reducer);
4. the new exact bounds come from the DATA, not arithmetic: the
   crossing bucket's own ``min(v)/max(v)`` and the exact int64
   cumulative weight before it.  A (group, target) whose crossing
   bucket holds one distinct value is done (that value IS the answer:
   the weight below it misses t, through it reaches t).

Targets whose remaining range holds few rows finish exactly in one
shot: distinct-value weights + a per-group cumulative window + min
qualifying value (the classic decomposition, safe because the remnant
is small).

Driver-side control: one 1-row bounded aggregate per pass (count of
unconverged targets — decides loop exit), same iterative discipline as
the BPE merge loop.  Bounds are ``lineage_cut`` per pass (RDD-id-diff
block release) so the plan does not deepen.

Scale notes: passes are ~ log_B(distinct values per group) — 3 passes
at B=4096 cover 6.9e10 distinct values; each pass re-scans the fact
(the 100 TB contract: no cache assumed) and shuffles only
group x target x bucket partials; multiple rank targets share each scan
(facts replicate per target only while ranges overlap — after pass 1
the ranges are disjoint slivers).  The bounds table is
(group x target)-cardinality-sized and re-plans through AQE, so small
group counts get a broadcast join for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_stream_analyzer_spark.functions.materialize import lineage_cut


def _grouped_value_at_ranks(
    facts: DataFrame,
    group_cols: list[str],
    targets: list[tuple[str, str]],
    *,
    buckets: int,
    finish_threshold: int,
    max_passes: int,
) -> DataFrame:
    """Exact per-group value-at-rank for multiple rank targets.

    ``facts``: columns ``group_cols + [_v double, _w long]`` (callers
    pre-filter ``_w > 0`` and non-null ``_v``).  ``targets``: list of
    ``(tid, t_sql)`` where ``t_sql`` is an int64 SQL expression over
    ``_total`` (the group's total weight) with ``1 <= t <= _total``.
    Output: ``group_cols + [_tid, _rv, _total]`` — one row per group per
    target.
    """
    spark = facts.sparkSession
    gkey = [*group_cols, "_tid"]

    tgt_structs = ", ".join(
        f"struct('{tid}' AS _tid, CAST({t_sql} AS BIGINT) AS _t)"
        for tid, t_sql in targets
    )
    bounds = (
        facts.groupBy(*group_cols)
        .agg(
            F.sum("_w").alias("_total"),
            F.min("_v").alias("_minv"),
            F.max("_v").alias("_maxv"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            *group_cols,
            "_total",
            F.explode(F.expr(f"array({tgt_structs})")).alias("_tg"),
            "_minv",
            "_maxv",
            "_n",
        )
        .select(
            *group_cols,
            F.col("_tg._tid").alias("_tid"),
            F.col("_tg._t").alias("_t"),
            "_total",
            F.lit(0).cast("long").alias("_base"),
            "_minv",
            "_maxv",
            "_n",
            (F.col("_minv") == F.col("_maxv")).alias("_done"),
        )
    )

    from spark_stream_analyzer_spark.session import (
        persistent_rdd_ids,
        unpersist_rdds,
    )

    _before = persistent_rdd_ids(spark)
    bounds = lineage_cut(bounds, chain=0)
    prev_round_ids = persistent_rdd_ids(spark) - _before
    # loop-exit count over the just-materialized bounds (bounded: ONE
    # row to the driver).  Inside the loop the same count is FUSED with
    # each pass's lineage cut (r15, verdict task 8): the cut is lazy and
    # the count action materializes it, so one driver action per pass
    # replaces the previous eager-cut + separate-count pair.
    _active_pred = ~F.col("_done") & (F.col("_n") > finish_threshold)
    # bounded: one row — loop-exit decision for the iterative bisection
    remaining = bounds.where(_active_pred).agg(F.count(F.lit(1))).first()[0]

    from spark_stream_analyzer_spark.session import loop_aqe_scope

    for _pass in range(max_passes):
        if not remaining:
            break
        active = bounds.where(_active_pred)

        width = (F.col("_maxv") - F.col("_minv")) / F.lit(float(buckets))
        bucket = F.least(
            F.lit(buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("_v") - F.col("_minv")) / width).cast("int"),
            ),
        )
        j = (
            facts.join(active, group_cols)
            .where(F.col("_v").between(F.col("_minv"), F.col("_maxv")))
            .withColumn("_bkt", bucket)
        )
        bstats = j.groupBy(*gkey, F.col("_bkt")).agg(
            F.sum("_w").alias("_bw"),
            F.min("_v").alias("_bmin"),
            F.max("_v").alias("_bmax"),
            F.count(F.lit(1)).alias("_bn"),
            F.first("_t").alias("_t"),
            F.first("_total").alias("_total"),
            F.first("_base").alias("_base"),
        )
        win = Window.partitionBy(*gkey).orderBy("_bkt")
        cum_before = F.coalesce(
            F.sum("_bw").over(win.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        )
        crossed = (
            bstats.withColumn("_before", F.col("_base") + cum_before)
            .where(
                (F.col("_before") < F.col("_t"))
                & (F.col("_before") + F.col("_bw") >= F.col("_t"))
            )
            .select(
                *gkey,
                "_t",
                "_total",
                F.col("_before").alias("_base"),
                F.col("_bmin").alias("_minv"),
                F.col("_bmax").alias("_maxv"),
                F.col("_bn").alias("_n"),
                (F.col("_bmin") == F.col("_bmax")).alias("_done"),
            )
        )
        # carry untouched targets (already done, or small enough for the
        # exact finish) alongside the narrowed active ones
        rest = bounds.where(
            F.col("_done") | (F.col("_n") <= finish_threshold)
        )
        _b = persistent_rdd_ids(spark)
        # AQE policy scope (SSA_LOOP_AQE, session.py — default no-op):
        # the pass's plans execute at these two statements
        with loop_aqe_scope(spark):
            new_bounds = lineage_cut(
                crossed.unionByName(rest), chain=_pass + 1, eager=False
            )
            this_round_ids = persistent_rdd_ids(spark) - _b
            # fused cut + loop-exit count: this full-scan action
            # computes and caches every partition of the lazy cut and
            # returns next pass's decision (bounded: one long)
            remaining = new_bounds.where(_active_pred).count()
        # free the previous round's lineage-cut blocks (RDD-id diff —
        # Dataset.unpersist does not release localCheckpoint blocks)
        unpersist_rdds(spark, prev_round_ids)
        prev_round_ids = this_round_ids
        bounds = new_bounds
    # if max_passes was exhausted (pathological range, e.g. subnormal
    # widths), everything left flows to the exact finish below

    # exact finish over the (small) remaining ranges: distinct-value
    # weights -> per-(group, target) cumulative -> min qualifying value
    rem = bounds.where(~F.col("_done"))
    finished = bounds.where(F.col("_done")).select(
        *gkey, F.col("_maxv").alias("_rv"), "_total"
    )

    rj = facts.join(rem, group_cols).where(
        F.col("_v").between(F.col("_minv"), F.col("_maxv"))
    )
    dv = rj.groupBy(*gkey, F.col("_v")).agg(
        F.sum("_w").alias("_vw"),
        F.first("_t").alias("_t"),
        F.first("_total").alias("_total"),
        F.first("_base").alias("_base"),
    )
    winv = Window.partitionBy(*gkey).orderBy("_v")
    cum = F.col("_base") + F.sum("_vw").over(
        winv.rowsBetween(Window.unboundedPreceding, 0)
    )
    tail = (
        dv.withColumn("_cum", cum)
        .where(F.col("_cum") >= F.col("_t"))
        .groupBy(*gkey)
        .agg(F.min("_v").alias("_rv"), F.first("_total").alias("_total"))
    )
    # the final bounds blocks are released by the caller's post-collect
    # sweep (session.unpersist_rdds), matching the other iterative
    # operators
    return tail.unionByName(finished)


def grouped_weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    *,
    buckets: int = 4096,
    finish_threshold: int = 4096,
    max_passes: int = 12,
    median_col: str = "wmedian",
) -> DataFrame:
    """Exact lower weighted median of ``value_col`` per group:
    ``min { x : 2 * cumw(x) >= total }`` — ``value_at(ceil(total/2))``.

    Contract: ``weight_col`` is int64 >= 0; groups with zero total
    weight are omitted (a median of nothing).  ``value_col`` is any
    numeric (compared as double).  Output: one row per group,
    ``group_cols + [median_col]``.
    """
    facts = df.select(
        *[F.col(c) for c in group_cols],
        F.col(value_col).cast("double").alias("_v"),
        F.col(weight_col).cast("long").alias("_w"),
    ).where((F.col("_w") > 0) & F.col("_v").isNotNull())
    ranks = _grouped_value_at_ranks(
        facts,
        group_cols,
        [("m", "(_total + 1) div 2")],
        buckets=buckets,
        finish_threshold=finish_threshold,
        max_passes=max_passes,
    )
    return ranks.select(*group_cols, F.col("_rv").alias(median_col))


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float],
    *,
    buckets: int = 4096,
    finish_threshold: int = 4096,
    max_passes: int = 12,
    col_prefix: str = "p",
) -> DataFrame:
    """Exact INTERPOLATED percentiles per group at fact scale — the
    distributed twin of SQL ``percentile_cont`` / Spark ``percentile``,
    with the single-aggregation-buffer problem removed (Spark's exact
    ``percentile`` buffers every value of a group in one reducer's
    memory; this computes the same answer from O(log V) scans).

    Pinned definition (unweighted, n rows per group):
    ``pos = 1 + (n - 1) * p``; ``k = floor(pos)``; ``f = pos - k``;
    ``result = x_(k) + f * (x_(k+1) - x_(k))`` over the ascending order
    statistics (x_(n+1) clamped to x_(n)).  The interpolation arithmetic
    is part of the contract — oracles must use this exact expression
    shape, not their built-in quantile, for bit-equality.

    Output: one row per group, ``group_cols + [<prefix><idx> ...]``
    (one column per requested percentile, in input order).
    """
    facts = df.select(
        *[F.col(c) for c in group_cols],
        F.col(value_col).cast("double").alias("_v"),
        F.lit(1).cast("long").alias("_w"),
    ).where(F.col("_v").isNotNull())
    targets = []
    for i, p in enumerate(ps):
        pos = f"(1.0D + (CAST(_total - 1 AS DOUBLE) * CAST({p!r} AS DOUBLE)))"
        k = f"CAST(floor({pos}) AS BIGINT)"
        targets.append((f"lo{i}", k))
        targets.append((f"hi{i}", f"least({k} + 1L, _total)"))
    ranks = _grouped_value_at_ranks(
        facts,
        group_cols,
        targets,
        buckets=buckets,
        finish_threshold=finish_threshold,
        max_passes=max_passes,
    )
    # pivot the <= 2*len(ps) target rows per group into columns
    # (bounded map, no data-sized collect_list)
    pivoted = ranks.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct("_tid", "_rv"))
        ).alias("_m"),
        F.first("_total").alias("_n"),
    )
    cols = [F.col(c) for c in group_cols]
    for i, p in enumerate(ps):
        pos = f"(1.0D + (CAST(_n - 1 AS DOUBLE) * CAST({p!r} AS DOUBLE)))"
        frac = f"({pos} - floor({pos}))"
        lo, hi = f"element_at(_m, 'lo{i}')", f"element_at(_m, 'hi{i}')"
        cols.append(
            F.expr(f"{lo} + {frac} * ({hi} - {lo})").alias(f"{col_prefix}{i}")
        )
    return pivoted.select(*cols)


#: per-group Arrow-batch comfort bound for the auto entry point below:
#: above this many rows in the LARGEST group, the grouped-agg pandas
#: UDAF (which must hold one whole group per batch) yields to the
#: bisection.  1M float64 pairs ~ 16 MB per batch — well inside executor
#: memory, far under Arrow's 2 GB hard limits.
UDAF_MAX_GROUP_ROWS = 1 << 20


def weighted_median_grouped_auto(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    *,
    udaf_max_group_rows: int = UDAF_MAX_GROUP_ROWS,
    median_col: str = "wmedian",
    **bisect_kw,
) -> DataFrame:
    """ONE entry point for the exact grouped weighted median — retires
    the bounded-groups asterisk on :mod:`.udafs` by applying the BPE
    auto-select discipline (r13 verdict task 5): the physical strategy
    is picked from the data, not from the caller reading two docstrings.

    Decision: one extra map-side-combinable scan computes the LARGEST
    group's row count (one row to the driver).  At or under
    ``udaf_max_group_rows`` the grouped-agg pandas UDAF runs (each group
    is one Arrow batch — fastest when groups are bounded, e.g. enum
    keys); above it, the value-domain bisection (O(log_B V) scans, safe
    at ANY group size and group count).  Max-group-rows is the honest
    signal, not group cardinality: a 2-group frame with a billion rows
    per group must bisect, a billion-group frame with 10 rows per group
    may UDAF — skew decides, so skew is what is measured.

    Both paths compute the SAME pinned lower weighted median
    (min { x : 2*cumw(x) >= total }, int64 weights, RANGE-frame ties)
    over identically filtered facts (weight > 0, value non-NULL,
    zero-total groups omitted), so the switch is a PERFORMANCE decision
    that provably cannot change the answer — pinned by
    tests/test_round14_ops.py::test_weighted_median_auto_paths_agree.
    """
    facts = df.select(
        *[F.col(c) for c in group_cols],
        F.col(value_col).cast("double").alias("_v"),
        F.col(weight_col).cast("long").alias("_w"),
    ).where((F.col("_w") > 0) & F.col("_v").isNotNull())
    # bounded: one (group)-combinable count scan, ONE row to the driver
    max_rows = (
        facts.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n"))
        .first()[0]
    )
    if max_rows is not None and max_rows <= udaf_max_group_rows:
        from spark_stream_analyzer_spark.functions.udafs import weighted_median

        return facts.groupBy(*group_cols).agg(
            weighted_median("_v", "_w").alias(median_col)
        )
    return grouped_weighted_median(
        facts, group_cols, "_v", "_w", median_col=median_col, **bisect_kw
    )
