"""As-of (backward) join — the canonical timeseries operator (EXT;
generalizes the reference's correlated-subquery forward-fill, reference
``sql/queries.sql:42-49`` / SURVEY §2.6 J5).

Spark has no native as-of join; the scalable formulation is the
union+window trick:

1. tag right rows 0, left rows 1; union on (by, ts, tag);
2. one shuffle on ``by``, sort within partition by (ts, tag);
3. ``last(value, ignorenulls)`` over an unbounded-preceding frame fills
   each left row with the latest right value at-or-before its timestamp;
4. keep the left rows.

This is one shuffle + one sort — exactly the cost of a sort-merge join,
with no per-row subquery and no range explosion, and it holds at any
scale (each ``by`` partition streams through its sorted frame). A right
row tying a left timestamp IS visible to it (tag order), matching
DuckDB's ASOF JOIN (``ON r.ts <= l.ts``), which the oracle uses as an
independent implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Left rows + the latest ``right.value_col`` with ``right.ts <= left.ts``
    per ``by`` key (NULL when no earlier right row exists).

    ``right`` must be unique per (by, ts) — pre-aggregate if not, or the
    fill picks an unspecified row among ties.
    """
    out_col = out_col or value_col
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(dict(right.dtypes)[value_col]).alias("_rv"),
        F.lit(1).alias("_tag"),
    )
    r_tag = right.select(
        by,
        ts_col,
        *[
            F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
            if c not in (by, ts_col)
        ],
        F.col(value_col).alias("_rv"),
        F.lit(0).alias("_tag"),
    ).select(*[c for c in left.columns], "_rv", "_tag")  # align column order
    w = (
        Window.partitionBy(by)
        .orderBy(ts_col, "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_tag.unionByName(r_tag)
        .withColumn(out_col, F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
        .drop("_rv", "_tag")
    )
