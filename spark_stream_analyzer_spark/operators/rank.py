"""Scalable global ordering / ranking.

The reference's only global sorts are dim-sized ``ORDER BY`` clauses
(reference ``sql/queries.sql:13,33,69``), where a single-reducer sort is
fine. A FACT-sized global rank (the 100 TB case) cannot go through one
``Window.orderBy`` — Spark moves the whole table to one partition. The
standard decomposition, implemented here:

1. ``repartitionByRange`` on the full ordering key — the range exchange
   samples split points, so partitions hold disjoint, ordered key ranges;
2. rank locally inside each partition (``row_number`` partitioned by the
   physical partition id);
3. add each partition's global offset — the cumulative row counts of the
   partitions before it, a ≤ num-partitions-row aggregate that is the
   only single-partition window and is broadcast back.

Total cost: one range shuffle + one tiny agg — same shape Spark itself
uses for ``sortWithinPartitions``-based total ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window




def global_rank(
    df: DataFrame, order_cols: list[Column], rank_col: str = "rnk"
) -> DataFrame:
    """Dense global ``row_number`` over an arbitrary total order.

    ``order_cols`` must define a TOTAL order (include a unique tiebreak
    column) — otherwise ranks at partition boundaries are tie-arbitrary.
    """
    d = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = d.groupBy("_pid").agg(F.count("*").alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        d.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.row_number().over(w_local) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[Column],
    n: int,
    tile_col: str = "tile",
    rank_col: str | None = None,
) -> DataFrame:
    """SQL ``ntile(n) OVER (ORDER BY order_cols)`` without a single-reducer
    sort.

    SQL ntile over N rows puts ``ceil(N/n)`` rows in the first
    ``N mod n`` buckets and ``floor(N/n)`` in the rest, by row position.
    Both inputs of that formula distribute: the global row position comes
    from :func:`global_rank` (range shuffle + per-partition window +
    broadcast offsets) and N is a one-row aggregate broadcast back. Same
    answer as the built-in ``ntile`` for any TOTAL order (unique
    tiebreak), with no ``Exchange SinglePartition`` over the input.

    ``rank_col`` (r9): when ``df`` already carries a global row_number
    over the SAME total order (from a prior :func:`global_rank`), name
    it and the second range shuffle + window pass is skipped entirely —
    the tile is pure arithmetic on the existing rank plus one broadcast
    one-row count. This is the multi-ranking-column case
    (customer_spend_ranks computes rank AND ntile over one order): the
    r9 bench caught the naive compose paying the range exchange twice.
    """
    if rank_col is None:
        ranked = global_rank(df, order_cols, rank_col="_rn")
        drop = ["_rn", "_N"]
    else:
        ranked = df
        drop = ["_N"]
    total = df.agg(F.count(F.lit(1)).alias("_N"))
    # Integer arithmetic throughout (SQL ``div``, never double '/'): exact
    # at any row count, not just below 2^53 (r10, ADVICE). q = small-bucket
    # size, r = #(q+1)-sized buckets, cut = rows covered by big buckets.
    rn_name = "_rn" if rank_col is None else rank_col
    q = f"(_N div {n}L)"
    r = f"(_N % {n}L)"
    cut = f"(({q} + 1L) * {r})"
    tile = (
        f"CASE WHEN `{rn_name}` <= {cut} "
        f"THEN (`{rn_name}` - 1L) div ({q} + 1L) + 1L "
        f"ELSE {r} + (`{rn_name}` - {cut} - 1L) div {q} + 1L END"
    )
    return (
        ranked.join(F.broadcast(total))
        .withColumn(tile_col, F.expr(tile).cast("long"))
        .drop(*drop)
    )


def global_dense_rank(
    df: DataFrame, value_col: Column, dense_col: str = "drnk", *, desc: bool = False
) -> DataFrame:
    """``dense_rank() OVER (ORDER BY value_col [DESC])`` at fact scale.

    dense_rank depends only on the DISTINCT values, so: dedupe the value
    column (hash shuffle on the value — map-side partial), global-rank
    the distinct set (row_number over distinct values IS the dense rank),
    and hash-join the ranks back on the value. The distinct set is the
    only thing ever range-shuffled; the fact table sees one equi-join.

    NULL values rank like the built-in (``asc_nulls_first`` /
    ``desc_nulls_last``, Spark's window defaults): ``distinct()`` keeps a
    NULL row and the join-back is null-safe, so NULL inputs are ranked,
    not dropped (r10, ADVICE).
    """
    v = df.select(value_col.alias("_v")).distinct()
    order = [F.desc_nulls_last("_v")] if desc else [F.asc_nulls_first("_v")]
    ranks = global_rank(v, order, rank_col=dense_col)
    return df.join(ranks.withColumnRenamed("_v", "__dr_key"),
                   value_col.eqNullSafe(F.col("__dr_key"))).drop("__dr_key")
