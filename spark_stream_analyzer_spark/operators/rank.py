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
