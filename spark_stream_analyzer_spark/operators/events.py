"""Event-stream normalization: driver `events` table → reference Event rows.

The reference's normalized event row is
``player, steam_id, type('kill'|'death'|'assist'|'damage'), second, amount,
round`` (reference ``model/Event.java:10-24``). The driver's synthetic
``events`` table (``event_id, ts, user_id, event_type, value, props``) is
the oracle substrate, mapped per FIXTURES.md §B:

* ``user_id``  → ``steam_id`` (the aggregation key)
* ``event_type`` → ``type`` via :data:`EVENT_TYPE_MAP`
  (click→kill, error→death, signup→assist, purchase→damage; view→view,
  kept but ignored by the counters, like unknown types in the reference's
  ``default`` switch arm — ``spark/PlayerStatsUpdater.java:53-67``)
* ``ts`` → integer ``second`` (epoch seconds; the reference derives
  ``second = tick / 128`` — integer division, SURVEY §1.2)
* ``value`` → ``amount`` (damage points analog)
* ``round`` → 10-minute bucket of ``second`` (the match-round analog;
  deterministic, shared with the oracle SQL)

Works identically on batch and streaming DataFrames — pure column
expressions, no shuffles, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.functions.scalar import epoch_seconds, int_div

#: driver event_type → reference event type
EVENT_TYPE_MAP = {
    "click": "kill",
    "error": "death",
    "signup": "assist",
    "purchase": "damage",
}

#: seconds per synthetic "round" (10-minute buckets of event time)
ROUND_SECONDS = 600


def _type_col(c: Column) -> Column:
    expr = None
    for src, dst in EVENT_TYPE_MAP.items():
        expr = F.when(c == src, dst) if expr is None else expr.when(c == src, dst)
    return expr.otherwise(c)


def normalize_events(events: DataFrame) -> DataFrame:
    """Project the driver's events table into the reference Event schema."""
    # prefer the exact ns-long when the loader provided it (parquet
    # TIMESTAMP(NANOS) source); epoch-second floor matches DuckDB's
    # floor(epoch(ts)) either way
    if "ts_ns" in events.columns:
        sec = F.expr("ts_ns DIV 1000000000")
    else:
        sec = epoch_seconds(F.col("ts"))
    return events.select(
        F.col("user_id").cast("string").alias("steam_id"),
        _type_col(F.col("event_type")).alias("type"),
        sec.alias("second"),
        F.col("value").alias("amount"),
        int_div(sec, ROUND_SECONDS).alias("round"),
    )


def union_streams(*streams: DataFrame) -> DataFrame:
    """Union N same-schema event streams by name.

    The reference unions its kills- and damages-derived streams
    (``spark/SparkStreamingService.java:101-102``); ``unionByName`` works
    on batch and streaming DataFrames alike and is a no-shuffle operator.
    """
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s)
    return out
