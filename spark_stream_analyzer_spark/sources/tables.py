"""Batch parquet sources for the driver's TPC-H-ish star schema.

Replaces the reference's two batch "sources" — the REST-fetched players
dimension (reference ``client/PlayerRestClient.java:28-51``) and the
Postgres ``player_stats`` table — with plain columnar parquet scans, so
Catalyst gets predicate pushdown + column pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: tables small enough to broadcast at ANY scale factor (bounded cardinality
#: in TPC-H: region=5, nation=25 rows regardless of SF).
ALWAYS_BROADCAST = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table, tolerating nanosecond parquet timestamps.

    The driver writes ``ts`` as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright. We read nanos as raw longs
    (runtime-settable legacy conf — works under any caller's session;
    the conf deliberately stays set for the session so every later
    events read under the same SparkSession decodes consistently) and
    expose BOTH a µs-truncated proper ``ts`` timestamp (for event-time
    windows/watermarks) and the exact ``ts_ns`` long.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        # integer DIV — routing an int64 ns value through double division
        # would lose µs precision (53-bit mantissa < 1.7e18)
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns DIV 1000"))
        )
    else:  # already a timestamp (future driver versions may write µs)
        # unix_micros keeps sub-second precision; unix_timestamp would
        # silently truncate to whole seconds
        df = df.withColumn(
            "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1_000)
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` plans work."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
