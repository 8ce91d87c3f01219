"""Streaming sources — config-swappable, identical post-``load()`` plan.

The reference reads two Kafka topics (``spark/SparkStreamingService.java:
124-132,181-189``: ``startingOffsets=latest``, ``failOnDataLoss=false``).
This environment has no broker, so tests replay fixture CSV files with the
``text`` file source; the downstream pipeline (parse → union → agg) is
source-agnostic, so swapping in Kafka is a pure config change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def file_lines_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """Replay a directory of text files as a stream of ``value:string``
    rows — one file per micro-batch by default (deterministic tests)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


#: the exact relation the spark-sql-kafka connector's ``load()`` returns —
#: used by tests to machine-check the config-swap claim without a broker
KAFKA_RAW_SCHEMA = (
    "key BINARY, value BINARY, topic STRING, partition INT, "
    "offset BIGINT, timestamp TIMESTAMP, timestampType INT"
)


def lines_from_kafka_frames(raw: DataFrame) -> DataFrame:
    """Kafka raw frames → ``value:string`` lines.

    The ONLY kafka-specific transformation in the pipeline (everything
    downstream is source-agnostic): decode the binary payload, drop the
    metadata columns. Factored out so tests can drive it with a
    :data:`KAFKA_RAW_SCHEMA`-shaped stream and prove the swapped-in
    source feeds the identical downstream plan.
    """
    return raw.selectExpr("CAST(value AS STRING) AS value")


def kafka_lines_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Kafka topic → ``value:string`` lines (reference source settings).

    Requires the spark-sql-kafka connector on the classpath; where absent
    (this environment has no broker or connector jar), the post-``load()``
    chain is still exercised end-to-end by replaying wire lines through a
    :data:`KAFKA_RAW_SCHEMA`-shaped stream (``tests/test_streaming.py``).
    """
    df = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
        .load()
    )
    return lines_from_kafka_frames(df)
