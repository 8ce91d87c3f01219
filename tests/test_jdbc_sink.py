"""JDBC sink idempotency against embedded Derby (reference K2,
``spark/SparkStreamingService.java:254-295``).

Derby's embedded engine ships in Spark's own jars directory (it backs
the Hive metastore), so this exercises the REAL executor→JDBC write
path — table auto-creation, identifier quoting, type mapping — without
an external database. The reference's sink was driver-serial JPA
inserts with at-least-once duplicates; the rebuild must show zero
duplicates even when a batch is replayed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_stream_analyzer_spark.operators.player_stats import player_stats
from spark_stream_analyzer_spark.sources.wire import parse_kill_lines
from spark_stream_analyzer_spark.streaming.sinks import (
    jdbc_snapshot_batch_writer,
    to_jdbc_snapshots,
)
from spark_stream_analyzer_spark.streaming.sources import file_lines_stream
from spark_stream_analyzer_spark.streaming.stateful import running_player_stats_stream

KILL_B0 = "x,12800,1,Alice,S_A,x,x,Bob,S_B,x,x,Cara,S_C\n"  # sec 100
KILL_B1 = "x,25600,2,Bob,S_B,x,x,Alice,S_A,x,x,0,S_C\n"  # sec 200


def _url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_stream_checkpoint_restart_no_duplicates(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    src.mkdir()
    (src / "000.txt").write_text(KILL_B0)
    url = _url(tmp_path)

    def build():
        ev = parse_kill_lines(file_lines_stream(spark, str(src))).drop("player")
        return running_player_stats_stream(ev)

    q = to_jdbc_snapshots(build(), url, "snapshots", str(ckpt))
    q.processAllAvailable()
    q.stop()

    (src / "001.txt").write_text(KILL_B1)
    q = to_jdbc_snapshots(build(), url, "snapshots", str(ckpt))
    q.processAllAvailable()
    q.stop()

    out = spark.read.jdbc(url, "snapshots")
    # zero duplicate (steam_id, second) rows across the restart
    assert out.count() == out.select("steam_id", "second").distinct().count()
    # update-mode: latest batch per key carries the running totals —
    # compare against the batch twin over the same lines
    latest = (
        out.withColumn(
            "_rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("steam_id")
                .orderBy(F.desc("batch_id"))
            ),
        )
        .filter("_rn = 1")
        .collect()
    )
    batch = {
        r.steam_id: r
        for r in player_stats(
            parse_kill_lines(spark.read.text(str(src))).drop("player")
        ).collect()
    }
    assert {r.steam_id for r in latest} == set(batch) == {"S_A", "S_B", "S_C"}
    for r in latest:
        b = batch[r.steam_id]
        assert (r.kills, r.deaths, r.assists) == (b.kills, b.deaths, b.assists)


def test_jdbc_batch_writer_is_replay_idempotent(spark, tmp_path):
    """Re-running the SAME batch id (failure between sink write and
    checkpoint commit) must rewrite the batch, not duplicate it."""
    url = _url(tmp_path)
    write_batch = jdbc_snapshot_batch_writer(url, "replayed")
    df = spark.createDataFrame(
        [("S_A", 100, 1), ("S_B", 100, 0)], "steam_id string, second long, kills long"
    )
    write_batch(df, 0)
    write_batch(df, 0)  # replay
    write_batch(df.withColumn("second", F.lit(200)), 1)

    out = spark.read.jdbc(url, "replayed")
    assert out.count() == 4  # 2 rows per batch, batch 0 rewritten in place
    assert out.filter("batch_id = 0").count() == 2
    assert (
        out.select("steam_id", "second", "batch_id").distinct().count() == out.count()
    )


def test_postgres_dialect_type_mapping_pinned(spark):
    """The reference sinks to Postgres (reference
    spark/SparkStreamingService.java:260-277); no Postgres server exists
    in this container, but the DIALECT is a driver-side pure function —
    pin Spark's PostgresDialect type mapping for exactly the snapshot
    schema our JDBC sink writes, so a Spark upgrade or a schema edit
    that would break the CREATE TABLE against a real Postgres fails
    here first (Derby exercises the wire contract; this pins the
    Postgres DDL contract).
    """
    jvm = spark._jvm
    dialects = jvm.org.apache.spark.sql.jdbc.JdbcDialects
    d = dialects.get("jdbc:postgresql://host/db")
    assert "PostgresDialect" in d.toString()

    types = jvm.org.apache.spark.sql.types
    def scala_obj(name):
        return getattr(getattr(types, name + "$"), "MODULE$")

    expected = {
        "StringType": "TEXT",      # steam_id / player_name (PG strings are TEXT)
        "LongType": "BIGINT",       # kills/deaths/assists/batch_id
        "DoubleType": "FLOAT8",     # damage / kd_ratio
        "IntegerType": "INTEGER",
        "TimestampType": "TIMESTAMP",
    }
    # Spark resolves a column type as dialect override -> common default
    # (JdbcUtils.getJdbcType); mirror exactly that
    jdbc_utils = getattr(
        getattr(jvm.org.apache.spark.sql.execution.datasources.jdbc, "JdbcUtils$"),
        "MODULE$",
    )
    for tname, want in expected.items():
        dt = scala_obj(tname)
        got = d.getJDBCType(dt)
        if not got.isDefined():
            got = jdbc_utils.getCommonJDBCType(dt)
        assert got.isDefined(), tname
        name = got.get().databaseTypeDefinition()
        assert want in name, f"{tname}: {name} !~ {want}"
    # identifier quoting: our writer DELETEs on "batch_id" (quoted,
    # lowercase) — that must be exactly how the dialect quotes it
    assert d.quoteIdentifier("batch_id") == '"batch_id"'
