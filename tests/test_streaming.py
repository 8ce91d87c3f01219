"""Streaming semantics tests (SURVEY §5.3): file-replay sources + memory
sink with processAllAvailable — no Kafka broker needed.

Covers: update-mode emission, cumulative totals across micro-batches,
union of two source streams, exact-parity snapshot quirks (batch-local
maxima, first-non-blank name), checkpoint restart without double-count,
and lifecycle control.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from spark_stream_analyzer_spark.operators.events import union_streams
from spark_stream_analyzer_spark.operators.player_stats import player_stats
from spark_stream_analyzer_spark.sources.wire import parse_damage_lines, parse_kill_lines
from spark_stream_analyzer_spark.streaming.lifecycle import StreamController
from spark_stream_analyzer_spark.streaming.sinks import to_memory, to_parquet_snapshots
from spark_stream_analyzer_spark.streaming.sources import file_lines_stream, rate_stream
from spark_stream_analyzer_spark.streaming.stateful import (
    running_player_stats_stream,
    snapshot_player_stats_stream,
)

KILL_B0 = "x,12800,1,Alice,S_A,x,x,Bob,S_B,x,x,Cara,S_C\n"  # sec 100
KILL_B1 = "x,25600,2,Bob,S_B,x,x,Alice,S_A,x,x,0,S_C\n"  # sec 200, assist dropped
DMG_B0 = "x,12800,1,x,x,100,70,x,x,S_A\n"  # 30 dmg by Alice
DMG_B1 = "x,25600,2,x,x,100,55,x,x,S_B\n"  # 45 dmg by Bob


def _write(p, name, text):
    (p / name).write_text(text)


def _drain(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_union_streaming_running_agg_matches_batch(spark, tmp_path):
    kills_dir, dmg_dir = tmp_path / "kills", tmp_path / "dmg"
    kills_dir.mkdir(), dmg_dir.mkdir()
    _write(kills_dir, "000.txt", KILL_B0)
    _write(kills_dir, "001.txt", KILL_B1)
    _write(dmg_dir, "000.txt", DMG_B0 + DMG_B1)

    k = parse_kill_lines(file_lines_stream(spark, str(kills_dir)))
    d = parse_damage_lines(file_lines_stream(spark, str(dmg_dir)))
    unioned = union_streams(k, d).drop("player")
    q = to_memory(running_player_stats_stream(unioned), "t_running")
    _drain(q)

    # memory/update sink emits one row per key per touching batch; the two
    # sources' batches interleave nondeterministically, but counters are
    # monotone — per-key maxima ARE the final state
    final = {
        r.steam_id: r
        for r in spark.sql(
            "SELECT steam_id, max(kills) AS kills, max(deaths) AS deaths, "
            "max(assists) AS assists, max(damage) AS damage FROM t_running "
            "GROUP BY steam_id"
        ).collect()
    }
    # batch twin over the same lines
    k_b = parse_kill_lines(spark.read.text(str(kills_dir)))
    d_b = parse_damage_lines(spark.read.text(str(dmg_dir)))
    batch = {r.steam_id: r for r in player_stats(union_streams(k_b, d_b).drop("player")).collect()}

    assert set(final) == set(batch) == {"S_A", "S_B", "S_C"}
    for sid in batch:
        s, b = final[sid], batch[sid]
        assert (s.kills, s.deaths, s.assists) == (b.kills, b.deaths, b.assists), sid
        assert abs(s.damage - b.damage) < 1e-9
    assert batch["S_A"].kills == 1 and batch["S_A"].deaths == 1
    assert batch["S_C"].assists == 1  # second assist dropped by the "0" guard


def test_snapshot_stream_exact_parity_quirks(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 0: Alice kills (named), damage by S_A (blank name)
    _write(src, "000.txt", KILL_B0 + DMG_B0)
    # batch 1: only damage by S_A → name must persist from state
    _write(src, "001.txt", "x,38400,3,x,x,100,90,x,x,S_A\n")

    events = parse_kill_lines(file_lines_stream(spark, str(src))).unionByName(
        parse_damage_lines(file_lines_stream(spark, str(src)))
    )
    q = to_memory(snapshot_player_stats_stream(events), "t_snap")
    _drain(q)
    rows = spark.sql("SELECT * FROM t_snap WHERE steam_id = 'S_A' ORDER BY second").collect()
    # one snapshot per batch the key appeared in
    assert len(rows) == 2
    b0, b1 = rows
    # batch-local maxima: second is per-batch, not lifetime
    assert b0.second == 100 and b1.second == 300
    # cumulative counters
    assert b0.kills == 1 and b1.kills == 1
    assert abs(b0.damage - 30.0) < 1e-9 and abs(b1.damage - 40.0) < 1e-9
    # first-non-blank name persisted in state across batches
    assert b0.player_name == "Alice" and b1.player_name == "Alice"


def test_checkpoint_restart_no_duplicates(spark, tmp_path):
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    _write(src, "000.txt", KILL_B0)

    def build():
        ev = parse_kill_lines(file_lines_stream(spark, str(src)))
        return running_player_stats_stream(ev)

    q = to_parquet_snapshots(build(), str(out), str(ckpt))
    q.processAllAvailable()
    q.stop()

    _write(src, "001.txt", KILL_B1)
    q = to_parquet_snapshots(build(), str(out), str(ckpt))
    q.processAllAvailable()
    q.stop()

    snaps = spark.read.option("basePath", str(out)).parquet(str(out))
    latest = {
        r.steam_id: r
        for r in snaps.withColumn(
            "_rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "steam_id"
                ).orderBy(F.desc("batch_id"))
            ),
        )
        .filter("_rn = 1")
        .collect()
    }
    # totals across restart: Alice 1 kill + 1 death (batch 1), Bob 1 kill + 1 death
    assert latest["S_A"].kills == 1 and latest["S_A"].deaths == 1
    assert latest["S_B"].kills == 1 and latest["S_B"].deaths == 1
    # batch partitions are unique (idempotent overwrite, no replays doubled)
    batches = [r.batch_id for r in snaps.select("batch_id").distinct().collect()]
    assert len(batches) == len(set(batches))


def test_lifecycle_controller(spark):
    ctl = StreamController()
    assert ctl.status() == {"running": False}
    assert ctl.stop() is False

    def factory():
        df = rate_stream(spark, rows_per_second=10).selectExpr("CAST(value AS STRING) AS value")
        return to_memory(df, "t_rate", output_mode="append")

    assert ctl.start(factory) is True
    assert ctl.start(factory) is False  # refuse double-start (reference guard)
    deadline = time.time() + 30
    while not ctl.is_running and time.time() < deadline:
        time.sleep(0.2)
    st = ctl.status()
    assert st["running"] is True and "id" in st
    assert ctl.stop() is True
    assert ctl.status() == {"running": False}
