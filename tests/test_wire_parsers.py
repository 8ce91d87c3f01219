"""Wire-format parser tests (SURVEY §2.2-2.3, FIXTURES.md §A edge set).

Every FIXTURES.md edge case: empty killer, empty victim, assister "0",
damage with empty damager id, unparseable tick, integer tick division.
"""

from __future__ import annotations

from spark_stream_analyzer_spark.sources.wire import (
    parse_damage_lines,
    parse_kill_lines,
    parse_player_lines,
)


def _lines(spark, *lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_kill_line_full_fanout(spark):
    df = _lines(spark, "x,12800,3,PlayerA,STEAM_1,x,x,PlayerB,STEAM_2,x,x,PlayerC,STEAM_3")
    rows = sorted(parse_kill_lines(df).collect(), key=lambda r: r.type)
    assert [(r.type, r.player, r.steam_id) for r in rows] == [
        ("assist", "PlayerC", "STEAM_3"),
        ("death", "PlayerB", "STEAM_2"),
        ("kill", "PlayerA", "STEAM_1"),
    ]
    assert all(r.second == 100 and r.round == 3 and r.amount == 0 for r in rows)


def test_kill_line_guards(spark):
    # empty killer → no kill; empty victim → no death; assister "0" → no assist
    df = _lines(
        spark,
        "x,128,1,,STEAM_1,x,x,PlayerB,STEAM_2,x,x,0,STEAM_3",
        "x,128,1,PlayerA,STEAM_1,x,x,,STEAM_2,x,x,,STEAM_3",
    )
    rows = parse_kill_lines(df).collect()
    assert sorted(r.type for r in rows) == ["death", "kill"]


def test_kill_line_tick_integer_division(spark):
    df = _lines(spark, "x,255,1,A,S1,x,x,,,x,x,,")  # 255/128 = 1 (trunc), not 2
    [r] = parse_kill_lines(df).collect()
    assert r.second == 1


def test_kill_line_bad_tick_dropped(spark):
    df = _lines(spark, "x,notanumber,1,A,S1,x,x,,,x,x,,")
    assert parse_kill_lines(df).count() == 0


def test_damage_line(spark):
    df = _lines(spark, "x,25600,5,x,x,100,73,x,x,STEAM_1")
    [r] = parse_damage_lines(df).collect()
    assert (r.player, r.steam_id, r.type) == ("", "STEAM_1", "damage")
    assert (r.second, r.amount, r.round) == (200, 27, 5)


def test_damage_line_empty_damager_dropped(spark):
    df = _lines(spark, "x,25600,5,x,x,100,73,x,x,")
    assert parse_damage_lines(df).count() == 0


def test_player_lines(spark):
    df = _lines(spark, "Alice,STEAM_1,x,TeamA", "Bob,STEAM_2,x,TeamB")
    rows = sorted(parse_player_lines(df).collect(), key=lambda r: r.name)
    assert [(r.name, r.steam_id, r.team) for r in rows] == [
        ("Alice", "STEAM_1", "TeamA"),
        ("Bob", "STEAM_2", "TeamB"),
    ]


def test_parsers_work_on_streaming_df(spark, tmp_path):
    # same function must work on a streaming DataFrame (config-only source swap)
    p = tmp_path / "in"
    p.mkdir()
    (p / "batch0.txt").write_text(
        "x,12800,3,PlayerA,STEAM_1,x,x,PlayerB,STEAM_2,x,x,PlayerC,STEAM_3\n"
    )
    stream = spark.readStream.format("text").schema("value string").load(str(p))
    parsed = parse_kill_lines(stream)
    q = (
        parsed.writeStream.format("memory")
        .queryName("wire_stream_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM wire_stream_test").collect()
    finally:
        q.stop()
    assert sorted(r.type for r in rows) == ["assist", "death", "kill"]
