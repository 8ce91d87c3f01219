"""Unit tests for the core keyed aggregation (SURVEY §2.5 A1-A7).

Edge cases pinned per FIXTURES.md: zero-death K/D, round-0
damage_per_round, unknown event types ignored, damage with no kills.
"""

from __future__ import annotations

from pyspark.sql import Row

from spark_stream_analyzer_spark.operators.events import normalize_events
from spark_stream_analyzer_spark.operators.player_stats import (
    player_stats,
    player_stats_timeseries,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(steam_id=r[0], type=r[1], second=r[2], amount=r[3], round=r[4]) for r in rows],
        schema="steam_id string, type string, second long, amount double, round long",
    )


def test_counters_and_ratios(spark):
    df = _events(
        spark,
        [
            ("p1", "kill", 10, 0.0, 1),
            ("p1", "kill", 11, 0.0, 1),
            ("p1", "death", 12, 0.0, 1),
            ("p1", "assist", 13, 0.0, 2),
            ("p1", "damage", 14, 37.0, 2),
            ("p1", "damage", 15, 63.0, 2),
            ("p1", "view", 16, 99.0, 2),  # unknown type: ignored by counters
        ],
    )
    [r] = player_stats(df).collect()
    assert (r.kills, r.deaths, r.assists) == (2, 1, 1)
    assert r.damage == 100.0
    assert r.second == 16 and r.round == 2
    assert r.kd_ratio == 2.0
    assert r.damage_per_round == 50.0


def test_zero_death_kd_is_kills(spark):
    df = _events(spark, [("p1", "kill", 1, 0.0, 1), ("p1", "kill", 2, 0.0, 1)])
    [r] = player_stats(df).collect()
    assert r.deaths == 0 and r.kd_ratio == 2.0  # guard: kills, not div/0


def test_round_zero_damage_per_round_is_null(spark):
    df = _events(spark, [("p1", "damage", 1, 10.0, 0)])
    [r] = player_stats(df).collect()
    assert r.damage == 10.0 and r.damage_per_round is None


def test_damage_only_player_has_zero_counters(spark):
    df = _events(spark, [("p9", "damage", 5, 42.0, 3)])
    [r] = player_stats(df).collect()
    assert (r.kills, r.deaths, r.assists) == (0, 0, 0)
    assert r.kd_ratio == 0.0


def test_timeseries_running_totals(spark):
    df = _events(
        spark,
        [
            ("p1", "kill", 10, 0.0, 1),
            ("p1", "damage", 10, 30.0, 1),
            ("p1", "kill", 20, 0.0, 2),
            ("p1", "death", 30, 0.0, 3),
        ],
    )
    rows = {r.second: r for r in player_stats_timeseries(df).collect()}
    assert rows[10].kills == 1 and rows[10].damage == 30.0
    assert rows[20].kills == 2 and rows[20].damage == 30.0
    assert rows[30].kills == 2 and rows[30].deaths == 1
    # final snapshot equals the lifetime aggregate (stream/batch consistency)
    [life] = player_stats(df).collect()
    last = rows[30]
    assert (last.kills, last.deaths, last.assists, last.damage) == (
        life.kills,
        life.deaths,
        life.assists,
        life.damage,
    )


def test_normalize_events_mapping(spark, sf_dir):
    from spark_stream_analyzer_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    norm = normalize_events(ev)
    assert set(norm.columns) == {"steam_id", "type", "second", "amount", "round"}
    types = {r.type for r in norm.select("type").distinct().collect()}
    assert types == {"kill", "death", "assist", "damage", "view"}
    # round is derived from second by integer division
    bad = norm.filter((F_round_check := (norm.second / 600).cast("long")) != norm.round)
    assert bad.count() == 0
