"""Reference-parity queries (SURVEY §2) over the driver's tables.

Domain mapping per FIXTURES.md §B: ``events`` stands in for the unioned
kill/damage event stream (``user_id`` = player key), ``customer`` for the
players dimension. Each query re-expresses one operator cluster from the
reference:

* ``player_stats``            — A1-A7 cumulative keyed agg (the engine core)
* ``player_stats_named``      — + J6 broadcast dim join (name repair)
* ``player_stats_timeseries`` — the append-only snapshot table (K2 analog)
* ``latest_snapshot``         — Q1 latest-per-player argmax (J1/W1)
* ``player_trend``            — Q2 equi-join trend (J2)
* ``pivot_asof``              — Q3 spine × dim grid, as-of forward fill,
                                pivot (J3/J4/J5/A9/W3)
* ``union_kill_damage``       — U1 streaming-union analog
* ``distinct_rounds``         — A10/W2 distinct + sort
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_stream_analyzer_spark.functions.scalar import round6
from spark_stream_analyzer_spark.operators.events import normalize_events
from spark_stream_analyzer_spark.operators.player_stats import (
    player_stats,
    player_stats_timeseries,
    player_stats_with_names,
)
from spark_stream_analyzer_spark.plans.registry import register
from spark_stream_analyzer_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# shared oracle fragments
# ---------------------------------------------------------------------------

#: DuckDB mirror of operators/events.py::normalize_events
NORM_CTE = """
norm AS (
  SELECT CAST(user_id AS VARCHAR) AS steam_id,
         CASE event_type
           WHEN 'click' THEN 'kill'
           WHEN 'error' THEN 'death'
           WHEN 'signup' THEN 'assist'
           WHEN 'purchase' THEN 'damage'
           ELSE event_type END AS type,
         CAST(floor(epoch(ts)) AS BIGINT) AS second,
         value AS amount,
         CAST(floor(epoch(ts)) AS BIGINT) // 600 AS round
  FROM events
)
"""

#: DuckDB mirror of operators/player_stats.py::player_stats (lifetime agg)
STATS_CTE = """
agg AS (
  SELECT steam_id,
         CAST(COALESCE(SUM(CASE WHEN type = 'kill' THEN 1 END), 0) AS BIGINT) AS kills,
         CAST(COALESCE(SUM(CASE WHEN type = 'death' THEN 1 END), 0) AS BIGINT) AS deaths,
         CAST(COALESCE(SUM(CASE WHEN type = 'assist' THEN 1 END), 0) AS BIGINT) AS assists,
         ROUND(COALESCE(SUM(CASE WHEN type = 'damage' THEN amount END), 0), 6) AS damage,
         MAX(second) AS second,
         MAX(round) AS round
  FROM norm
  GROUP BY steam_id
),
stats AS (
  SELECT steam_id, kills, deaths, assists, damage, second, round,
         ROUND(CASE WHEN deaths = 0 THEN CAST(kills AS DOUBLE)
                    ELSE CAST(kills AS DOUBLE) / CAST(deaths AS DOUBLE) END, 6) AS kd_ratio,
         CASE WHEN round = 0 THEN NULL
              ELSE ROUND(damage / CAST(round AS DOUBLE), 6) END AS damage_per_round
  FROM agg
)
"""

#: DuckDB mirror of player_stats_timeseries (running snapshots)
TS_CTE = """
per_sec AS (
  SELECT steam_id, second,
         CAST(COALESCE(SUM(CASE WHEN type = 'kill' THEN 1 END), 0) AS BIGINT) AS d_kills,
         CAST(COALESCE(SUM(CASE WHEN type = 'death' THEN 1 END), 0) AS BIGINT) AS d_deaths,
         CAST(COALESCE(SUM(CASE WHEN type = 'assist' THEN 1 END), 0) AS BIGINT) AS d_assists,
         COALESCE(SUM(CASE WHEN type = 'damage' THEN amount END), 0) AS d_damage,
         MAX(round) AS d_round
  FROM norm
  GROUP BY steam_id, second
),
run AS (
  SELECT steam_id, second,
         CAST(SUM(d_kills) OVER w AS BIGINT) AS kills,
         CAST(SUM(d_deaths) OVER w AS BIGINT) AS deaths,
         CAST(SUM(d_assists) OVER w AS BIGINT) AS assists,
         ROUND(SUM(d_damage) OVER w, 6) AS damage,
         MAX(d_round) OVER w AS round
  FROM per_sec
  WINDOW w AS (PARTITION BY steam_id ORDER BY second
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
ts AS (
  SELECT steam_id, second, kills, deaths, assists, damage, round,
         ROUND(CASE WHEN deaths = 0 THEN CAST(kills AS DOUBLE)
                    ELSE CAST(kills AS DOUBLE) / CAST(deaths AS DOUBLE) END, 6) AS kd_ratio,
         CASE WHEN round = 0 THEN NULL
              ELSE ROUND(damage / CAST(round AS DOUBLE), 6) END AS damage_per_round
  FROM run
)
"""


def _norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_events(load_table(spark, sf_dir, "events"))


def _dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Players dimension analog: customer key/name/segment."""
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("steam_id"),
        F.col("c_name").alias("player_name"),
        F.col("c_mktsegment").alias("team"),
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


@register(
    "player_stats",
    oracle=f"WITH {NORM_CTE}, {STATS_CTE} SELECT * FROM stats",
    doc="A1-A7: lifetime per-player conditional counters + guarded ratios",
)
def q_player_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return player_stats(_norm(spark, sf_dir))


@register(
    "player_stats_named",
    oracle=f"""
    WITH {NORM_CTE}, {STATS_CTE}
    SELECT s.*, d.player_name, d.team
    FROM stats s
    LEFT JOIN (SELECT CAST(c_custkey AS VARCHAR) AS steam_id,
                      c_name AS player_name, c_mktsegment AS team
               FROM customer) d USING (steam_id)
    """,
    doc="J6: stats + broadcast dimension name repair",
)
def q_player_stats_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    return player_stats_with_names(_norm(spark, sf_dir), _dim(spark, sf_dir))


@register(
    "player_stats_timeseries",
    oracle=f"WITH {NORM_CTE}, {TS_CTE} SELECT * FROM ts",
    doc="K2 analog: append-only running snapshot per (player, active second)",
)
def q_player_stats_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    return player_stats_timeseries(_norm(spark, sf_dir))


@register(
    "latest_snapshot",
    oracle=f"""
    WITH {NORM_CTE}, {TS_CTE}
    SELECT steam_id, second, kills, deaths, assists, damage, kd_ratio
    FROM ts
    QUALIFY row_number() OVER (PARTITION BY steam_id ORDER BY second DESC) = 1
    """,
    doc="Q1/J1/W1: latest row per key via window argmax "
    "(reference sql/queries.sql:5-13 double-join, rebuilt as row_number)",
)
def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ts = player_stats_timeseries(_norm(spark, sf_dir))
    w = Window.partitionBy("steam_id").orderBy(F.desc("second"))
    return (
        ts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("steam_id", "second", "kills", "deaths", "assists", "damage", "kd_ratio")
    )


@register(
    "player_trend",
    oracle=f"""
    WITH {NORM_CTE}, {TS_CTE}
    SELECT t.steam_id, d.player_name, t.second, t.damage_per_round
    FROM ts t
    JOIN (SELECT CAST(c_custkey AS VARCHAR) AS steam_id, c_name AS player_name
          FROM customer WHERE c_custkey < 10) d USING (steam_id)
    """,
    doc="Q2/J2: per-player trend, equi-join with filtered dim "
    "(reference sql/queries.sql:18-21 generalizes the literal id=1)",
)
def q_player_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ts = player_stats_timeseries(_norm(spark, sf_dir))
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 10)
        .select(
            F.col("c_custkey").cast("string").alias("steam_id"),
            F.col("c_name").alias("player_name"),
        )
    )
    return ts.join(F.broadcast(dim), "steam_id").select(
        "steam_id", "player_name", "second", "damage_per_round"
    )


_PIVOT_IDS = [str(i) for i in range(10)]


@register(
    "pivot_asof",
    oracle=f"""
    WITH {NORM_CTE},
    spine AS (SELECT DISTINCT round FROM norm),
    users AS (SELECT CAST(i AS VARCHAR) AS steam_id FROM range(10) t(i)),
    vals AS (
      SELECT steam_id, round,
             SUM(CASE WHEN type = 'damage' THEN amount END) AS dmg
      FROM norm GROUP BY steam_id, round
    ),
    grid AS (SELECT s.round, u.steam_id FROM spine s CROSS JOIN users u),
    filled AS (
      SELECT g.round, g.steam_id,
             ROUND(COALESCE(last_value(v.dmg IGNORE NULLS) OVER (
               PARTITION BY g.steam_id ORDER BY g.round
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 6) AS fv
      FROM grid g LEFT JOIN vals v
        ON v.round = g.round AND v.steam_id = g.steam_id
    )
    SELECT round,
           {", ".join(f"MAX(CASE WHEN steam_id = '{i}' THEN fv END) AS player_{i}" for i in _PIVOT_IDS)}
    FROM filled GROUP BY round
    """,
    doc="Q3/J3-J5/A9/W3: time-spine × dim grid, as-of forward-fill "
    "(reference sql/queries.sql:30-69 correlated subquery → window fill), pivot",
)
def q_pivot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = _norm(spark, sf_dir)
    spine = norm.select("round").distinct()
    users = spark.range(10).select(F.col("id").cast("string").alias("steam_id"))
    vals = (
        norm.groupBy("steam_id", "round")
        .agg(F.sum(F.when(F.col("type") == "damage", F.col("amount"))).alias("dmg"))
    )
    grid = spine.crossJoin(F.broadcast(users))
    w = (
        Window.partitionBy("steam_id")
        .orderBy("round")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        grid.join(vals, ["round", "steam_id"], "left")
        .withColumn("fv", round6(F.coalesce(F.last("dmg", ignorenulls=True).over(w), F.lit(0.0))))
    )
    pivoted = filled.groupBy("round").pivot("steam_id", _PIVOT_IDS).agg(F.first("fv"))
    return pivoted.select(
        "round", *[F.col(i).alias(f"player_{i}") for i in _PIVOT_IDS]
    )


@register(
    "union_kill_damage",
    oracle=f"""
    WITH {NORM_CTE},
    kills AS (SELECT * FROM norm WHERE type IN ('kill', 'death', 'assist')),
    damages AS (SELECT * FROM norm WHERE type = 'damage'),
    unioned AS (SELECT * FROM kills UNION ALL SELECT * FROM damages)
    SELECT type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COALESCE(SUM(amount), 0), 6) AS total_amount
    FROM unioned GROUP BY type
    """,
    doc="U1: union of the two parsed streams (kill-events ∪ damage-events), "
    "then a per-type rollup (reference SparkStreamingService.java:101-102)",
)
def q_union_kill_damage(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = _norm(spark, sf_dir)
    kills = norm.filter(F.col("type").isin("kill", "death", "assist"))
    damages = norm.filter(F.col("type") == "damage")
    from spark_stream_analyzer_spark.operators.events import union_streams

    return (
        union_streams(kills, damages)
        .groupBy("type")
        .agg(
            F.count("*").alias("n"),
            round6(F.coalesce(F.sum("amount"), F.lit(0.0))).alias("total_amount"),
        )
    )


@register(
    "distinct_rounds",
    oracle=f"WITH {NORM_CTE} SELECT DISTINCT round FROM norm ORDER BY round",
    doc="A10/W2: distinct time spine + global sort (reference sql/queries.sql:31-35)",
)
def q_distinct_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _norm(spark, sf_dir).select("round").distinct().orderBy("round")
