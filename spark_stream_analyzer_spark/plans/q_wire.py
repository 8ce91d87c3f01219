"""Oracle-checked wire-parser queries (SURVEY §2.2-2.3: P1-P6, G1-G3).

Strategy: deterministically synthesize the reference's positional CSV
lines FROM the events table inside the Spark query, run the real parsers
(`sources/wire.py`), and have the DuckDB oracle derive the expected
fan-out directly from the events table with CASE guards — an independent
re-derivation, so any index/guard bug in the parser mismatches.

Line synthesis (shared contract, mirrored in the oracle):

* ``sec``  = epoch-second of ts, ``tick`` = ``sec*128 + event_id % 128``
  (so ``tick DIV 128`` must recover ``sec`` exactly)
* ``rnd``  = ``sec DIV 600``
* kill line:   killer   = 'u'||uid  when event_type='click'  else ''
               victim   = 'v'||uid  when event_type='error'  else ''
               assister = 'a'||uid  when 'signup', **'0'** when 'view'
               (exercises the reference's assister-"0" guard on real data)
               all steam ids = 'p'||uid
* damage line: old_hp = 100 + amt, new_hp = 100 (amt = floor(value) % 100,
  floor on BOTH sides — DuckDB CAST(double AS BIGINT) rounds, Spark
  truncates), damager id = '' when event_type='error' (dropped) else 'p'||uid
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.operators.events import union_streams
from spark_stream_analyzer_spark.operators.player_stats import player_stats
from spark_stream_analyzer_spark.plans.registry import register
from spark_stream_analyzer_spark.sources.tables import load_table
from spark_stream_analyzer_spark.sources.wire import (
    parse_damage_lines,
    parse_kill_lines,
    parse_player_lines,
)

# ---------------------------------------------------------------------------
# line synthesis (Spark side)
# ---------------------------------------------------------------------------


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr("ts_ns DIV 1000000000").alias("sec"),
    ).withColumns(
        {
            "tick": F.expr("sec * 128 + event_id % 128"),
            "rnd": F.expr("sec DIV 600"),
            "pid": F.concat(F.lit("p"), F.col("user_id")),
        }
    )


def synth_kill_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _base(spark, sf_dir)
    killer = F.when(F.col("event_type") == "click", F.concat(F.lit("u"), F.col("user_id"))).otherwise("")
    victim = F.when(F.col("event_type") == "error", F.concat(F.lit("v"), F.col("user_id"))).otherwise("")
    assister = (
        F.when(F.col("event_type") == "signup", F.concat(F.lit("a"), F.col("user_id")))
        .when(F.col("event_type") == "view", F.lit("0"))
        .otherwise("")
    )
    return b.select(
        F.concat_ws(
            ",",
            F.lit("x"), F.col("tick"), F.col("rnd"),
            killer, F.col("pid"),
            F.lit("x"), F.lit("x"),
            victim, F.col("pid"),
            F.lit("x"), F.lit("x"),
            assister, F.col("pid"),
        ).alias("value")
    )


def synth_damage_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _base(spark, sf_dir).withColumn("amt", F.expr("CAST(floor(value) AS LONG) % 100"))
    damager = F.when(F.col("event_type") == "error", F.lit("")).otherwise(F.col("pid"))
    return b.select(
        F.concat_ws(
            ",",
            F.lit("x"), F.col("tick"), F.col("rnd"),
            F.lit("x"), F.lit("x"),
            (F.lit(100) + F.col("amt")), F.lit(100),
            F.lit("x"), F.lit("x"),
            damager,
        ).alias("value")
    )


#: oracle mirror of _base
_O_BASE = """
base AS (
  SELECT event_id, user_id, event_type, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CAST(floor(epoch(ts)) AS BIGINT) // 600 AS rnd,
         'p' || CAST(user_id AS VARCHAR) AS pid
  FROM events
)
"""

# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


@register(
    "wire_parse_kills",
    oracle=f"""
    WITH {_O_BASE}
    SELECT 'u' || CAST(user_id AS VARCHAR) AS player, pid AS steam_id,
           'kill' AS type, sec AS second, CAST(0 AS BIGINT) AS amount, rnd AS round
    FROM base WHERE event_type = 'click'
    UNION ALL
    SELECT 'v' || CAST(user_id AS VARCHAR), pid, 'death', sec, CAST(0 AS BIGINT), rnd
    FROM base WHERE event_type = 'error'
    UNION ALL
    SELECT 'a' || CAST(user_id AS VARCHAR), pid, 'assist', sec, CAST(0 AS BIGINT), rnd
    FROM base WHERE event_type = 'signup'
    """,
    doc="G1/P2-P6: kill-line explode fan-out with all three guards "
    "(empty killer/victim skip; assister '0' skip via the 'view' branch)",
)
def q_wire_parse_kills(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_kill_lines(synth_kill_lines(spark, sf_dir))


@register(
    "wire_parse_damages",
    oracle=f"""
    WITH {_O_BASE}
    SELECT '' AS player, pid AS steam_id, 'damage' AS type, sec AS second,
           CAST(floor(value) AS BIGINT) % 100 AS amount, rnd AS round
    FROM base WHERE event_type <> 'error'
    """,
    doc="G2/G3/P5: damage-line parse (amount = old_hp - new_hp), "
    "empty-damager rows dropped",
)
def q_wire_parse_damages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_damage_lines(synth_damage_lines(spark, sf_dir))


@register(
    "wire_parse_players",
    oracle="""
    SELECT c_name AS name, CAST(c_custkey AS VARCHAR) AS steam_id,
           c_mktsegment AS team
    FROM customer
    """,
    doc="S3/P2: player dimension CSV parse (REST-fetched in the reference)",
)
def q_wire_parse_players(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    lines = cust.select(
        F.concat_ws(
            ",", F.col("c_name"), F.col("c_custkey"), F.lit("x"), F.col("c_mktsegment")
        ).alias("value")
    )
    return parse_player_lines(lines)


@register(
    "wire_pipeline_stats",
    oracle=f"""
    WITH {_O_BASE},
    parsed AS (
      SELECT pid AS steam_id, 'kill' AS type, sec AS second,
             CAST(0 AS BIGINT) AS amount, rnd AS round
      FROM base WHERE event_type = 'click'
      UNION ALL
      SELECT pid, 'death', sec, CAST(0 AS BIGINT), rnd FROM base WHERE event_type = 'error'
      UNION ALL
      SELECT pid, 'assist', sec, CAST(0 AS BIGINT), rnd FROM base WHERE event_type = 'signup'
      UNION ALL
      SELECT pid, 'damage', sec, CAST(floor(value) AS BIGINT) % 100, rnd
      FROM base WHERE event_type <> 'error'
    ),
    agg AS (
      SELECT steam_id,
             CAST(COALESCE(SUM(CASE WHEN type = 'kill' THEN 1 END), 0) AS BIGINT) AS kills,
             CAST(COALESCE(SUM(CASE WHEN type = 'death' THEN 1 END), 0) AS BIGINT) AS deaths,
             CAST(COALESCE(SUM(CASE WHEN type = 'assist' THEN 1 END), 0) AS BIGINT) AS assists,
             ROUND(CAST(COALESCE(SUM(CASE WHEN type = 'damage' THEN amount END), 0) AS DOUBLE), 6) AS damage,
             MAX(second) AS second,
             MAX(round) AS round
      FROM parsed GROUP BY steam_id
    )
    SELECT steam_id, kills, deaths, assists, damage, second, round,
           ROUND(CASE WHEN deaths = 0 THEN CAST(kills AS DOUBLE)
                      ELSE CAST(kills AS DOUBLE) / CAST(deaths AS DOUBLE) END, 6) AS kd_ratio,
           CASE WHEN round = 0 THEN NULL
                ELSE ROUND(damage / CAST(round AS DOUBLE), 6) END AS damage_per_round
    FROM agg
    """,
    doc="Full reference pipeline: synth CSV → parse both wire formats → "
    "union (U1) → keyed stats agg (A1-A7) — the end-to-end parity query",
)
def q_wire_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    kills = parse_kill_lines(synth_kill_lines(spark, sf_dir))
    damages = parse_damage_lines(synth_damage_lines(spark, sf_dir))
    return player_stats(union_streams(kills, damages).drop("player"))
