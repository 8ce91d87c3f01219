"""Columnar parsers for the reference's positional-CSV wire formats.

The reference parses Kafka CSV lines with opaque Java lambdas
(``flatMap``/``map`` — reference ``spark/SparkStreamingService.java:134-213``),
which defeat Catalyst (deserialize/serialize barriers around every batch).
Here each parser is a pure column-expression pipeline — ``split`` →
``element_at`` → struct-array ``explode`` with per-branch guards — so the
whole parse stays inside whole-stage codegen and works unchanged on batch
AND streaming DataFrames (the key idiom: source choice is config-only).

Wire layouts (FIXTURES.md §A, traced to the reference):

* kill lines   (≥13 cols): ``[1]=tick, [2]=round, [3]=killer_name,
  [4]=killer_steamid, [7]=victim_name, [8]=victim_steamid,
  [11]=assister_name, [12]=assister_steamid``; one line fans out to 0-3
  events — kill (killer non-empty), death (victim non-empty), assist
  (assister non-empty and != "0").
* damage lines (≥10 cols): ``[1]=tick, [2]=round, [5]=old_hp, [6]=new_hp,
  [9]=damager_steamid``; one event with ``amount = old_hp - new_hp``,
  blank name; empty damager id → row dropped.
* player lines (≥4 cols): ``[0]=name, [1]=steamId, [3]=team``.

``second = tick / 128`` uses Java integer division (128-tick servers).
Parse failures become NULL (``try_cast`` — Spark 4 ANSI mode would throw on plain cast) and are filtered, where
Java would throw — documented deviation, strictly more robust.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.functions.scalar import int_div

#: normalized event schema produced by every parser (reference model/Event.java)
EVENT_COLUMNS = ("player", "steam_id", "type", "second", "amount", "round")


def _field(arr: Column, idx: int) -> Column:
    """0-based positional access (try_element_at is 1-based).

    ``try_element_at``: a line with fewer fields than the layout expects
    yields NULLs and is dropped by the guards, instead of crashing the
    whole (possibly streaming) job under ANSI mode. The reference's Java
    would throw ArrayIndexOutOfBounds and kill the stream on such input.
    """
    return F.try_element_at(arr, F.lit(idx + 1))


def parse_kill_lines(df: DataFrame, col: str = "value") -> DataFrame:
    """1 CSV kill line → 0-3 events (kill / death / assist).

    Columnar re-expression of the reference's flatMap exploder
    (``spark/SparkStreamingService.java:134-177``): build an array of the
    three candidate event structs, keep the ones whose guard passes, and
    explode. ``explode`` of an empty array drops the row — exactly the
    0-event case.
    """
    arr = F.split(F.col(col).cast("string"), ",", -1)
    tick = _field(arr, 1).try_cast("long")
    second = int_div(tick, 128)
    rnd = _field(arr, 2).try_cast("long")

    def ev(name_idx: int, id_idx: int, etype: str) -> Column:
        return F.struct(
            _field(arr, name_idx).alias("player"),
            _field(arr, id_idx).alias("steam_id"),
            F.lit(etype).alias("type"),
            second.alias("second"),
            F.lit(0).cast("long").alias("amount"),
            rnd.alias("round"),
        )

    candidates = F.array(ev(3, 4, "kill"), ev(7, 8, "death"), ev(11, 12, "assist"))
    kept = F.filter(
        candidates,
        lambda s: (s["player"] != "")
        & ~((s["type"] == "assist") & (s["player"] == "0")),
    )
    return (
        df.select(F.explode(kept).alias("e"))
        .select(*[F.col(f"e.{c}").alias(c) for c in EVENT_COLUMNS])
        .filter(F.col("second").isNotNull())  # G3: drop unparseable ticks
    )


def parse_damage_lines(df: DataFrame, col: str = "value") -> DataFrame:
    """1 CSV damage line → 1 event or dropped.

    Columnar re-expression of the reference's map+filter
    (``spark/SparkStreamingService.java:191-212``): blank name by design
    (repaired later by the dimension join), rows with empty/NULL damager
    id or unparseable tick are dropped.
    """
    arr = F.split(F.col(col).cast("string"), ",", -1)
    tick = _field(arr, 1).try_cast("long")
    out = df.select(
        F.lit("").alias("player"),
        _field(arr, 9).alias("steam_id"),
        F.lit("damage").alias("type"),
        int_div(tick, 128).alias("second"),
        (_field(arr, 5).try_cast("long") - _field(arr, 6).try_cast("long")).alias("amount"),
        _field(arr, 2).try_cast("long").alias("round"),
    )
    return out.filter(
        F.col("steam_id").isNotNull()
        & (F.col("steam_id") != "")
        & F.col("second").isNotNull()
    )


def parse_player_lines(df: DataFrame, col: str = "value") -> DataFrame:
    """Dimension CSV → (name, steam_id, team) rows
    (reference ``client/PlayerRestClient.java:59-68``)."""
    arr = F.split(F.col(col).cast("string"), ",", -1)
    return df.select(
        _field(arr, 0).alias("name"),
        _field(arr, 1).alias("steam_id"),
        _field(arr, 3).alias("team"),
    ).filter(F.col("steam_id").isNotNull() & (F.col("steam_id") != ""))
