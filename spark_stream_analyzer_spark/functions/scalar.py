"""Scalar column helpers pinning the reference's Java arithmetic edges.

The reference computes everything with Java primitives; Spark SQL has
different defaults in exactly three places (SURVEY.md §1.2):

* ``tick / 128`` is *integer* division in Java
  (reference ``spark/SparkStreamingService.java:137,194``) — Spark's ``/``
  promotes to double, so we use ``div``.
* ``kdRatio`` guards division by zero explicitly
  (reference ``spark/PlayerStatsUpdater.java:34-36``).
* ``damagePerRound`` is *unguarded* in Java (÷0 → Infinity,
  reference ``spark/PlayerStatsUpdater.java:37``); we deliberately emit
  NULL instead (Spark/ANSI-SQL semantics) and document the deviation —
  NULL is representable in every sink, Infinity is not.

All helpers are pure Column expressions — they stay inside whole-stage
codegen; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def int_div(col: Column | str, divisor: int | Column) -> Column:
    """Java-style integer division (``tick / 128`` semantics).

    Uses Spark's native integral ``div`` operator: long-typed all the
    way, truncates toward zero like Java ``long / long``, and — unlike a
    double-division round-trip — exact for |values| ≥ 2^53 (a double
    mantissa cannot represent every long). Pure column arithmetic, stays
    in codegen.
    """
    a = (F.col(col) if isinstance(col, str) else col).cast("long")
    b = F.lit(divisor) if isinstance(divisor, int) else divisor.cast("long")
    return F.call_function("div", a, b)


def epoch_seconds(col: Column | str) -> Column:
    """Timestamp → epoch seconds as LONG (UTC session tz).

    Matches DuckDB ``CAST(floor(epoch(ts)) AS BIGINT)`` so oracle value
    hashes line up; also the rebuild's analog of the reference's
    integer ``second`` column (derived ``tick/128``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_timestamp(c).cast("long")


def guarded_ratio(num: Column, den: Column) -> Column:
    """``den == 0 ? num : num / den`` — the reference's kdRatio guard
    (reference ``spark/PlayerStatsUpdater.java:34-36``), as double."""
    return F.when(den == 0, num.cast("double")).otherwise(num.cast("double") / den.cast("double"))


def round6(col: Column) -> Column:
    """Round a double to 6 decimals — stabilizes cross-engine value
    hashes (Spark vs DuckDB double aggregation drift is << 1e-6 at the
    oracle's scale factors)."""
    return F.round(col, 6)


def dsum6(col: Column) -> Column:
    """Order-independent exact SUM for money-like doubles, as double.

    ``round6(F.sum(double))`` is only stable while accumulated float
    error stays below 5e-7 — the round-4b sf0.1 sweep caught 8 queries
    whose sums drifted a last-ulp apart between Spark's partial-agg
    tree and DuckDB's sequential fold (…160003 vs …160004). Casting
    each addend to DECIMAL(18,6) first quantizes identically on both
    engines (the true values carry ≤6 decimals, so the cast is
    lossless) and makes the SUM exact integer arithmetic — any
    partitioning, any merge order, any engine. Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)``.
    """
    return F.sum(col.cast("decimal(18,6)")).cast("double")


def round6_half_up(col: Column) -> Column:
    """Engine-agnostic 6-decimal HALF-UP rounding for positive doubles.

    Spark's ``round`` is HALF_UP, DuckDB's ``round`` is half-to-even on
    doubles — a value landing EXACTLY on a tie (l_extendedprice /
    l_quantity = 266.9078125 at sf0.1) rounds differently. ``floor(x *
    1e6 + 0.5) / 1e6`` runs the same IEEE ops on both engines, so ties
    break identically. Oracle twin: ``floor(x * 1000000 + 0.5) /
    1000000``.
    """
    return F.floor(col * F.lit(1_000_000) + F.lit(0.5)) / F.lit(1_000_000.0)
