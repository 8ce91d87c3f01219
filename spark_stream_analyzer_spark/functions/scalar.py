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


def msum6(col: Column) -> Column:
    """Order-independent exact SUM for NON-NEGATIVE money-like doubles.

    ``round6(F.sum(double))`` is only stable while accumulated float
    error stays below 5e-7 — the round-4b sf0.1 sweep caught 8 queries
    whose sums drifted a last-ulp apart between Spark's partial-agg
    tree and DuckDB's sequential fold (…160003 vs …160004). The first
    fix (per-addend ``cast(decimal(18,6))``) was exact but put a
    decimal conversion on every row of the hottest aggregates — the r4
    verdict measured ``tpch_pricing_summary`` 0.53→1.22s from it.

    This form stays in pure LONG codegen: quantize each addend once to
    integer micro-units ``m = floor(x*1e6 + 0.5)`` (tie-free — the true
    values carry ≤6 decimals so ``x*1e6`` sits within 1e-4 of an
    integer, never at a tie; ``floor(+0.5)`` runs the same IEEE ops on
    Spark and DuckDB), then run TWO long sums — whole units
    ``m div 1e6`` and micro residue ``m mod 1e6`` — and recombine as
    ``hi + lo/1e6`` in double. Exact integer arithmetic under any
    partitioning / merge order / engine.

    Why split instead of one ``sum(m)``: at 100 TB a TPC-H-Q1-shaped
    group holds ~1.5e11 rows; one micro-unit sum overflows int64 at
    ~9e7 rows/group (1e5-valued money × 1e6), while the split's hi sum
    (≤~1e5/row) and lo sum (<1e6/row) carry ~9e13-row int64 headroom.
    The scaling limit is the final ``hi.cast(double)`` recombination:
    the hi sum stays exactly double-representable only below 2^53,
    i.e. ~9e10 rows/group of 1e5-valued money — past that the int64
    sums are still exact but the double conversion loses last-ulp
    precision (the 1.5e11-row group above sits just over that line;
    keep hi/lo as longs if bit-exactness is required there).

    Domain: non-negative addends (all money/ratio consumers are —
    ``div``/``%`` truncation semantics differ between engines for
    negatives). Oracle twin::

        CAST(SUM(CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT) // 1000000)
             AS DOUBLE)
        + CAST(SUM(CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT) % 1000000)
               AS DOUBLE) / 1000000.0
    """
    m = F.floor(col * F.lit(1_000_000) + F.lit(0.5))
    hi = F.sum(F.call_function("div", m, F.lit(1_000_000).cast("long")))
    lo = F.sum(m % F.lit(1_000_000).cast("long"))
    return hi.cast("double") + lo.cast("double") / F.lit(1_000_000.0)


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
