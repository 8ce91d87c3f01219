"""Event-time windowed aggregation (EXT — SURVEY §2.9: the reference has
no windows; cumulative-only state at ``spark/PlayerStatsUpdater.java:19-32``).

Builders work on BOTH batch and streaming DataFrames — ``F.window`` /
``F.session_window`` are plan-agnostic, which is the core Spark idiom
this engine leans on: the oracle checks the batch form, the streaming
tests replay the same function over a file source.

Scale notes: tumbling/sliding windows are plain groupBy shuffles on
(window, keys) — bounded state per window in streaming when a watermark
is set (required for append mode / state eviction; without one, update
mode keeps all windows forever, the reference's unbounded-state shape).
Session windows use Spark's native session merge (sorted within key
partition); skewed keys are the usual salting candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str | None) -> DataFrame:
    """Attach an event-time watermark (streaming late-data bound).

    ``delay=None`` → accept all late data with unbounded state (the
    reference's semantics — SURVEY §2.9 'Watermarks: none').
    """
    if delay is None or not df.isStreaming:
        return df
    return df.withWatermark(ts_col, delay)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Fixed non-overlapping windows; epoch-aligned (1970-01-01 UTC)."""
    df = with_watermark(df, ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration), *keys).agg(*aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    df = with_watermark(df, ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration, slide), *keys).agg(*aggs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Dynamic-size sessions: events merge while consecutive gaps < gap;
    window end = last event + gap (half-open, so an event exactly ``gap``
    after the previous one starts a NEW session)."""
    df = with_watermark(df, ts_col, watermark)
    return df.groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs)
