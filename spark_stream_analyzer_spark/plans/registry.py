"""Query registry — every operator's oracle-checkable form lives here.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent DuckDB oracle SQL string over
the same parquet tables. The driver hash-compares both at sf0.01
(row count + schema + order-insensitive value hash, columns sorted by
name) — so **every computed column is aliased identically on both
sides**, doubles are rounded to 6 decimals, and timestamps are reduced to
epoch-second longs / dates.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def wrap(fn):
        QUERIES[name] = QuerySpec(build=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.build for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from spark_stream_analyzer_spark.plans import (  # noqa: F401
        q_analytics,
        q_llm,
        q_reference,
        q_setops,
        q_streaming,
        q_tpch,
        q_windows,
        q_wire,
    )

    _LOADED = True
