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


class _LazyQueryDict(dict):
    """Self-populating registry: a miss triggers ``_load_all()`` once.

    Tests (and any other caller) may index ``QUERIES`` directly without
    first going through ``queries()`` — round 2 shipped a test file that
    did exactly that and died on an empty dict.
    """

    def __missing__(self, key: str) -> QuerySpec:
        _load_all()
        try:
            return dict.__getitem__(self, key)
        except KeyError:
            raise KeyError(key) from None


QUERIES: dict[str, QuerySpec] = _LazyQueryDict()


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

#: The driver snapshots only the first ~50 names of ``queries()``
#: iteration order per round (``CORRECTNESS_r{N}.json``).  Rounds 6-11
#: hand-curated a priority tuple here under a standing rule ("new +
#: changed-code rows first, then rotate the oldest greens"); since r12
#: the ENTIRE order is computed by :mod:`.history` from the driver's own
#: CORRECTNESS artifacts plus git staleness — never-green rows first,
#: then stale-after-edit rows (freshest edits leading), then the rest
#: oldest-green-first.  ``_DRIVER_PRIORITY`` is bound to the computed
#: permutation at load time; tests assert its structural invariants
#: (tests/test_sampling_guard.py) instead of trusting curation.
_DRIVER_PRIORITY: tuple = ()


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from spark_stream_analyzer_spark.plans import (  # noqa: F401
        q_analytics,
        q_formats,
        q_llm,
        q_reference,
        q_setops,
        q_streaming,
        q_tpch,
        q_windows,
        q_wire,
    )

    _LOADED = True
    # Reorder into the computed driver-sample priority (pure reordering —
    # a permutation of registration order, no entry added or dropped).
    global _DRIVER_PRIORITY
    from spark_stream_analyzer_spark.plans import history

    items = dict(QUERIES)
    _DRIVER_PRIORITY = history.priority_order(
        {name: spec.build for name, spec in items.items()}
    )
    QUERIES.clear()
    for name in _DRIVER_PRIORITY:
        QUERIES[name] = items.pop(name)
    QUERIES.update(items)  # defensive: history must return a permutation
