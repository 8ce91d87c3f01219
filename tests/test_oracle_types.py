"""Oracle output-type audit.

Round 2's only value-level red row (``dedup_simhash_signatures``) was the
one oracle emitting an uncast DuckDB expression: ``list_aggregate(...,
'sum')`` widens BIGINT to HUGEINT (int128), which a type-sensitive
comparator distinguishes from Spark's int64 even at equal values.  DuckDB
widens silently in several places (integer SUM → HUGEINT, AVG → DOUBLE is
fine, etc.), so this audit runs ``DESCRIBE`` on EVERY registered oracle and
asserts each emitted column's type is in the closed set the driver's
comparator treats as equivalent to Spark's types.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from spark_stream_analyzer_spark.sources.tables import TABLES

ALLOWED = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "BOOLEAN",
    # exact decimal money results — Spark DECIMAL(p,s) twins
    # (scale-matched in the queries themselves)
}
ALLOWED_PREFIXES = ("DECIMAL",)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_every_oracle_emits_driver_safe_types(duck):
    oracles = entry_mod.oracle_sql()
    assert oracles, "oracle registry is empty"
    offenders = {}
    for name, sql in oracles.items():
        desc = duck.execute(f"DESCRIBE {sql}").fetchall()
        bad = {
            col: typ
            for col, typ, *_ in desc
            if typ not in ALLOWED and not typ.startswith(ALLOWED_PREFIXES)
        }
        if bad:
            offenders[name] = bad
    assert not offenders, f"oracles emitting driver-unsafe types: {offenders}"
