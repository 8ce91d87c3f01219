"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value multiset (columns sorted by name,
like the driver's hash). Usage::

    python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod
from spark_stream_analyzer_spark import get_spark
from spark_stream_analyzer_spark.sources.tables import TABLES


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-equivalent value canon: doubles are rounded by the
        # queries themselves; this guards only against -0.0 vs 0.0
        return v + 0.0
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(_canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # driver-fidelity mode: plain session, all Spark defaults — the
        # grading harness does NOT use our tuned get_spark()
        from pyspark.sql import SparkSession

        builder = (
            SparkSession.builder.master("local[8]")
            .appName("verify-vanilla")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
        )
        # configuration-robustness sweeps: e.g.
        # SPARK_GRAFT_EXTRA_CONF="spark.sql.ansi.enabled=false" runs the
        # whole gate under the non-default ANSI mode (r6/r7 sweeps)
        for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
            if "=" in kv:
                k, v = kv.split("=", 1)
                builder = builder.config(k.strip(), v.strip())
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark(app_name="verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        finally:
            # drop localCheckpoint residue between queries (see bench.py)
            try:
                from spark_stream_analyzer_spark.session import unpersist_rdds

                unpersist_rdds(spark)
            except Exception:  # noqa: BLE001
                pass
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        elif len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        else:
            sm, om = rows_multiset(scols, srows), rows_multiset(ocols, orows)
            if sm != om:
                diff1 = [k for k in sm if sm[k] != om.get(k)][:3]
                diff2 = [k for k in om if om[k] != sm.get(k)][:3]
                problems.append(f"values spark-only={diff1} oracle-only={diff2}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print(f"all green ({len([n for n in qs if not only or n in only])} queries)")


if __name__ == "__main__":
    main()
