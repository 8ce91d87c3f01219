"""Per-query profiler for optimization work (r14).

Usage:  python tools/profile_query.py [--sf SF_DIR] [--explain DIR] [--runs N] q1 q2 ...

For each named registry query: time the build phase (``fn(spark, sf_dir)``,
which for training-loop rows includes driver-side iteration) and the
collect phase separately, count the Spark jobs each phase issued, and
optionally dump ``.explain("formatted")`` of the returned DataFrame to
``<DIR>/<name>.txt``.  Mirrors bench.py's session + warm-up conventions so
numbers are comparable to BENCH_DETAIL.json rows.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_stream_analyzer_spark import get_spark
from spark_stream_analyzer_spark.plans import registry
from spark_stream_analyzer_spark.session import unpersist_rdds


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--explain", default=None, help="dir for explain dumps")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--suffix", default="", help="suffix for explain files")
    args = ap.parse_args()

    os.environ.setdefault("SSA_MATERIALIZE", "local_checkpoint")
    spark = get_spark(app_name="ssa-profile")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from spark_stream_analyzer_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, args.sf, t).limit(1).collect()

    qs = registry.queries()
    names = []
    for pat in args.queries:
        hits = [n for n in qs if n == pat] or [n for n in qs if pat in n]
        names.extend(h for h in hits if h not in names)

    for name in names:
        fn = qs[name]
        # warm run at sf0.001 (codegen/JIT) unless streaming (own cost)
        small = os.path.join(os.path.dirname(args.sf.rstrip("/")), "sf0.001")
        if not name.startswith("streaming_") and os.path.isdir(small):
            try:
                fn(spark, small).collect()
            except Exception as e:  # noqa: BLE001
                print(f"## warm {name} failed: {e}")
            unpersist_rdds(spark)
        for r in range(args.runs):
            j0 = sc._jsc.sc().dagScheduler().nextJobId()
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            j1 = sc._jsc.sc().dagScheduler().nextJobId()
            n = len(df.collect())
            t2 = time.perf_counter()
            j2 = sc._jsc.sc().dagScheduler().nextJobId()
            print(
                f"{name}: run{r} build={t1 - t0:.2f}s ({j1 - j0} jobs) "
                f"collect={t2 - t1:.2f}s ({j2 - j1} jobs) total={t2 - t0:.2f}s "
                f"rows={n}",
                flush=True,
            )
            if args.explain and r == 0:
                os.makedirs(args.explain, exist_ok=True)
                path = os.path.join(args.explain, f"{name}{args.suffix}.txt")
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(path, "w") as f:
                    f.write(buf.getvalue())
                print(f"  explain -> {path}")
            unpersist_rdds(spark)


if __name__ == "__main__":
    main()
