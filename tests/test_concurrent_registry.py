"""r10 (VERDICT r9 task 6): concurrent-registry stress.

A 24/7 engine serves concurrent queries; every other gate runs the
registry serially.  This suite runs a mixed batch + live-streaming
query set CONCURRENTLY on one shared SparkSession — including the same
query twice at once — and asserts every run returns the serial row
count.  What this pins structurally:

* no temp-view / sink-name collisions (streaming fixtures must keep
  their uuid-suffixed memory-sink names and mkdtemp workdirs);
* no checkpoint-dir collisions between two live runs of the SAME
  streaming fixture;
* shared-session safety of the query builders (they may set/restore
  session confs — a race there can change a PLAN, never a result).

Known and accepted: the set/restore pattern IS racy under concurrency —
thread A sets shuffle.partitions=2, thread B snapshots 2 as its "prev"
and restores 2, leaving the session at the fixture value (this test
caught exactly that leaking into the AQE skew test downstream). Results
stay correct; only plan knobs drift. A serving deployment would isolate
per-query conf via ``spark.newSession()`` (shared SparkContext,
independent SQL conf); here the test snapshots and restores the knobs
it knows fixtures touch, mirroring that isolation boundary.

The global ``unpersist_rdds`` sweep is deliberately NOT run between
concurrent queries (it would free another thread's in-flight blocks —
exactly the bug this test would catch); it runs once at the end, as a
serving loop would between request waves.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from spark_stream_analyzer_spark.plans import registry

SF = "/root/testdata/sf0.001"

# mixed families: scans, joins, windows, dedup, text, a format
# round-trip with its own tempdir, and a LIVE streaming fixture
MIX = (
    "tpch_pricing_summary",
    "dedup_exact",
    "events_tumbling_daily",
    "orders_rollup_totals",
    "text_token_stats",
    "similarity_topk_bruteforce",
    "source_csv_roundtrip",
    "streaming_windowed_counts",
)


_FIXTURE_CONFS = (
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.enabled",
    "spark.sql.autoBroadcastJoinThreshold",
)


def test_concurrent_mixed_registry_matches_serial(spark):
    from spark_stream_analyzer_spark.session import unpersist_rdds

    snap = {k: spark.conf.get(k) for k in _FIXTURE_CONFS}
    qs = registry.queries()
    # serial reference counts first (also warms codegen so the
    # concurrent phase measures interference, not compilation)
    expected = {n: len(qs[n](spark, SF).collect()) for n in MIX}
    unpersist_rdds(spark)

    def run(name: str) -> tuple[str, int]:
        return name, len(qs[name](spark, SF).collect())

    # each query twice, interleaved: 16 concurrent runs on 8 workers —
    # the same-name duplicate is the collision probe
    jobs = list(MIX) * 2
    try:
        with ThreadPoolExecutor(max_workers=len(MIX)) as ex:
            results = list(ex.map(run, jobs))
    finally:
        unpersist_rdds(spark)
        # undo any conf drift from racing set/restore pairs (see module
        # docstring) so later suites see the session they expect
        for k, v in snap.items():
            spark.conf.set(k, v)

    mismatches = [
        (name, got, expected[name])
        for name, got in results
        if got != expected[name]
    ]
    assert not mismatches, f"concurrent runs diverged from serial: {mismatches}"
    assert len(results) == len(jobs)


def test_newsession_isolates_fixture_confs(spark):
    """The serving-isolation boundary the module docstring recommends,
    demonstrated: two spark.newSession() handles share the SparkContext
    (one JVM, one block manager) but hold INDEPENDENT SQL confs — a
    fixture pinning shuffle partitions in one session must not leak into
    the other, which is exactly what the shared-session set/restore race
    cannot guarantee."""
    s1 = spark.newSession()
    s2 = spark.newSession()
    base = spark.conf.get("spark.sql.shuffle.partitions")
    s1.conf.set("spark.sql.shuffle.partitions", "2")
    assert s2.conf.get("spark.sql.shuffle.partitions") == base
    assert spark.conf.get("spark.sql.shuffle.partitions") == base
    # and the isolated setting is live for s1's plans
    df = s1.range(0, 1000).selectExpr("id % 7 AS k").groupBy("k").count()
    parts = df.rdd.getNumPartitions()
    assert parts <= 2
