"""SparkSession factory with scale-aware defaults.

The reference creates a bare ``local[*]`` session with all Spark defaults
(reference ``spark/SparkStreamingService.java:76-80``) — including 200
shuffle partitions for a ~10-key stream. Here we centralize a tuned
configuration that is correct on ``local[N]`` test runs and remains sane
on a real multi-executor cluster:

* AQE on (runtime partition coalescing, skew-join splitting);
* shuffle partitions sized from available cores (overridable; a cluster
  deployment would raise this to ~2-3x total cores);
* Arrow enabled for the few Pandas-UDF paths (vectorized transfer);
* UTC session timezone so epoch arithmetic matches the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "spark-stream-analyzer",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    On a shared test host this reuses any active session; config options
    that require a fresh JVM are applied only when creating one.
    """
    cpus = str(cpus or DEFAULT_CPUS)
    n_shuffle = int(shuffle_partitions or max(int(cpus), 8))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # -- memory --------------------------------------------------------
        # Spark's 1g default heap is sized for a driver-only process, but
        # local[N] hosts ALL executor tasks in this one JVM: 32 concurrent
        # tasks x a few hundred MB of shuffle/agg pages blows 1g instantly.
        # ~512m/core keeps execution memory per task in the range a real
        # executor would provide. Only applies when this call creates the
        # JVM (driver memory cannot change on a live session).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", f"{max(int(cpus) // 2, 4)}g"),
        )
        # -- planner / optimizer ------------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # -- IO ------------------------------------------------------------
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # -- python interop ------------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- determinism for the oracle ------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # quieter local runs
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """IDs of every RDD currently persisted/checkpointed in the context.

    ``localCheckpoint`` persists its RDD and Spark's ContextCleaner only
    frees the blocks when the JVM-side reference is GC'd — which, with
    Py4J holding references, can be never within a long session. Round-3
    benchmarking showed these blocks accumulating across a 125-query run
    (storage-memory residue ≈ across-the-board slowdown), so iterative
    operators and the bench harness scope their checkpoints explicitly
    via this + :func:`unpersist_rdds`.
    """
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def unpersist_rdds(
    spark: SparkSession, ids: set[int] | None = None, blocking: bool = False
) -> int:
    """Unpersist the given RDD ids (or every persistent RDD if ``None``).

    Returns the number of RDDs unpersisted. Safe to call on ids that have
    already been freed. The full sweep (``ids=None``) also clears the SQL
    CacheManager so ``materialize``'s persisted DataFrames don't leave
    stale InMemoryRelation entries that later identical plan fragments
    would silently re-cache against.
    """
    if ids is None:
        # clear the SQL cache FIRST: it unpersists its own relations, so
        # the RDD-level loop below only sees what remains (checkpoint
        # residue) — the other order double-frees and spams
        # "Asked to remove block" warnings
        spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for k in list(jmap.keySet().toArray()):
        if ids is None or int(k) in ids:
            jmap.get(k).unpersist(blocking)
            n += 1
    return n
