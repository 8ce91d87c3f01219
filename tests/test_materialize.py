"""The cluster-safe materialization helper (round-7, r6 verdict task 2).

``materialize`` pins fan-out intermediates: persist(DISK_ONLY) by
default (lineage kept — executor-loss recoverable), localCheckpoint on
opt-in. ``lineage_cut`` truncates iterative loops' plans: reliable
checkpoint() when the context has a checkpoint dir, localCheckpoint
otherwise.
"""

from __future__ import annotations

import pytest
from pyspark import StorageLevel
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.functions.materialize import lineage_cut, materialize


def _unset_checkpoint_dir(spark):
    # PySpark has no unsetCheckpointDir; clear the Scala Option directly
    # so session-scoped tests don't leak a dir into later tests
    sc = spark.sparkContext
    setter = getattr(sc._jsc.sc(), "checkpointDir_$eq")
    setter(sc._jvm.scala.Option.apply(None))


def test_materialize_default_is_recoverable_persist(spark, monkeypatch):
    monkeypatch.delenv("SSA_MATERIALIZE", raising=False)
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 7).alias("g"))
    out = materialize(df)
    try:
        # DISK_ONLY blocks, lineage KEPT: the storage level is set and the
        # plan still resolves to the original source (no LogicalRDD swap)
        assert out.storageLevel == StorageLevel.DISK_ONLY
        assert "Range" in out._jdf.queryExecution().analyzed().toString()
        assert out.count() == 1000
        # two consumers agree (the fan-out contract)
        a = out.groupBy("g").count().count()
        b = out.select(F.sum("id")).collect()[0][0]
        assert a == 7 and b == 499500
    finally:
        out.unpersist()


def test_materialize_local_checkpoint_opt_in(spark, monkeypatch):
    monkeypatch.setenv("SSA_MATERIALIZE", "local_checkpoint")
    df = spark.range(0, 100)
    out = materialize(df)
    # localCheckpoint replaces the plan with a materialized-RDD scan
    assert "LogicalRDD" in out._jdf.queryExecution().analyzed().toString()
    assert out.count() == 100


def test_materialize_rejects_unknown_strategy(spark):
    with pytest.raises(ValueError, match="unknown materialize strategy"):
        materialize(spark.range(1), strategy="hdfs_tiered")


def test_lineage_cut_uses_reliable_checkpoint_when_dir_set(spark, tmp_path):
    from spark_stream_analyzer_spark.functions import materialize as M

    sc = spark.sparkContext
    jdir = sc._jsc.sc().getCheckpointDir()
    # an earlier test's loop may have SELF-provisioned a temp dir on the
    # shared session — that must behave like "no dir" for one-off cuts
    if jdir.isDefined():
        cur = jdir.get()  # qualified <dir>/<uuid> form
        assert any(d in cur for d in M._SELF_PROVISIONED_DIRS), (
            "test assumes no EXTERNAL checkpoint dir pre-configured"
        )
    df = spark.range(0, 50).select(F.col("id") * 2)
    # no external dir → localCheckpoint (single-node one-off path)
    local = lineage_cut(df)
    assert local.count() == 50 and not local._jdf.isLocal()
    sc.setCheckpointDir(str(tmp_path / "chk"))
    try:
        cut = lineage_cut(df)
        assert cut.count() == 50
        # reliable checkpoint writes partition files under the dir —
        # the cluster-recoverable form (recomputed from storage, not
        # executor-local blocks)
        files = list((tmp_path / "chk").rglob("part-*"))
        assert files, "expected reliable checkpoint files on disk"
    finally:
        _unset_checkpoint_dir(spark)


def test_iterative_cc_runs_under_reliable_checkpoint(spark, tmp_path):
    """The duplicate_clusters fixpoint loop — the one true lineage_cut
    consumer — converges identically when the cut is a reliable
    checkpoint (cluster mode) instead of localCheckpoint."""
    from spark_stream_analyzer_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (12, 13)],
        ["doc_a", "doc_b"],
    )
    expected = {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10, 13: 10}
    base = {r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
    assert base == expected
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ccchk"))
    try:
        rel = {r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
        assert rel == expected
    finally:
        _unset_checkpoint_dir(spark)


def test_hybrid_stays_local_after_self_provisioned_deep_cut(spark):
    """After a deep cut self-provisions the temp dir (stored by Spark as
    <dir>/<uuid>), subsequent non-deep rounds must STILL take the local
    path — the uuid suffix must not make the dir look external."""
    from spark_stream_analyzer_spark.functions import materialize as M

    df = spark.range(0, 10).select(F.col("id"))
    out = lineage_cut(df, chain=M._DEEP_CUT_EVERY - 1)  # deep cut
    assert out.count() == 10
    sc = spark.sparkContext
    jdir = sc._jsc.sc().getCheckpointDir()
    assert jdir.isDefined()
    if not any(d in jdir.get() for d in M._SELF_PROVISIONED_DIRS):
        # an external dir was configured by the environment: the hybrid
        # correctly defers to always-reliable there — nothing to pin
        return
    calls = []
    cls = type(df)  # Spark 4: the classic subclass overrides the method
    orig = cls.localCheckpoint

    def spy(self, eager=True):
        calls.append(True)
        return orig(self, eager)

    cls.localCheckpoint = spy
    try:
        out2 = lineage_cut(df, chain=0)  # non-deep round
        assert out2.count() == 10
        assert calls, "non-deep round took the reliable path after provision"
    finally:
        cls.localCheckpoint = orig
