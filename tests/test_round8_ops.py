"""Semantic tests for the round-8 operators — known-answer checks on
hand-built frames (the oracle sweep proves parity with DuckDB; these
prove the SEMANTICS are the intended ones on inputs where the answer is
computable by eye)."""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: N812
import pytest

from spark_stream_analyzer_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_wirelog_writer_roundtrip_append_overwrite(spark, tmp_path):
    """The writer's two-phase commit: distributed write → manifest
    publish → read-back equality, across append and overwrite modes."""
    import json
    import os

    from spark_stream_analyzer_spark.sources.wire_datasource import (
        MANIFEST,
        register_wirelog,
    )

    register_wirelog(spark)
    d = str(tmp_path / "sink")
    os.makedirs(d)
    mk = lambda lo, hi, p: (  # noqa: E731
        spark.range(lo, hi)
        .select(F.concat(F.lit(p), F.col("id")).alias("value"))
        .repartition(4)
    )
    mk(0, 100, "a-").write.format("wirelog").mode("append").option("path", d).save()
    back = spark.read.format("wirelog").options(path=d).load()
    assert back.count() == 100
    mk(100, 150, "b-").write.format("wirelog").mode("append").option("path", d).save()
    vals = {r.value for r in spark.read.format("wirelog").options(path=d).load().collect()}
    assert vals == {f"a-{i}" for i in range(100)} | {f"b-{i}" for i in range(100, 150)}
    mk(0, 10, "c-").write.format("wirelog").mode("overwrite").option("path", d).save()
    vals = {r.value for r in spark.read.format("wirelog").options(path=d).load().collect()}
    assert vals == {f"c-{i}" for i in range(10)}
    # overwrite reclaimed the superseded files: manifest == disk listing
    manifest = set(json.load(open(os.path.join(d, MANIFEST)))["files"])
    on_disk = {f for f in os.listdir(d) if f.endswith(".txt")}
    assert manifest == on_disk and len(on_disk) <= 4


def test_wirelog_writer_abort_leaves_snapshot_untouched(spark, tmp_path):
    """A job with a failing task must not change the committed snapshot
    — no new visible files, manifest intact (all-or-nothing publish)."""
    import json
    import os

    from pyspark.sql.types import StringType

    from spark_stream_analyzer_spark.sources.wire_datasource import (
        MANIFEST,
        register_wirelog,
    )

    register_wirelog(spark)
    d = str(tmp_path / "sink")
    os.makedirs(d)
    (
        spark.range(25)
        .select(F.concat(F.lit("ok-"), F.col("id")).alias("value"))
        .repartition(2)
        .write.format("wirelog").mode("append").option("path", d).save()
    )
    before = json.load(open(os.path.join(d, MANIFEST)))

    def _boom(i):
        raise RuntimeError("planted task failure")

    bad = spark.range(20).select(
        F.udf(_boom, StringType())(F.col("id")).alias("value")
    )
    with pytest.raises(Exception):
        bad.write.format("wirelog").mode("append").option("path", d).save()
    after = json.load(open(os.path.join(d, MANIFEST)))
    assert after == before
    assert spark.read.format("wirelog").options(path=d).load().count() == 25


def test_chunk_udtf_matches_explode_form_and_plan_shapes(spark):
    """The UDTF chunker must be row-identical to the codegen explode
    form, and the two plans must have the intended shapes: explode runs
    as a Generate inside whole-stage codegen (no Python boundary), the
    UDTF plan carries an Arrow-eval Python UDTF node."""
    explode_df = QUERIES["doc_chunk_windows"].build(spark, SF)
    udtf_df = QUERIES["doc_chunk_windows_udtf"].build(spark, SF)

    key = lambda r: (r.doc_id, r.chunk_idx)  # noqa: E731
    a = sorted(map(tuple, explode_df.collect()), key=lambda t: t[:2])
    b = sorted(map(tuple, udtf_df.collect()), key=lambda t: t[:2])
    assert a == b and len(a) > 0

    explode_plan = explode_df._jdf.queryExecution().executedPlan().toString()
    udtf_plan = udtf_df._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in explode_plan
    assert "PythonUDTF" not in explode_plan and "ArrowEval" not in explode_plan
    assert "*(" in explode_plan  # the codegen-stage marker ("*(1) Project…")
    assert "PythonUDTF" in udtf_plan  # the Arrow Python boundary


def test_wirelog_stream_reader_maxfilespertrigger_throttles_batches(spark, tmp_path):
    """Admission control: the FIRST batch of a run is unthrottled by
    API necessity (r10: latestOffset runs before the reader can know
    its position; capping there regresses offsets after a restart and
    re-delivers data — see the reader docstring). Steady-state, a
    6-file backlog with maxfilespertrigger=2 drains in 3 bounded
    micro-batches, every row exactly once."""
    import os

    from spark_stream_analyzer_spark.sources.wire_datasource import register_wirelog

    register_wirelog(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(f"{src}/seed.txt", "w") as f:
        f.write("row-seed\n")
    q = (
        spark.readStream.format("wirelog")
        .options(path=src, maxfilespertrigger="2")
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("throttle_t")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 0: the seed file (unthrottled)
        for i in range(6):  # backlog lands mid-run
            with open(f"{src}/z{i:03d}.txt", "w") as f:
                f.write(f"row-{i}\n")
        q.processAllAvailable()
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    finally:
        q.stop()
    got = {r.value for r in spark.table("throttle_t").collect()}
    assert got == {"row-seed"} | {f"row-{i}" for i in range(6)}
    steady = [p for p in batches if p["numInputRows"] == 2]
    assert len(steady) == 3  # the backlog drained as 3 bounded batches
    spark.catalog.dropTempView("throttle_t")


def test_wirelog_writer_only_committed_attempt_visible(spark, tmp_path):
    """Speculative/retried task safety: two staged attempts for the same
    logical partition, commit carries only one message — only that
    attempt's file becomes visible, the orphan stays staged."""
    import json
    import os

    from spark_stream_analyzer_spark.sources.wire_datasource import (
        MANIFEST,
        WireLogWriter,
        _WireCommit,
    )

    d = str(tmp_path / "sink")
    os.makedirs(os.path.join(d, "_staging"))
    for name, row in (("part-winner.txt", "W"), ("part-loser.txt", "L")):
        with open(os.path.join(d, "_staging", name), "w") as f:
            f.write(row + "\n")
    w = WireLogWriter({"path": d}, overwrite=False)
    w.commit([_WireCommit("part-winner.txt", 1)])
    manifest = json.load(open(os.path.join(d, MANIFEST)))
    assert manifest["files"] == ["part-winner.txt"]
    assert os.path.exists(os.path.join(d, "_staging", "part-loser.txt"))
    back = spark.read.format("wirelog").options(path=d).load().collect()
    assert [r.value for r in back] == ["W"]


def test_txn_publish_time_travel_and_vacuum(spark, tmp_path):
    """The manifest-pointer table: versions stay readable until vacuum,
    vacuum reclaims manifest-then-data and never touches the live
    snapshot."""
    import os

    from spark_stream_analyzer_spark.sources.txn_publish import (
        committed_version,
        publish,
        read_committed,
        read_version,
        snapshot_dir,
        vacuum,
    )

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    for v, hi in ((1, 10), (2, 20), (3, 30)):
        d = snapshot_dir(root)
        spark.range(hi).write.parquet(d)
        publish(root, d, v)
    assert committed_version(root) == 3
    assert read_committed(spark, root).count() == 30
    assert read_version(spark, root, 1).count() == 10
    assert read_version(spark, root, 2).count() == 20

    reclaimed = vacuum(root, keep_last=1)
    assert reclaimed == [1, 2]
    assert read_committed(spark, root).count() == 30  # live untouched
    with pytest.raises(FileNotFoundError):
        read_version(spark, root, 1)
    # idempotent: nothing left to reclaim
    assert vacuum(root, keep_last=1) == []


def test_streaming_full_outer_emits_both_null_directions(spark):
    """Both outer halves must actually fire: unmatched purchases emit
    null click_id AND unmatched clicks emit null purchase_id (the
    direction left_outer doesn't test), each exactly once, and matched
    rows stay within the interval bound."""
    out = QUERIES["streaming_full_outer_join"].build(spark, SF).collect()
    null_click = [r for r in out if r["click_id"] is None]
    null_purchase = [r for r in out if r["purchase_id"] is None]
    matched = [
        r for r in out if r["click_id"] is not None and r["purchase_id"] is not None
    ]
    assert null_click, "no purchase-side null extension — expiry never fired"
    assert null_purchase, "no click-side null extension — expiry never fired"
    assert all(r["delta_s"] is None for r in null_click + null_purchase)
    assert all(0 <= r["delta_s"] <= 3600 for r in matched)
    # exactly-once null emission per unmatched row, per direction
    pids = [r["purchase_id"] for r in null_click]
    cids = [r["click_id"] for r in null_purchase]
    assert len(pids) == len(set(pids))
    assert len(cids) == len(set(cids))
    # no row is null on both sides (the join never invents rows)
    assert all(
        r["click_id"] is not None or r["purchase_id"] is not None for r in out
    )
