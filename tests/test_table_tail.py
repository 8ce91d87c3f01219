"""Manifest-table streaming source (r10): restart / exactly-once pins.

The driver row (``streaming_table_version_tail``) proves mid-query
incremental discovery; this suite pins the RESTART contract the
exactly-once claim rests on: offsets live in the checkpoint, so a new
query resuming from the same checkpoint emits ONLY versions committed
after the last batch — never a re-read of already-delivered versions —
and a version published while the stream was DOWN is picked up on
resume (the catch-up path).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from spark_stream_analyzer_spark.sources.table_datasource import (
    register_manifesttable,
)
from spark_stream_analyzer_spark.sources.txn_publish import publish, snapshot_dir


def _publish_version(spark, root, version, ids):
    d = snapshot_dir(str(root))
    spark.createDataFrame(
        [(i, f"v{version}") for i in ids], "k bigint, tag string"
    ).coalesce(1).write.parquet(d)
    publish(str(root), d, version)


def _drain(spark, root, ckpt, out_dir):
    """One run segment: foreachBatch-append into a parquet dir (the
    memory sink refuses checkpoint recovery, so restart tests need a
    recoverable sink)."""

    def _sink(bdf, bid):
        if bdf.count():
            bdf.withColumn("_batch", F.lit(bid)).write.mode("append").parquet(
                str(out_dir)
            )

    q = (
        spark.readStream.format("manifesttable")
        .option("path", str(root))
        .load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_restart_resumes_at_next_version_exactly_once(spark, tmp_path):
    root = tmp_path / "table"
    root.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    register_manifesttable(spark)

    _publish_version(spark, root, 1, [1, 2, 3])
    _drain(spark, root, ckpt, out)
    got1 = {(r.k, r.tag, r._version) for r in spark.read.parquet(str(out)).collect()}
    assert got1 == {(1, "v1", 1), (2, "v1", 1), (3, "v1", 1)}

    # version published while the stream is DOWN -> catch-up on resume;
    # v1 must NOT be re-emitted (the sink would show duplicate v1 rows)
    _publish_version(spark, root, 2, [10, 11])
    _drain(spark, root, ckpt, out)
    got2 = {(r.k, r.tag, r._version) for r in spark.read.parquet(str(out)).collect()}
    assert got2 == got1 | {(10, "v2", 2), (11, "v2", 2)}
    assert spark.read.parquet(str(out)).count() == 5  # no re-emission

    # nothing new -> an idle resume emits nothing
    _drain(spark, root, ckpt, out)
    assert spark.read.parquet(str(out)).count() == 5


def test_starting_version_skips_history(spark, tmp_path):
    root = tmp_path / "table"
    root.mkdir()
    register_manifesttable(spark)
    _publish_version(spark, root, 1, [1])
    _publish_version(spark, root, 2, [2])
    name = f"tts_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("manifesttable")
        .option("path", str(root))
        .option("startingversion", "2")
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.k, r._version) for r in spark.table(name).collect()}
    assert got == {(2, 2)}
    spark.catalog.dropTempView(name)


def test_maxversionspertrigger_throttles_steady_state(spark, tmp_path):
    """The FIRST batch of a run is unthrottled by API necessity (the
    engine asks latestOffset before the reader can know its position —
    see the reader docstring); once running, a multi-version backlog
    drains one version per micro-batch, every version exactly once."""
    root = tmp_path / "table"
    root.mkdir()
    register_manifesttable(spark)
    _publish_version(spark, root, 1, [10])
    out = tmp_path / "out"

    def _sink(bdf, bid):
        if bdf.count():
            bdf.withColumn("_batch", F.lit(bid)).write.mode("append").parquet(
                str(out)
            )

    q = (
        spark.readStream.format("manifesttable")
        .option("path", str(root))
        .option("maxversionspertrigger", "1")
        .load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()  # batch 0: v1 (unthrottled first batch)
        for v in range(2, 5):  # a 3-version backlog lands mid-run
            _publish_version(spark, root, v, [v * 10])
        q.processAllAvailable()  # throttled: one version per batch
    finally:
        q.stop()
    rows = spark.read.parquet(str(out)).collect()
    assert {(r.k, r._version) for r in rows} == {
        (10, 1), (20, 2), (30, 3), (40, 4)
    }
    # v2-v4 each in their OWN micro-batch (plus batch 0 for v1)
    assert len({r._batch for r in rows}) == 4


from hypothesis import given, settings, strategies as st


@settings(max_examples=6, deadline=None)
@given(
    st.dictionaries(st.integers(0, 12), st.integers(0, 3), max_size=10),
    st.dictionaries(st.integers(0, 12), st.integers(0, 3), max_size=10),
)
def test_version_changes_matches_bruteforce(spark, tmp_path_factory, pre, post):
    """Delta-CDF semantics against a dict diff: inserts/deletes/updates
    classified exactly; byte-equal rows emit NOTHING; updates emit both
    pre- and post-image rows."""
    from spark_stream_analyzer_spark.sources.txn_publish import (
        publish,
        snapshot_dir,
        version_changes,
    )

    root = str(tmp_path_factory.mktemp("vdiff"))
    for v, data in ((1, pre), (2, post)):
        d = snapshot_dir(root)
        spark.createDataFrame(
            [(k, val) for k, val in data.items()] or [(None, None)],
            "k bigint, val bigint",
        ).where("k IS NOT NULL").coalesce(1).write.parquet(d)
        publish(root, d, v)
    got = {
        (r.k, r.val, r.change_type)
        for r in version_changes(spark, root, 1, 2, ["k"]).collect()
    }
    want = set()
    for k in post.keys() - pre.keys():
        want.add((k, post[k], "insert"))
    for k in pre.keys() - post.keys():
        want.add((k, pre[k], "delete"))
    for k in pre.keys() & post.keys():
        if pre[k] != post[k]:
            want.add((k, pre[k], "update_preimage"))
            want.add((k, post[k], "update_postimage"))
    assert got == want


def test_throttled_restart_never_redelivers(spark, tmp_path):
    """The r10 code-review scenario: drain v1-v4 under
    maxversionspertrigger=1, STOP, publish v5-v6, RESTART with the same
    throttle. The cold first latestOffset must not regress below the
    committed offset (which would make the next batch re-deliver v2-v4);
    resume emits exactly v5-v6, nothing twice."""
    root = tmp_path / "table"
    root.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    register_manifesttable(spark)
    for v in range(1, 5):
        _publish_version(spark, root, v, [v * 10])

    def _sink(bdf, bid):
        if bdf.count():
            bdf.write.mode("append").parquet(str(out))

    def _run():
        q = (
            spark.readStream.format("manifesttable")
            .option("path", str(root))
            .option("maxversionspertrigger", "1")
            .load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _run()
    assert spark.read.parquet(str(out)).count() == 4
    for v in (5, 6):
        _publish_version(spark, root, v, [v * 10])
    _run()  # restart: new reader instance, cold _planned
    rows = [(r.k, r._version) for r in spark.read.parquet(str(out)).collect()]
    assert sorted(rows) == [(v * 10, v) for v in range(1, 7)]  # no dupes
