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
