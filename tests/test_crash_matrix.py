"""Crash matrix for the custom connectors' two-phase commit protocols
(r10 verdict task 5) — each corner's outcome is PINNED, not assumed.

Covered here (replay and speculative-attempt corners are pinned in
test_round8_ops / test_table_tail):

* transactional publish: writer dies between data write and manifest
  swap; writer dies between version CLAIM and live swap (roll-forward);
  two concurrent publishers of one version (loser fails closed); a
  stale straggler publishing an older version (never regresses);
* vacuum racing a reader that still holds the reclaimed version;
* wirelog writer: commit crash between the staged-file moves and the
  manifest swap on a manifest-less directory (the glob-fallback leak,
  closed by the initial-manifest guard).
"""

from __future__ import annotations

import json
import os

import pytest

from spark_stream_analyzer_spark.sources.txn_publish import (
    ConcurrentPublishError,
    committed_version,
    publish,
    read_committed,
    read_version,
    snapshot_dir,
    vacuum,
)


def _write_snapshot(spark, root: str, vals: list[int]) -> str:
    d = snapshot_dir(root)
    spark.createDataFrame([(v,) for v in vals], "k long").coalesce(1).write.parquet(d)
    return d


def test_publish_crash_before_manifest_swap_is_invisible(spark, tmp_path):
    """Corner: writer completes its data files but dies BEFORE publish.
    Pinned: readers still see the old snapshot; the orphan dir is
    unreferenced; the next successful publish proceeds normally."""
    root = str(tmp_path)
    d1 = _write_snapshot(spark, root, [1, 2])
    publish(root, d1, 1)
    _orphan = _write_snapshot(spark, root, [99])  # crash: publish never runs
    assert committed_version(root) == 1
    assert sorted(r.k for r in read_committed(spark, root).collect()) == [1, 2]
    d2 = _write_snapshot(spark, root, [3])
    publish(root, d2, 2)
    assert sorted(r.k for r in read_committed(spark, root).collect()) == [3]


def test_concurrent_same_version_publish_loser_fails_closed(spark, tmp_path):
    """Corner: two publishers race one version. Pinned outcome: the
    claim (os.link, exclusive) picks exactly one winner; the loser
    raises ConcurrentPublishError, its data dir stays invisible, and
    the committed snapshot is the winner's."""
    root = str(tmp_path)
    d_win = _write_snapshot(spark, root, [10])
    d_lose = _write_snapshot(spark, root, [20])
    publish(root, d_win, 1)
    with pytest.raises(ConcurrentPublishError, match="already claimed"):
        publish(root, d_lose, 1)
    assert committed_version(root) == 1
    assert [r.k for r in read_committed(spark, root).collect()] == [10]
    # the loser's dir is an orphan: time travel to v1 is the winner too
    assert [r.k for r in read_version(spark, root, 1).collect()] == [10]


def test_claim_then_crash_is_rolled_forward_by_next_publisher(spark, tmp_path):
    """Corner: publisher claims its version (versioned manifest exists)
    then dies before the live swap — the table must not stay stuck.
    Pinned: the NEXT publisher of that version completes the swap to
    the CLAIMED snapshot, then still fails closed for its own data;
    a caller's replay guard (committed_version >= v) then no-ops."""
    root = str(tmp_path)
    d1 = _write_snapshot(spark, root, [1])
    publish(root, d1, 1)
    d2 = _write_snapshot(spark, root, [2])
    # simulate: claim written, live swap never happened
    with open(os.path.join(root, "_manifest.v2.json"), "w") as f:
        json.dump({"version": 2, "dir": d2}, f)
    assert committed_version(root) == 1  # stuck state
    d2_replay = _write_snapshot(spark, root, [2])  # replay recomputes
    with pytest.raises(ConcurrentPublishError):
        publish(root, d2_replay, 2)
    # rolled forward: the ORIGINAL claimed snapshot is now committed
    assert committed_version(root) == 2
    assert [r.k for r in read_committed(spark, root).collect()] == [2]
    assert read_committed(spark, root).inputFiles()[0].find(d2_replay) == -1


def test_stale_straggler_publish_never_regresses_live(spark, tmp_path):
    """Corner: a publisher claims an older version after a newer one is
    already live (late scheduling). Pinned: the claim is retained for
    time travel, no error, and the live pointer does NOT regress."""
    root = str(tmp_path)
    d2 = _write_snapshot(spark, root, [22])
    publish(root, d2, 2)
    d1 = _write_snapshot(spark, root, [11])
    publish(root, d1, 1)  # stale: succeeds quietly, no live swap
    assert committed_version(root) == 2
    assert [r.k for r in read_committed(spark, root).collect()] == [22]
    assert [r.k for r in read_version(spark, root, 1).collect()] == [11]


def test_vacuum_racing_reader_fails_cleanly_not_partially(spark, tmp_path):
    """Corner: vacuum reclaims a version a reader still holds. Pinned:
    the in-flight DataFrame RAISES on materialization (Spark's default
    ignoreMissingFiles=false — never a silent partial result), and a
    fresh time-travel open of the reclaimed version raises
    FileNotFoundError on the manifest (deleted FIRST, fail-closed)."""
    root = str(tmp_path)
    d1 = _write_snapshot(spark, root, [1])
    publish(root, d1, 1)
    d2 = _write_snapshot(spark, root, [2])
    publish(root, d2, 2)
    held = read_version(spark, root, 1)  # lazy: holds the v1 file list
    assert vacuum(root, keep_last=1) == [1]
    with pytest.raises(Exception, match="(?i)not.?exist|file.?not.?found"):
        held.collect()
    with pytest.raises(FileNotFoundError):
        read_version(spark, root, 1)
    # the LIVE version is untouched by the race
    assert [r.k for r in read_committed(spark, root).collect()] == [2]


# ---------------------------------------------------------------------------
# wirelog writer: the manifest-less crash window
# ---------------------------------------------------------------------------


class _Row:
    def __init__(self, value: str):
        self.value = value


def test_wire_commit_crash_window_invisible_after_initial_manifest(tmp_path):
    """Corner: stream-writer commit crashes BETWEEN moving staged files
    into the root and the manifest swap, on a directory that had no
    manifest (pre-protocol). Without the initial-manifest guard the
    reader's raw-glob fallback would see the uncommitted files. Pinned:
    the guard snapshots the raw listing first, so the half-moved file
    stays invisible; the batch's REPLAY then publishes exactly once."""
    from spark_stream_analyzer_spark.sources.wire_datasource import (
        WireLogStreamWriter,
        _ensure_manifest,
        _list_files,
    )

    path = str(tmp_path / "t")
    os.makedirs(path)
    with open(f"{path}/pre.txt", "w") as f:
        f.write("old-row\n")

    w = WireLogStreamWriter({"path": path})
    # phase 1 (executor): stage the batch's file
    msg = w.write(iter([_Row("new-row")]))
    # phase 2 (driver) crashes mid-way: guard ran, file moved, NO swap
    _ensure_manifest(path)
    os.replace(f"{path}/_staging/{msg.staged}", f"{path}/{msg.staged}")
    # reader view: manifest resolution hides the half-committed file
    assert _list_files(path) == ["pre.txt"]

    # restart replays the batch: a fresh attempt stages its own file
    w2 = WireLogStreamWriter({"path": path})
    msg2 = w2.write(iter([_Row("new-row")]))
    w2.commit([msg2], batchId=0)
    visible = _list_files(path)
    assert "pre.txt" in visible  # pre-protocol rows retained (append)
    assert msg2.staged in visible
    assert msg.staged not in visible  # the crashed attempt never publishes
    with open(f"{path}/_wirelog_manifest.json") as f:
        state = json.load(f)
    assert state["batches"] == {"0": [msg2.staged]}


def test_wire_batch_commit_snapshots_pre_protocol_files(tmp_path):
    """Append-mode batch commit on a pre-protocol directory: the initial
    manifest snapshots the raw listing, and the final manifest lists
    prior + new — visibility flipped only at manifest swaps."""
    from spark_stream_analyzer_spark.sources.wire_datasource import (
        WireLogWriter,
        _list_files,
    )

    path = str(tmp_path / "t")
    os.makedirs(path)
    with open(f"{path}/pre.txt", "w") as f:
        f.write("old-row\n")
    w = WireLogWriter({"path": path}, overwrite=False)
    msg = w.write(iter([_Row("new-row")]))
    w.commit([msg])
    assert _list_files(path) == sorted(["pre.txt", msg.staged])
