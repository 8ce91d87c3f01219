"""Round-11 tests: the four r10 ADVICE fixes.

1. JDBC sink DELETE-failure classification by SQLState (fail-closed).
2. manifesttable latestOffset floored under a transiently missing manifest.
3. TTL state-schema changelog (doc-only; pinned by the r10 tests).
4. wirelog ``maxcatchup``: sidecar-backed first-batch admission control.
"""

from __future__ import annotations

import json
import os

import pytest


# ---------------------------------------------------------------------------
# 1. JDBC DELETE-failure classification
# ---------------------------------------------------------------------------


class _FakeJavaExc:
    """Duck-typed java.sql.SQLException chain node."""

    def __init__(self, state, cause=None, broken=False):
        self._state = state
        self._cause = cause
        self._broken = broken

    def getSQLState(self):
        if self._broken:
            raise RuntimeError("not a SQLException")
        return self._state

    def getCause(self):
        return self._cause


class _FakePy4JError(Exception):
    def __init__(self, java_exception):
        super().__init__("py4j")
        self.java_exception = java_exception


def test_missing_table_classifier_accepts_known_sqlstates():
    from spark_stream_analyzer_spark.streaming.sinks import _is_missing_table_error

    for state in ("42X05", "42S02", "42P01", "S0002", "42x05"):
        exc = _FakePy4JError(_FakeJavaExc(state))
        assert _is_missing_table_error(exc), state


def test_missing_table_classifier_walks_cause_chain():
    from spark_stream_analyzer_spark.streaming.sinks import _is_missing_table_error

    inner = _FakeJavaExc("42X05")
    outer = _FakeJavaExc(None, cause=_FakeJavaExc("XJ001", cause=inner))
    assert _is_missing_table_error(_FakePy4JError(outer))


def test_missing_table_classifier_fail_closed():
    """Anything not positively classified as table-not-found must NOT be
    swallowed: other SQLStates, non-SQL exceptions, plain Python errors,
    broken getSQLState, and cause cycles all classify False."""
    from spark_stream_analyzer_spark.streaming.sinks import _is_missing_table_error

    assert not _is_missing_table_error(RuntimeError("no java_exception attr"))
    assert not _is_missing_table_error(_FakePy4JError(_FakeJavaExc("08006")))
    assert not _is_missing_table_error(_FakePy4JError(_FakeJavaExc(None)))
    assert not _is_missing_table_error(
        _FakePy4JError(_FakeJavaExc(None, broken=True))
    )
    loop = _FakeJavaExc("XJ001")
    loop._cause = loop  # defensive: cause cycle must terminate, not hang
    assert not _is_missing_table_error(_FakePy4JError(loop))


def test_jdbc_writer_aborts_on_unclassifiable_delete_failure(spark, monkeypatch):
    """A transient DELETE failure on an existing table must abort the
    batch (raise), never fall through to the append — the append would
    duplicate a replayed batch's rows (r10 ADVICE: the old existence
    probe was fail-open under exactly this scenario)."""
    from spark_stream_analyzer_spark.streaming import sinks

    def _boom(*a, **k):
        raise RuntimeError("transient: connection reset")

    monkeypatch.setattr(sinks, "_jdbc_execute", _boom)
    writer = sinks.jdbc_snapshot_batch_writer("jdbc:derby:memory:nope", "t")
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(RuntimeError, match="transient"):
        writer(df, 0)


# ---------------------------------------------------------------------------
# 2. manifesttable: latestOffset under a missing manifest
# ---------------------------------------------------------------------------


def test_table_latest_offset_missing_manifest_is_not_a_regression(tmp_path):
    """A transiently unreadable manifest must read as 'no new versions'
    (offset = last planned), never as a regression to start_version-1 —
    a regressed offset makes the following batch re-deliver committed
    versions (r10 ADVICE)."""
    from spark_stream_analyzer_spark.sources.table_datasource import (
        ManifestTableStreamReader,
    )

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    r = ManifestTableStreamReader({"path": root})
    # engine plans a batch up to version 7 (e.g. restored from checkpoint)
    r.partitions({"version": 5}, {"version": 7})
    # manifest now transiently unreadable (m is None): hold position
    assert r.latestOffset() == {"version": 7}


# ---------------------------------------------------------------------------
# 4. wirelog maxcatchup sidecar
# ---------------------------------------------------------------------------


def _mk_files(src: str, names: list[str]) -> None:
    os.makedirs(src, exist_ok=True)
    for n in names:
        with open(os.path.join(src, n), "w") as f:
            f.write(f"row-{n}\n")


def test_wire_maxcatchup_caps_fresh_start_first_offset(tmp_path):
    from spark_stream_analyzer_spark.sources.wire_datasource import (
        WireLogStreamReader,
    )

    src = str(tmp_path / "src")
    _mk_files(src, [f"f{i}.txt" for i in range(9)])
    r = WireLogStreamReader({"path": src, "maxcatchup": "2"})
    # engine call order on a fresh start: latestOffset BEFORE initialOffset
    assert r.latestOffset() == {"n_files": 2}
    assert r.initialOffset() == {"n_files": 0}
    r.partitions({"n_files": 0}, {"n_files": 2})
    # steady state with no maxfilespertrigger: drain the rest
    assert r.latestOffset() == {"n_files": 9}


def test_wire_maxcatchup_sidecar_written_before_offset_returned(tmp_path):
    from spark_stream_analyzer_spark.sources.wire_datasource import (
        _PLANNED_SIDECAR,
        WireLogStreamReader,
    )

    src = str(tmp_path / "src")
    _mk_files(src, ["a.txt", "b.txt", "c.txt"])
    r = WireLogStreamReader({"path": src, "maxcatchup": "2"})
    off = r.latestOffset()
    with open(os.path.join(src, _PLANNED_SIDECAR)) as f:
        assert json.load(f)["n_files"] == off["n_files"]


def test_wire_maxcatchup_restart_floors_at_sidecar_no_regression(tmp_path):
    """Restart into a deep backlog: the cold first latestOffset is capped
    at sidecar+maxcatchup but floored AT the sidecar — it can never fall
    below any offset the engine could have committed (sidecar is written
    before the offset is ever returned)."""
    from spark_stream_analyzer_spark.sources.wire_datasource import (
        WireLogStreamReader,
    )

    src = str(tmp_path / "src")
    _mk_files(src, [f"f{i:02d}.txt" for i in range(3)])
    r1 = WireLogStreamReader({"path": src, "maxcatchup": "10"})
    assert r1.latestOffset() == {"n_files": 3}
    r1.partitions({"n_files": 0}, {"n_files": 3})
    # backlog lands while the stream is down
    _mk_files(src, [f"f{i:02d}.txt" for i in range(3, 12)])
    r2 = WireLogStreamReader({"path": src, "maxcatchup": "2"})
    # cold restart: capped at 3+2, never below the sidecar's 3
    assert r2.latestOffset() == {"n_files": 5}
    r2.partitions({"n_files": 3}, {"n_files": 5})
    assert r2.latestOffset() == {"n_files": 12}


def test_wire_maxcatchup_off_means_no_sidecar_and_old_behavior(tmp_path):
    from spark_stream_analyzer_spark.sources.wire_datasource import (
        _PLANNED_SIDECAR,
        WireLogStreamReader,
    )

    src = str(tmp_path / "src")
    _mk_files(src, ["a.txt", "b.txt"])
    r = WireLogStreamReader({"path": src})
    assert r.latestOffset() == {"n_files": 2}
    assert not os.path.exists(os.path.join(src, _PLANNED_SIDECAR))


def test_wire_maxcatchup_live_restart_throttles_first_batch(spark, tmp_path):
    """End-to-end: drain 3 files, stop, land a 6-file backlog, restart
    with maxcatchup=2 + maxfilespertrigger=2 — every micro-batch of the
    restarted run is ≤ 2 rows (including the FIRST, the one the default
    path cannot throttle) and every row arrives exactly once."""
    from spark_stream_analyzer_spark.sources.wire_datasource import register_wirelog

    register_wirelog(spark)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _mk_files(src, [f"f{i:02d}.txt" for i in range(3)])
    seen: list[tuple[int, int]] = []
    rows: list[str] = []

    def _sink(bdf, bid):
        got = [r.value for r in bdf.collect()]  # bounded: ≤2 tiny test rows
        if got:
            seen.append((bid, len(got)))
            rows.extend(got)

    def _run():
        q = (
            spark.readStream.format("wirelog")
            .options(path=src, maxcatchup="2", maxfilespertrigger="2")
            .load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _run()
    assert sorted(rows) == [f"row-f{i:02d}.txt" for i in range(3)]
    n_before = len(seen)
    _mk_files(src, [f"f{i:02d}.txt" for i in range(3, 9)])
    _run()  # cold restart into the backlog
    assert sorted(rows) == [f"row-f{i:02d}.txt" for i in range(9)]  # exactly once
    restarted = seen[n_before:]
    assert restarted and all(n <= 2 for _, n in restarted), restarted


# ---------------------------------------------------------------------------
# 4b. manifesttable maxcatchup sidecar (mirror of the wirelog design)
# ---------------------------------------------------------------------------


def _publish(spark, root: str, version: int, ids: list[int]) -> None:
    from spark_stream_analyzer_spark.sources.txn_publish import (
        publish,
        snapshot_dir,
    )

    d = snapshot_dir(root)
    spark.createDataFrame([(i,) for i in ids], "k bigint").coalesce(
        1
    ).write.parquet(d)
    publish(root, d, version)


def test_table_maxcatchup_caps_fresh_start_first_offset(spark, tmp_path):
    from spark_stream_analyzer_spark.sources.table_datasource import (
        ManifestTableStreamReader,
    )

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    for v in range(1, 10):
        _publish(spark, root, v, [v])
    r = ManifestTableStreamReader({"path": root, "maxcatchup": "2"})
    assert r.latestOffset() == {"version": 2}
    assert r.initialOffset() == {"version": 0}
    r.partitions({"version": 0}, {"version": 2})
    assert r.latestOffset() == {"version": 9}


def test_table_maxcatchup_restart_floors_at_sidecar(spark, tmp_path):
    from spark_stream_analyzer_spark.sources.table_datasource import (
        _PLANNED_SIDECAR,
        ManifestTableStreamReader,
    )

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    for v in range(1, 4):
        _publish(spark, root, v, [v])
    r1 = ManifestTableStreamReader({"path": root, "maxcatchup": "10"})
    assert r1.latestOffset() == {"version": 3}
    with open(os.path.join(root, _PLANNED_SIDECAR)) as f:
        assert json.load(f)["version"] == 3  # written before the return
    r1.partitions({"version": 0}, {"version": 3})
    for v in range(4, 13):  # backlog published while the stream is down
        _publish(spark, root, v, [v])
    r2 = ManifestTableStreamReader({"path": root, "maxcatchup": "2"})
    assert r2.latestOffset() == {"version": 5}  # 3+2, never below 3
    r2.partitions({"version": 3}, {"version": 5})
    assert r2.latestOffset() == {"version": 12}


def test_table_maxcatchup_off_means_no_sidecar(spark, tmp_path):
    from spark_stream_analyzer_spark.sources.table_datasource import (
        _PLANNED_SIDECAR,
        ManifestTableStreamReader,
    )

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    _publish(spark, root, 1, [1])
    r = ManifestTableStreamReader({"path": root})
    assert r.latestOffset() == {"version": 1}
    assert not os.path.exists(os.path.join(root, _PLANNED_SIDECAR))


def test_table_maxcatchup_live_restart_throttles_first_batch(spark, tmp_path):
    """End-to-end twin of the wirelog test: drain 2 versions, stop,
    publish a 6-version backlog, restart with maxcatchup=2 +
    maxversionspertrigger=2 — every micro-batch of the restarted run
    carries ≤ 2 versions (including the FIRST) and every version
    arrives exactly once."""
    from spark_stream_analyzer_spark.sources.table_datasource import (
        register_manifesttable,
    )

    register_manifesttable(spark)
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple[int, list[int]]] = []

    def _sink(bdf, bid):
        vs = [r._version for r in bdf.collect()]  # bounded: tiny test rows
        if vs:
            seen.append((bid, sorted(vs)))

    def _run():
        q = (
            spark.readStream.format("manifesttable")
            .options(path=root, maxcatchup="2", maxversionspertrigger="2")
            .load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    for v in (1, 2):
        _publish(spark, root, v, [v * 10])
    _run()
    n_before = len(seen)
    for v in range(3, 9):
        _publish(spark, root, v, [v * 10])
    _run()  # cold restart into the backlog
    all_versions = sorted(v for _, vs in seen for v in vs)
    assert all_versions == list(range(1, 9))  # exactly once
    restarted = seen[n_before:]
    assert restarted and all(
        len(set(vs)) <= 2 for _, vs in restarted
    ), restarted
