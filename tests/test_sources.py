"""Dtype-matrix test for the events loader.

The driver's generator has written ``events.ts`` three different ways
across rounds (parquet TIMESTAMP(NANOS) read as bigint, pandas-written
``timestamp[us]`` read as TIMESTAMP_NTZ, and UTC-adjusted ``timestamp[us]``
read as TIMESTAMP).  Round 2 died because the NTZ branch had never been
exercised — this test writes a tiny events parquet in ALL THREE encodings
and asserts ``load_table`` yields identical ``ts`` / ``ts_ns`` for each,
so no encoding branch can ship untested again.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_stream_analyzer_spark.sources.tables import load_table

# three event rows with sub-second precision (µs-representable so every
# encoding can express them exactly)
_EPOCH_US = [1_704_067_207_179_575, 1_704_067_432_824_425, 1_704_067_589_165_275]
_BASE_COLS = {
    "event_id": pa.array([1, 2, 3], type=pa.int64()),
    "user_id": pa.array([10, 20, 30], type=pa.int64()),
    "event_type": pa.array(["view", "click", "purchase"]),
    "value": pa.array([1.5, 2.5, 3.5], type=pa.float64()),
    "props": pa.array(["{}", "{}", "{}"]),
}


def _write_events(tmp_path, name: str, ts_array: pa.Array) -> str:
    d = tmp_path / name
    d.mkdir()
    cols = dict(_BASE_COLS)
    cols["ts"] = ts_array
    table = pa.table(
        {k: cols[k] for k in ("event_id", "ts", "user_id", "event_type", "value", "props")}
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("events_encodings")
    naive = [dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us) for us in _EPOCH_US]
    return {
        # round-1 encoding: TIMESTAMP(NANOS) — Spark reads as bigint under
        # the legacy nanosAsLong conf
        "ns_as_long": _write_events(
            tmp_path, "ns", pa.array([us * 1000 for us in _EPOCH_US], type=pa.timestamp("ns"))
        ),
        # round-2 encoding: pandas-written µs without isAdjustedToUTC →
        # Spark TIMESTAMP_NTZ (the encoding that broke round 2)
        "us_ntz": _write_events(tmp_path, "ntz", pa.array(naive, type=pa.timestamp("us"))),
        # UTC-adjusted µs → Spark TIMESTAMP (LTZ)
        "us_ltz": _write_events(
            tmp_path, "ltz", pa.array(naive, type=pa.timestamp("us", tz="UTC"))
        ),
    }


def test_events_loader_dtype_matrix(spark, encoded_dirs):
    results = {}
    for label, d in encoded_dirs.items():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (
            f"{label}: ts must normalize to TIMESTAMP (LTZ), got {dict(df.dtypes)['ts']}"
        )
        assert dict(df.dtypes)["ts_ns"] == "bigint", label
        rows = df.orderBy("event_id").select("event_id", "ts", "ts_ns").collect()
        results[label] = [(r.event_id, r.ts, r.ts_ns) for r in rows]

    assert results["ns_as_long"] == results["us_ntz"] == results["us_ltz"], results
    # and the values are the exact epochs we wrote
    assert [r[2] for r in results["us_ntz"]] == [us * 1000 for us in _EPOCH_US]


#: dtypes every query in the registry is written against.  If a future
#: driver regeneration changes an encoding (the round-2 lesson: ts went
#: ns→µs and broke 28 queries at analysis time), this fails loudly and
#: points at the loader instead of letting half the registry err.
_CANONICAL_DTYPES = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": {"timestamp", "timestamp_ntz", "date"},
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": {"timestamp", "timestamp_ntz", "date"},
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # whatever the file held, the loader normalizes
        "ts_ns": "bigint",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": {"array<float>", "array<double>"},
        "label": "int",
    },
}


def test_all_tables_match_canonical_dtypes(spark, sf_dir):
    from spark_stream_analyzer_spark.sources.tables import TABLES

    problems = []
    for t in TABLES:
        got = dict(load_table(spark, sf_dir, t).dtypes)
        want = _CANONICAL_DTYPES[t]
        for col, exp in want.items():
            ok = got.get(col) in exp if isinstance(exp, set) else got.get(col) == exp
            if not ok:
                problems.append(f"{t}.{col}: expected {exp}, got {got.get(col)}")
    assert not problems, problems


def test_events_loader_real_driver_data(spark, sf_dir):
    """The actual driver parquet (whatever encoding this round) loads and
    exposes both normalized columns with non-null values."""
    df = load_table(spark, sf_dir, "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["ts_ns"] == "bigint"
    row = df.selectExpr(
        "count(*) AS n",
        "count(ts) AS n_ts",
        "count(ts_ns) AS n_ns",
        "min(ts_ns) AS lo",
    ).collect()[0]
    assert row.n > 0 and row.n_ts == row.n and row.n_ns == row.n
    assert row.lo > 1_000_000_000_000_000_000  # epoch-ns magnitude, not µs/ms

# ------- round-4: future-proofing against a FOURTH encoding change -------
# ms-representable instants (the µs-precision epochs above can't round-trip
# a ms encoding exactly)
_EPOCH_MS = [1_704_067_207_179, 1_704_067_432_824, 1_704_067_589_165]


@pytest.fixture(scope="module")
def ms_encoded_dirs(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("events_ms_encodings")
    naive = [
        dt.datetime(1970, 1, 1) + dt.timedelta(milliseconds=ms) for ms in _EPOCH_MS
    ]
    return {
        # parquet timestamp[ms] UTC-adjusted → Spark TIMESTAMP (ms→µs widen)
        "ms_ltz": _write_events(
            tmp_path, "ms_ltz", pa.array(naive, type=pa.timestamp("ms", tz="UTC"))
        ),
        # parquet timestamp[ms] naive → Spark TIMESTAMP_NTZ
        "ms_ntz": _write_events(
            tmp_path, "ms_ntz", pa.array(naive, type=pa.timestamp("ms"))
        ),
        # raw int64 epoch-ms (no logical type at all) → bigint branch,
        # unit self-identified by magnitude
        "ms_as_long": _write_events(
            tmp_path, "ms_long", pa.array(_EPOCH_MS, type=pa.int64())
        ),
        # raw int64 epoch-µs → bigint branch, µs magnitude band
        "us_as_long": _write_events(
            tmp_path, "us_long", pa.array([ms * 1000 for ms in _EPOCH_MS], type=pa.int64())
        ),
        # raw int64 epoch-seconds → bigint branch, smallest band
        "s_as_long": _write_events(
            tmp_path,
            "s_long",
            pa.array([ms // 1000 for ms in _EPOCH_MS], type=pa.int64()),
        ),
    }


def test_events_loader_ms_and_raw_long_units(spark, ms_encoded_dirs):
    """Any parquet encoding among {timestamp[ms] LTZ/NTZ, raw int64 in
    ms/µs/s} normalizes to the identical ``ts``/``ts_ns`` pair — the
    property the verdict asked pinned BEFORE a round-5 encoding surprise.
    (raw s_as_long holds whole-second instants, so it's compared at
    second resolution only.)"""
    results = {}
    for label, d in ms_encoded_dirs.items():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", label
        assert dict(df.dtypes)["ts_ns"] == "bigint", label
        rows = df.orderBy("event_id").select("event_id", "ts", "ts_ns").collect()
        results[label] = [(r.event_id, r.ts, r.ts_ns) for r in rows]

    expect_ns = [ms * 1_000_000 for ms in _EPOCH_MS]
    for label in ("ms_ltz", "ms_ntz", "ms_as_long", "us_as_long"):
        assert [r[2] for r in results[label]] == expect_ns, label
    assert results["ms_ltz"] == results["ms_ntz"] == results["ms_as_long"]
    # seconds-encoded rows were written pre-truncated to whole seconds
    assert [r[2] for r in results["s_as_long"]] == [
        ms // 1000 * 1_000_000_000 for ms in _EPOCH_MS
    ]


def test_events_loader_is_session_timezone_independent(spark, sf_dir):
    """Round-4 regression: ts_ns must be identical under ANY session
    timezone. The old NTZ branch (to_utc_timestamp after Spark's implicit
    session-zone NTZ→LTZ cast) shifted every event by the host's UTC
    offset — 24 registry queries went red under TZ=America/New_York."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = [
            r[0]
            for r in load_table(spark, sf_dir, "events")
            .orderBy("event_id").limit(5).select("ts_ns").collect()
        ]
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = [
            r[0]
            for r in load_table(spark, sf_dir, "events")
            .orderBy("event_id").limit(5).select("ts_ns").collect()
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc == ny
    import duckdb

    con = duckdb.connect()
    truth = [
        r[0] * 1000
        for r in con.sql(
            f"SELECT epoch_us(ts) FROM '{sf_dir}/events.parquet'"
            " ORDER BY event_id LIMIT 5"
        ).fetchall()
    ]
    con.close()
    assert utc == truth  # UTC-anchored, matching the oracle's naive read


def test_events_loader_dtype_matrix_under_foreign_timezone(spark, encoded_dirs):
    """Cross product: every ts encoding × a non-UTC session timezone must
    yield the same exact ts_ns — the two driver-surprise axes composed
    (round 2 changed the encoding; a future round could change the host
    zone; neither, nor both at once, may move an event)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Australia/Adelaide")
        for label, d in encoded_dirs.items():
            got = [
                r.ts_ns
                for r in load_table(spark, d, "events")
                .orderBy("event_id").select("ts_ns").collect()
            ]
            assert got == [us * 1000 for us in _EPOCH_US], label
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_wirelog_datasource_partition_planning(spark, tmp_path):
    """One InputPartition per file: the distributed unit of the custom
    Python Data Source is the log file, and empty lines are skipped."""
    from spark_stream_analyzer_spark.sources.wire_datasource import register_wirelog

    d = tmp_path / "logs"
    d.mkdir()
    for i in range(3):
        (d / f"{i:03d}.txt").write_text(f"a{i},1\n\nb{i},2\n")
    (d / "ignored.dat").write_text("not a log\n")
    register_wirelog(spark)
    df = spark.read.format("wirelog").options(path=str(d)).load()
    assert df.rdd.getNumPartitions() == 3  # .dat file excluded from planning
    rows = {(r.value, r.src_file) for r in df.collect()}
    assert rows == {
        ("a0,1", "000.txt"), ("b0,2", "000.txt"),
        ("a1,1", "001.txt"), ("b1,2", "001.txt"),
        ("a2,1", "002.txt"), ("b2,2", "002.txt"),
    }


def test_wirelog_stream_reader_reads_each_offset_range_once(spark, tmp_path):
    """The stream reader's offset (count of sorted files) must advance
    per wave and never re-read committed ranges: two drains with a
    mid-stream wave land every line exactly once."""
    import uuid

    from spark_stream_analyzer_spark.sources.wire_datasource import register_wirelog

    d = tmp_path / "tail"
    d.mkdir()
    (d / "000.txt").write_text("w0a,1\nw0b,2\n")
    register_wirelog(spark)
    s = spark.readStream.format("wirelog").options(path=str(d)).load()
    name = f"wtail_{uuid.uuid4().hex[:6]}"
    q = s.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
        (d / "001.txt").write_text("w1a,3\n")
        q.processAllAvailable()
        (d / "002.txt").write_text("w2a,4\n")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(tuple(r) for r in spark.table(name).collect())
    assert rows == [
        ("w0a,1", "000.txt"), ("w0b,2", "000.txt"),
        ("w1a,3", "001.txt"), ("w2a,4", "002.txt"),
    ]
    spark.catalog.dropTempView(name)
