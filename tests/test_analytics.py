"""Unit tests for the round-2 analytics family — hand-computed
expectations on tiny frames, complementing the sf0.01 oracle gate
(which proves engine parity, not intent)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_chunk_windows_reconstruct_document(spark, tmp_path):
    """Chunks at (size 200, stride 160) must tile the document: the
    first 160 chars of each chunk plus the full final chunk reassemble
    the original text exactly — the no-token-lost contract a
    context-window shaper must keep."""
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    text = "abcdefghij" * 53  # 530 chars → offsets 0,160,320,480
    df = spark.createDataFrame([(1, text, "en", "src0", len(text))],
                               "doc_id long, text string, lang string, source string, n_chars long")
    out_dir = tmp_path / "docs"
    df.write.parquet(str(out_dir / "documents.parquet"))
    build = QUERIES["doc_chunk_windows"].build
    rows = sorted(
        build(spark, str(out_dir)).collect(), key=lambda r: r.chunk_idx
    )
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3]
    # every chunk except the last is full-size; last is the remainder
    assert [r.chunk_len for r in rows] == [200, 200, 200, 50]
    # stride tiling covers every character: 3*160 + 50 = 530
    assert 160 * (len(rows) - 1) + rows[-1].chunk_len == len(text)


def test_daily_retention_hand_example(spark, tmp_path):
    """user 1 active days 0,1,2 → retained on days 0,1; user 2 active
    days 0,2 → never retained next-day."""
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    rows = [
        (1, 0), (1, 86_400), (1, 172_800),
        (2, 3_600), (2, 180_000),
    ]
    df = spark.createDataFrame(
        [(i, u, s) for i, (u, s) in enumerate(rows)], "event_id long, user_id long, sec long"
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    out_dir = tmp_path / "ev"
    df.write.parquet(str(out_dir / "events.parquet"))
    out = {
        r.day: (r.actives, r.retained)
        for r in QUERIES["events_daily_retention"].build(spark, str(out_dir)).collect()
    }
    assert out == {0: (2, 1), 1: (1, 1), 2: (2, 0)}


def test_rollup_totals_include_grand_total(spark):
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    out = QUERIES["orders_rollup_totals"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()
    grand = [r for r in out if r.g_status == 1 and r.g_priority == 1]
    assert len(grand) == 1
    assert grand[0].n_orders == sum(
        r.n_orders for r in out if r.g_status == 0 and r.g_priority == 0
    )
    # subtotals per status must sum to the grand total as well
    subs = [r for r in out if r.g_status == 0 and r.g_priority == 1]
    assert sum(r.n_orders for r in subs) == grand[0].n_orders


def test_unigram_surprisal_orders_rare_above_common(spark, tmp_path):
    """A doc of corpus-rare tokens must score strictly higher surprisal
    than a doc of the corpus's most common tokens."""
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    docs = [
        (1, "the the the the the the the the"),
        (2, "the the the the the the the the"),
        (3, "zyx wvu"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out_dir = tmp_path / "docs"
    df.write.parquet(str(out_dir / "documents.parquet"))
    out = {
        r.doc_id: r.avg_surprisal
        for r in QUERIES["text_unigram_surprisal"].build(spark, str(out_dir)).collect()
    }
    assert out[3] > out[1] == out[2]


def test_pii_redaction_scrubs_injected_spans(spark):
    """The redacted text must contain the typed tags and no surviving
    email/URL/long-digit spans."""
    from spark_stream_analyzer_spark.operators.text import redact

    df = spark.createDataFrame(
        [(1, "reach me at bob.smith+x@corp.example.org or https://a.b/c?d=1 id 12345678")],
        "doc_id long, text string",
    )
    r = redact(df).collect()[0]
    assert r.n_email == 1 and r.n_url == 1 and r.n_digits == 1
    assert "<email>" in r.redacted and "<url>" in r.redacted and "<digits>" in r.redacted
    assert "@" not in r.redacted and "https" not in r.redacted


def test_mixture_sample_limiting_stratum_kept_whole(spark):
    from spark_stream_analyzer_spark.operators.split import mixture_sample

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    # small has 10 rows at weight 0.5 → scale = 20; big quota = floor(10)
    out = mixture_sample(df, {"big": 0.5, "small": 0.5})
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 10, "small": 10}


def test_bm25_ranks_rare_term_above_common(spark):
    """Within a doc holding one rare and many common tokens, the rare
    term must take the top BM25 slot (higher idf, saturating tf)."""
    from spark_stream_analyzer_spark.operators.text import bm25_top_terms

    docs = [
        (1, "common common common common rare"),
        (2, "common common common common"),
        (3, "common common common common"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    top = {
        r.doc_id: r.term
        for r in bm25_top_terms(df, k=1).collect()
    }
    assert top[1] == "rare"


def test_weighted_sample_extremes(spark):
    """weight<=0 keeps nothing; weight>=1 keeps everything; a mid
    weight keeps a subset that is a subset of the weight-1 selection
    ordered by bucket (threshold monotonicity)."""
    import pyspark.sql.functions as F

    from spark_stream_analyzer_spark.operators.split import weighted_hash_sample

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    assert weighted_hash_sample(df, F.lit(0.0)).count() == 0
    assert weighted_hash_sample(df, F.lit(1.0)).count() == 200
    half = {r.doc_id for r in weighted_hash_sample(df, F.lit(0.5)).collect()}
    assert 0 < len(half) < 200
    # monotone: raising the weight only ADDS rows
    q30 = {r.doc_id for r in weighted_hash_sample(df, F.lit(0.3)).collect()}
    assert q30 <= half


def test_column_profile_counts_nulls_and_ndv(spark):
    from spark_stream_analyzer_spark.plans.q_analytics import _profile_one

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "a")], "id long, v string"
    )
    row = _profile_one(df, "v").collect()[0]
    assert (row.n_rows, row.n_notnull, row.n_distinct) == (4, 3, 2)
    assert (row.min_str, row.max_str) == ("a", "b")


def test_driver_priority_names_all_resolve():
    """Every _DRIVER_PRIORITY name must exist in the registry: a typo or
    a renamed query would silently shrink the driver's 50-sample onto
    already-verified queries instead of the never-checked set."""
    from spark_stream_analyzer_spark.plans import registry

    known = set(registry.queries())
    missing = [n for n in registry._DRIVER_PRIORITY if n not in known]
    assert not missing, f"priority names not in registry: {missing}"
    # and the curated names must stay unique (a dup eats a sample slot)
    assert len(set(registry._DRIVER_PRIORITY)) == len(registry._DRIVER_PRIORITY)


def test_never_sampled_rows_lead_driver_priority():
    """Structural guard for the r10 verdict's blind spot: any registry row
    that has NEVER appeared in a driver CORRECTNESS_r*.json sample must sit
    inside the head of _DRIVER_PRIORITY (the driver snapshots ~50 rows per
    round in iteration order), or it will age out unsampled forever —
    exactly what happened to the 8 r9 rows that landed after the r9 sample
    was taken."""
    import glob
    import json
    import pathlib

    from spark_stream_analyzer_spark.plans import registry

    root = pathlib.Path(__file__).resolve().parents[1]
    files = sorted(glob.glob(str(root / "CORRECTNESS_r*.json")))
    if not files:  # fresh checkout without driver artifacts: nothing to pin
        return
    sampled: set[str] = set()
    for f in files:
        sampled.update(json.load(open(f)).keys())
    never = set(registry.queries()) - sampled
    window = 50  # driver sample-window size
    head = set(registry._DRIVER_PRIORITY[:window])
    outside = sorted(never - head)
    assert not outside, (
        f"{len(outside)} never-driver-sampled rows sit outside the "
        f"{window}-row priority head and will never be checked: {outside}"
    )


def test_incremental_rollup_merge_equals_full_recompute(spark):
    """The partial-merge identity on a hand-built frame: keys present in
    only-history, only-delta, and both must all come out equal to the
    direct aggregate."""
    from spark_stream_analyzer_spark.plans.registry import QUERIES  # noqa: F401
    from spark_stream_analyzer_spark.plans import q_analytics as qa

    rows = [
        # (event_id, user_id, value, sec): ids straddle the 5000 cutoff
        (1, 10, 3.7, 100), (2, 10, 4.2, 200),        # history only ops
        (6001, 10, 9.9, 300),                        # + delta for same key
        (3, 20, 1.1, 50),                            # history-only key
        (6002, 30, 8.8, 400), (6003, 30, 0.5, 500),  # delta-only key
    ]
    ev = spark.createDataFrame(
        [(i, u, v, s) for i, u, v, s in rows],
        "event_id long, user_id long, value double, sec long",
    )

    def partial(df):
        return df.groupBy("user_id").agg(
            F.count("*").alias("pn"),
            F.sum(F.expr("cast(floor(value) as bigint)")).alias("ps"),
            F.max("sec").alias("pm"),
        )

    merged = (
        partial(ev.filter(F.col("event_id") < qa._INC_CUT))
        .unionByName(partial(ev.filter(F.col("event_id") >= qa._INC_CUT)))
        .groupBy("user_id")
        .agg(
            F.sum("pn").alias("n"), F.sum("ps").alias("s"), F.max("pm").alias("m")
        )
    )
    got = {r.user_id: (r.n, r.s, r.m) for r in merged.collect()}
    assert got == {10: (3, 16, 300), 20: (1, 1, 50), 30: (2, 8, 500)}


def test_day_bucketing_negative_epoch_cross_engine(spark, tmp_path):
    """Pre-1970 timestamps must land on the same day in the Spark plan
    and the DuckDB oracle.  Spark uses F.floor(epoch/86400); DuckDB's
    integer // truncates toward zero, so the oracle pins the explicit
    floor form — this test runs BOTH engines on the same parquet and
    asserts the retention rows agree (ADVICE r5, high)."""
    import duckdb

    from spark_stream_analyzer_spark.plans.registry import QUERIES

    # user 1: active epoch-days -1 and 0 (one second before/after the
    # epoch) → retained across the boundary; truncation would collapse
    # both events onto day 0 and report no retention at all
    rows = [(1, -1), (1, 1), (2, -90_000), (2, -86_399)]
    df = spark.createDataFrame(
        [(i, u, s) for i, (u, s) in enumerate(rows)],
        "event_id long, user_id long, sec long",
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    out_dir = tmp_path / "ev"
    df.coalesce(1).write.parquet(str(out_dir / "events.parquet"))

    spark_out = {
        (r.day, r.actives, r.retained)
        for r in QUERIES["events_daily_retention"].build(spark, str(out_dir)).collect()
    }
    # expected under floor-day semantics: u1 on days -1,0; u2 on days -2,-1
    assert spark_out == {(-2, 1, 1), (-1, 2, 1), (0, 1, 0)}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{out_dir}/events.parquet/*.parquet')"
    )
    oracle_out = {
        tuple(r) for r in con.execute(QUERIES["events_daily_retention"].oracle).fetchall()
    }
    assert oracle_out == spark_out
