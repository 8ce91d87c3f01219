"""Round-6 operator tests: FK-integrity audit, broadcast range join,
declarative expectations, binaryFile ingest — hand-computed intent
checks beside the sf0.01 oracle gate (which proves engine parity)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_fk_audit_counts_planted_orphans(spark, tmp_path, monkeypatch):
    """An orphan child key must be counted, a matched one must not —
    and duplicate parent keys must not double-count children."""
    import spark_stream_analyzer_spark.plans.q_tpch as qt
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    nation = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 10)], "n_nationkey long, n_regionkey long"
    )  # duplicate parent key 2 on purpose
    region = spark.createDataFrame([(10,)], "r_regionkey long")
    nation.write.parquet(str(tmp_path / "nation.parquet"))
    region.write.parquet(str(tmp_path / "region.parquet"))
    customer = spark.createDataFrame(
        [(100, 1), (101, 2), (102, 7)], "c_custkey long, c_nationkey long"
    )  # custkey 102 → nation 7 is an orphan
    customer.write.parquet(str(tmp_path / "customer.parquet"))

    monkeypatch.setattr(
        qt,
        "_FK_EDGES",
        (
            ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
            ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
        ),
    )
    out = {
        r.edge: (r.n_rows, r.n_orphans)
        for r in QUERIES["tpch_fk_integrity_audit"].build(spark, str(tmp_path)).collect()
    }
    assert out == {
        "customer->nation": (3, 1),  # dup parent key must not inflate to 4
        "nation->region": (3, 0),
    }


def test_range_join_boundaries_are_half_open(spark, tmp_path):
    """A price exactly on a tier edge belongs to the UPPER tier
    ([lo, hi) on both engines), and every row lands in exactly one."""
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    li = spark.createDataFrame(
        [(0.0,), (9999.99,), (10_000.0,), (29_999.99,), (30_000.0,), (60_000.0,)],
        "l_extendedprice double",
    )
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        r.tier: (r.n_items, r.sum_price)
        for r in QUERIES["lineitem_price_tier_rangejoin"]
        .build(spark, str(tmp_path))
        .collect()
    }
    assert out["budget"] == (2, 9999.99)
    assert out["mid"] == (2, 39_999.99)  # 10k edge goes UP, 30k edge leaves
    assert out["premium"] == (1, 30_000.0)
    assert out["luxury"] == (1, 60_000.0)
    assert sum(n for n, _ in out.values()) == 6  # total coverage, no dupes


def test_range_join_fact_side_never_exchanges(spark, sf_dir):
    """The scale contract: the 4-row tier dim broadcasts and the fact
    reaches the join without ANY Exchange (a sort-merge range join
    would shuffle the full fact to sort it)."""
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    df = QUERIES["lineitem_price_tier_rangejoin"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_part = plan[: plan.index("HashAggregate")] if "HashAggregate" in plan else plan
    assert "BroadcastNestedLoopJoin" in plan
    # the only exchanges allowed are the broadcast of the dim and the
    # final |tiers|-row aggregate merge — never a fact-side shuffle
    import re

    fact_exchanges = [
        ln for ln in join_part.splitlines()
        if re.search(r"\bExchange (hash|range)partitioning", ln)
    ]
    assert not fact_exchanges, fact_exchanges


def test_expectations_report_flags_planted_violations(spark, tmp_path):
    """Every rule must count its own violations independently from one
    shared scan; NULL predicate results count as violations."""
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    rows = [
        # orderkey, custkey, status, totalprice, orderdate, priority
        (1, 10, "O", 100.0, "1995-01-01", "1-URGENT"),
        (2, None, "F", -5.0, "1995-01-02", "2-HIGH"),   # bad custkey, bad price
        (3, 11, "X", 50.0, None, "bogus"),               # bad status/date/priority
        (-4, 12, "P", None, "1995-01-04", "3-MEDIUM"),   # bad orderkey, NULL price
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    df.write.parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.rule: (r.n_checked, r.n_violations, r["pass"])
        for r in QUERIES["orders_expectations_report"].build(spark, str(tmp_path)).collect()
    }
    assert out["totalprice_positive"] == (4, 2, 0)  # -5 and NULL both violate
    assert out["orderdate_not_null"] == (4, 1, 0)
    assert out["status_in_domain"] == (4, 1, 0)
    assert out["priority_wellformed"] == (4, 1, 0)
    assert out["custkey_present"] == (4, 1, 0)
    assert out["orderkey_positive"] == (4, 1, 0)
    assert out["totalprice_in_range"] == (4, 1, 0)  # NULL is not in range


def test_expectations_single_scan(spark, sf_dir):
    """N rules must cost ONE scan of orders — the plan may contain only
    a single parquet scan node."""
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    df = QUERIES["orders_expectations_report"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_binaryfile_ingest_round_trips_files(spark, sf_dir):
    """Files written executor-side must read back via binaryFile with
    identity recovered from the path and bodies byte-exact (the decode
    witnesses only hold if content survived the disk round trip)."""
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    out = QUERIES["source_binaryfile_ingest"].build(spark, sf_dir).collect()
    assert out, "fixture subset selected no docs"
    for r in out:
        assert r.doc_id % 17 == 3
        h = 2 + r.doc_id % 4
        assert r.height == h and r.n_filters_used == h
        assert r.mean_pixel == r.doc_id % 200 + (h - 1) / 2.0
