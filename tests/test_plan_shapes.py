"""Physical-plan regression tests — the 100 TB contract, checked at sf0.001.

Correctness says a query returns the right rows; these tests pin the
*shape* that makes it survive a 1000× scale-up: filters reaching the
parquet scan, column pruning, broadcast (not shuffled) dim joins,
map-side partial aggregation, and bounded-heap global top-k. A refactor
that silently breaks one of these still passes the oracle gate — this
file is what catches it.
"""

from __future__ import annotations

import pytest

from spark_stream_analyzer_spark.plans.registry import queries

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_pricing_summary_pushes_shipdate_filter(spark):
    plan = plan_of(spark, "tpch_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_pricing_summary_prunes_columns(spark):
    plan = plan_of(spark, "tpch_pricing_summary")
    # ReadSchema must not include unused wide columns
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read


def test_revenue_forecast_is_scan_plus_agg_only(spark):
    plan = plan_of(spark, "tpch_revenue_forecast")
    assert "hashpartitioning" not in plan  # global agg: partial + SinglePartition exchange
    assert "PushedFilters" in plan


def test_dim_joins_are_broadcast(spark):
    plan = plan_of(spark, "tpch_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan or plan.count("BroadcastHashJoin") >= 2


def test_grouped_agg_has_partial_aggregation(spark):
    plan = plan_of(spark, "tpch_pricing_summary")
    # two HashAggregate nodes (partial then final) around one exchange
    assert plan.count("HashAggregate") >= 2


def test_top_k_uses_bounded_heap_not_full_sort(spark):
    plan = plan_of(spark, "tpch_returned_item_customers")
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_joins_planned_for_exists_shapes(spark):
    plan = plan_of(spark, "tpch_lone_return_supplier")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_unpivot_expands_without_extra_shuffle(spark):
    plan = plan_of(spark, "lineitem_unpivot_measures")
    assert "Expand" in plan
    assert plan.count("Exchange (") == 1  # only the final agg's shuffle


def test_wire_parsers_have_no_python_udf(spark):
    for name in ("wire_parse_kills", "wire_parse_damages", "wire_parse_players"):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_text_ops_stay_in_codegen(spark):
    # single-scan column expressions: no shuffle, no Python; token stats
    # and language-ID must be FULLY codegen (no CodegenFallback HOFs —
    # every plan node starred). Fingerprints keep their zip_with shingle
    # lambdas (measured faster than the alternatives), so they are only
    # held to the no-shuffle/no-Python bar.
    for name in ("text_token_stats", "text_language_id", "text_fingerprints"):
        plan = plan_of(spark, name)
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for name in ("text_token_stats", "text_language_id"):
        plan = plan_of(spark, name)
        for line in plan.splitlines():
            if line.strip().startswith("== "):
                continue
            # every plan-tree node line must carry the codegen star
            if "Project (" in line or "Filter (" in line:
                assert "* " in line, f"{name}: interpreted node: {line}"


def test_vocab_has_no_distinct_expand(spark):
    # doc_freq must come from two-level agg, not a COUNT DISTINCT expand
    plan = plan_of(spark, "text_vocab_stats")
    assert "Expand" not in plan


def test_asof_join_is_window_not_cross_product(spark):
    plan = plan_of(spark, "events_asof_last_purchase")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_global_rank_uses_range_partitioning(spark):
    plan = plan_of(spark, "orders_global_rank")
    assert "rangepartitioning" in plan  # fact side: range exchange, not SinglePartition


def test_token_shards_never_single_partitions_the_corpus(spark):
    """Sequence packing must range-partition the fact side; the only
    SinglePartition exchange allowed is the tiny per-partition offsets
    window (<= num-partitions rows)."""
    plan = plan_of(spark, "corpus_token_shards")
    assert "rangepartitioning" in plan
    # the offsets' window is the one sanctioned single-partition step
    assert plan.count("SinglePartition") <= 1


def executed_plan_of(spark, name: str) -> str:
    """Final AQE plan — ReuseExchange only materializes at runtime."""
    df = queries()[name](spark, SF)
    df.collect()
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_decontamination_materializes_postings_once(spark):
    """The shingle postings are materialized once (Catalyst would push
    the is_eval filters below a shared repartition, defeating plain
    exchange reuse); both join sides read the pinned table and
    candidates come from an equality join, never a product. The pin
    signature depends on the materialize strategy: InMemoryTableScan
    under the cluster-safe persist default, ExistingRDD under the
    local_checkpoint opt-in (r7)."""
    plan = executed_plan_of(spark, "corpus_decontamination")
    assert "InMemoryTableScan" in plan or "ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_pairs_join_on_hashed_keys_with_reuse(spark):
    plan = executed_plan_of(spark, "customer_name_fuzzy_pairs")
    assert "xxhash64" in plan
    assert "ReusedExchange" in plan
    assert "CartesianProduct" not in plan


def test_lsh_pairs_reuse_signature_exchange(spark):
    """Band sides and verify sides all hang off ONE signature exchange
    (the measured ~35% win from round 1 must not silently regress)."""
    plan = executed_plan_of(spark, "dedup_minhash_lsh_pairs")
    assert "ReusedExchange" in plan


def test_bruteforce_topk_broadcasts_queries(spark):
    plan = plan_of(spark, "similarity_topk_bruteforce")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------- round 2


def test_chunk_windows_is_shuffle_free(spark):
    """Sliding-window chunking is a pure per-row generator: scan →
    sequence+explode → project. ANY exchange here would mean the chunker
    serializes the corpus through a shuffle at 100 TB."""
    plan = plan_of(spark, "doc_chunk_windows")
    assert "Generate" in plan
    assert "Exchange" not in plan


def test_rollup_is_expand_plus_one_shuffle(spark):
    """ROLLUP must plan as Expand → partial agg → ONE exchange → final
    agg — not a union of per-grouping-set scans."""
    plan = plan_of(spark, "orders_rollup_totals")
    assert "Expand" in plan
    assert plan.count("Exchange") <= 2  # formatted explain lists nodes twice


def test_lag_features_share_one_window(spark):
    """All six lag/lead/rank features must ride one Window node over one
    shuffle+sort — six window specs would mean six sorts of the fact."""
    plan = plan_of(spark, "events_user_lag_features")
    assert plan.count("Window") == 2  # one node (tree + details sections)
    assert plan.count("Exchange") <= 2


def test_mixture_sample_broadcasts_quota(spark):
    plan = plan_of(spark, "corpus_mixture_sample")
    assert "BroadcastHashJoin" in plan


def test_percentiles_have_partial_aggregation(spark):
    plan = plan_of(spark, "events_value_percentiles")
    assert plan.count("ObjectHashAggregate") + plan.count("SortAggregate") >= 2


def test_approx_distinct_check_has_no_expand(spark):
    """The approx-vs-exact distinct verdict must keep its dedup-first
    shape: combining approx_count_distinct with countDistinct in one agg
    triggers the Expand rewrite (input rows duplicated through the
    distinct-agg path, HLL update outside codegen).  Dedup-first keeps
    one scan + one shuffle of unique keys at every SF."""
    plan = plan_of(spark, "approx_distinct_check")
    assert "Expand" not in plan
    # partial dedup before the shuffle: HashAggregate on both sides
    assert plan.count("HashAggregate") >= 2


# ---------------------------------------------------------------- round 3


def test_quality_filter_is_single_scan_codegen(spark):
    """Five quality rules must ride ONE scan-side projection: any
    Exchange or Python eval here turns a scan-bound filter into a
    shuffle/IPC problem at 100 TB."""
    plan = plan_of(spark, "text_quality_filter")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_dedup_is_explode_plus_hash_joins(spark):
    """Chunk dedup candidates must come from equality joins on the chunk
    hash — a Cartesian/nested-loop here would be the d² blowup the
    operator exists to avoid; the chunking itself must be a Generate
    (explode), not a UDF fan-out."""
    plan = plan_of(spark, "dedup_chunk_exact")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan


def test_pq_audit_scoring_stays_jvm_side(spark):
    """PQ encode (argmin over literal codebooks) and ADC scoring
    (element_at on literal distance tables) must be pure JVM
    expressions — no Python eval anywhere, candidates never via a
    product."""
    plan = plan_of(spark, "similarity_pq_recall_audit")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------- round-4 additions


def test_q6_filters_reach_scan_and_no_shuffle_before_agg(spark):
    """Q6 is the io-path floor: every predicate must be a PushedFilter,
    and the only exchange is the final 1-row partial-agg merge."""
    plan = plan_of(spark, "tpch_forecast_revenue_q6")
    assert "PushedFilters" in plan
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in plan, frag
    assert "Join" not in plan


def test_pareto_ranks_aggregated_rows_not_fact(spark):
    """The window must run over the per-customer AGGREGATE — in the
    formatted tree (parents print first) Window is an ANCESTOR of
    HashAggregate, so its line appears earlier; and the fact is combined
    map-side (partial_sum) before any exchange."""
    plan = plan_of(spark, "orders_pareto_share")
    assert plan.index("Window") < plan.index("HashAggregate")
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan


def _nodes(plan: str, name: str) -> int:
    """Count physical nodes named exactly `name` in the details section
    ("(N) Name" lines) — plain substring counts also hit the tree echo
    and prefixed nodes (Window vs WindowGroupLimit)."""
    import re

    return len(re.findall(rf"^\(\d+\) {name}\s*$", plan, re.M))


def test_contingency_windows_run_over_cell_table(spark):
    """Marginal sums are windows over the 15-cell aggregate — the fact is
    scanned exactly once."""
    plan = plan_of(spark, "orders_priority_status_contingency")
    assert _nodes(plan, "Scan parquet") == 1


def test_delay_bands_joins_on_orderkey_then_aggregates(spark):
    plan = plan_of(spark, "lineitem_shipping_delay_bands")
    # partial aggregation must exist (map-side combine before the band agg)
    assert "partial_count" in plan or "partial count" in plan.lower()
    assert "CartesianProduct" not in plan


def test_gapfill_spine_is_broadcast_not_fact_rescan(spark):
    """The dense hour spine comes from the 1-row range agg crossed with
    the distinct type list — both broadcast; the left join against bucket
    counts must be a broadcast hash join, not a shuffled one."""
    plan = plan_of(spark, "events_minute_resample_gapfill")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_centroid_queries_have_no_python_and_no_product(spark):
    for name in ("embedding_label_cosine_matrix", "embedding_centroid_outliers"):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_domain_cap_is_single_window_with_group_limit_pushdown(spark):
    """One per-source window; Spark 4 additionally pushes the rank<=K
    filter down as WindowGroupLimit on BOTH sides of the exchange (a
    partial top-K per map partition) — pin that, it is precisely the
    optimization that keeps a hot domain from flooding one reducer."""
    plan = plan_of(spark, "corpus_domain_cap_sample")
    assert _nodes(plan, "Window") == 1
    assert plan.count("WindowGroupLimit") >= 2
    assert _nodes(plan, "Scan parquet") == 1


# ---------------------------------------------------------------- round 7


def test_single_fold_text_plans_explode_once(spark, monkeypatch):
    """The r6 single-fold refactor must survive the r7 cluster-safe
    materialize swap: every consumer reads the pinned fold, never a
    re-explode of the token stream. Checked in local_checkpoint mode,
    where the pin is opaque (ExistingRDD) — ANY explode in the outer
    plan would be a consumer re-deriving the fold. (Under the persist
    default the same materialize() call site pins an InMemoryRelation;
    formatted explain re-prints the cached plan per occurrence, so a
    text count over it is not meaningful — the decontamination test
    covers the persist signature.)"""
    monkeypatch.setenv("SSA_MATERIALIZE", "local_checkpoint")
    for name in ("text_tfidf_top_terms", "text_unigram_surprisal"):
        plan = executed_plan_of(spark, name)
        assert plan.count("explode(") == 0, name
        assert "ExistingRDD" in plan, name


def test_salted_join_has_no_pathological_join(spark):
    """Salting must produce a plain (key, salt) equi-join — a fallback
    that degraded to a nested-loop or cartesian product would be worse
    than the skew it treats."""
    plan = executed_plan_of(spark, "orders_salted_customer_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # results merge through partial aggregation like any plain groupBy
    assert plan.count("HashAggregate") >= 2


def test_bpe_pair_counts_single_bounded_exchange(spark):
    """Pair generation is a per-row transform; the only data exchange is
    the pair-count shuffle over the |alphabet|^2 key universe (plus the
    window's single partition over the bounded count table). The raw
    token stream must never hit an exchange un-combined."""
    plan = plan_of(spark, "text_bpe_pair_counts")
    assert plan.count("explode(") == 2  # words, then pairs — row fan-out, no shuffle
    # partial agg below the exchange: map-side combine collapses the pair stream
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_incremental_index_joins_on_band_keys(spark, tmp_path):
    """The new-batch-vs-index candidate join must be an equality join on
    the band keys (batch-sized left side), and verification must read
    the STORED shingle arrays — no re-shingling of the indexed corpus."""
    from pyspark.sql import functions as F

    from spark_stream_analyzer_spark.operators import dedup
    from spark_stream_analyzer_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    idx_path = str(tmp_path / "idx")
    dedup.write_signature_index(docs.filter(F.col("doc_id") % 10 < 8), idx_path)
    out = dedup.lsh_pairs_against_index(
        spark, docs.filter(F.col("doc_id") % 10 >= 8), idx_path, min_jaccard=0.02
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the index side enters as a parquet scan of the signature table —
    # its shingles come from storage, not a recompute of the corpus
    assert plan.count("Scan parquet") >= 2


def test_cdc_merge_windows_delta_only_and_outer_joins_on_key(spark):
    """CDC compaction's row_number window must sort only the change log
    (its exchange input is the filtered union, never the base orders
    scan), and the apply must be a plain full-outer equi-join on the
    key — no product, no nested loop. Partial aggregation merges the
    final per-status rollup."""
    plan = plan_of(spark, "orders_cdc_merge_apply")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # one Window node (compaction argmax) — and Spark's rn=1 rewrite
    # engages WindowGroupLimit, pre-truncating each key's run to its
    # top row on BOTH sides of the window exchange
    assert plan.count("Window (") == 1
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin FullOuter" in plan
    # rollup merges map-side like any groupBy
    assert plan.count("HashAggregate") >= 2


def test_semdedup_pair_join_is_cluster_equijoin(spark):
    """SemDeDup's zero-cross-cluster claim, pinned from the plan: the
    within-cluster pair comparison must be an EQUI-join keyed on the
    cluster id — never BroadcastNestedLoopJoin/CartesianProduct
    (the r10 build caught exactly this: a self-join equality on the
    un-renamed cluster_id resolved trivially true and degraded to a
    filtered cross join).  Since r15 the prune runs as a LEFT SEMI join
    (the rule is an EXISTS; no pair materialization, early exit per
    probe row), so the pin now reads the semi-join node itself: join
    type LeftSemi with both equi-join key sides on the cluster id."""
    import re

    plan = plan_of(spark, "dedup_semantic_keep_list")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    m = re.search(
        r"Left keys \[1\]: \[(\w+)#\d+L?\]\n"
        r"Right keys \[1\]: \[(\w+)#\d+L?\]\n"
        r"Join type: LeftSemi",
        plan,
    )
    assert m, "no LeftSemi equi-join in the semdedup plan"
    assert m.group(1) == m.group(2) == "cluster_id"


def test_weighted_median_bisect_windows_are_group_partitioned(spark):
    """The fact-scale exact weighted median must never funnel data
    through a single-reducer window: every WindowExec in its plan is
    partitioned by the group key (the registry-wide SinglePartition lint
    covers this too — this pins it locally with the finish window's
    small-remnant input)."""
    plan = plan_of(spark, "lineitem_weighted_median_partkey")
    assert "AggregateInPandas" not in plan  # no per-group Arrow batches
    assert "BatchEvalPython" not in plan


def test_corpus_join_is_shuffle_equijoin(spark):
    """similarity_corpus_join_ann: BOTH sides are fact-scale, so the
    bucket join must be an EQUI-join with extractable keys — never a
    cartesian/BNLJ (all-pairs).  At sf0.001 Catalyst auto-broadcasts
    the tiny side (legal and adaptive); with auto-broadcast disabled
    (how the planner sees two at-scale corpora) the SAME plan must
    degrade to a shuffle equi-join, proving no all-pairs fallback
    lurks.  The within-bucket top-k is the only window, by query."""
    plan = plan_of(spark, "similarity_corpus_join_ann")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        at_scale = plan_of(spark, "similarity_corpus_join_ann")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "CartesianProduct" not in at_scale
    assert "BroadcastNestedLoopJoin" not in at_scale
    assert "BroadcastHashJoin" not in at_scale
    assert ("SortMergeJoin" in at_scale) or ("ShuffledHashJoin" in at_scale)
