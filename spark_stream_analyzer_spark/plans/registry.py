"""Query registry — every operator's oracle-checkable form lives here.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent DuckDB oracle SQL string over
the same parquet tables. The driver hash-compares both at sf0.01
(row count + schema + order-insensitive value hash, columns sorted by
name) — so **every computed column is aliased identically on both
sides**, doubles are rounded to 6 decimals, and timestamps are reduced to
epoch-second longs / dates.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


class _LazyQueryDict(dict):
    """Self-populating registry: a miss triggers ``_load_all()`` once.

    Tests (and any other caller) may index ``QUERIES`` directly without
    first going through ``queries()`` — round 2 shipped a test file that
    did exactly that and died on an empty dict.
    """

    def __missing__(self, key: str) -> QuerySpec:
        _load_all()
        try:
            return dict.__getitem__(self, key)
        except KeyError:
            raise KeyError(key) from None


QUERIES: dict[str, QuerySpec] = _LazyQueryDict()


def register(name: str, oracle: str | None = None, doc: str = ""):
    def wrap(fn):
        QUERIES[name] = QuerySpec(build=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.build for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}


_LOADED = False

#: Names surfaced FIRST in ``queries()`` / ``oracle_sql()`` iteration order.
#: The driver snapshots only ~50 of the registry per round (in iteration
#: order).  Standing rule (since r6): this round's NEW queries and every
#: row whose CODE changed this round come first — each needs a fresh
#: driver row; then the prior round's sections age in place as rotation.
#: Round-8 cut: 9 new rows (LSH hot-band pair + stats, full-outer stream
#: join, datasource writer round-trip + stream sink, transactional
#: publish, UDTF chunker, bucketed join) and the ADVICE-touched rows.
#: Names must stay UNIQUE across sections (a duplicate eats one of the
#: ~50 sample slots) — drop a name from the older section when a new
#: round re-touches it; test_driver_priority_names_all_resolve enforces.
_DRIVER_PRIORITY = (
    # -- round-11 head: the 8 rows the r10 verdict flagged as NEVER
    # driver-sampled (r9 additions that landed after the r9 sample was
    # taken and were then displaced by the r10 head).  These must stay at
    # the very top until each has a green CORRECTNESS row; the structural
    # guard test_never_sampled_rows_lead_driver_priority derives this set
    # from the CORRECTNESS_r*.json history and fails if any member sits
    # outside the sample-window head.
    "corpus_span_dedup_clean",
    "dedup_duplicated_spans",
    "lineitem_weighted_median_udaf",
    "streaming_ann_lookup",
    "streaming_dim_refresh_enrich",
    "streaming_join_state_reader",
    "streaming_state_change_feed",
    "streaming_state_store_reader",
    # -- round-11 changed-code rows (fresh driver row required) --
    "approx_quantile_check",  # exact check side swapped to bisection form
    "events_value_percentiles",  # bisection form (lint ban on percentile())
    "price_quartiles_by_flag",  # bisection form (lint ban on percentile())
    "streaming_jdbc_sink_snapshots",  # DELETE failure classified by SQLState
    "streaming_table_version_tail",  # latestOffset floored at planned version
    # -- round-11 additions --
    "orders_bloom_semijoin",
    "streaming_semi_join",
    "embedding_random_projection",
    "corpus_quality_buckets",
    "text_bpe_encode",
    "orders_time_travel_asof",
    "streaming_dual_sink_exactly_once",
    "similarity_jl_rerank_audit",
    "source_file_provenance",
    "streaming_phash_dedup",
    "streaming_approx_distinct_windows",
    "events_cep_chain",
    "embedding_top_pc_power_iteration",
    "orders_gdpr_erasure",
    "text_textrank_keywords",
    "corpus_sequence_pack",
    "similarity_hard_negatives",
    "events_robust_zscore",
    "corpus_source_tv_divergence",
    "events_dp_noisy_release",
    "similarity_mmr_rerank",
    "streaming_windowed_topk_board",
    "customer_entity_resolution",
    "orders_benford_audit",
    "streaming_watermark_metrics",
    "orders_bootstrap_replicates",
    "streaming_late_data_drop",  # batch construction extracted to shared helper
    # -- round-11 changed-code rows (lineage_cut hybrid deep-cut — the
    # CC-loop consumers not already in the head above) --
    "dedup_duplicate_clusters",
    "dedup_survivors",
    "corpus_cluster_safe_split",
    # -- round-11 changed-code rows (cont.) --
    "text_bpe_merge_table",  # training loop extracted to bpe_train_merges
    # -- round-10 additions --
    "lineitem_weighted_median_partkey",
    "dedup_semantic_keep_list",
    "lineitem_exact_percentiles_bisect",
    "orders_version_changes",
    "embedding_kmeans_bigk_assign",
    # -- round-10 changed-code rows (fresh driver row required) --
    "streaming_state_ttl_eviction",  # timer epoch from unix_millis (TZ fix)
    "events_k_anonymity",  # hour-of-day from epoch arithmetic (TZ fix)
    "customer_name_fuzzy_pairs",  # empty-string deletion-key guard
    "customer_name_fuzzy_pairs_d2",
    "customer_spend_ranks",  # integer-div ntile arithmetic
    "supplier_balance_deciles",
    "orders_global_rank",
    # -- round-8 additions --
    "dedup_lsh_hot_band_cap",
    "dedup_lsh_hot_band_stats",
    "streaming_full_outer_join",
    "sink_python_datasource_roundtrip",
    "orders_cdc_transactional_publish",
    "orders_cdc_merge_apply",  # merge body extracted to shared helper
    "doc_chunk_windows_udtf",
    "orders_bucketed_colocated_join",
    "streaming_python_datasource_sink",
    "source_dynamic_partition_overwrite",
    "orders_scd2_dimension_history",
    "streaming_cdc_upsert_publish",
    # -- round-8 changed-code rows (fresh driver row required) --
    "source_small_file_compaction",  # bound-derived verdict bits (ADVICE)
    "dedup_minhash_lsh_pairs",  # default band_cap path (cold branch)
    "dedup_lsh_recall_audit",
    "corpus_cross_source_dup_matrix",
    # -- round-7 additions --
    "streaming_rocksdb_windowed_counts",
    "streaming_availablenow_backfill",
    "streaming_checkpoint_restart",
    "dedup_incremental_index",
    "text_bpe_pair_counts",
    # (text_bpe_merge_table moved to the round-11 changed-code section)
    "orders_salted_customer_join",
    "source_partitioned_pruned_scan",
    "source_schema_evolution_merge",
    "events_observed_quality",
    "approx_hll_mergeable_rollup",
    "source_zorder_multidim_pruning",
    # -- round-7 changed-code rows (fresh driver row required) --
    "similarity_pq_recall_audit",  # output schema changed (banded gate)
    "text_tfidf_top_terms",
    "text_bm25_top_terms",
    "text_unigram_surprisal",
    "text_bigram_perplexity",
    "part_triangle_count",
    "part_pagerank",
    "dedup_simhash_pairs",
    "corpus_decontamination",
    "multimodal_png_decode_stats",
    # -- round-6-touched rows that missed the r6 driver sample --
    "events_daily_retention",
    "events_activity_islands",
    "embedding_centroid_outliers",
    "corpus_mixture_sample",
    "dedup_chunk_exact",
    # -- rotation: rows whose latest driver check is r1 --
    "streaming_snapshot_stats",
    "streaming_windowed_counts",
    "wire_pipeline_stats",
    "tpch_revenue_forecast",
    "tpch_shipping_priority",
    "approx_distinct_check",
    "churned_customers_except",
    "repeat_customers_intersect",
    # -- rotation: rows whose latest driver check is r2 --
    "dedup_minhash_signatures",
    "similarity_ann_lsh",
    "similarity_ann_multiprobe",
    "embedding_label_centroids",
    "embedding_norm_stats",
    "embedding_quantize_int8",
    "corpus_curation_pipeline",
    "corpus_hash_split",
    "corpus_stratified_sample",
    "corpus_sample_exact_k",
    "corpus_token_shards",
    "text_fingerprints",
    "text_vocab_stats",
    "text_repetition_stats",
    "text_pii_redaction",
    "approx_heavy_hitters_check",
    "orders_rollup_totals",
    "lineitem_price_histogram",
    "multimodal_feature_extract",
    "multimodal_decode_stats",
    "multimodal_frame_sample",
    "multimodal_resize_stats",
    "doc_chunk_windows",
)


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from spark_stream_analyzer_spark.plans import (  # noqa: F401
        q_analytics,
        q_formats,
        q_llm,
        q_reference,
        q_setops,
        q_streaming,
        q_tpch,
        q_windows,
        q_wire,
    )

    _LOADED = True
    # Reorder: driver-priority names first, everything else in registration
    # order after them (pure reordering — no entry is added or dropped).
    items = dict(QUERIES)
    QUERIES.clear()
    for name in _DRIVER_PRIORITY:
        if name in items:
            QUERIES[name] = items.pop(name)
    QUERIES.update(items)
