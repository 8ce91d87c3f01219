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
#: order).  Round-6 cut (verdict r5 task 1): the 11 queries that have never
#: received a driver row come first so every registry entry finally has a
#: hard driver signal; then this round's new additions; then the rows whose
#: most recent driver sample is oldest (r1), as rotation; everything already
#: re-confirmed green in r4/r5 drops past the window.
_DRIVER_PRIORITY = (
    # -- never driver-sampled in any round (verdict r5 task 1) --
    "similarity_rank_fusion",
    "embedding_whitening_stats",
    "multimodal_bmp_decode_stats",
    "part_multiset_diff",
    "part_multiset_common",
    "events_variant_shred",
    "revenue_yoy_growth",
    "customer_rfm_segments",
    "source_xml_roundtrip",
    "corpus_cross_source_dup_matrix",
    # -- round-6 additions / changed-output rows (need a fresh driver row) --
    "multimodal_png_decode_stats",
    "similarity_pq_recall_audit",
    "tpch_fk_integrity_audit",
    "lineitem_price_tier_rangejoin",
    "orders_expectations_report",
    "source_binaryfile_ingest",
    "text_bigram_perplexity",
    "streaming_media_ingest",
    "streaming_late_data_drop",
    "source_python_datasource_wire",
    "streaming_python_datasource_tail",
    # -- round-6 plan-refactor rows (values re-verified both SFs; a fresh
    #    driver row pins the new single-fold / materialized-edge plans) --
    "part_triangle_count",
    "text_unigram_surprisal",
    "text_tfidf_top_terms",
    "text_bm25_top_terms",
    # -- rotation: oldest driver-green rows (r1, not sampled since) --
    "wire_parse_kills",
    "wire_parse_damages",
    "wire_parse_players",
    "union_kill_damage",
    "distinct_rounds",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_embedding_cosine_pairs",
    "similarity_topk_bruteforce",
    "similarity_ivf_topk",
    "text_token_stats",
    "text_language_id",
    "corpus_decontamination",
    # -- r2/r3-green rows not sampled since --
    "tpch_pricing_summary",
    "tpch_min_cost_supplier",
    "revenue_cube",
    "customer_mktsegment_stats",
    "events_json_props",
    "customer_running_spend",
    "lineitem_unpivot_measures",
    "orders_global_rank",
    "top_orders_per_customer",
    "events_asof_last_purchase",
    "embedding_kmeans_assign",
    "customer_name_fuzzy_pairs",
    # -- r5-green rows (freshest; refresh last within the window) --
    "player_stats",
    "player_stats_named",
    "player_stats_timeseries",
    "latest_snapshot",
    "player_trend",
    "pivot_asof",
    "events_value_percentiles",
    "events_daily_retention",
    "events_user_lag_features",
    "orders_column_profile",
    "events_incremental_rollup",
    "events_anomaly_zscore",
    "events_salted_type_counts",
    "lineitem_price_equidepth",
    "corpus_weighted_sample",
    "embedding_dim_profile",
    "multimodal_phash_dedup",
    "dedup_containment_pairs",
    "part_pagerank",
    "tpch_forecast_revenue_q6",
    "orders_pareto_share",
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
