"""Empirical scale probe for the dedup/ANN families (SCALING.md evidence).

Builds 1x and 10x corpora from $SPARK_GRAFT_SF_DIR's documents/embeddings
and times each family at both scales. The candidate-generation argument
(pairs come from equality joins on band/bucket/posting keys, never n²)
predicts ~linear runtime in corpus size; this measures it.

Copies are PERTURBED so the 10x corpus has the same near-dup structure
per copy as the original, rather than 10-cliques of identical documents
(which would measure pair-output blowup, not candidate-generation
scaling): text gets a per-copy character rotation (changes most
shingles), embeddings get a per-copy cyclic dimension shift (destroys
cross-copy cosine similarity).

Usage: python tools/scale_probe.py [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_stream_analyzer_spark import get_spark
from spark_stream_analyzer_spark.plans import registry

PROBE_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine_pairs",
    "dedup_duplicate_clusters",
    "similarity_ann_lsh",
    "similarity_ann_multiprobe",
    "similarity_ivf_topk",
    "corpus_decontamination",
    "corpus_token_shards",
    # round-3 additions
    "dedup_chunk_exact",
    "multimodal_phash_dedup",
    "similarity_pq_recall_audit",
    # round-4: the global-rank decomposition family (range exchange +
    # local rank + broadcast partition offsets — the no-single-reducer
    # total order). Probing these needs the FACT tables scaled, so
    # build_corpora also clones orders/lineitem with offset keys and
    # epsilon-perturbed measures (pure copies would make every value a
    # 10-way tie, measuring tie-chain pathology instead of rank scaling).
    "orders_global_rank",
    "lineitem_price_equidepth",
    # round-4b: graph + islands + dedup-aware-split families. Events are
    # cloned with per-copy user_id offsets, so the xN corpus means N×
    # USERS with unchanged per-user history — the realistic growth axis
    # for per-user windows (longer-history growth would instead measure
    # sort-within-partition, which stays bounded by repartitioning on
    # (user, day-range) at real scale). Triangle counting rides the
    # offset-orderkey fact clone: same parts, 10× baskets, so edge
    # support GROWS and pair/triangle output grows with it — row counts
    # are recorded to separate output growth from candidate-generation
    # growth, as with the jaccard family.
    "part_triangle_count",
    "events_activity_islands",
    "events_state_intervals",
    "corpus_cluster_safe_split",
    "dedup_survivors",
    "text_intradoc_dup_chunks",
    # round-4b second batch: hybrid retrieval (k-bounded fusion over two
    # retrievers), whitening (broadcast-profile scan), variant shredding
    # (scan-shaped binary-JSON extraction), bag-semantics set ops
    # (counted anti-aggregation)
    "similarity_rank_fusion",
    "embedding_whitening_stats",
    "events_variant_shred",
    "part_multiset_diff",
    # round-6: the remaining pair-emitting families the r5 verdict asked
    # to probe at 100x the correctness-gate SF (run with
    # SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 and factor 10 → sf1-scale)
    "dedup_containment_pairs",
    "customer_name_fuzzy_pairs",
    # round-7: incremental index dedup (batch-vs-index join must scale
    # with the BATCH, not the corpus), BPE pair counting (bounded-key
    # aggregation over the exploded stream), salted fact⋈dim join
    "dedup_incremental_index",
    "text_bpe_pair_counts",
    "orders_salted_customer_join",
    # round-7 second batch: CDC merge-apply (delta-windowed compaction +
    # one full-outer key shuffle of base+delta — must track the base
    # scan, never the delta squared)
    "orders_cdc_merge_apply",
    # round-7 third batch: scan-piggybacked observe() counters, sketch
    # rollup (bounded sketch exchange), Z-order rewrite (write-volume
    # bound) — all expected ~linear in input
    "events_observed_quality",
    "approx_hll_mergeable_rollup",
    "source_zorder_multidim_pruning",
    # round-8: hot-band-capped LSH over a degenerate corpus (star
    # expansion must keep candidates O(m) as the clone set grows with
    # the corpus — THE row whose uncapped form would go quadratic),
    # transactional publish (two full snapshot writes + one merge —
    # write-volume bound), datasource-writer round-trip (Python-boundary
    # write+read, linear in rows)
    "dedup_lsh_hot_band_cap",
    "orders_cdc_transactional_publish",
    "sink_python_datasource_roundtrip",
    # round-8 second batch: SCD2 history (key-windowed lead, append-only),
    # dynamic partition overwrite (rewrite volume = touched partition),
    # bucketed co-located join (two bucketed writes + zero-shuffle join)
    "orders_scd2_dimension_history",
    "source_dynamic_partition_overwrite",
    "orders_bucketed_colocated_join",
    # round-9: the LIVE streaming-CDC-publish composition (r8 verdict
    # task 5's last family) — 10× orders means a 10× base snapshot write
    # plus two 10× foreachBatch merges; expected write-volume bound like
    # its batch twin orders_cdc_transactional_publish, with the
    # micro-batch scheduling floor unchanged (2 data batches either way)
    "streaming_cdc_upsert_publish",
    # round-9 second batch: the exact-substring span family — sliding
    # grams are ~n_words exploded rows with uniform hash shuffles, so
    # both the finder and the cutter should track corpus size linearly
    # (the perturbed clone corpora keep cross-copy grams distinct, so
    # candidate structure per copy matches the original)
    "dedup_duplicated_spans",
    "corpus_span_dedup_clean",
    # round-9 third batch: the grouped-agg pandas UDAF — 6 bounded cells
    # over a 10× fact scan; expected to track the scan (the Arrow
    # exchange ships each cell's rows once, no map-side partial exists)
    "lineitem_weighted_median_udaf",
    # round-10: the fact-scale exact weighted median — O(log_B V) scans
    # with map-side-combinable (group, bucket) partials; expected to
    # track the fact scan like its bounded-groups UDAF sibling, with
    # 10× output rows impossible (one row per partkey, dims pinned)
    "lineitem_weighted_median_partkey",
    "lineitem_exact_percentiles_bisect",
    # round-10: dedup_semantic_keep_list is probed by the registry-wide
    # sweep (tools/scale_sweep.py, EXPLAINED entry: within-cluster
    # pairwise is the published SemDeDup cost model; k must scale with
    # the corpus) — not duplicated here.
    # round-10 (r9 verdict task 7): the r9 streaming rows with a real
    # data-dependent side. ann_lookup: 10× embeddings = 10× persisted
    # index + 10× candidate buckets behind the stream-static joins
    # (query-id stream unchanged). dim_refresh_enrich: 10× customer dim
    # re-read per micro-batch (events capped by the fixture). The three
    # state-reader rows are EVENT_CAP-bounded fixtures — their input
    # does not scale with the corpus, so a 10× probe would measure
    # nothing (documented here instead of silently skipped).
    "streaming_ann_lookup",
    "streaming_dim_refresh_enrich",
    # round-10: table-version tailing — 10× orders means two 10× snapshot
    # writes + two 10× version drains; expected write/scan-volume bound
    # with the micro-batch scheduling floor unchanged (2 versions either
    # way), like streaming_cdc_upsert_publish
    "streaming_table_version_tail",
    # round-12 (r11 verdict task 3): the remaining top-cost BENCH_r11 rows.
    # bpe trainer: each argmax round is one 100× pair-count scan — multi-
    # scan but log-free, expected to track the scan with the 1-row driver
    # crossings unchanged. bpe encode: train + a pure per-row expression
    # map, expected ~scan-bound. pagerank: l_orderkey-offset clones keep
    # the SAME partkeys, so co-occurrence SUPPORT multiplies and the edge
    # set densifies toward the >=3 threshold — row counts are recorded to
    # separate that output growth from per-iteration join/agg scaling
    # (same reading as part_triangle_count). ER rows: tag-prefixed name
    # bijection guarantees zero cross-copy candidates; output is 100
    # disjoint per-copy resolutions, candidates linear by blocking.
    # NOT probed, documented instead: streaming_windowed_topk_board and
    # the state-reader rows are EVENT_CAP-bounded fixtures (input does
    # not scale with the corpus — a probe would measure the scheduling
    # floor); dedup_semantic_keep_list's within-cluster pairwise cost is
    # the published SemDeDup model (k must scale with the corpus), kept
    # as the sweep's EXPLAINED entry.
    "text_bpe_merge_table",
    "text_bpe_encode",
    "part_pagerank",
    "customer_entity_resolution",
    "customer_entity_resolution_full",
    # round-12: the production-vocab Arrow BPE encoder (pad-gated twin of
    # text_bpe_encode) — expected to track the chain form's scan-bound
    # scaling with a constant Arrow-boundary overhead
    "text_bpe_encode_bigvocab",
    # round-12 batch 2: GD logistic regression (per-step scan + bounded
    # groupBy(dim), D-float driver crossings — the PCA cost shape),
    # chi-square independence (one scan to |types| x 7 cells), and the
    # temperature mixture plan (one scan to |sources| cells)
    "embedding_logreg_gd",
    "events_chi2_independence",
    "corpus_temperature_mixture",
]

# distinct single-char rotations per copy; copy 0 is the original corpus
_ROT_SRC = "etaoinshr"


def build_corpora(spark, sf_dir: str, base: str, factor: int = 10) -> None:
    from spark_stream_analyzer_spark.sources.tables import load_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    events = load_table(spark, sf_dir, "events")  # ts-normalized read
    n_docs = docs.count()
    n_emb = emb.count()
    dim_expr = "size(embedding)"

    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(f"{base}/x1", exist_ok=True)
    docs.write.mode("overwrite").parquet(f"{base}/x1/documents.parquet")
    emb.write.mode("overwrite").parquet(f"{base}/x1/embeddings.parquet")
    orders.write.mode("overwrite").parquet(f"{base}/x1/orders.parquet")
    lineitem.write.mode("overwrite").parquet(f"{base}/x1/lineitem.parquet")
    customer.write.mode("overwrite").parquet(f"{base}/x1/customer.parquet")
    events.write.mode("overwrite").parquet(f"{base}/x1/events.parquet")

    # Dimension tables are PINNED across scales (r10 registry-wide sweep):
    # the realistic 100 TB growth axis is fact volume against a stable dim
    # population — part/supplier/region/nation are copied verbatim into
    # both corpora so every registry query resolves its joins. The fact
    # clones keep per-copy key alignment (o_orderkey/l_orderkey offsets
    # match), so orders⋈lineitem joins 10× rows while dim joins fan a 10×
    # fact side against the original dims.
    for dim in ("region", "nation", "supplier", "part"):
        d = spark.read.parquet(f"{sf_dir}/{dim}.parquet")
        d.write.mode("overwrite").parquet(f"{base}/x1/{dim}.parquet")
        d.write.mode("overwrite").parquet(f"{base}/x{factor}/{dim}.parquet")

    # customer copies for the fuzzy (SymSpell) family: offset keys and a
    # per-copy digit BIJECTION on the name (translate with a rotated
    # digit alphabet). A bijection preserves every within-copy edit
    # distance exactly — each copy keeps the original's near-pair
    # structure — while cross-copy names differ at ~every digit
    # position, so no cross-copy pairs appear: the xN corpus measures
    # candidate-generation scaling, not pair-output blowup.
    digits = "0123456789"
    cust_copies = [customer]
    for k in range(1, factor):
        rot = digits[k % 10 :] + digits[: k % 10]
        # beyond 10 copies the digit rotation repeats (k and k+10 share a
        # bijection — copies 0 and 10 would carry IDENTICAL names and
        # poison the ER/fuzzy probes with cross-copy cliques), so every
        # copy also gets a triple-char tag prefix: any two distinct tags
        # differ in >= 3 positions, guaranteeing cross-copy levenshtein
        # >= 3 (> both fuzzy distances) at ANY factor, while a shared
        # prefix leaves within-copy distances exactly unchanged.
        tag = chr(97 + k // 26) * 3 + chr(97 + k % 26) * 3
        cust_copies.append(
            customer.withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(k * 1_000_000_000)
            ).withColumn(
                "c_name",
                F.concat(F.lit(tag), F.translate(F.col("c_name"), digits, rot)),
            )
        )
    big_cust = cust_copies[0]
    for c in cust_copies[1:]:
        big_cust = big_cust.unionByName(c)
    big_cust.write.mode("overwrite").parquet(f"{base}/x{factor}/customer.parquet")

    # events copies: new user ids per copy (N× users, same per-user
    # history), offset event ids to keep them unique
    ev_copies = [events]
    for k in range(1, factor):
        ev_copies.append(
            events.withColumn(
                "event_id", F.col("event_id") + F.lit(k * 1_000_000_000)
            ).withColumn("user_id", F.col("user_id") + F.lit(k * 1_000_000))
        )
    big_ev = ev_copies[0]
    for e in ev_copies[1:]:
        big_ev = big_ev.unionByName(e)
    big_ev.write.mode("overwrite").parquet(f"{base}/x{factor}/events.parquet")

    # fact copies for the rank family: offset keys, epsilon-shift measures
    # so the xN corpus has a real total order (not 10-way value ties)
    def _fact_union(df, key_col: str, measure_col: str):
        parts = [df]
        for k in range(1, factor):
            parts.append(
                df.withColumn(key_col, F.col(key_col) + F.lit(k * 1_000_000_000))
                .withColumn(
                    measure_col, F.col(measure_col) + F.lit(k * 1e-3)
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    _fact_union(orders, "o_orderkey", "o_totalprice").write.mode(
        "overwrite"
    ).parquet(f"{base}/x{factor}/orders.parquet")
    _fact_union(lineitem, "l_orderkey", "l_extendedprice").write.mode(
        "overwrite"
    ).parquet(f"{base}/x{factor}/lineitem.parquet")

    doc_copies = []
    emb_copies = []
    for k in range(factor):
        if k == 0:
            doc_copies.append(docs)
            emb_copies.append(emb)
            continue
        rot = _ROT_SRC[k % len(_ROT_SRC)]
        doc_copies.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * n_docs)).withColumn(
                "text", F.translate(F.col("text"), _ROT_SRC[0], rot)
            )
        )
        emb_copies.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * n_emb)).withColumn(
                "embedding",
                F.expr(
                    f"transform(sequence(0, {dim_expr} - 1), i -> "
                    f"element_at(embedding, CAST(pmod(i + {k}, {dim_expr}) + 1 AS INT)))"
                ).cast("array<float>"),
            )
        )
    big_docs = doc_copies[0]
    for d in doc_copies[1:]:
        big_docs = big_docs.unionByName(d)
    big_emb = emb_copies[0]
    for e in emb_copies[1:]:
        big_emb = big_emb.unionByName(e)
    big_docs.write.mode("overwrite").parquet(f"{base}/x{factor}/documents.parquet")
    big_emb.write.mode("overwrite").parquet(f"{base}/x{factor}/embeddings.parquet")


def time_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, int]]:
    from spark_stream_analyzer_spark.session import unpersist_rdds

    qs = registry.queries()
    out: dict[str, float] = {}
    rows: dict[str, int] = {}
    only = {s for s in os.environ.get("SPARK_GRAFT_PROBE_ONLY", "").split(",") if s}
    for name in PROBE_QUERIES:
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        n = len(qs[name](spark, sf_dir).collect())
        out[name] = round(time.perf_counter() - t0, 3)
        rows[name] = n
        print(f"# {sf_dir}: {name}: {out[name]:.2f}s ({n} rows)", file=sys.stderr)
        unpersist_rdds(spark)  # same checkpoint-residue sweep as bench.py
    return out, rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/ssa_scale_probe")
    factor = int(os.environ.get("SPARK_GRAFT_PROBE_FACTOR", "10"))
    out_json = sys.argv[1] if len(sys.argv) > 1 else None

    spark = get_spark(app_name="ssa-scale-probe")
    if os.environ.get("SPARK_GRAFT_PROBE_SKIP_BUILD") != "1":
        build_corpora(spark, sf_dir, base, factor)
    t1, r1 = time_queries(spark, f"{base}/x1")
    t1b, _ = time_queries(spark, f"{base}/x1")  # warm second run: steadier 1x
    t1 = {k: min(t1[k], t1b[k]) for k in t1}
    tN, rN = time_queries(spark, f"{base}/x{factor}")

    report = {
        "sf_dir": sf_dir,
        "factor": factor,
        "x1_sec": t1,
        f"x{factor}_sec": tN,
        "scaling": {k: round(tN[k] / t1[k], 2) for k in t1},
        "x1_rows": r1,
        f"x{factor}_rows": rN,
        "row_scaling": {
            k: (round(rN[k] / r1[k], 2) if r1[k] else None) for k in r1
        },
    }
    line = json.dumps(report)
    print(line)
    if out_json:
        with open(out_json, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
