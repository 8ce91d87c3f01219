"""Round-11 new operators.

1. Bloom-filter runtime semi-join pruning (``functions/bloom.py``):
   never a false negative, measured FP rate inside the sizing bound,
   and the probe actually prunes the fact side before the join
   exchange.
2. Stream-stream LEFT SEMI interval join (``streaming_semi_join``):
   once-only emission per matched purchase even under multiple
   matching clicks, cross-batch matches included.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.functions.bloom import (
    bloom_build_words,
    bloom_might_contain,
)
from spark_stream_analyzer_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# 1. bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    words = bloom_build_words(keys, "k", num_bits=1 << 13)
    missed = keys.filter(~bloom_might_contain(words, F.col("k"))).count()
    assert missed == 0  # the hard guarantee: identical positions both sides


def test_bloom_fp_rate_within_sizing_bound(spark):
    inserted = spark.range(0, 1000).select(F.col("id").alias("k"))
    words = bloom_build_words(inserted, "k", num_bits=1 << 14)
    # probe a disjoint key range: every hit is a false positive
    absent = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    fp = absent.filter(bloom_might_contain(words, F.col("k"))).count()
    # 16 Kbit / 1k keys at k=4 -> theoretical FP ~0.24%; allow 4x slack
    assert fp / 10_000 < 0.01


def test_bloom_word_table_is_bounded(spark):
    # a million keys still produce at most num_bits/64 words
    keys = spark.range(0, 100_000).select(F.col("id").alias("k"))
    words = bloom_build_words(keys, "k", num_bits=1 << 10)
    assert len(words) == (1 << 10) // 64
    # saturated filter: every word fully set is the worst case, and the
    # list length (what crosses the driver) never scales with keys
    assert all(isinstance(w, int) for w in words)


def test_bloom_rejects_unaligned_num_bits(spark):
    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_build_words(keys, "k", num_bits=100)


def test_bloom_semijoin_prunes_fact_side_and_matches_exact_join(spark):
    cust = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    words = bloom_build_words(cust, "c_custkey")
    pruned = orders.filter(bloom_might_contain(words, F.col("o_custkey")))

    exact = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    n_exact = exact.count()
    n_orders = orders.count()
    n_pruned = pruned.count()
    # sound: every truly-matching order survives the probe
    assert n_pruned >= n_exact
    # effective: the probe removed a large share of the fact side
    # (BUILDING is ~1/5 of customers; FPs at this sizing are ~0)
    assert n_pruned < 0.5 * n_orders
    # exact join after the probe equals the unpruned exact join
    n_joined = pruned.join(cust, pruned["o_custkey"] == cust["c_custkey"]).count()
    assert n_joined == n_exact


# ---------------------------------------------------------------------------
# 2. stream-stream left semi join
# ---------------------------------------------------------------------------


def test_streaming_semi_join_emits_once_per_matched_purchase(spark):
    out = QUERIES["streaming_semi_join"].build(spark, SF_DIR).collect()
    pids = [r["purchase_id"] for r in out]
    assert pids, "semi join emitted nothing"
    # once-only: no purchase may re-emit when a second click matches
    assert len(pids) == len(set(pids))

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_timestamp("ts").alias("cs")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_timestamp("ts").alias("ps"),
    )
    matches = purchases.join(
        clicks,
        (purchases["user_id"] == clicks["user_id"])
        & (clicks["cs"] >= purchases["ps"])
        & (clicks["cs"] <= purchases["ps"] + 86400),
    )
    expected = {r.purchase_id for r in matches.select("purchase_id").distinct().collect()}
    assert set(pids) == expected
    # the once-only contract must actually have been exercised: at least
    # one emitted purchase had >1 matching click
    per_purchase = matches.groupBy("purchase_id").count().filter("count > 1").count()
    assert per_purchase > 0, "corpus has no multi-click purchase — test is vacuous"


# ---------------------------------------------------------------------------
# 3. Johnson-Lindenstrauss random sign projection
# ---------------------------------------------------------------------------


def test_jl_projection_is_unbiased_and_shuffle_free(spark):
    from spark_stream_analyzer_spark.operators.similarity import (
        random_sign_projection,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    k = 8
    proj = random_sign_projection(emb, out_dim=k)
    # E[||Px||^2] = ||x||^2 for Rademacher projections: the MEAN ratio
    # over 500 vectors must sit near 1 even though any single vector's
    # ratio is noisy at k=8
    pn = proj.select(
        "vec_id",
        sum(
            [F.col(f"r{j}") * F.col(f"r{j}") for j in range(k)],
            F.lit(0.0),
        ).alias("p2"),
    )
    xn = emb.select(
        "vec_id",
        F.expr(
            "aggregate(embedding, CAST(0.0 AS DOUBLE),"
            " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        ).alias("x2"),
    )
    ratio = (
        pn.join(xn, "vec_id")
        .agg(F.avg(F.col("p2") / F.col("x2")).alias("m"))
        .collect()[0]
        .m
    )
    assert 0.85 < ratio < 1.15, f"projection is biased: mean ratio {ratio}"
    # scale shape: per-row expressions only — no exchange in the plan
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_jl_projection_deterministic(spark):
    from spark_stream_analyzer_spark.operators.similarity import (
        random_sign_projection,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = random_sign_projection(emb, out_dim=4).orderBy("vec_id").collect()
    b = random_sign_projection(emb, out_dim=4).orderBy("vec_id").collect()
    assert a == b


# ---------------------------------------------------------------------------
# 4. CCNet perplexity tertiles
# ---------------------------------------------------------------------------


def test_quality_buckets_are_balanced_tertiles(spark):
    out = QUERIES["corpus_quality_buckets"].build(spark, SF_DIR).collect()
    assert {r["label"] for r in out} == {"head", "middle", "tail"}
    sizes = {r["bucket"]: r["n_docs"] for r in out}
    assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile contract
    by = {r["label"]: r for r in out}
    # head is the LOW-perplexity tertile: ordering must be monotone
    assert by["head"]["max_ppl"] <= by["middle"]["min_ppl"]
    assert by["middle"]["max_ppl"] <= by["tail"]["min_ppl"]


# ---------------------------------------------------------------------------
# 5. BPE encode (apply half of the tokenizer pair)
# ---------------------------------------------------------------------------


def test_bpe_encode_applies_merges_in_training_order(spark):
    from spark_stream_analyzer_spark.operators.text import bpe_encode_stats

    # hand-traced: word "banana" with merges ["a n", "an a"] under
    # single-pass NON-OVERLAPPING replace (the documented deviation from
    # re-scanning greedy BPE):
    #   ' b a n a n a ' --"a n"-> ' b an a n a '   (the second 'a n' is
    #   not replaced: its leading space was consumed by the first match)
    #   --"an a"-> ' b ana n a '
    # => tokens [b, ana, n, a]
    df = spark.createDataFrame([(1, "banana")], "doc_id long, text string")
    out = bpe_encode_stats(df, ["a n", "an a"]).collect()[0]
    assert out["n_tokens"] == 4  # b | ana | n | a
    assert out["n_merged_tokens"] == 1  # ana
    assert out["n_chars"] == 6
    # empty doc: zero counts, fingerprint of the empty stream
    e = bpe_encode_stats(
        spark.createDataFrame([(2, "")], "doc_id long, text string"),
        ["a n"],
    ).collect()[0]
    assert (e["n_tokens"], e["n_merged_tokens"], e["n_chars"]) == (0, 0, 0)


def test_bpe_encode_matches_trained_table_end_to_end(spark):
    from spark_stream_analyzer_spark.operators.text import (
        bpe_encode_stats,
        bpe_train_merges,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = [p for _, p, _ in bpe_train_merges(docs, rounds=2)]
    assert len(merges) == 2
    out = bpe_encode_stats(docs, merges)
    # every merge can only SHRINK the token stream: n_tokens <= n_chars,
    # and at least one doc must contain a merged token (the trained
    # merges came from this very corpus)
    agg = out.selectExpr(
        "sum(case when n_tokens > n_chars then 1 else 0 end) AS bad",
        "sum(n_merged_tokens) AS merged",
    ).collect()[0]
    assert agg["bad"] == 0
    assert agg["merged"] > 0


# ---------------------------------------------------------------------------
# 6. TIMESTAMP AS OF time travel
# ---------------------------------------------------------------------------


def test_read_as_of_version_order_beats_straggler_wall_time(spark, tmp_path):
    from spark_stream_analyzer_spark.sources.txn_publish import (
        publish,
        read_as_of,
        snapshot_dir,
    )

    root = str(tmp_path)
    for v in (1, 2):
        d = snapshot_dir(root)
        spark.range(v * 10).write.parquet(d)
        publish(root, d, v, commit_ts=1000.0 * v)
    # stale straggler: an OLDER version claimed with a LATER wall time
    # (the publish no-regress path retains its manifest, never swaps)
    d = snapshot_dir(root)
    spark.range(5).write.parquet(d)
    import pytest as _pt
    from spark_stream_analyzer_spark.sources.txn_publish import (
        ConcurrentPublishError,
    )

    with _pt.raises(ConcurrentPublishError):
        publish(root, d, 1, commit_ts=9000.0)  # v1 already claimed
    # AS OF after everything: the straggler's 9000.0 claim must not
    # shadow v2 — version order decides among eligible manifests
    assert read_as_of(spark, root, 10_000.0).count() == 20
    assert read_as_of(spark, root, 1500.0).count() == 10


def test_read_as_of_ignores_legacy_manifests_without_ts(spark, tmp_path):
    import json
    import os

    from spark_stream_analyzer_spark.sources.txn_publish import (
        publish,
        read_as_of,
        snapshot_dir,
    )

    root = str(tmp_path)
    d1 = snapshot_dir(root)
    spark.range(7).write.parquet(d1)
    # hand-write a pre-commit_ts-era versioned manifest (migration case)
    with open(os.path.join(root, "_manifest.v1.json"), "w") as f:
        json.dump({"version": 1, "dir": d1}, f)
    with pytest.raises(ValueError):
        read_as_of(spark, root, 10_000.0)  # no ELIGIBLE manifest at all
    d2 = snapshot_dir(root)
    spark.range(3).write.parquet(d2)
    publish(root, d2, 2, commit_ts=50.0)
    assert read_as_of(spark, root, 60.0).count() == 3


def test_bloom_semijoin_probe_sits_below_the_fact_exchange(spark):
    """The whole point of the runtime filter: the bloom probe must
    filter the fact scan BEFORE its join exchange, so the shuffle
    carries only probable matches."""
    df = QUERIES["orders_bloom_semijoin"].build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # tree prints top-down: on the orders branch the Exchange must appear
    # BEFORE (above) a Filter carrying the probe's xxhash64 lookups,
    # which itself sits on the orders parquet scan
    assert re.search(
        r"Exchange[\s\S]*?Filter[^\n]*xxhash64[\s\S]*?orders\.parquet", plan
    ), f"bloom probe not below the fact exchange:\n{plan[:2000]}"


# ---------------------------------------------------------------------------
# 7. PCA power iteration
# ---------------------------------------------------------------------------


def test_power_iteration_respects_spectral_bounds(spark):
    import numpy as np

    from spark_stream_analyzer_spark.operators.similarity import (
        top_pc_power_iteration,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows3 = top_pc_power_iteration(emb, iters=3).collect()
    lam3 = rows3[0]["eigenvalue"]
    lam1 = top_pc_power_iteration(emb, iters=1).collect()[0]["eigenvalue"]

    X = np.array(
        [np.array(r.embedding, dtype=float) for r in emb.orderBy("vec_id").collect()]
    )
    Xc = X - X.mean(0)
    evals = np.linalg.eigvalsh(Xc.T @ Xc)
    # ||C v|| of a unit vector can never exceed the top eigenvalue, and
    # the power-iteration estimate is (quantization aside) non-decreasing
    assert lam3 <= evals[-1] * (1 + 1e-6)
    assert lam3 >= lam1 - 1e-3
    # the estimate must have moved meaningfully off the uniform start
    # toward the top of the spectrum (flat synthetic spectrum -> partial
    # convergence at 3 iterations is expected and fine)
    assert lam3 >= 0.7 * evals[-1]
    # returned component is unit-norm (round6 grid)
    assert abs(sum(r["pc"] ** 2 for r in rows3) - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# 8. concat-and-chunk sequence packing
# ---------------------------------------------------------------------------


def test_sequence_pack_invariants_vs_single_reducer_definition(spark):
    from pyspark.sql.window import Window

    from spark_stream_analyzer_spark.operators.split import sequence_pack_stats

    L = 64
    docs = spark.range(0, 137).select(
        F.col("id").alias("doc_id"),
        # adversarial lengths: zero-word docs (EOS only), docs shorter
        # than, equal to, and several times longer than a sequence
        (
            F.when(F.col("id") % 11 == 0, F.lit(0))
            .when(F.col("id") % 7 == 0, F.lit(L * 3 + 5))
            .when(F.col("id") % 5 == 0, F.lit(L - 1))  # +EOS = exactly L
            .otherwise(F.col("id") % 40 + 1)
            + F.lit(1)  # EOS
        )
        .cast("long")
        .alias("n_tokens"),
    )
    got = {r["seq_id"]: r for r in sequence_pack_stats(docs, seq_len=L).collect()}

    # single-reducer reference: global window cumsum, python expansion
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    ref_rows = (
        docs.withColumn("cum", F.sum("n_tokens").over(w))
        .select("doc_id", "n_tokens", (F.col("cum") - F.col("n_tokens")).alias("s"))
        .collect()
    )
    exp: dict[int, dict] = {}
    total = 0
    for r in ref_rows:
        s, e = r["s"], r["s"] + r["n_tokens"]
        total += r["n_tokens"]
        for seq in range(s // L, (e - 1) // L + 1):
            d = exp.setdefault(
                seq,
                {"n_docs": 0, "n_doc_starts": 0, "seq_tokens": 0, "docs": []},
            )
            d["n_docs"] += 1
            d["n_doc_starts"] += int(s >= seq * L)
            d["seq_tokens"] += min(e, (seq + 1) * L) - max(s, seq * L)
            d["docs"].append(r["doc_id"])

    assert set(got) == set(exp)
    for seq, d in exp.items():
        g = got[seq]
        assert (
            g["n_docs"],
            g["n_doc_starts"],
            g["seq_tokens"],
            g["first_doc_id"],
            g["last_doc_id"],
        ) == (
            d["n_docs"],
            d["n_doc_starts"],
            d["seq_tokens"],
            min(d["docs"]),
            max(d["docs"]),
        )
    # packing identities: zero padding (every sequence full except the
    # last), token conservation, contiguous sequence ids
    seqs = sorted(got)
    assert seqs == list(range(len(seqs)))
    assert all(got[s]["seq_tokens"] == L for s in seqs[:-1])
    assert sum(got[s]["seq_tokens"] for s in seqs) == total
    # every doc starts in exactly one sequence
    assert sum(got[s]["n_doc_starts"] for s in seqs) == 137


# ---------------------------------------------------------------------------
# 9. hard-triplet mining
# ---------------------------------------------------------------------------


def test_hard_triplet_mining_matches_numpy_brute_force(spark):
    import numpy as np

    from spark_stream_analyzer_spark.operators.similarity import hard_triplet_mining

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        r["anchor_id"]: r
        for r in hard_triplet_mining(emb, F.col("vec_id") % 9 == 0).collect()
    }

    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    X = np.array([np.array(r["embedding"], dtype=float) for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xn @ Xn.T

    anchors = [i for i, v in enumerate(ids) if v % 9 == 0]
    assert set(got) == {int(ids[i]) for i in anchors}
    for i in anchors:
        g = got[int(ids[i])]
        same = (labels == labels[i]) & (ids != ids[i])
        diff = labels != labels[i]
        # hardest positive: min cosine then min id among same-label
        pi = min(np.where(same)[0], key=lambda j: (cos[i, j], ids[j]))
        ni = min(np.where(diff)[0], key=lambda j: (-cos[i, j], ids[j]))
        assert g["pos_id"] == ids[pi] and g["neg_id"] == ids[ni]
        assert abs(g["pos_cos"] - cos[i, pi]) < 1e-4
        assert abs(g["neg_cos"] - cos[i, ni]) < 1e-4
        assert abs(g["margin"] - (cos[i, pi] - cos[i, ni])) < 1e-4
        assert g["is_violation"] == int(cos[i, ni] >= cos[i, pi])


def test_hard_triplet_mining_null_extends_when_no_same_label_peer(spark):
    from spark_stream_analyzer_spark.operators.similarity import hard_triplet_mining

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),  # label 7 appears once: no positive exists
            (1, [0.9, 0.1], 1),
            (2, [0.0, 1.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r["anchor_id"]: r for r in hard_triplet_mining(emb, F.lit(True)).collect()}
    assert rows[0]["pos_id"] is None and rows[0]["is_violation"] is None
    assert rows[0]["neg_id"] == 1  # closest out-of-class by cosine
    # anchors 1 and 2 have both sides
    assert rows[1]["pos_id"] == 2 and rows[1]["neg_id"] == 0
    assert rows[1]["is_violation"] == 1  # vec 0 is nearer vec 1 than vec 2 is


def test_hard_triplet_mining_anchor_without_any_candidate_surfaces(spark):
    """Single-row corpus: the lone anchor has no candidate at all, yet it
    must come back as one all-NULL row — mirroring the oracle's LEFT JOIN
    from the anchor set (ADVICE r11: the pre-fix groupBy over the filtered
    cross join silently dropped such anchors)."""
    from spark_stream_analyzer_spark.operators.similarity import hard_triplet_mining

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 7)], "vec_id long, embedding array<float>, label int"
    )
    rows = hard_triplet_mining(emb, F.lit(True)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["anchor_id"] == 0 and r["anchor_label"] == 7
    assert r["pos_id"] is None and r["neg_id"] is None
    assert r["pos_cos"] is None and r["neg_cos"] is None
    assert r["margin"] is None and r["is_violation"] is None


# ---------------------------------------------------------------------------
# 10. robust z-score (median / MAD)
# ---------------------------------------------------------------------------


def test_robust_zscore_stats_match_python_brute_force(spark):
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    rows = {
        r["event_type"]: r
        for r in QUERIES["events_robust_zscore"].build(spark, SF_DIR).collect()
    }

    import math

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_type: dict[str, list[float]] = {}
    for r in ev:
        if r["value"] is not None:
            by_type.setdefault(r["event_type"], []).append(r["value"])

    def lower_median(vals):
        vals = sorted(vals)
        return vals[math.ceil(len(vals) / 2) - 1]

    assert set(rows) == set(by_type)
    for t, vals in by_type.items():
        med = lower_median(vals)
        ads = [abs(v - med) for v in vals]
        mad = lower_median(ads)
        out = sum(1 for ad in ads if ad * 0.6745 > mad * 3.5)
        g = rows[t]
        assert g["n"] == len(vals)
        assert abs(g["median_value"] - med) < 1e-9
        assert abs(g["mad"] - mad) < 1e-9
        assert g["n_outliers"] == out
        assert abs(g["max_absdev"] - max(ads)) < 1e-9
        # heavy-tail sanity: the robust flag fires on this corpus
        assert g["n_outliers"] > 0


def test_robust_zscore_constant_group_degenerates_cleanly(spark):
    """MAD = 0 (constant group): the multiplication-form test flags every
    deviating row and no constant row — no division-by-zero semantics in
    play on either engine."""
    from spark_stream_analyzer_spark.functions.materialize import materialize
    from spark_stream_analyzer_spark.functions.median import (
        grouped_weighted_median,
    )

    df = spark.createDataFrame(
        [("const", 5.0)] * 9 + [("const", 9.0)],
        "event_type string, value double",
    ).withColumn("_one", F.lit(1))
    med = materialize(
        grouped_weighted_median(
            df, ["event_type"], "value", "_one", median_col="med"
        )
    )
    a = df.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = grouped_weighted_median(
        a, ["event_type"], "ad", "_one", median_col="mad"
    )
    row = (
        a.join(F.broadcast(mad), "event_type")
        .agg(
            F.sum(
                (F.col("ad") * F.lit(0.6745) > F.col("mad") * F.lit(3.5)).cast(
                    "long"
                )
            ).alias("n_outliers"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
        )
        .collect()[0]
    )
    assert row["med"] == 5.0 and row["mad"] == 0.0
    assert row["n_outliers"] == 1  # only the 9.0 row deviates


# ---------------------------------------------------------------------------
# 11. total-variation source divergence
# ---------------------------------------------------------------------------


def test_tv_divergence_matches_python_and_bounds(spark):
    from collections import Counter

    from spark_stream_analyzer_spark.functions import texthash as TH
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    got = {
        r["source"]: r
        for r in QUERIES["corpus_source_tv_divergence"].build(spark, SF_DIR).collect()
    }

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source", F.expr(TH.spark_norm_words("text")).alias("words"))
        .collect()
    )
    per_src: dict[str, Counter] = {}
    allw: Counter = Counter()
    for r in docs:
        c = per_src.setdefault(r["source"], Counter())
        c.update(r["words"])
        allw.update(r["words"])
    M = sum(allw.values())
    assert set(got) == set(per_src)
    for src, c in per_src.items():
        N = sum(c.values())
        # full TV over the whole vocabulary (including words absent
        # from this source) — the closed-form missing-mass shortcut in
        # the operator must equal this direct definition
        tv = 0.5 * sum(
            abs(c.get(w, 0) / N - allw[w] / M) for w in allw
        )
        g = got[src]
        assert g["n_tokens"] == N
        assert g["n_vocab"] == len(c)
        assert abs(g["tv_distance"] - tv) < 1e-6
        assert 0.0 <= g["tv_distance"] < 1.0


# ---------------------------------------------------------------------------
# 12. differential-privacy noisy release
# ---------------------------------------------------------------------------


def test_dp_release_matches_python_inverse_cdf_and_clips(spark):
    import hashlib
    import math

    from spark_stream_analyzer_spark.operators.privacy import dp_noisy_release

    df = spark.createDataFrame(
        [("a", 40.25), ("a", 250.0), ("a", -30.0), ("b", 10.5)],
        "event_type string, value double",
    )
    got = {
        r["event_type"]: r
        for r in dp_noisy_release(df, "event_type", "value").collect()
    }

    def u(tag, g):
        h = hashlib.md5(f"dp:{tag}:{g}".encode()).hexdigest()[:15]
        return int(h, 16) / float(1 << 60)

    def lap(tag, g, b):
        t = u(tag, g) - 0.5
        return -b * math.copysign(1.0, t) * math.log(
            max(1e-12, 1.0 - 2.0 * abs(t))
        )

    # clipping: 250 -> 100, -30 -> 0
    true = {"a": (3, 40.25 + 100.0 + 0.0), "b": (1, 10.5)}
    for g, (n, s) in true.items():
        r = got[g]
        assert abs(r["noisy_count"] - (n + lap("c", g, 4.0))) < 1e-6
        assert abs(r["noisy_sum"] - (s + lap("s", g, 400.0))) < 1e-6
        assert r["epsilon"] == 0.5 and r["clip_bound"] == 100.0
        # the release is actually noised
        assert r["noisy_count"] != n

    # deterministic: a second run releases identical values
    again = {
        r["event_type"]: r
        for r in dp_noisy_release(df, "event_type", "value").collect()
    }
    for g in true:
        assert again[g] == got[g]


# ---------------------------------------------------------------------------
# 13. MMR diversity re-ranking
# ---------------------------------------------------------------------------


def test_mmr_rerank_matches_python_greedy(spark):
    import numpy as np

    from spark_stream_analyzer_spark.operators.similarity import mmr_rerank

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {}
    for r in mmr_rerank(emb, F.col("vec_id") < 3, m=4, pool=8, lam=0.5).collect():
        got.setdefault(r["query_id"], {})[r["mmr_rank"]] = r

    rows = emb.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    X = np.array([np.array(r["embedding"], dtype=float) for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xn @ Xn.T

    for qi, q in enumerate(ids):
        if q >= 3:
            continue
        # pool: top-8 by (cos desc, id asc), self excluded, ROUND6 like
        # the operator
        order = sorted(
            (j for j in range(len(ids)) if ids[j] != q),
            key=lambda j: (-cos[qi, j], ids[j]),
        )[:8]
        rc = {ids[j]: round(cos[qi, j], 6) for j in order}
        pc = {
            (ids[a], ids[b]): round(cos[a, b], 6)
            for a in order
            for b in order
            if a != b
        }
        sel: list[tuple[int, float]] = []
        first = max(rc, key=lambda d: (rc[d], -d))
        sel.append((first, rc[first]))
        for _ in range(3):
            chosen = {d for d, _ in sel}
            best = max(
                (d for d in rc if d not in chosen),
                key=lambda d: (
                    0.5 * rc[d] - 0.5 * max(pc[(d, s)] for s in chosen),
                    -d,
                ),
            )
            sel.append(
                (
                    best,
                    0.5 * rc[best] - 0.5 * max(pc[(best, s)] for s in chosen),
                )
            )
        for rank, (d, score) in enumerate(sel, start=1):
            g = got[q][rank]
            assert g["vec_id"] == d, (q, rank, g, d)
            assert abs(g["score"] - score) < 1e-6  # round6 output grid
    # diversity sanity: MMR must not simply return the relevance top-4
    # for every query (the corpus has correlated near-neighbors)
    from spark_stream_analyzer_spark.operators.similarity import cosine_topk

    top4 = {}
    for r in cosine_topk(emb, F.col("vec_id") < 3, k=4).collect():
        top4.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    mmr4 = {qid: {r["vec_id"] for r in by.values()} for qid, by in got.items()}
    assert any(mmr4[q] != top4[q] for q in mmr4)


# ---------------------------------------------------------------------------
# 14. foreachBatch second-stage top-k leaderboard
# ---------------------------------------------------------------------------


def test_windowed_topk_board_ranks_from_full_counts_not_batch_rows(
    spark, tmp_path
):
    """Batch 2 changes only the RUNNER-UP's count: its update-mode output
    holds a single row, so a writer that ranked the batch's rows alone
    would crown the runner-up. The read-back must keep the unchanged
    leader on top."""
    import os
    import time

    from pyspark.sql import functions as F

    from spark_stream_analyzer_spark.streaming.sinks import (
        _jdbc_execute,
        windowed_topk_batch_writer,
    )
    from spark_stream_analyzer_spark.streaming.sources import file_lines_stream

    indir = tmp_path / "in"
    indir.mkdir()
    # window [0, 86400): A x5, B x3 in batch 1; B x1 more in batch 2
    (indir / "000.txt").write_text(
        "".join(["100,A\n"] * 5 + ["200,B\n"] * 3)
    )
    (indir / "001.txt").write_text("300,B\n")
    anchor = 1_600_000_000
    os.utime(indir / "000.txt", (anchor, anchor))
    os.utime(indir / "001.txt", (anchor + 10, anchor + 10))

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    for ddl in (
        'CREATE TABLE counts ("win_start" BIGINT, "event_type" VARCHAR(32),'
        ' "n" BIGINT)',
        'CREATE TABLE board ("win_start" BIGINT, "rk" BIGINT,'
        ' "event_type" VARCHAR(32), "n" BIGINT)',
    ):
        _jdbc_execute(spark, url, ddl)

    raw = file_lines_stream(spark, str(indir))
    parts = F.split("value", ",")
    counts = (
        raw.select(
            F.timestamp_seconds(parts[0].cast("long")).alias("ts"),
            parts[1].alias("event_type"),
        )
        .withWatermark("ts", "36500 days")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start"),
            "event_type",
            "n",
        )
    )
    q = (
        counts.writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "chk"))
        # file_lines_stream defaults to maxFilesPerTrigger=1, so the two
        # mtime-ordered files ARE two micro-batches
        .foreachBatch(windowed_topk_batch_writer(url, "counts", "board", k=2))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    board = sorted(
        (r["rk"], r["event_type"], r["n"])
        for r in spark.read.jdbc(url, "board").collect()
    )
    # A (5, untouched by batch 2) must still lead B (4)
    assert board == [(1, "A", 5), (2, "B", 4)]


# ---------------------------------------------------------------------------
# 15. entity resolution (blocking -> CC -> survivorship)
# ---------------------------------------------------------------------------


def test_entity_resolution_survivorship_on_hand_built_graph(spark):
    """Two chained matches + one singleton: transitive closure must merge
    the chain (1~2, 2~3 but 1!~3), the max-balance member must win the
    cluster, and the singleton must survive as its own canonical."""
    from spark_stream_analyzer_spark.operators import dedup
    from spark_stream_analyzer_spark.operators.fuzzy import fuzzy_pairs

    c = spark.createDataFrame(
        [
            (1, "alpha", 10.0),
            (2, "alphb", 99.0),  # dist(alpha, alphb)=1; dist(alphb, alpbb)=1
            (3, "alpbb", 50.0),  # dist(alpha, alpbb)=2 -> chain, not clique
            (9, "zzzzz", 7.0),
        ],
        "c_custkey long, c_name string, c_acctbal double",
    )
    pairs = fuzzy_pairs(c, "c_custkey", "c_name", max_dist=1)
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got_pairs == {(1, 2), (2, 3)}  # 1-3 is distance 2: no direct edge

    lab = dedup.duplicate_clusters(pairs, id_a="id_a", id_b="id_b")
    labels = {r["doc_id"]: r["cluster_id"] for r in lab.collect()}
    assert labels == {1: 1, 2: 1, 3: 1}  # chain merged transitively

    al = c.join(
        lab.select(F.col("doc_id").alias("c_custkey"), "cluster_id"),
        "c_custkey",
        "left",
    ).select(
        "c_custkey",
        "c_acctbal",
        F.coalesce("cluster_id", F.col("c_custkey")).alias("cluster_id"),
    )
    per = al.groupBy("cluster_id").agg(
        F.max(
            F.struct(
                F.col("c_acctbal").alias("b"), (-F.col("c_custkey")).alias("ni")
            )
        ).alias("_m"),
        F.count(F.lit(1)).alias("n"),
    )
    canon = {
        r["cluster_id"]: (-r["_m"]["ni"], r["n"]) for r in per.collect()
    }
    assert canon[1] == (2, 3)  # max acctbal 99.0 wins the merged cluster
    assert canon[9] == (9, 1)  # singleton is its own canonical


def test_sequence_pack_skips_zero_token_docs_without_shifting_offsets(spark):
    from spark_stream_analyzer_spark.operators.split import sequence_pack_stats

    with_zero = spark.createDataFrame(
        [(0, 10), (1, 0), (2, 10)], "doc_id long, n_tokens long"
    )
    without = spark.createDataFrame(
        [(0, 10), (2, 10)], "doc_id long, n_tokens long"
    )
    a = sorted(
        tuple(r) for r in sequence_pack_stats(with_zero, seq_len=8).collect()
    )
    b = sorted(
        tuple(r) for r in sequence_pack_stats(without, seq_len=8).collect()
    )
    assert a == b  # the zero-token doc neither appears nor shifts anyone


def test_topk_board_writer_escapes_quoted_keys(spark, tmp_path):
    from spark_stream_analyzer_spark.streaming.sinks import (
        _jdbc_execute,
        windowed_topk_batch_writer,
    )

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    for ddl in (
        'CREATE TABLE counts ("win_start" BIGINT, "event_type" VARCHAR(32),'
        ' "n" BIGINT)',
        'CREATE TABLE board ("win_start" BIGINT, "rk" BIGINT,'
        ' "event_type" VARCHAR(32), "n" BIGINT)',
    ):
        _jdbc_execute(spark, url, ddl)
    # a NULL-key row already in the serving store, in a window the batch
    # does NOT touch (written by a DB whose dialect accepts NULL strings
    # — Spark's Derby dialect maps StringType to CLOB and rejects
    # setNull, so plant it via SQL and keep it out of the board rewrite)
    _jdbc_execute(spark, url, "INSERT INTO counts VALUES (86400, NULL, 2)")
    batch = spark.createDataFrame(
        [(0, "o'brien", 3), (0, "plain", 1)],
        "win_start long, event_type string, n long",
    )
    writer = windowed_topk_batch_writer(url, "counts", "board", k=3)
    writer(batch, 0)
    writer(batch, 0)  # replay: the quoted key must DELETE, not duplicate
    rows = sorted(
        (r["rk"], r["event_type"], r["n"])
        for r in spark.read.jdbc(url, "board").collect()
    )
    assert rows == [(1, "o'brien", 3), (2, "plain", 1)]
    # the untouched NULL-key row must SURVIVE the upsert (the delete
    # targets only the batch's changed keys)
    counts = spark.read.jdbc(url, "counts").collect()
    assert len(counts) == 3
    assert any(r["event_type"] is None and r["n"] == 2 for r in counts)


# ---------------------------------------------------------------------------
# 16. Poisson bootstrap replicates
# ---------------------------------------------------------------------------


def test_bootstrap_replicates_are_sound(spark):
    import math

    from spark_stream_analyzer_spark.plans.registry import QUERIES

    rows = (
        QUERIES["orders_bootstrap_replicates"]
        .build(spark, SF_DIR)
        .collect()
    )
    assert len(rows) == 16
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = o.count()
    true_total = sum(r["o_totalprice"] for r in o.collect())
    # each replicate draws ~Poisson(1) per row: n_drawn ~ Binomial-ish
    # around n with sd ~ sqrt(n); 6 sigma band
    for r in rows:
        assert abs(r["n_drawn"] - n) < 6 * math.sqrt(n) + 10
        # replicate totals concentrate around the true total
        assert abs(r["boot_total"] - true_total) / true_total < 0.5
    # replicates must differ from each other (a broken seed would
    # collapse them all to the same resample)
    assert len({r["boot_total"] for r in rows}) > 1
    # bootstrap sd of the total ~ sqrt(sum(value^2)); sanity: nonzero
    totals = [r["boot_total"] for r in rows]
    assert max(totals) > min(totals)
