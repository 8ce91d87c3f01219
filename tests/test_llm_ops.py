"""Unit tests for the LLM-data-pipeline operators (EXT surface) on tiny
literal DataFrames — planted duplicates/neighbors prove the semantics the
synthetic tables can't (they contain no real near-dups)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.operators import dedup, multimodal, similarity, text


def docs(spark, *texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="t", n_chars=len(t)) for i, t in enumerate(texts)]
    )


def test_exact_dedup_groups_identical_texts(spark):
    df = dedup.exact_dedup(docs(spark, "a b c", "x y", "a b c", "a b c"))
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[0].canonical_id == 0 and rows[0].n_copies == 3 and rows[0].is_duplicate == 0
    assert rows[2].canonical_id == 0 and rows[2].is_duplicate == 1
    assert rows[3].canonical_id == 0 and rows[3].is_duplicate == 1
    assert rows[1].n_copies == 1 and rows[1].is_duplicate == 0


def test_minhash_identical_docs_have_identical_signatures(spark):
    t = "the quick brown fox jumps over the lazy dog again and again"
    sig = dedup.minhash_signatures(docs(spark, t, t, "totally different words here ok yes"))
    rows = {r.doc_id: r for r in sig.collect()}
    for j in range(16):
        assert rows[0][f"mh{j}"] == rows[1][f"mh{j}"]
    assert any(rows[0][f"mh{j}"] != rows[2][f"mh{j}"] for j in range(16))


def test_lsh_pairs_find_planted_near_duplicate(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"  # high jaccard overlap
    pairs = dedup.lsh_duplicate_pairs(
        docs(spark, base, near, "unrelated totally other text entirely", ), min_jaccard=0.5
    ).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(0, 1)]
    assert pairs[0].jaccard > 0.7


def test_lsh_hot_band_cap_bounds_candidates_and_keeps_cluster(spark):
    """200 identical docs (one degenerate bucket per band): the hot-band
    guard must emit O(m·bands·cap) candidates — here exactly the m-1
    star pairs — not the m(m-1)/2 quadratic set, while keeping the
    cluster connected for the downstream clusters pass."""
    m = 200
    clone = "the quick brown fox jumps over the lazy dog clone body text"
    rows = [Row(doc_id=i, text=clone, lang="en", source="t", n_chars=len(clone))
            for i in range(m)]
    rows += [
        Row(doc_id=1000 + i, text=f"unique doc {i} alpha{i} beta{i} gamma{i} filler",
            lang="en", source="t", n_chars=40)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    pairs = dedup.lsh_duplicate_pairs(df, min_jaccard=0.02, band_cap=16)
    got = pairs.collect()
    clone_pairs = [r for r in got if r.doc_a < 1000 and r.doc_b < 1000]
    # star expansion: exactly m-1 pairs, all rooted at the bucket min,
    # all exact-Jaccard verified at 1.0 — NOT the 19900-pair clique
    assert len(clone_pairs) == m - 1
    assert all(r.doc_a == 0 for r in clone_pairs)
    assert all(r.jaccard == pytest.approx(1.0) for r in clone_pairs)
    # connectivity preserved: the clusters pass recovers ONE cluster
    cl = dedup.duplicate_clusters(pairs)
    clone_clusters = {
        r.cluster_id for r in cl.collect() if r.doc_id < 1000
    }
    assert clone_clusters == {0}
    # no-silent-caps: the audit query names every capped bucket (all 8
    # bands of the clone set), each at the full bucket size
    hot = dedup.lsh_hot_band_stats(df, band_cap=16).collect()
    assert len(hot) == 8 and all(r.m == m for r in hot)
    # cold buckets keep exact semantics: capped == uncapped when no
    # bucket exceeds the cap
    small = docs(spark, "alpha beta gamma delta epsilon zeta", "alpha beta gamma delta epsilon eta")
    a = sorted(map(tuple, dedup.lsh_duplicate_pairs(small, min_jaccard=0.02, band_cap=16).collect()))
    b = sorted(map(tuple, dedup.lsh_duplicate_pairs(small, min_jaccard=0.02, band_cap=None).collect()))
    assert a == b


def test_ngram_jaccard_exact_value(spark):
    # doc0: shingles {a b c, b c d}; doc1: {a b c}; jaccard = 1/2
    pairs = dedup.ngram_jaccard_pairs(docs(spark, "a b c d", "a b c"), min_jaccard=0.1).collect()
    assert len(pairs) == 1
    assert pairs[0].n_shared == 1 and pairs[0].jaccard == pytest.approx(0.5)


def test_simhash_identical_zero_hamming_and_pairs(spark):
    t = "one two three four five six seven eight nine ten"
    out = dedup.simhash_pairs(docs(spark, t, t, "completely disjoint vocabulary set"), max_hamming=3).collect()
    assert [(p.doc_a, p.doc_b, p.hamming) for p in out] == [(0, 1, 0)]


def test_cosine_topk_orders_by_similarity(spark):
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0], label=0),  # query
            Row(vec_id=1, embedding=[0.9, 0.1], label=0),  # closest
            Row(vec_id=2, embedding=[0.5, 0.5], label=0),
            Row(vec_id=3, embedding=[0.0, 1.0], label=0),  # orthogonal
        ]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    out = similarity.cosine_topk(emb, F.col("vec_id") < 1, k=3).collect()
    assert [r.neighbor_id for r in out] == [1, 2, 3]
    assert out[0].cosine > 0.99 and abs(out[2].cosine) < 1e-6


def test_multimodal_frame_fanout_counts(spark):
    d = multimodal.with_payload(docs(spark, "x" * 100, "y" * 600))
    rows = multimodal.fake_frame_sample(d).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) == 1  # 100 bytes → 1 frame
    assert len(by_doc[1]) == 3  # 600 bytes → frames at 0/256/512
    f = sorted(by_doc[1], key=lambda r: r.frame_idx)
    assert [x.frame_offset for x in f] == [0, 256, 512]
    assert [x.frame_bytes for x in f] == [256, 256, 88]


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_multimodal_resize_matches_python_slicing(spark):
    """The emitted bookkeeping must agree with an actual payload[::stride]
    slice — byte-exactness of the binary→binary path."""
    texts = ("x" * 7, "y" * 512, "z" * 513, "w" * 5000, "")
    d = multimodal.with_payload(docs(spark, *texts))
    rows = {r.doc_id: r for r in multimodal.fake_resize(d).collect()}
    for i, t in enumerate(texts):
        payload = t.encode()
        stride = max(1, -(-len(payload) // multimodal.RESIZE_TARGET))
        assert rows[i].in_bytes == len(payload)
        assert rows[i].stride == stride
        assert rows[i].out_bytes == len(payload[::stride])
        assert rows[i].out_bytes <= multimodal.RESIZE_TARGET


def test_multimodal_features_match_hashlib(spark):
    import hashlib

    d = multimodal.with_payload(docs(spark, "hello world", ""))
    rows = {r.doc_id: r for r in multimodal.fake_features(d).collect()}
    for i, t in enumerate(("hello world", "")):
        for j in range(multimodal.FEATURE_DIM):
            expect = (
                int(hashlib.md5(f"feat{j}:".encode() + t.encode()).hexdigest()[:15], 16)
                % 10_000
            ) / 10_000.0
            assert getattr(rows[i], f"f{j}") == expect


def test_token_stats_edge_cases(spark):
    out = {r.doc_id: r for r in text.token_stats(docs(spark, "", "the the the", "你好世界")).collect()}
    assert out[0].n_words == 0 and out[0].avg_word_len == 0.0
    assert out[1].n_words == 3 and out[1].stop_ratio == pytest.approx(1.0)
    assert out[2].n_words == 0 and out[2].n_chars == 4  # CJK strips to no words


def test_language_id_votes(spark):
    d = docs(spark, "the cat is in the house", "der hund ist nicht zu haus", "你好")
    out = {r.doc_id: r for r in text.language_id(d).collect()}
    assert out[0].pred_lang == "en"
    assert out[1].pred_lang == "de"
    assert out[2].pred_lang == "und"


def test_kmeans_separates_planted_clusters(spark):
    import itertools

    from pyspark.sql import Row as R

    # two tight planted clusters around (1,0) and (0,1); ids 0/1 seed them
    pts = [(0, [1.0, 0.0]), (1, [0.0, 1.0])] + [
        (i, [1.0 + 0.01 * (i % 3), 0.01 * (i % 2)]) for i in range(2, 8)
    ] + [(i, [0.01 * (i % 2), 1.0 + 0.01 * (i % 3)]) for i in range(8, 14)]
    emb = spark.createDataFrame(
        [R(vec_id=i, embedding=v, label=0) for i, v in pts]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))

    from spark_stream_analyzer_spark.operators.similarity import kmeans_assign

    out = {r.vec_id: r.cluster_id for r in kmeans_assign(emb, k=2, iters=2).collect()}
    assert all(out[i] == 0 for i in itertools.chain([0], range(2, 8)))
    assert all(out[i] == 1 for i in itertools.chain([1], range(8, 14)))


def test_hash_split_deterministic_and_append_stable(spark):
    from pyspark.sql import Row as R

    from spark_stream_analyzer_spark.operators import split as splitops

    d1 = spark.createDataFrame([R(doc_id=i) for i in range(200)])
    a = {r.doc_id: r.split for r in splitops.hash_split(d1).collect()}
    # appending rows must not reassign existing ones (anti-randomSplit)
    d2 = spark.createDataFrame([R(doc_id=i) for i in range(400)])
    b = {r.doc_id: r.split for r in splitops.hash_split(d2).collect()}
    assert all(b[i] == a[i] for i in range(200))
    # rough 80/10/10 proportions
    n_train = sum(1 for s in b.values() if s == "train")
    assert 0.7 < n_train / 400 < 0.9
    assert set(b.values()) == {"train", "val", "test"}


def test_hash_rank_sample_exact_k(spark):
    from pyspark.sql import Row as R

    from spark_stream_analyzer_spark.operators import split as splitops

    d = spark.createDataFrame(
        [R(doc_id=i, source=f"s{i % 4}") for i in range(100)]
    )
    out = splitops.hash_rank_sample_k(d, k=5, strata_col="source").collect()
    per = {}
    for r in out:
        per.setdefault(r.source, set()).add(r.doc_id)
    assert all(len(v) == 5 for v in per.values()) and len(per) == 4
    # deterministic: same selection on re-run
    out2 = splitops.hash_rank_sample_k(d, k=5, strata_col="source").collect()
    assert {(r.source, r.doc_id) for r in out2} == {(r.source, r.doc_id) for r in out}


def test_redact_scrubs_planted_pii(spark):
    planted = (
        "contact bob.smith+x@example.co.uk or see https://ex.com/a?b=1 id 1234567890",
        "clean text with short 123 digits",
        "",
    )
    rows = {r.doc_id: r for r in text.redact(docs(spark, *planted)).collect()}
    assert rows[0].n_email == 1 and rows[0].n_url == 1 and rows[0].n_digits == 1
    assert rows[0].redacted == "contact <email> or see <url> id <digits>"
    assert rows[1].n_email == rows[1].n_url == rows[1].n_digits == 0
    assert rows[1].redacted == planted[1]
    assert rows[2].redacted == ""


def test_kmeans_seeds_from_sparse_id_space(spark):
    """Seeding must take the first k rows BY ORDER of id — an `id < k`
    filter would find zero seeds here (ids start at 1000)."""
    from pyspark.sql import Row as R

    from spark_stream_analyzer_spark.operators.similarity import kmeans_assign

    pts = [(1000, [1.0, 0.0]), (2001, [0.0, 1.0])] + [
        (3000 + i, [1.0 + 0.01 * (i % 3), 0.01 * (i % 2)]) for i in range(6)
    ] + [(4000 + i, [0.01 * (i % 2), 1.0 + 0.01 * (i % 3)]) for i in range(6)]
    emb = spark.createDataFrame(
        [R(vec_id=i, embedding=v) for i, v in pts]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    out = {r.vec_id: r.cluster_id for r in kmeans_assign(emb, k=2, iters=2).collect()}
    assert len(out) == len(pts)
    # seeds are ids 1000 and 2001; planted clusters must split along them
    assert all(out[3000 + i] == out[1000] for i in range(6))
    assert all(out[4000 + i] == out[2001] for i in range(6))
    assert out[1000] != out[2001]


def test_token_pack_shards_matches_sequential_definition(spark):
    """The range-partition + offset decomposition must equal the naive
    sequential packing exactly, across many partitions."""
    import random

    from spark_stream_analyzer_spark.operators.split import token_pack_shards

    rnd = random.Random(7)
    rows = [(i, rnd.randint(1, 500)) for i in range(5_000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(16)
    got = {
        r.doc_id: r.shard
        for r in token_pack_shards(df, budget=1000).collect()
    }
    cum = 0
    for i, n in rows:
        assert got[i] == cum // 1000, (i, n, cum)
        cum += n
    assert len({*got.values()}) > 1


def test_duplicate_clusters_long_chain_converges_via_path_doubling(spark):
    """A 300-node chain has diameter >> the 64-round bound; plain
    1-hop min-label propagation could not converge it, path doubling
    must (in ~log2(300) rounds), with no non-convergence warning."""
    import warnings

    from pyspark.sql import Row as R

    from spark_stream_analyzer_spark.operators.dedup import duplicate_clusters

    chain = spark.createDataFrame(
        [R(doc_a=i, doc_b=i + 1) for i in range(299)]
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = {r.doc_id: r.cluster_id for r in duplicate_clusters(chain).collect()}
    assert len(out) == 300
    assert set(out.values()) == {0}


def test_ivf_nprobe_improves_recall_toward_bruteforce(spark):
    """nprobe=n_cells must recover the exact brute-force top-k (every
    cell probed); nprobe=1 recall is <= nprobe=2 <= ... monotone."""
    from pyspark.sql import Row as R

    from spark_stream_analyzer_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    rnd = __import__("random").Random(13)
    emb = spark.createDataFrame(
        [R(vec_id=i, embedding=[rnd.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    pred = F.col("vec_id") < 4

    def pairs(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    exact = pairs(cosine_topk(emb, pred, k=3))
    recalls = []
    for nprobe in (1, 2, 4):
        got = pairs(ivf_topk(emb, pred, k=3, n_cells=4, nprobe=nprobe))
        recalls.append(len(got & exact) / len(exact))
    full = pairs(ivf_topk(emb, pred, k=3, n_cells=4, nprobe=4))
    assert full == exact
    assert recalls == sorted(recalls)


def test_contamination_check_planted_overlap_and_df_cap(spark):
    """A train doc sharing a 4-gram with an eval doc is flagged with the
    right counts; max_df drops stop-shingles from the collision universe."""
    from pyspark.sql import Row as R

    from spark_stream_analyzer_spark.operators.dedup import contamination_check
    from spark_stream_analyzer_spark.operators.split import N_BUCKETS, hash_bucket

    # find ids that hash into / out of the 5% eval bucket deterministically
    probe = spark.createDataFrame([R(doc_id=i) for i in range(200)]).select(
        "doc_id", hash_bucket("doc_id", "decontam").alias("b")
    )
    buckets = {r.doc_id: r.b for r in probe.collect()}
    eval_id = next(i for i in range(200) if buckets[i] < 500)
    train_ids = [i for i in range(200) if buckets[i] >= 500][:3]

    secret = "alpha beta gamma delta"          # the leaked 4-gram
    common = "zz yy xx ww"                     # planted stop-shingle
    rows = [
        R(doc_id=eval_id, text=f"{secret} filler words here"),
        R(doc_id=train_ids[0], text=f"prefix {secret} suffix"),
        R(doc_id=train_ids[1], text=f"{common} unrelated content entirely"),
        R(doc_id=train_ids[2], text=f"{common} other words again totally"),
    ]
    df = spark.createDataFrame(rows)
    out = {r.doc_id: r for r in contamination_check(df).collect()}
    assert set(out) == {train_ids[0]}
    assert out[train_ids[0]].n_shared == 1 and out[train_ids[0]].n_eval_docs == 1

    # make `common` an eval-side shingle too, then cap it away
    rows2 = [
        R(doc_id=eval_id, text=f"{secret} {common}"),
        R(doc_id=train_ids[1], text=f"{common} unrelated content entirely"),
        R(doc_id=train_ids[2], text=f"{common} other words again totally"),
    ]
    df2 = spark.createDataFrame(rows2)
    uncapped = {r.doc_id for r in contamination_check(df2).collect()}
    assert uncapped == {train_ids[1], train_ids[2]}
    capped = {r.doc_id for r in contamination_check(df2, max_df=2).collect()}
    assert capped == set()  # the 3-doc shingle is over the cap


def test_incremental_lsh_matches_batch_recompute(spark, tmp_path, sf_dir):
    """Index the first 400 docs, query the rest incrementally: the pairs
    involving (new, old) docs must equal the full-corpus LSH pairs
    restricted to those doc combinations — no rescan, no recompute."""
    from spark_stream_analyzer_spark.operators.dedup import (
        lsh_duplicate_pairs,
        lsh_pairs_against_index,
        write_signature_index,
    )
    from spark_stream_analyzer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)
    idx = str(tmp_path / "sig_index")
    write_signature_index(old, idx)

    got = {
        (r.doc_a, r.doc_b, r.n_shared, r.jaccard)
        for r in lsh_pairs_against_index(spark, new, idx, min_jaccard=0.02).collect()
    }
    full = lsh_duplicate_pairs(docs, min_jaccard=0.02).collect()
    want = {
        (max(r.doc_a, r.doc_b), min(r.doc_a, r.doc_b), r.n_shared, r.jaccard)
        for r in full
        if (r.doc_a < 400) != (r.doc_b < 400)
    }
    # incremental emits (new, old) = (doc_a>=400, doc_b<400)
    assert got == want and len(got) > 0


def test_ann_index_matches_inline_multiprobe(spark, tmp_path, sf_dir):
    """Query-against-persisted-index must equal the inline multi-probe
    LSH result, and the probe join must prune index partitions."""
    from spark_stream_analyzer_spark.operators.similarity import (
        ann_topk_against_index,
        lsh_multiprobe_topk,
        write_ann_index,
    )
    from spark_stream_analyzer_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "ann_index")
    write_ann_index(emb, path)

    queries = emb.filter(F.col("vec_id") < 8)
    got = {
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in ann_topk_against_index(spark, queries, path).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in lsh_multiprobe_topk(emb, F.col("vec_id") < 8).collect()
    }
    assert got == want and len(got) > 0


def test_mixture_sample_hits_target_composition(spark):
    """Output composition must match the target weights (limiting
    stratum kept whole), deterministically across runs."""
    from pyspark.sql import Row as R

    from spark_stream_analyzer_spark.operators.split import mixture_sample

    rows = (
        [R(doc_id=i, source="web") for i in range(1000)]
        + [R(doc_id=1000 + i, source="code") for i in range(100)]
        + [R(doc_id=1100 + i, source="books") for i in range(300)]
        + [R(doc_id=1400 + i, source="junk") for i in range(50)]
    )
    df = spark.createDataFrame(rows)
    # code is limiting: 100 / 0.25 = 400 -> web 200, books 100, junk dropped
    out = mixture_sample(df, {"web": 0.5, "code": 0.25, "books": 0.25})
    comp = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert comp == {"web": 200, "code": 100, "books": 100}
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {r.doc_id for r in mixture_sample(df, {"web": 0.5, "code": 0.25, "books": 0.25}).collect()}
    assert ids1 == ids2


def test_packed_sequences_preserve_docs_in_order(spark):
    from pyspark.sql import Row as R

    from spark_stream_analyzer_spark.operators.split import packed_sequences

    rows = [R(doc_id=i, n_tokens=40, text=f"d{i}") for i in range(50)]
    out = packed_sequences(
        spark.createDataFrame(rows), budget=200, sep=" "
    ).collect()
    # 40 tokens x 50 docs / 200 budget = exactly 5 docs per shard, 10 shards
    assert len(out) == 10
    by_shard = {r.shard: r for r in out}
    for shard, r in by_shard.items():
        assert r.n_docs == 5 and r.n_tokens == 200
        ids = [int(t[1:]) for t in r.sequence.split(" ")]
        assert ids == sorted(ids) and ids[0] == shard * 5
    all_ids = {int(t[1:]) for r in out for t in r.sequence.split(" ")}
    assert all_ids == set(range(50))


def test_asof_join_backward_edges(spark):
    """Tie timestamps are visible (right.ts <= left.ts), no-earlier-row
    fills NULL, keys never bleed into each other."""
    from pyspark.sql import Row as R

    from spark_stream_analyzer_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [R(k="a", ts=5, ev="a5"), R(k="a", ts=10, ev="a10"), R(k="a", ts=3, ev="a3"),
         R(k="b", ts=7, ev="b7"), R(k="c", ts=1, ev="c1")]
    )
    right = spark.createDataFrame(
        [R(k="a", ts=5, px=50), R(k="a", ts=9, px=90), R(k="b", ts=2, px=20),
         R(k="b", ts=100, px=990)]
    )
    out = {
        (r.k, r.ts): r.px
        for r in asof_join_backward(left, right, "k", "ts", "px").collect()
    }
    assert out == {
        ("a", 3): None,   # no right row at or before 3
        ("a", 5): 50,     # tie is visible
        ("a", 10): 90,    # latest at-or-before
        ("b", 7): 20,     # future right row (ts=100) ignored
        ("c", 1): None,   # key with no right rows at all
    }


def test_quality_filter_each_rule_trips_independently(spark):
    long_good = ("the cat sat and the dog ran to a tree because it was warm "
                 "outside so they played in that yard for hours you see ") * 2
    out = {
        r.doc_id: r
        for r in text.quality_filter(
            docs(
                spark,
                long_good,                      # 0: passes every rule
                "tiny doc the a",               # 1: too few words
                "x1 y2 z3 q4 " * 20,            # 2: no stopwords, short words ok
                "@@@@ #### %%%% $$$$ ^^^^ " * 4 + long_good,  # 3: symbol ratio pushed up
                "12345 67890 11111 " * 15,      # 4: all-digit words -> alpha_frac 0
            )
        ).collect()
    }
    assert out[0].keep == 1 and out[0].n_rules_failed == 0
    assert out[1].ok_word_count == 0 and out[1].keep == 0
    assert out[2].ok_stopwords == 0 and out[2].keep == 0
    assert out[3].ok_sym_ratio == 0 and out[3].keep == 0
    assert out[4].ok_alpha_frac == 0 and out[4].ok_stopwords == 0 and out[4].keep == 0


def test_chunk_exact_duplicates_counts_cross_doc_only(spark):
    # chunk width 3: doc0 = [A][B], doc1 = [A][C], doc2 repeats its own
    # chunk twice (intra-doc only), doc3 too short for any chunk
    A, B, C, D = "a b c", "d e f", "g h i", "j k l"
    out = {
        r.doc_id: r
        for r in dedup.chunk_exact_duplicates(
            docs(spark, f"{A} {B}", f"{A} {C}", f"{D} {D}", "x y"),
            chunk_w=3,
        ).collect()
    }
    assert (out[0].n_chunks, out[0].n_dup_chunks) == (2, 1)   # shares A
    assert (out[1].n_chunks, out[1].n_dup_chunks) == (2, 1)   # shares A
    assert (out[2].n_chunks, out[2].n_dup_chunks) == (1, 0)   # self-repeat only
    assert (out[3].n_chunks, out[3].n_dup_chunks) == (0, 0)   # no full chunk
    assert out[0].dup_ratio == pytest.approx(0.5)


def test_pq_recall_perfect_when_data_is_its_own_codebook(spark):
    # 8 well-separated one-hot-ish vectors; init = first 8 rows by id, so
    # every vector IS a centroid in every subspace -> ADC distances are
    # exact -> recall@k must be 1.0 (recall_ok at any floor)
    from pyspark.sql import Row

    vecs = []
    for i in range(8):
        v = [0.0] * 16
        v[i * 2] = 10.0 + i
        vecs.append(Row(vec_id=i, embedding=v))
    out = similarity.pq_recall_audit(
        spark.createDataFrame(vecs),
        m=4,
        ksub=8,
        iters=1,
        k=3,
        n_queries=2,
        recall_floor=0.99,
        expected_recall=1.0,
        band=0.05,
    ).collect()
    assert len(out) == 1
    assert out[0].recall_ok == 1 and out[0].n_queries == 2 and out[0].k == 3
    # recall 1.0 sits at the band center: the banded meter tracks the
    # actual level, not just the collapse bit (r5 verdict task 2 /
    # r7 advice re-cut)
    assert out[0].recall_in_band == 1


def test_containment_catches_planted_doc_in_doc(spark):
    # doc0 is fully embedded in doc1; Jaccard is tiny but containment_a
    # must be exactly 1.0 (every doc0 shingle appears in doc1)
    small = "alpha beta gamma delta epsilon"
    big = (
        "one two three four five six seven eight nine ten eleven twelve "
        + small
        + " thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
    )
    out = dedup.containment_pairs(
        docs(spark, small, big, "wholly unrelated other text entirely"),
        min_containment=0.5,
    ).collect()
    assert [(p.doc_a, p.doc_b) for p in out] == [(0, 1)]
    assert out[0].containment_a == pytest.approx(1.0)
    assert out[0].containment_b < 0.2


def test_decode_wav_is_a_real_riff_parser():
    """decode_audio must parse genuine WAV bytes (not fingerprint them):
    a hand-built 16-bit mono RIFF file decodes to its true sample count
    and RMS, and non-RIFF bytes hit the documented compressed-codec
    gate."""
    import io
    import wave

    import numpy as np
    import pytest as _pytest

    from spark_stream_analyzer_spark.operators.multimodal import decode_audio

    samples = np.array([3000, -3000] * 50, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    m = decode_audio(buf.getvalue())
    assert m["sample_rate"] == 16000
    assert m["n_channels"] == 1
    assert m["n_samples"] == 100
    assert m["duration_s"] == 100 / 16000
    assert m["rms"] == 3000.0

    with _pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfb\x90\x00 mp3-ish bytes")


def test_decode_ppm_parses_header_and_pixels():
    import pytest as _pytest

    from spark_stream_analyzer_spark.operators.multimodal import decode_image

    payload = b"P6 3 2 255\n" + bytes([10, 20, 30]) * 6
    m = decode_image(payload)
    assert (m["width"], m["height"], m["n_pixels"]) == (3, 2, 6)
    assert m["mean_pixel"] == 20.0

    # JPEG stays behind the documented gate (PNG decodes natively now)
    with _pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish bytes")


def test_png_round_trip_and_filter_reversal():
    """encode_png cycles all five row filters; decode_png must reverse
    each of them byte-exactly, concatenate split IDAT chunks, and
    verify chunk CRCs."""
    import zlib

    import pytest as _pytest

    from spark_stream_analyzer_spark.operators.multimodal import (
        _PNG_SIG,
        decode_image,
        decode_png,
        encode_png,
    )

    # 6 rows -> filters {0,1,2,3,4,0}: all five reversals run
    w, h = 4, 6
    pixels = [[(17 * r + 3 * i) % 256 for i in range(w * 3)] for r in range(h)]
    payload = encode_png(pixels, w, h)
    assert payload.count(b"IDAT") == 2  # split stream: concat is exercised
    m = decode_image(payload)  # routes through the PNG branch
    flat = [x for row in pixels for x in row]
    assert (m["width"], m["height"], m["n_pixels"]) == (w, h, w * h)
    assert m["mean_pixel"] == _pytest.approx(sum(flat) / len(flat))
    assert m["top_left"] == pixels[0][0] and m["bottom_left"] == pixels[-1][0]
    assert m["n_filters_used"] == 5

    # corruption/gating: every failure is a clean error, never garbage
    with _pytest.raises(ValueError, match="missing IHDR"):
        decode_png(_PNG_SIG)  # signature only
    bad = bytearray(payload)
    bad[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with _pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(bad))
    with _pytest.raises(ValueError, match="truncated PNG"):
        decode_png(payload[:-8])
    # truncation INSIDE a chunk's 4-byte CRC field (r7 advice: this case
    # leaked struct.error before the pos+12+length bound check)
    with _pytest.raises(ValueError, match="truncated PNG"):
        decode_png(payload[:-2])

    def chunk(ctype, data):
        import struct

        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    import struct

    def png_of(ihdr_fields, raw_filtered):
        ihdr = struct.pack(">IIBBBBB", *ihdr_fields)
        return (
            _PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw_filtered))
            + chunk(b"IEND", b"")
        )

    # interlaced and non-RGB stay behind the documented gate
    with _pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(png_of((1, 1, 8, 2, 0, 0, 1), b"\x00" + b"\x00" * 3))
    with _pytest.raises(NotImplementedError, match="color type 2"):
        decode_png(png_of((1, 1, 8, 6, 0, 0, 0), b"\x00" + b"\x00" * 4))
    # unknown filter byte and short inflated stream are hard errors
    with _pytest.raises(ValueError, match="unknown filter type 9"):
        decode_png(png_of((1, 1, 8, 2, 0, 0, 0), b"\x09" + b"\x00" * 3))
    with _pytest.raises(ValueError, match="IDAT inflates to"):
        decode_png(png_of((2, 2, 8, 2, 0, 0, 0), b"\x00" + b"\x00" * 3))


def test_png_decoder_witnesses_on_documents(spark):
    """Spark-side round trip on the real documents table: closed-form
    stats + the filter-mix witness (n_filters_used == height proves
    every distinct per-row reversal ran)."""
    from spark_stream_analyzer_spark.operators import multimodal as mm
    from spark_stream_analyzer_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    out = mm.png_decode_stats(mm.synth_png_payloads(d)).collect()
    assert len(out) == 20
    for r in out:
        v = r.doc_id % 200
        h = 2 + r.doc_id % 4
        assert r.top_left == v
        assert r.bottom_left == v + h - 1
        assert r.mean_pixel == v + (h - 1) / 2.0
        assert r.width == 3 + r.doc_id % 5
        assert r.n_filters_used == h


def test_rank_fusion_prefers_doubly_ranked_neighbors(spark):
    """A neighbor on BOTH lists must outscore one on a single list at
    comparable ranks, and every fused score must equal the closed form."""
    from pyspark.sql import Row

    a = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=10, rank=1),
         Row(query_id=1, neighbor_id=11, rank=2)]
    )
    b = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=10, rank=3),
         Row(query_id=1, neighbor_id=12, rank=1)]
    )
    from spark_stream_analyzer_spark.operators.similarity import rank_fusion

    out = {r.neighbor_id: r for r in rank_fusion(a, b, k=5).collect()}
    assert out[10].fused_rank == 1  # on both lists
    assert round(1 / 61 + 1 / 63, 6) == out[10].rrf_score
    assert round(1 / 61, 6) == out[12].rrf_score  # single-list
    assert out[12].fused_rank == 2 and out[11].fused_rank == 3


def test_bmp_decoder_row_order_and_padding_witnesses(spark):
    """The decoder must honor bottom-up storage and row padding: the
    top-left witness equals the IMAGE top row's value (stored LAST)."""
    from spark_stream_analyzer_spark.operators import multimodal as mm
    from spark_stream_analyzer_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    out = mm.bmp_decode_stats(mm.synth_bmp_payloads(d)).collect()
    for r in out:
        v = r.doc_id % 200
        h = 2 + r.doc_id % 4
        assert r.top_left == v
        assert r.bottom_left == v + h - 1
        assert r.mean_pixel == v + (h - 1) / 2.0
        assert r.width == 3 + r.doc_id % 5


def test_bmp_decoder_rejects_malformed_headers():
    """Header fields are untrusted: zero/negative dims and truncated
    pixel regions must raise cleanly, never IndexError or silent
    short-row stats (r4 ADVICE)."""
    import struct

    import pytest

    from spark_stream_analyzer_spark.operators.multimodal import decode_bmp

    def bmp(w, h, body_bytes):
        data_off = 14 + 40
        hdr = b"BM" + struct.pack("<IHHI", data_off + body_bytes, 0, 0, data_off)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0)
        return hdr + info + b"\x00" * body_bytes

    with pytest.raises(ValueError, match="width=0"):
        decode_bmp(bmp(0, 2, 64))
    with pytest.raises(ValueError, match="width=-3"):
        decode_bmp(bmp(-3, 2, 64))
    with pytest.raises(ValueError, match="height=0"):
        decode_bmp(bmp(4, 0, 64))
    # stride(4px)=12; h=100 promises 1200 bytes but only 24 are present
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bmp(4, 100, 24))
    # a crafted data_off pointing back inside the 54-byte header must be
    # rejected, not silently decode header bytes as pixels (r5 ADVICE)
    def bmp_off(data_off, w=4, h=2, body_bytes=1024):
        hdr = b"BM" + struct.pack("<IHHI", 54 + body_bytes, 0, 0, data_off)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0)
        return hdr + info + b"\x00" * body_bytes

    with pytest.raises(ValueError, match="data_off=0"):
        decode_bmp(bmp_off(0))
    with pytest.raises(ValueError, match="data_off=14"):
        decode_bmp(bmp_off(14))
    assert decode_bmp(bmp_off(54))["n_pixels"] == 8
    # intact: same header shape decodes fine
    m = decode_bmp(bmp(4, 2, 24))
    assert m["width"] == 4 and m["height"] == 2 and m["n_pixels"] == 8


def test_bpe_pair_counts_planted_corpus(spark):
    # "banana banana split": pairs of 'banana'x2 = {ba,an,na,an,na}x2,
    # 'split' = {sp,pl,li,it}; top pair must be 'an'/'na' (4 each) with
    # the deterministic 'an' < 'na' tiebreak ordering rank 1 vs 2
    from pyspark.sql import Row

    from spark_stream_analyzer_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame([Row(doc_id=0, text="banana banana split")])
    rows = bpe_pair_counts(df, k=5).collect()
    got = [(r.rank, r.pair, r.n) for r in rows]
    assert got[0] == (1, "an", 4) and got[1] == (2, "na", 4)
    assert got[2] == (3, "ba", 2)
    # single-char words contribute nothing
    df2 = spark.createDataFrame([Row(doc_id=0, text="a b c")])
    assert bpe_pair_counts(df2).count() == 0


def test_bpe_merge_table_applies_merges_between_rounds(spark):
    # hand-traced on "banana" x2:
    #  r1: pairs {a n:4, n a:4, b a:2} -> argmax 'a n' (tie, asc) ->
    #      ' b a n a n a ' -replace-> ' b an a n a ' (single-pass
    #      non-overlap: only the FIRST 'a n' merges; the second lost its
    #      leading delimiter to the consumed match)
    #  r2: symbols [b, an, a, n, a] -> all pairs count 2 -> argmax 'a n'
    #      again (asc) -> ' b an an a '
    #  r3: symbols [b, an, an, a] -> argmax 'an a' (prefix sorts first)
    from pyspark.sql import Row

    from spark_stream_analyzer_spark.operators.text import bpe_merge_table

    df = spark.createDataFrame([Row(doc_id=0, text="banana banana")])
    got = [(r.round, r.pair, r.n) for r in bpe_merge_table(df, rounds=3).collect()]
    assert got == [(1, "a n", 4), (2, "a n", 2), (3, "an a", 2)]


def test_bpe_trie_encoder_parity_with_chain_on_adversarial_runs(spark):
    """The production (>=64-merge) dictionary encoder must reproduce the
    literal replace-chain EXACTLY — including the boundary-space
    consumption of single-pass non-overlapping replace, where
    ' a a a a a ' -> ' aa a aa ' (NOT the fixpoint's 'aa aa a').  Runs,
    overlapping-pair chains, and merge-created pairs are the adversarial
    cases; both forms run on the same frame and must hash-agree row for
    row."""
    from pyspark.sql import Row

    from spark_stream_analyzer_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="aaaaa aaaa aaa aa a"),         # pure runs
            Row(doc_id=1, text="ababab abab ab ba"),           # alternations
            Row(doc_id=2, text="banana banana split"),         # the trainer fixture
            Row(doc_id=3, text="abc abcabc cba"),              # merge-created pairs
            Row(doc_id=4, text=""),                            # empty doc
            Row(doc_id=5, text="zzz qqq aabb bbaa abba"),
        ]
    )
    # a merge table >= the gate, in a deliberately tricky order: early
    # merges create symbols later merges consume, and ranks that never
    # fire pad the table to production size
    # "a b" appears TWICE: trained tables really do repeat a pair (the
    # r11 banana fixture merges 'a n' in rounds 1 AND 2) and each
    # occurrence is its own chain pass — the duplicated-pair regression
    # the hypothesis parity test first caught
    merges = ["a a", "aa a", "a b", "ab ab", "a b", "b a", "ba ba", "b b", "a ba"]
    merges += [f"q{i} q{i}" for i in range(T._BPE_TRIE_MIN_MERGES)]  # no-ops
    assert len(merges) >= T._BPE_TRIE_MIN_MERGES

    chain = {
        r["doc_id"]: tuple(r["enc"])
        for r in T._bpe_encode_chain(docs, merges, "text").collect()
    }
    trie = {
        r["doc_id"]: tuple(r["enc"])
        for r in T._bpe_encode_trie(docs, merges, "text").collect()
    }
    assert chain == trie
    # the boundary-space subtlety actually fired (guards test vacuity)
    assert chain[0][0] == "aaa aa"  # 'aaaaa': a a a a a -> aa a aa -> aaa aa


def test_bpe_encode_stats_auto_selects_trie_at_gate(spark):
    """bpe_encode_stats must route >= _BPE_TRIE_MIN_MERGES tables through
    the pandas encoder (ArrowEvalPython in the plan) and smaller tables
    through the pure expression chain (no Python in the plan), with
    identical output either side of the gate for the same table."""
    from pyspark.sql import Row

    from spark_stream_analyzer_spark.operators import text as T

    docs = spark.createDataFrame(
        [Row(doc_id=0, text="banana banana split"), Row(doc_id=1, text="aaaa")]
    )
    small = ["a n", "an a", "b an"]
    big = small + [f"q{i} q{i}" for i in range(T._BPE_TRIE_MIN_MERGES)]

    plan_small = T.bpe_encode_stats(docs, small)._jdf.queryExecution().executedPlan().toString()
    plan_big = T.bpe_encode_stats(docs, big)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan_small and "BatchEvalPython" not in plan_small
    assert "ArrowEvalPython" in plan_big

    # padding the table with never-firing merges cannot change the result
    got_small = sorted(map(tuple, T.bpe_encode_stats(docs, small).collect()))
    got_big = sorted(map(tuple, T.bpe_encode_stats(docs, big).collect()))
    assert got_small == got_big


def test_bpe_trie_parity_on_trained_table_from_real_docs(spark):
    """End-to-end parity at the registry's own fixture: train 3 merges on
    the sf0.001 documents, then force BOTH encoder forms over the same
    table and require identical (n_tokens, n_merged_tokens, n_chars,
    stream_hash) per doc — the stream hash pins exact token geometry."""
    from spark_stream_analyzer_spark.operators import text as T

    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    merges = [p for _, p, _ in T.bpe_train_merges(docs, rounds=3)]
    assert len(merges) == 3

    def stats(enc_df):
        return {r["doc_id"]: tuple(r)[1:] for r in _bpe_tail(enc_df).collect()}

    def _bpe_tail(enc):
        import pyspark.sql.functions as F

        from spark_stream_analyzer_spark.functions import texthash as TH

        return enc.select(
            "doc_id",
            F.expr(
                "aggregate(enc, CAST(0 AS BIGINT),"
                " (a, e) -> a + size(split(e, ' ')))"
            ).alias("n_tokens"),
            F.expr(TH.spark_hash60("array_join(enc, '|')")).alias("stream_hash"),
        )

    chain = stats(T._bpe_encode_chain(docs, merges, "text"))
    trie = stats(T._bpe_encode_trie(docs, merges, "text"))
    assert chain == trie


def test_duplicated_spans_geometry_and_overlap_merge(spark):
    """Planted corpus with known shared substrings (r9).

    docs 1/2 share one verbatim 8-word run; docs 3/4 share two runs
    separated by more than w unique words (two distinct spans); doc 5
    shares nothing.  dup_words must be the exact union of covered
    5-word windows (merged spans), and an 8-word shared run must yield
    longest_span_words == 8 on both sides.
    """
    run1 = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 words
    run2 = "kilo lima mike november oscar"  # 5 words
    rows = [
        Row(doc_id=1, text=f"one two three {run1} four five six"),
        Row(doc_id=2, text=f"seven eight {run1} nine ten"),
        Row(doc_id=3, text=f"{run1} u1 u2 u3 u4 u5 u6 u7 {run2}"),
        Row(doc_id=4, text=f"x1 x2 {run2} y1 y2"),
        Row(doc_id=5, text="entirely unique words nothing shared here at all ok"),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.doc_id: r
        for r in dedup.duplicated_spans(df, gram_w=5).collect()
    }
    # docs 1 and 2: exactly one 8-word span each
    for d in (1, 2):
        assert out[d].n_spans == 1, out[d]
        assert out[d].longest_span_words == 8, out[d]
        assert out[d].dup_words == 8, out[d]
    # doc 3 shares run1 (8 words, with docs 1/2) AND run2 (5 words,
    # with doc 4), separated by 7 unique words -> two distinct spans
    assert out[3].n_spans == 2, out[3]
    assert out[3].longest_span_words == 8, out[3]
    assert out[3].dup_words == 13, out[3]
    # doc 4: just the 5-word run
    assert out[4].n_spans == 1 and out[4].dup_words == 5, out[4]
    # doc 5: clean
    assert out[5].n_spans == 0 and out[5].dup_words == 0, out[5]
    assert out[5].dup_word_ratio == 0.0


def test_duplicated_spans_overlapping_windows_not_double_counted(spark):
    """Two docs share a 6-word run: covered positions {1, 2} on the
    sharer whose windows overlap in 4 words — dup_words must be 6
    (union), not 10 (sum of windows)."""
    run = "p q r s t u"  # 6 words -> positions 1..2 covered (w=5)
    rows = [
        Row(doc_id=1, text=f"{run} filler1 filler2"),
        Row(doc_id=2, text=f"lead1 lead2 {run}"),
    ]
    out = {
        r.doc_id: r
        for r in dedup.duplicated_spans(
            spark.createDataFrame(rows), gram_w=5
        ).collect()
    }
    for d in (1, 2):
        assert out[d].n_spans == 1, out[d]
        assert out[d].dup_words == 6, out[d]
        assert out[d].longest_span_words == 6, out[d]


def test_weighted_median_udaf_tie_and_parity_semantics(spark):
    """Pins the exact lower-weighted-median definition (r9): min x with
    2*cum(w) >= total under RANGE-frame tie semantics."""
    from spark_stream_analyzer_spark.functions.udafs import weighted_median

    rows = [
        # group a: values 1(w2) 2(w1) 3(w1) -> total 4, half 2 -> cum(1)=2
        # qualifies -> median 1 (lower median on the even boundary)
        ("a", 1.0, 2), ("a", 2.0, 1), ("a", 3.0, 1),
        # group b: tie group at 2 split across rows -> value-level cum
        # must include BOTH tied rows: 1(w1) 2(w1) 2(w1) 5(w4) ->
        # total 7, ceil-half 4; cum(1)=1, cum(2)=3, cum(5)=7 -> median 5
        ("b", 1.0, 1), ("b", 2.0, 1), ("b", 2.0, 1), ("b", 5.0, 4),
        # group c: single row
        ("c", 9.0, 3),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    out = {
        r.g: r.wm
        for r in df.groupBy("g").agg(weighted_median("v", "w").alias("wm")).collect()
    }
    assert out == {"a": 1.0, "b": 5.0, "c": 9.0}, out


def test_span_cleaned_docs_cuts_exactly_the_shared_spans(spark):
    """The cut half (r9): kept text must be the original minus the
    maximal shared spans, fingerprint-verified against a hand-computed
    md5-60."""
    import hashlib

    run = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 words
    rows = [
        Row(doc_id=1, text=f"one two three {run} four five six"),
        Row(doc_id=2, text=f"seven eight {run} nine ten"),
        Row(doc_id=3, text="entirely unique words nothing shared here at all ok"),
    ]
    out = {
        r.doc_id: r
        for r in dedup.span_cleaned_docs(
            spark.createDataFrame(rows), gram_w=5
        ).collect()
    }

    def fp(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    assert out[1].n_words == 14 and out[1].n_kept_words == 6
    assert out[1].cleaned_fp == fp("one two three four five six")
    assert out[2].n_words == 12 and out[2].n_kept_words == 4
    assert out[2].cleaned_fp == fp("seven eight nine ten")
    # untouched doc: fingerprint of its own normalized words
    assert out[3].n_kept_words == out[3].n_words == 9
    assert out[3].cleaned_fp == fp(
        "entirely unique words nothing shared here at all ok"
    )
