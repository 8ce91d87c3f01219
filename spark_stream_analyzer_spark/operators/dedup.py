"""Deduplication operators: exact, MinHash-LSH, n-gram Jaccard, SimHash,
embedding-cosine (EXT — beyond the reference, per the rebuild north star).

Scale design (the whole point of these shapes at 100 TB):

* **No all-pairs joins.** Candidate pairs come from equality joins on
  band keys / shingles / sign-LSH buckets — each a plain hash-shuffle
  Spark handles at any scale; exact verification runs only on candidates.
* Signatures (minhash / simhash) are per-row array expressions —
  whole-stage codegen, one scan, no Python.
* Skew: ultra-frequent shingles blow up the inverted-index join
  quadratically; ``max_df`` drops them (the standard df-cap trick).
  AQE skew-join handles residual imbalance.
* Dedup keys (md5-60bit) are uniform → even shuffle partitioning.

Everything is md5-based (:mod:`..functions.texthash`) so each operator
has an exact DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_stream_analyzer_spark.functions import texthash as TH
from spark_stream_analyzer_spark.functions.materialize import lineage_cut, materialize
from spark_stream_analyzer_spark.operators.text import with_words


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: per doc, the canonical (min-id) copy.

    One shuffle on the 60-bit text hash. At 100 TB the hash key is
    uniform, so partitions balance; the window is equivalent to
    groupBy(hash).agg(min(id), count) + rejoin but avoids the second
    shuffle by reusing the same partitioning.
    """
    h = F.expr(TH.spark_hash60(text_col))
    w = Window.partitionBy("text_h")
    return (
        df.withColumn("text_h", h)
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("n_copies", F.count("*").over(w))
        .select(
            id_col,
            "canonical_id",
            F.col("n_copies").cast("long").alias("n_copies"),
            (F.col(id_col) != F.col("canonical_id")).cast("int").alias("is_duplicate"),
        )
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", shingle_k: int = 3, k: int = TH.MINHASH_K
) -> DataFrame:
    """MinHash signature columns mh0..mh{k-1} + LSH band keys.

    shingle → 60-bit hash → k universal-hash minima ((a*h+b) mod 2^31-1).
    Empty shingle set hashes to the sentinel P31 in every slot.
    """
    df = with_words(df, text_col).withColumn(
        "sh", F.expr(TH.spark_shingles("words", shingle_k))
    )
    df = df.withColumn(
        "hs", F.expr(f"transform(sh, s -> {TH.spark_hash60('s')} % {TH.P31})")
    )
    for j, (a, b) in enumerate(TH.minhash_coeffs(k)):
        df = df.withColumn(f"mh{j}", F.expr(TH.spark_minhash_value("hs", a, b)))
    rows = TH.LSH_ROWS
    for band in range(TH.LSH_BANDS):
        parts = [f"mh{band * rows + r}" for r in range(rows)]
        df = df.withColumn(f"band{band}", F.concat_ws("-", *parts))
    return df


#: default per-(band_idx, band_key) bucket-size bound for
#: :func:`lsh_duplicate_pairs`. Sized to never fire on the tested
#: corpora (bucket size there = near-dup cluster size, max ≈ a few
#: dozen) while guarding the degenerate regime: a boilerplate band key
#: shared by m docs makes the within-bucket self-join emit m(m-1)/2
#: candidates — at m = 10^6 (one viral template across a 100 TB crawl)
#: that is 5·10^11 rows out of ONE bucket, i.e. one straggler task that
#: never finishes. Above the cap the bucket is star-expanded instead
#: (see below).
LSH_BAND_CAP = 256


def lsh_hot_band_stats(
    df: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    band_cap: int = LSH_BAND_CAP,
) -> DataFrame:
    """Oversized LSH buckets: (bi, bk, m) for every bucket with m > cap.

    The no-silent-caps companion to :func:`lsh_duplicate_pairs`: when the
    cap fires, pair coverage inside those buckets is star-reduced, and
    this is the audit query that names them (tiny result: one row per
    HOT bucket, not per member).
    """
    sig = minhash_signatures(df, text_col, shingle_k)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("bi"), F.col(f"band{b}").alias("bk"))
                for b in range(TH.LSH_BANDS)
            ])
        ).alias("band"),
    ).select("doc_id", "band.bi", "band.bk")
    return (
        bands.groupBy("bi", "bk")
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") > band_cap)
        .select("bi", "bk", F.col("m").cast("long").alias("m"))
    )


def lsh_duplicate_pairs(
    df: DataFrame,
    text_col: str = "text",
    min_jaccard: float = 0.02,
    shingle_k: int = 3,
    band_cap: int | None = LSH_BAND_CAP,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    Candidates = pairs agreeing on ≥1 of the LSH bands (equality join on
    (band_idx, band_key) — a hash shuffle, never an all-pairs product);
    then exact shingle-set Jaccard on candidates only.

    Hot-band guard (r8): the equality join is shuffle-bounded but
    quadratic WITHIN a bucket — m docs sharing one (band_idx, band_key)
    yield m(m-1)/2 candidates, so a single degenerate band key (empty
    docs, boilerplate) becomes the straggler that kills the job at
    100 TB. Buckets larger than ``band_cap`` are therefore
    STAR-EXPANDED instead of self-joined: every member is paired with
    the bucket's min-doc_id representative (m-1 candidates, O(m) not
    O(m²)). A bucket that hot is near-certainly one duplicate cluster,
    and the star keeps it CONNECTED — downstream
    :func:`duplicate_clusters` recovers the full clique from the star
    edges, so cluster/survivor semantics are preserved; what is reduced
    is only direct pair coverage between non-representative members
    (recoverable via the cluster pass). Pairs that also co-occur in a
    non-hot bucket of another band are still emitted exactly. This is
    intentionally NOT silent: :func:`lsh_hot_band_stats` (same
    ``band_cap``) names every capped bucket, and the
    ``dedup_lsh_hot_band_cap`` driver row pins both the capped
    semantics and the bucket counts. ``band_cap=None`` disables the
    guard (exact parity with the uncapped all-candidates oracle).

    The signature subtree feeds both band sides and both verify sides;
    an explicit repartition on doc_id roots them all in ONE exchange
    (ReuseExchange), so the regex+minhash signature computation runs
    once instead of once per consumer — measured ~35% faster at sf0.1
    (and localCheckpoint of the wide shingle arrays was 2× SLOWER than
    exchange reuse). At cluster scale the two-phase form writes
    signatures to a table first.
    """
    sig = (
        minhash_signatures(df, text_col, shingle_k)
        .select("doc_id", "sh", *[f"band{b}" for b in range(TH.LSH_BANDS)])
        .repartition("doc_id")
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("bi"), F.col(f"band{b}").alias("bk"))
                for b in range(TH.LSH_BANDS)
            ])
        ).alias("band"),
    ).select("doc_id", "band.bi", "band.bk")
    if band_cap is not None:
        # one extra aggregation on the SAME (bi, bk) hash partitioning
        # the candidate self-join shuffles on — the bucket-size join
        # reuses that exchange rather than adding a new shuffle shape
        sizes = bands.groupBy("bi", "bk").agg(
            F.count("*").alias("_m"), F.min("doc_id").alias("_rep")
        )
        flagged = bands.join(sizes, ["bi", "bk"])
        cold = flagged.filter(F.col("_m") <= band_cap).select("doc_id", "bi", "bk")
        # star expansion: rep is the bucket min, so rep < doc_id holds
        # for every emitted pair by construction
        cand_hot = (
            flagged.filter(
                (F.col("_m") > band_cap) & (F.col("doc_id") != F.col("_rep"))
            )
            .select(F.col("_rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        )
    else:
        cold, cand_hot = bands, None
    cand = (
        cold.alias("a")
        .join(
            cold.alias("b"),
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    if cand_hot is not None:
        cand = cand.unionByName(cand_hot)
    cand = cand.distinct()
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.when(union == 0, F.lit(1.0)).otherwise(inter.cast("double") / union)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= min_jaccard)
        .select(
            "doc_a",
            "doc_b",
            inter.cast("long").alias("n_shared"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    min_jaccard: float = 0.02,
    shingle_k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard via inverted-index (shingle equality) join.

    Intersections come from groupBy(pair).count over the shingle postings
    join — the classic document-similarity self-join; ``max_df`` drops
    shingles appearing in more than max_df docs (stop-shingle cap: the
    quadratic-blowup guard at 100 TB; must match the oracle when set).
    """
    docs = with_words(df, text_col).select(
        "doc_id", F.expr(TH.spark_shingles("words", shingle_k)).alias("sh")
    )
    # One explicit hash exchange on the shingle key, placed BEFORE the
    # df-cap: every downstream consumer (the cap aggregate, the cap
    # filter join, both self-join sides, the set sizes) hangs off this
    # one subplan, so the regex+shingle explode runs once and the
    # shuffle is written once, read by all (identical Exchange subplans
    # dedup via ReuseExchange; without it each consumer re-ran the
    # explode from the parquet scan — ~6 redundant scans observed).
    # hashpartitioning(s) also already satisfies the cap join's and the
    # pair join's distribution requirements, so neither adds a shuffle.
    post = docs.select("doc_id", F.explode("sh").alias("s")).repartition("s")
    if max_df is not None:
        # df-cap: drop stop-shingles from the UNIVERSE (postings AND set
        # sizes), so Jaccard stays consistent over the filtered space.
        keep = post.groupBy("s").count().filter(F.col("count") <= max_df).select("s")
        post = post.join(keep, "s")
    sizes = post.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pairs = (
        post.alias("a")
        .join(post.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_shared")
    )
    return (
        pairs.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", F.col("n_shared").cast("long").alias("n_shared"),
                F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", shingle_k: int = 3
) -> DataFrame:
    """32-bit SimHash per doc: per-bit ±1 vote over k-gram shingle hashes.

    Shingle features (Charikar-style), not unigrams: templated corpora
    share most of their vocabulary, so unigram simhashes collapse into
    huge Hamming clusters (measured: 2.1M pairs at hamming ≤ 3 on the
    sf0.1 synthetic docs); shingle features keep fingerprints
    discriminative while remaining edit-tolerant.

    Physical form: explode shingle hashes → ONE groupBy(doc_id) with 32
    conditional bit-vote sums (all whole-stage-codegen, map-side partial
    aggregation, uniform shuffle key). The naive nested-fold expression
    (32 higher-order aggregates) drops out of codegen into interpreted
    eval and re-inlines the md5 transform per bit — measured 100×+ slower
    at sf0.1 — so this shape is load-bearing, not stylistic.
    """
    df = with_words(df, text_col).withColumn(
        "sh", F.expr(TH.spark_shingles("words", shingle_k))
    )
    h = df.select(
        "doc_id",
        F.explode_outer(
            F.expr(f"transform(sh, s -> {TH.spark_hash60('s')})")
        ).alias("h"),
    )
    votes = [
        F.sum(
            F.expr(
                f"CASE WHEN h IS NULL THEN 0 WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END"
            )
        ).alias(f"v{i}")
        for i in range(TH.SIMHASH_BITS)
    ]
    agg = h.groupBy("doc_id").agg(*votes, F.count("h").alias("n_features"))
    simhash = sum(
        [
            F.when(F.col(f"v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
            for i in range(TH.SIMHASH_BITS)
        ],
        start=F.lit(0).cast("long"),
    )
    return agg.select(
        "doc_id",
        simhash.alias("simhash"),
        F.col("n_features").cast("long").alias("n_features"),
    )


def simhash_pairs(
    df: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs within a Hamming radius, via byte-band LSH.

    4 bands of 8 bits: any pair with hamming ≤ 3 must agree on ≥1 whole
    byte (pigeonhole) → candidates from an equality join on
    (band_idx, band_byte), never an all-pairs scan. Exact bit_count
    verification on candidates. Fingerprints materialize once
    (cluster-safe persist, functions.materialize) — both self-join
    sides reuse them.
    """
    sim = materialize(
        simhash_fingerprints(df, text_col).select("doc_id", "simhash")
    )
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("bi"),
                    F.expr(f"(simhash >> {8 * k}) & 255").alias("bk"),
                )
                for k in range(4)
            ])
        ).alias("band"),
    ).select("doc_id", "simhash", "band.bi", "band.bk")
    return (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def duplicate_clusters(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Connected components over near-dup pairs → per-doc canonical id.

    The real dedup workflow's last step: near-dup PAIRS become duplicate
    CLUSTERS (keep one doc per cluster). Min-label propagation with a
    path-doubling shortcut, iterated to fixpoint:

    * neighbor step — each node takes the min label over its edges (one
      groupBy-min shuffle over the edge list per round);
    * doubling steps — each node also takes its LABEL's label
      (``labels ⋈ labels`` self-join) AND that label's label (the
      composition applied twice per round, r14: two self-joins of the
      node-scale label table cost far less than an extra round's
      edge-list join + lineage cut + convergence action, and shorten
      label chains ~4x per round instead of ~2x), so convergence is
      O(log diameter) rounds with a smaller constant — what makes
      adversarial long-path graphs (diameter ≫ the round bound) safe,
      not just the tiny cliques real near-dup graphs produce.

    Initialization folds the first neighbor step into the node-list
    pass (r14): ``label = least(id, min(neighbor id))`` comes out of
    the same groupBy that previously built the DISTINCT node list with
    ``label = id`` — one full round (edge join + lineage cut +
    convergence action) removed at any scale for free.

    The driver only sees a single converged-or-not count per round (no
    data collect); a warning fires in the (now pathological, > 2^64-ish
    chain) case the bound is still hit.  The label monotone (labels
    only decrease, never below the component min, and the loop runs to
    fixpoint of a map whose components INCLUDE the single neighbor
    step) is unchanged by both r14 edits, so the converged labels are
    the same component-min labeling — re-verified by value against the
    previous implementation (md5-equal full labelings) and by the
    DuckDB transitive-closure oracles of every consuming row.
    """
    from spark_stream_analyzer_spark.session import (
        loop_aqe_scope,
        persistent_rdd_ids,
        unpersist_rdds,
    )

    spark = pairs.sparkSession
    # materialize once: every fixpoint round re-joins the edge list, and
    # recomputing the upstream candidate-pair pipeline per round would
    # dominate the whole computation (cluster-safe persist — lineage kept).
    # Snapshot the persistent-RDD id set around the (eager) materialize:
    # under SSA_MATERIALIZE=local_checkpoint the blocks are NOT
    # CacheManager-tracked, so Dataset.unpersist() at convergence would
    # be a no-op and the edge blocks would linger until the caller's
    # post-query sweep (r8, ADVICE) — the id diff frees them under
    # either strategy
    _edges_before = persistent_rdd_ids(spark)
    edges = materialize(
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .unionByName(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
    )
    edges_rdd_ids = persistent_rdd_ids(spark) - _edges_before
    labels = edges.groupBy(F.col("a").alias("id")).agg(
        F.least(F.col("a"), F.min("b")).alias("label")
    )
    # cut the INITIAL labels too (r15, ADVICE r14): round 0 references
    # `labels` ~5 times (neighbor join, step, and the x/y/z self-joins),
    # so without a cut the init aggregation over the full edge list runs
    # ~5x in the first round; after this, "labels is a checkpoint" holds
    # from round 0 on.  Tracked like the per-round cuts so round 0's cut
    # frees these blocks.
    _b0 = persistent_rdd_ids(spark)
    labels = lineage_cut(labels)
    prev_round_ids: set[int] = persistent_rdd_ids(spark) - _b0
    for rnd in range(64):  # hard bound; convergence checked each round
        neigh = (
            edges.join(labels, edges.b == labels.id)
            .groupBy(edges.a)
            .agg(F.min("label").alias("nmin"))
            .withColumnRenamed("a", "id")
        )
        step = labels.join(neigh, "id", "left")
        # path doubling, applied twice: label-of-label, then that
        # label's label again — two self-joins of the node-scale label
        # table per round (labels is the previous round's checkpoint,
        # so each join is a scan of materialized blocks, not a
        # recompute). Starts at round 0 because initialization already
        # folded in one neighbor step, so label-of-label is not the
        # identity even in the first round.
        hop = labels.alias("x").join(
            labels.alias("y"), F.col("x.label") == F.col("y.id")
        ).select(F.col("x.id").alias("id"), F.col("y.label").alias("l1"))
        hop2 = hop.alias("h").join(
            labels.alias("z"), F.col("h.l1") == F.col("z.id"), "left"
        ).select(
            F.col("h.id").alias("id"),
            F.least(
                F.col("h.l1"), F.coalesce(F.col("z.label"), F.col("h.l1"))
            ).alias("lmin"),
        )
        new_label = F.least(
            "label", F.coalesce("nmin", "label"), F.coalesce("lmin", "label")
        )
        step = step.join(hop2, "id", "left")
        updated = step.select(
            "id",
            new_label.alias("label"),
            # carry the convergence bit instead of re-joining old vs new
            # labels afterwards — one fewer join + action per round
            (new_label < F.col("label")).alias("moved"),
        )
        _before = persistent_rdd_ids(spark)
        # cut lineage growth: the plan deepens per round, so a persist
        # would still compound analysis time — chain=rnd selects the
        # hybrid strategy: fast localCheckpoint most rounds, a reliable
        # deep cut() every _DEEP_CUT_EVERY rounds (always reliable when
        # the deployment configured an external checkpoint dir).
        # FUSED with the convergence check (r15, verdict task 8 class):
        # the cut is LAZY and the moved-count action materializes it —
        # the count's full scan computes and caches every partition, so
        # one driver action per round does both jobs the previous
        # eager-cut + limit(1)-probe pair did (bounded: one long to the
        # driver).
        # AQE policy scope (r15, SSA_LOOP_AQE — session.py): the round's
        # plans execute at these two statements, so the scope around
        # them covers the whole round's planning; default is a no-op.
        with loop_aqe_scope(spark):
            updated = lineage_cut(updated, chain=rnd, eager=False)
            this_round_ids = persistent_rdd_ids(spark) - _before
            # bounded: one long to the driver (convergence decision)
            changed = updated.filter("moved").count()
        # the new checkpoint is materialized — last round's blocks are dead
        unpersist_rdds(spark, prev_round_ids)
        prev_round_ids = this_round_ids
        labels = updated.select("id", "label")
        if changed == 0:
            break
    else:
        # labels are NOT a fixpoint here and would mismatch the
        # transitive-closure oracle — surface it loudly
        import warnings

        warnings.warn(
            "duplicate_clusters: propagation hit the 64-round bound "
            "without converging despite path doubling; labels are NOT "
            "a fixpoint",
            RuntimeWarning,
            stacklevel=2,
        )
    # the converged labels are a checkpoint of their own — the edge list
    # (and every pre-final round, already dropped above) is no longer
    # reachable from the result, so release it now. BOTH releases are
    # needed: Dataset-level unpersist evicts the CacheManager entry under
    # the persist strategy (so a later identical pairs plan re-persists
    # instead of hitting a storage-level-NONE cache entry — r7 review
    # finding), while the RDD-id diff frees the localCheckpoint blocks
    # the CacheManager never tracked (r8, ADVICE — under
    # SSA_MATERIALIZE=local_checkpoint the Dataset call alone is a
    # no-op). Each is a no-op in the other's mode; unpersist_rdds is
    # already-freed-safe. The final round's checkpoint stays alive for
    # the consumer and is reclaimed by the caller's post-action cleanup
    edges.unpersist()
    unpersist_rdds(spark, edges_rdd_ids)
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    min_cosine: float = 0.3,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: sign-LSH bucket candidates + exact cosine.

    Bucket = sign bits of ``n_planes`` fixed hyperplane projections
    (2^n_planes buckets); pairs are generated only within a bucket —
    equality-join shuffle, not O(n²). Recall is tunable via multi-probe /
    more plane sets; precision is exact (cosine verified).
    """
    planes = TH.hyperplanes(n_planes)
    bucket = " + ".join(
        f"(CASE WHEN {TH.spark_dot_lit(vec_col, p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    e = emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.expr(bucket).alias("bucket"),
        F.expr(f"sqrt({TH.spark_dot(vec_col, vec_col)})").alias("norm"),
    )
    a, b = e.alias("a"), e.alias("b")
    cos = F.expr(f"{TH.spark_dot('a.' + vec_col, 'b.' + vec_col)}") / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= min_cosine)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.bucket").cast("long").alias("bucket"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def contamination_check(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 4,
    eval_fraction: float = 0.05,
    salt: str = "decontam",
    max_df: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: train docs sharing an n-gram with the
    eval split (the training-pipeline step that keeps test sets out of
    training data).

    The eval set is carved out by the same deterministic salted-hash
    split as :mod:`.split` (reproducible, engine-portable, append-
    stable). Collisions come from an inverted-index equality join on the
    k-word shingle — the same candidate discipline as
    :func:`ngram_jaccard_pairs`, with the same optional ``max_df``
    stop-shingle cap for 100 TB corpora (a shingle in "every" doc adds
    no decontamination signal and dominates the join). Per contaminated
    train doc: how many distinct shingles collide and how many distinct
    eval docs they hit.
    """
    from spark_stream_analyzer_spark.operators.split import N_BUCKETS, hash_bucket

    thresh = int(eval_fraction * N_BUCKETS)
    base = with_words(df, text_col).select(
        F.col(id_col).alias("doc_id"),
        (hash_bucket(id_col, salt) < thresh).alias("is_eval"),
        F.expr(TH.spark_shingles("words", shingle_k)).alias("sh"),
    )
    # materialize the postings ONCE, already partitioned on the shingle
    # key: plain exchange-reuse does not fire here because Catalyst
    # pushes the is_eval filters below the repartition, making the two
    # subtrees differ — the checkpoint (same precedent as simhash_pairs)
    # runs the explode once, and both filtered sides inherit the hash
    # partitioning, so the train×eval join adds NO further shuffle
    # (verified in tests/test_plan_shapes.py). At 100 TB the two-phase
    # form writes the postings table instead.
    post = materialize(
        base.select("doc_id", "is_eval", F.explode("sh").alias("s")).repartition("s"),
        eager=False,
    )
    if max_df is not None:
        keep = post.groupBy("s").count().filter(F.col("count") <= max_df).select("s")
        post = post.join(keep, "s")
    ev = post.filter(F.col("is_eval")).select("s", F.col("doc_id").alias("eval_id"))
    tr = post.filter(~F.col("is_eval")).select("s", "doc_id")
    return tr.join(ev, "s").groupBy("doc_id").agg(
        F.countDistinct("s").cast("long").alias("n_shared"),
        F.countDistinct("eval_id").cast("long").alias("n_eval_docs"),
    )


def write_signature_index(
    df: DataFrame, path: str, text_col: str = "text", shingle_k: int = 3
) -> None:
    """Persist the MinHash signature index (the two-phase / incremental
    dedup pattern for large corpora).

    At 100 TB, recomputing shingles+signatures for the WHOLE corpus on
    every dedup run is the dominant cost; production pipelines compute
    signatures once per document and store them. The index holds
    ``doc_id, sh, band0..band{B-1}`` — everything
    :func:`lsh_pairs_against_index` needs, nothing else.
    """
    (
        minhash_signatures(df, text_col, shingle_k)
        .select("doc_id", "sh", *[f"band{b}" for b in range(TH.LSH_BANDS)])
        .write.mode("overwrite")
        .parquet(path)
    )


def _band_posts(sig: DataFrame) -> DataFrame:
    return sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("bi"), F.col(f"band{b}").alias("bk"))
                for b in range(TH.LSH_BANDS)
            ])
        ).alias("band"),
    ).select("doc_id", "band.bi", "band.bk")


def lsh_pairs_against_index(
    spark,
    new_docs: DataFrame,
    index_path: str,
    min_jaccard: float = 0.02,
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Near-dup pairs of a NEW batch against a persisted signature index
    — the incremental (daily-ingest) dedup shape.

    Candidates come from new-batch bands ⋈ index bands (an equality
    join whose left side is batch-sized, so the whole run costs
    O(batch + matching-bucket rows), never O(corpus²) and never a
    corpus rescan); exact shingle-set Jaccard verifies candidates using
    the stored ``sh`` arrays. Pairs are (new doc, index doc); append
    the new batch's signatures to the index afterwards (same
    :func:`write_signature_index` output schema) to keep it current —
    new×new pairs then surface on the next run, or immediately by
    indexing the batch before querying it.

    Returns ``doc_a``/``doc_b`` with ``doc_a`` = the new document.
    """
    idx = spark.read.parquet(index_path)
    new_sig = materialize(
        minhash_signatures(new_docs, text_col, shingle_k).select(
            "doc_id", "sh", *[f"band{b}" for b in range(TH.LSH_BANDS)]
        ),
        eager=False,
    )
    cand = (
        _band_posts(new_sig)
        .alias("a")
        .join(
            _band_posts(idx).alias("b"),
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = new_sig.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = idx.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.when(union == 0, F.lit(1.0)).otherwise(inter.cast("double") / union)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= min_jaccard)
        .select(
            "doc_a",
            "doc_b",
            inter.cast("long").alias("n_shared"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def chunk_exact_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_w: int = 5,
) -> DataFrame:
    """Chunk-level exact dedup: per doc, how much of it is verbatim
    repeated in OTHER docs (the scalable approximation of suffix-array
    exact-substring dedup used on web corpora — fixed-width chunk
    hashing instead of arbitrary-length substring matching).

    Normalized words are cut into non-overlapping ``chunk_w``-word
    chunks (trailing partial dropped), each hashed to the md5-60bit key.
    A chunk counts as duplicated iff the same hash occurs in >= 2
    DISTINCT docs — repeats inside one doc don't count (that is
    :func:`text.repetition_stats`'s job). Output per doc: distinct-chunk
    count, cross-doc duplicated-chunk count, and the dup ratio.

    Scale shape: one scan -> explode (Generate, no shuffle) -> distinct
    (doc, chunk-hash) pairs (one shuffle on a uniform 60-bit key) ->
    per-hash doc counts by reusing that SAME partitioning (groupBy on a
    prefix of the distinct key — no second exchange) -> broadcast-sized
    rejoin? No: the rejoin is hash-on-hash, the exchange the distinct
    already produced. Never quadratic: a chunk shared by d docs costs d
    rows, not d^2 pairs.
    """
    n_chunks = f"(size(words) div {chunk_w})"
    chunks = (
        f"case when {n_chunks} >= 1 then "
        f"transform(sequence(1, {n_chunks}),"
        f" i -> array_join(slice(words, (i - 1) * {chunk_w} + 1, {chunk_w}), ' ')) "
        "else array() end"
    )
    doc_chunks = (
        with_words(df, text_col)
        .select(id_col, F.explode(F.expr(chunks)).alias("chunk"))
        .select(id_col, F.expr(TH.spark_hash60("chunk")).alias("ch"))
        .distinct()
    )
    # docs-per-chunk: groupBy on ch reuses the distinct's (doc_id, ch)
    # hash partitioning only if keys align; ch alone re-shuffles — accept
    # ONE extra exchange of the deduped (small) pair set, never of docs.
    per_chunk = doc_chunks.groupBy("ch").agg(F.count("*").alias("n_docs_with"))
    per_doc = (
        doc_chunks.join(per_chunk, "ch")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("n_docs_with") >= 2).cast("int")).alias("n_dup_chunks"),
        )
    )
    base = df.select(id_col)
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).cast("long").alias("n_dup_chunks"),
            F.round(
                F.when(
                    F.coalesce("n_chunks", F.lit(0)) == 0, F.lit(0.0)
                ).otherwise(
                    F.coalesce("n_dup_chunks", F.lit(0)).cast("double")
                    / F.col("n_chunks")
                ),
                6,
            ).alias("dup_ratio"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    min_containment: float = 0.04,
    shingle_k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric n-gram containment pairs: C(A→B) = |A∩B| / |A|.

    Containment is what catches doc-in-doc duplication (quotes,
    boilerplate wrappers, article+comments supersets) that symmetric
    Jaccard under-scores: a 50-shingle doc fully embedded in a
    5000-shingle doc has C = 1.0 but Jaccard ≈ 0.01. Same inverted-index
    physical shape as :func:`ngram_jaccard_pairs` (one postings
    exchange reused by the cap, both self-join sides, and the sizes),
    same ``max_df`` stop-shingle guard; only the scoring differs —
    both directions are emitted and the filter keeps pairs where
    EITHER direction clears the threshold.
    """
    docs = with_words(df, text_col).select(
        "doc_id", F.expr(TH.spark_shingles("words", shingle_k)).alias("sh")
    )
    post = docs.select("doc_id", F.explode("sh").alias("s")).repartition("s")
    if max_df is not None:
        keep = post.groupBy("s").count().filter(F.col("count") <= max_df).select("s")
        post = post.join(keep, "s")
    sizes = post.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pairs = (
        post.alias("a")
        .join(post.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    c_a = F.col("n_shared").cast("double") / F.col("na")
    c_b = F.col("n_shared").cast("double") / F.col("nb")
    return (
        pairs.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .filter(F.greatest(c_a, c_b) >= min_containment)
        .select(
            "doc_a",
            "doc_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(c_a, 6).alias("containment_a"),
            F.round(c_b, 6).alias("containment_b"),
        )
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_w: int = 5,
) -> DataFrame:
    """Maximal cross-doc duplicated SPANS — exact-substring dedup in the
    Lee et al. 2022 sense ("Deduplicating Training Data Makes Language
    Models Better": find and cut every verbatim substring shared across
    documents), re-expressed as sliding-gram coverage islands instead of
    a distributed suffix array.

    Every word position ``i`` contributes the sliding ``gram_w``-gram
    starting there; a position is COVERED iff that gram occurs in >= 2
    distinct docs.  Any verbatim shared substring of ``>= gram_w`` words
    covers all of its window starts, so the union of covered windows is
    exactly the duplicated text, and maximal duplicated spans fall out
    as islands of covered positions — two covered positions belong to
    one span iff their windows touch (``pos - prev <= gram_w``), which
    makes the spans disjoint and their word counts exact (no
    double-counting where windows overlap).

    Output per doc: ``n_words``, ``n_spans`` (maximal duplicated spans),
    ``longest_span_words``, ``dup_words`` (exact union size), and
    ``dup_word_ratio`` — the removal budget a span-cutting pass would
    free.  :func:`chunk_exact_duplicates` is the cheap non-overlapping
    variant (chunk-count ratios, no span geometry).

    Scale shape (identical discipline to the chunk form): one scan ->
    posexplode sliding grams (~n_words rows, Generate under codegen) ->
    distinct (doc, gram-hash) -> per-hash doc counts -> positions
    rejoin on the uniform 60-bit hash -> per-DOC windows (partitioned by
    doc_id — never a global window) over the covered subset only.  A
    gram shared by d docs costs d rows, never d^2; boilerplate grams
    shared by millions of docs stay one aggregate row + one join hit per
    occurrence.
    """
    base, spans = _span_intervals(df, text_col, id_col, int(gram_w))
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.max(F.col("p1") - F.col("p0") + 1).alias("longest_span_words"),
        F.sum(F.col("p1") - F.col("p0") + 1).alias("dup_words"),
    )
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.col("n_words").cast("long").alias("n_words"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("longest_span_words", F.lit(0))
        .cast("long")
        .alias("longest_span_words"),
        F.coalesce("dup_words", F.lit(0)).cast("long").alias("dup_words"),
        F.round(
            F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
                F.coalesce("dup_words", F.lit(0)).cast("double") / F.col("n_words")
            ),
            6,
        ).alias("dup_word_ratio"),
    )


def _span_intervals(
    df: DataFrame, text_col: str, id_col: str, w: int
) -> tuple[DataFrame, DataFrame]:
    """Shared core of :func:`duplicated_spans` / :func:`span_cleaned_docs`:
    returns ``(base(id, n_words), spans(id, sid, p0, p1))`` — the maximal
    duplicated word intervals per doc (1-based, inclusive)."""
    # one md5 per WORD, then each sliding gram's 62-bit key is a double
    # Horner chain over the word hashes (texthash.spark_gram_hash) —
    # pure int64 arithmetic per position instead of a per-gram
    # slice+join+md5 (measured 2.5× faster end-to-end at sf0.1, and the
    # per-word hash count is n_words, not n_words × w characters)
    gh_arr = (
        f"case when n_words >= {w} then "
        f"transform(sequence(1, n_words - {w} + 1),"
        f" i -> {TH.spark_gram_hash('hw', 'i', w)}) "
        "else array() end"
    )
    # The repartition sits BETWEEN the word-hash projection and the gram
    # projection on purpose: an Exchange is the one boundary
    # CollapseProject cannot cross.  In a single projection Catalyst
    # inlines the `hw` transform into EVERY element_at reference of the
    # Horner chains — the whole-array md5 transform re-evaluated 10×
    # per position (measured: the collapsed form ran minutes, not
    # seconds, at sf0.1).  The exchange also roots the subtree for both
    # consumers (`base`, `pos_grams` — ReuseExchange, same discipline as
    # lsh_duplicate_pairs) and spreads a few-file corpus before the
    # per-position arithmetic.
    words_hw = (
        with_words(df, text_col)
        .withColumn("hw", F.expr(TH.spark_word_hashes("words")))
        .select(id_col, F.size("words").alias("n_words"), "hw")
    )
    words = words_hw.repartition(id_col).select(
        id_col, "n_words", F.expr(gh_arr).alias("ghs")
    )
    base = words.select(id_col, "n_words")
    # posexplode_OUTER, not posexplode: InferFiltersFromGenerate rewrites
    # a non-outer generate into a pushed-down `size(ghs) > 0 AND
    # isnotnull(ghs)` scan filter with the WHOLE ghs expression inlined —
    # and since ghs references hw, that inlines the per-word md5
    # transform into all 10 element_at sites of the Horner chains,
    # re-hashing every word 10x per doc in an interpreted Filter
    # (measured: minutes instead of seconds at sf0.1).  The rule skips
    # outer generates; the short-doc null rows it emits are dropped
    # right here, above the Generate.
    pos_grams = (
        words.select(id_col, F.posexplode_outer("ghs").alias("pos0", "gh"))
        .filter(F.col("gh").isNotNull())
        .select(id_col, (F.col("pos0") + 1).alias("pos"), "gh")
    )
    per_gh = (
        pos_grams.select(id_col, "gh")
        .distinct()
        .groupBy("gh")
        .agg(F.count("*").alias("n_docs_with"))
        .filter(F.col("n_docs_with") >= 2)
    )
    covered = pos_grams.join(per_gh, "gh").select(id_col, "pos").distinct()
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    flagged = covered.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(wdoc) <= w, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn(
        "sid",
        F.sum("brk").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = flagged.groupBy(id_col, "sid").agg(
        F.min("pos").alias("p0"),
        (F.max("pos") + F.lit(w - 1)).alias("p1"),
    )
    return base, spans


def span_cleaned_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_w: int = 5,
) -> DataFrame:
    """The CUT half of exact-substring dedup: re-emit each document with
    every cross-doc duplicated span (as found by
    :func:`duplicated_spans`) removed — the boilerplate-stripping pass a
    training-data pipeline runs after the span finder.

    Policy: covered spans are cut from EVERY doc (the
    repeated-boilerplate treatment); canonical-copy retention is
    :func:`duplicate_clusters` + :func:`dedup_survivors`' job at the
    whole-doc level.  Output per doc: original word count, kept word
    count, and the md5-60 fingerprint of the cleaned text (normalized
    words joined by single spaces) — enough for an engine-independent
    bit-exact comparison without shipping the corpus through the driver.

    Scale shape: the span set per doc is tiny (an aggregate of the
    covered subset), so it is collect_list'd per doc and joined back to
    the words relation on doc_id — one hash join, no window over the
    full corpus; the per-row cut is a codegen'd filter over the words
    array against the doc's own span list.
    """
    w = int(gram_w)
    _, spans = _span_intervals(df, text_col, id_col, w)
    spans_per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("p0", "p1")).alias("spans")
    )
    base = with_words(df, text_col).select(
        id_col, F.col("words"), F.size("words").alias("n_words")
    )
    joined = base.join(spans_per_doc, id_col, "left")
    # the size(words) >= 1 guard matters: Spark's sequence(1, 0) is a
    # DESCENDING [1, 0] (implicit step -1), and element_at(words, 0)
    # then errors under ANSI — empty docs must short-circuit to array()
    kept_words = (
        "case when size(words) >= 1 then "
        "filter(transform(sequence(1, size(words)), i ->"
        " struct(i AS i, element_at(words, i) AS w)),"
        " x -> spans IS NULL OR NOT exists(spans,"
        " s -> x.i >= s.p0 AND x.i <= s.p1)) "
        "else array() end"
    )
    cleaned = joined.withColumn(
        "kept", F.expr(f"transform({kept_words}, x -> x.w)")
    ).withColumn("cleaned_text", F.array_join("kept", " "))
    return cleaned.select(
        id_col,
        F.col("n_words").cast("long").alias("n_words"),
        F.size("kept").cast("long").alias("n_kept_words"),
        F.expr(TH.spark_hash60("cleaned_text")).alias("cleaned_fp"),
    )


# ------------------------------------------------------------- SemDeDup


def semdedup_keep_list(
    emb: DataFrame,
    assign: DataFrame,
    tau: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-native semantic dedup —
    cluster with k-means, prune within-cluster by cosine, keep the
    representative FARTHEST from the centroid.  No LSH band tuning: the
    coarse quantizer localizes comparisons, so cross-cluster pairs are
    never formed BY CONSTRUCTION (the pair join is an equi-join on
    ``cluster_id`` — plan-lint's CartesianProduct ban plus the
    test-pinned join condition prove it).

    Pinned deterministic rule (oracle-reproducible):

    1. centroid(c) = per-dimension mean of the FINAL cluster members,
       round6-quantized (same grid as :func:`..operators.similarity.
       kmeans_assign` uses between Lloyd's rounds);
    2. rank members by (cos(v, centroid) ASC, id ASC) — rank 1 is the
       least-centroid-like member, SemDeDup's preferred representative;
    3. prune member i iff some j with rank(j) < rank(i) has
       cos(i, j) >= tau.

    Scale shape: the centroid table is k rows (broadcast join back);
    the rank window partitions by cluster (never a single reducer); the
    pair comparison is within-cluster only and runs as a LEFT SEMI join
    (the prune rule is an EXISTS), so the candidate bound is
    O(sum c_i^2) worst case but each row stops at its first qualifying
    better-ranked neighbor and no pair row is ever materialized — the
    published trade: more clusters => smaller c_i.  All cosines use the
    pinned left-fold double dot product (bit-exact DuckDB twin).
    """
    from spark_stream_analyzer_spark.operators.similarity import (
        centroid_arrays,
    )

    e = emb.select(F.col(id_col), F.col(vec_col)).join(assign, id_col)
    # final-cluster centroids: the shared round6 assembly (one contract
    # with the kmeans forms and their oracles), plus the centroid norm
    # computed ONCE per cluster in the k-row table — not per member row
    cent = centroid_arrays(e, "cluster_id", vec_col, "_cent").withColumn(
        "_cnrm", F.expr(f"sqrt({TH.spark_dot('_cent', '_cent')})")
    )
    scored = (
        e.join(F.broadcast(cent), "cluster_id")
        # per-row norm computed ONCE and carried into the pair join
        # (recomputing both norms per pair would triple the dominant
        # within-cluster pair cost)
        .withColumn("_nrm", F.expr(f"sqrt({TH.spark_dot(vec_col, vec_col)})"))
        .withColumn(
            "_cos_c",
            F.expr(TH.spark_dot(vec_col, "_cent"))
            / (F.col("_nrm") * F.col("_cnrm")),
        )
        .withColumn(
            "_rnk",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.asc("_cos_c"), F.asc(id_col)
                )
            ),
        )
    )
    a = scored.select(
        "cluster_id",
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
        F.col("_nrm").alias("_na"),
        F.col("_rnk").alias("_ra"),
    )
    # the right side renames cluster_id too: a self-join equality on the
    # SAME attribute resolves trivially true (Spark dedups the lineage)
    # and silently degrades to a cross join — the exact all-pairs shape
    # this operator exists to avoid
    b = scored.select(
        F.col("cluster_id").alias("_cb"),
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
        F.col("_nrm").alias("_nb"),
        F.col("_rnk").alias("_rb"),
    )
    pair_cos = F.expr(TH.spark_dot("_va", "_vb")) / (
        F.col("_na") * F.col("_nb")
    )
    # rule 3 is an EXISTS — "some better-ranked j with cos >= tau" — so
    # run it as a LEFT SEMI join with the whole predicate in the join
    # condition (r15, guide §2.4/§3): the pair stream is never
    # materialized, each probe row stops at its FIRST qualifying match
    # (measured 2.8x on this stage at sf0.1 — 1373/2000 rows prune, so
    # early-exit bites), and the DISTINCT exchange the pair-projection
    # form needed disappears.  Same equi-join key (cluster_id = _cb), so
    # the zero-cross-cluster plan pin holds unchanged; identical pruned
    # set by construction (EXISTS semantics, same pinned left-fold
    # cosine compared to the same tau).
    pruned = b.join(
        a,
        (F.col("cluster_id") == F.col("_cb"))
        & (F.col("_ra") < F.col("_rb"))
        & (pair_cos >= tau),
        "left_semi",
    ).select(F.col("_idb").alias(id_col))
    return (
        scored.join(pruned.withColumn("_pruned", F.lit(True)), id_col, "left")
        .select(
            id_col,
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.round("_cos_c", 6).alias("centroid_cos"),
            F.coalesce(~F.col("_pruned"), F.lit(True)).alias("kept"),
        )
    )


def cross_corpus_lsh_pairs(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    min_jaccard: float = 0.02,
    shingle_k: int = 3,
) -> DataFrame:
    """TWO-SIDED MinHash-LSH near-dup JOIN (r13) — the text twin of the
    embedding corpus×corpus ANN join: for two distinct corpora (a new
    crawl snapshot vs the existing corpus, a train set vs a benchmark
    dump), every (a, b) pair sharing at least one LSH band bucket,
    exact-Jaccard verified.  This is the cross-snapshot contamination /
    ingest-vs-corpus shape :func:`lsh_duplicate_pairs` (within-corpus,
    ``doc_a < doc_b``) and :func:`incremental index <index_minhash_bands>`
    (tiny-batch-vs-index) both do not cover: BOTH sides fact-scale, so
    the candidate join is a plain (band_idx, band_key) equality SHUFFLE
    join — never a broadcast of a corpus, never all-pairs.

    Scale notes: signatures are computed per side (at 100 TB the two
    corpora are different tables — one scan each, map-only); the
    within-bucket cost is |A_bucket|·|B_bucket| — the hot-band audit
    (:func:`lsh_hot_band_stats` over each side) names degenerate
    buckets, and the production guards are the same knobs the
    within-corpus row pins: more bands/rows, or star-reduction of
    audited hot buckets before the join.  No ``doc_a < doc_b``
    constraint applies across corpora; ids may even collide (the pair
    is (corpus-A id, corpus-B id), not an unordered set).
    """
    def _bands(df: DataFrame, out: str, sh_out: str):
        sig = minhash_signatures(df, text_col, shingle_k).select(
            F.col("doc_id").alias(out),
            F.col("sh").alias(sh_out),
            *[f"band{b}" for b in range(TH.LSH_BANDS)],
        )
        bands = sig.select(
            out,
            F.explode(
                F.array(*[
                    F.struct(F.lit(b).alias("bi"), F.col(f"band{b}").alias("bk"))
                    for b in range(TH.LSH_BANDS)
                ])
            ).alias("band"),
        ).select(out, "band.bi", "band.bk")
        return sig.select(out, sh_out), bands

    sig_a, bands_a = _bands(docs_a, "doc_a", "sh_a")
    sig_b, bands_b = _bands(docs_b, "doc_b", "sh_b")
    cand = (
        bands_a.join(bands_b, ["bi", "bk"])
        .select("doc_a", "doc_b")
        .distinct()
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.when(union == 0, F.lit(1.0)).otherwise(inter.cast("double") / union)
    return (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= min_jaccard)
        .select(
            "doc_a",
            "doc_b",
            inter.cast("long").alias("n_shared"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
