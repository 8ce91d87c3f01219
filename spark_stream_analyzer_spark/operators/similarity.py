"""Similarity-search operators over embedding columns (EXT).

``array<float>`` embeddings → cosine top-k, two physical strategies:

* **brute force** — broadcast the (small) query set, one scan over the
  corpus computing JVM-side fold dot products, per-query top-k via a
  ranked window. Exact; at 100 TB this is the gold standard to measure
  ANN recall against, and is itself scan-parallel (the only shuffle is
  the tiny per-query top-k).
* **sign-LSH (IVF-style)** — bucket both sides by fixed hyperplane sign
  bits, equality-join on bucket, rank within. Sub-linear candidate sets;
  recall tunable via plane count / multi-probe. This is the 100 TB path.

Dot products are left-fold doubles (texthash.spark_dot) — bit-identical
to the DuckDB oracle's list_reduce, so ranking order matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_stream_analyzer_spark.functions import texthash as TH


def _with_norm(emb: DataFrame, vec_col: str) -> DataFrame:
    return emb.withColumn("norm", F.expr(f"sqrt({TH.spark_dot(vec_col, vec_col)})"))


def cosine_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k for rows matching ``query_pred``.

    Ties break on neighbor id (deterministic for the oracle).
    """
    e = _with_norm(emb, vec_col)
    q = e.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    cos = F.expr(TH.spark_dot("qvec", vec_col)) / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc(id_col))
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cos_raw", cos)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "rank",
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


def hard_triplet_mining(
    emb: DataFrame,
    anchor_pred: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """EXT hard-triplet mining for contrastive / metric-learning data
    prep: for each anchor, the HARDEST POSITIVE (same label, minimum
    cosine — the farthest in-class example) and the HARDEST NEGATIVE
    (different label, maximum cosine — the closest out-of-class
    example), plus the triplet margin and whether the triplet is
    violated (negative at least as close as the positive).

    Physical shape: broadcast the anchor set, ONE corpus scan computing
    fold-dot cosines, then a single map-side-combinable
    ``groupBy(anchor)`` with struct-ordered min/max — no per-anchor
    window, no second shuffle. Ties break on neighbor id ascending via
    the struct's second field (negated for the max side). At 100 TB the
    anchor count is the broadcast knob and the ANN rows
    (:func:`lsh_topk`, :func:`ivf_topk`, :func:`jl_rerank_recall_audit`)
    are the candidate-generation scale path; this exact form is the
    recall gold standard, same contract as :func:`cosine_topk`.
    """
    e = _with_norm(emb, vec_col)
    q = e.filter(anchor_pred).select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col(label_col).alias("anchor_label"),
    )
    cos = F.expr(TH.spark_dot("qvec", vec_col)) / (F.col("qnorm") * F.col("norm"))
    same = F.col(label_col) == F.col("anchor_label")
    cand = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("anchor_id"))
        .withColumn("cos_raw", cos)
    )
    # struct-ordered extrema: (cos, id) min → lowest cosine then lowest
    # id; (cos, -id) max → highest cosine then lowest id.
    pos = F.when(same, F.struct(F.col("cos_raw").alias("c"), F.col(id_col).alias("i")))
    neg = F.when(
        ~same, F.struct(F.col("cos_raw").alias("c"), (-F.col(id_col)).alias("ni"))
    )
    agg = cand.groupBy("anchor_id", "anchor_label").agg(
        F.min(pos).alias("p"), F.max(neg).alias("n")
    )
    # left-join the extrema back onto the anchor set: an anchor with no
    # candidate at all (single-row corpus) must still surface as an
    # all-NULL row, mirroring the oracle's LEFT JOIN from q (ADVICE r11).
    # The hint rides the RIGHT side — a left-outer join can only build
    # (broadcast) its right side; agg is anchor-bounded (≤ one row per
    # anchor), so it is the legal tiny side.
    agg = q.select("anchor_id", "anchor_label").join(
        F.broadcast(agg), ["anchor_id", "anchor_label"], "left"
    )
    return agg.select(
        "anchor_id",
        F.col("anchor_label").cast("int").alias("anchor_label"),
        F.col("p.i").alias("pos_id"),
        F.round("p.c", 6).alias("pos_cos"),
        (-F.col("n.ni")).cast("long").alias("neg_id"),
        F.round("n.c", 6).alias("neg_cos"),
        F.round(F.col("p.c") - F.col("n.c"), 6).alias("margin"),
        (F.col("n.c") >= F.col("p.c")).cast("int").alias("is_violation"),
    )


def lsh_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN cosine top-k: candidates restricted to the query's LSH bucket.

    Same output shape as :func:`cosine_topk`; neighbors outside the
    bucket are missed by design (recall/sped-up trade). The bucket join
    is a plain equality shuffle → scales linearly in corpus size.
    """
    planes = TH.hyperplanes(n_planes)
    bucket = " + ".join(
        f"(CASE WHEN {TH.spark_dot_lit(vec_col, p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    e = _with_norm(emb, vec_col).withColumn("bucket", F.expr(bucket))
    q = e.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    cos = F.expr(TH.spark_dot("qvec", vec_col)) / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc(id_col))
    return (
        e.join(F.broadcast(q), (F.col("bucket") == F.col("qbucket")) & (F.col(id_col) != F.col("query_id")))
        .withColumn("cos_raw", cos)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.col("bucket").cast("long").alias("bucket"),
            "rank",
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


def lsh_multiprobe_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe sign-LSH top-k: each query probes its own bucket PLUS
    the n_planes single-bit-flip neighbor buckets (the hyperplanes the
    vector is closest to are the likeliest sign errors).

    Recall recovers most of what single-bucket LSH loses at ~(1+n_planes)×
    the candidate volume — still an equality join on (probe bucket), never
    a scan of the corpus per query.
    """
    planes = TH.hyperplanes(n_planes)
    bucket = " + ".join(
        f"(CASE WHEN {TH.spark_dot_lit(vec_col, p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    e = _with_norm(emb, vec_col).withColumn("bucket", F.expr(bucket))
    probes = F.array(
        F.col("bucket"),
        *[F.expr(f"int(bucket) ^ {1 << i}") for i in range(n_planes)],
    )
    q = (
        e.filter(query_pred)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.col("norm").alias("qnorm"),
            F.explode(probes).alias("probe"),
        )
    )
    cos = F.expr(TH.spark_dot("qvec", vec_col)) / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc(id_col))
    return (
        e.join(F.broadcast(q), (F.col("bucket") == F.col("probe")) & (F.col(id_col) != F.col("query_id")))
        .withColumn("cos_raw", cos)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "rank",
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means assignment after ``iters`` rounds — the training
    step of an IVF coarse quantizer for ANN at scale.

    Deterministic by construction: init centroids are the first ``k``
    vectors by id (no RNG); recomputed centroids are quantized to 6
    decimals each round so the oracle's independently-computed means land
    on the same grid. Per round: one scan for assignment (distances to k
    broadcast-as-literal centroids, argmin with id tie-break), one
    posexplode shuffle for the (cluster, dim) means, and a k×dim collect
    to the driver — the same driver-sized exchange MLlib's k-means does;
    data rows never leave executors. Empty clusters drop out (standard
    Lloyd's behavior).
    """
    e = emb.select(F.col(id_col), F.col(vec_col))
    # first k rows BY ORDER of id — not `id < k`, which silently
    # under-seeds when the id space is sparse (e.g. post-filter corpora)
    init = e.orderBy(id_col).limit(k).collect()
    cents: dict[int, list[float]] = {int(r[0]): [float(x) for x in r[1]] for r in init}
    dim = len(next(iter(cents.values())))
    assign = None
    for t in range(iters):
        structs = [
            f"struct({TH.spark_l2sq_lit(vec_col, cents[cid])} AS d,"
            f" CAST({cid} AS BIGINT) AS c)"
            for cid in sorted(cents)
        ]
        amin = F.expr(f"array_min(array({', '.join(structs)}))")
        assign = e.withColumn("cluster_id", amin["c"])
        if t < iters - 1:
            means = (
                assign.select("cluster_id", F.posexplode(vec_col).alias("dim", "v"))
                .groupBy("cluster_id", "dim")
                .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("c"))
            ).collect()  # bounded: k x dim centroid rows (the kmeans exchange)
            by_cid: dict[int, dict[int, float]] = {}
            for r in means:
                by_cid.setdefault(int(r.cluster_id), {})[int(r.dim)] = float(r.c)
            cents = {cid: [d[i] for i in range(dim)] for cid, d in by_cid.items()}
    return assign.select(id_col, "cluster_id")


def centroid_arrays(
    assigned: DataFrame,
    key_col: str = "cluster_id",
    vec_col: str = "embedding",
    out_col: str = "cvec",
) -> DataFrame:
    """Distributed round6-quantized centroid means, re-assembled as
    arrays: (key, dim) means -> ROUND(.., 6) -> sorted collect_list.

    This expression is a CROSS-IMPLEMENTATION CONTRACT: the kmeans
    oracles, the SemDeDup oracle, and the k=8 cross-form parity test
    all depend on the exact round6 grid and dim ordering — it lives in
    one place so an edit cannot silently diverge one consumer (r10
    review: it had been restated in three)."""
    return (
        assigned.select(key_col, F.posexplode(vec_col).alias("dim", "x"))
        .groupBy(key_col, "dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("c"))
        .groupBy(key_col)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, c))), s -> s.c)"
            ).alias(out_col)
        )
    )


def kmeans_assign_join(
    emb: DataFrame,
    k: int = 64,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's assignment for LARGE k — the scalable twin of
    :func:`kmeans_assign`.

    The literal-expression form inlines k centroid-distance structs into
    ONE codegen expression: perfect for the 8-cell oracle rows, but at
    production k (thousands — the "k grows with N" regime SemDeDup and
    IVF live in) the expression blows past codegen limits and every k
    re-plans the query. This form keeps centroids as DATA:

    * distances via a broadcast join against the k-row centroid table
      (``BroadcastNestedLoopJoin`` over a provably k-bounded side — the
      N x k pair stream is the algorithm's irreducible work, and it
      flows through one shuffle-free stage);
    * argmin per vector = ``min(struct(dist, cid))`` — a plain
      map-side-combinable aggregate, NO window;
    * per-round centroid recompute stays DISTRIBUTED: (cluster, dim)
      means -> round6 quantization -> arrays rebuilt via sorted
      collect_list of k x dim rows — unlike :func:`kmeans_assign`, no
      k x dim driver exchange; only the k seed vectors ever reach the
      driver (init, bounded by construction).

    Same pinned semantics as :func:`kmeans_assign` (id-seeded init,
    round6-quantized means, (dist, cid) tie-break), so the unrolled
    DuckDB oracle form is identical modulo k.
    """
    if iters < 1:
        raise ValueError("kmeans_assign_join needs iters >= 1")
    e = emb.select(F.col(id_col), F.col(vec_col))
    # init: first k vectors by id — k rows to the driver (bounded: the
    # seed set), the only driver exchange in this variant
    init = e.orderBy(id_col).limit(k).collect()
    spark = emb.sparkSession
    # cid = the seed vector's id (kmeans_assign's id-seeded naming)
    cents = spark.createDataFrame(
        [(int(r[0]), [float(x) for x in r[1]]) for r in init],
        "cid long, cvec array<double>",
    )
    # r15 (guide §4.2): the per-pair squared-L2 runs as the Arrow-batched
    # FOLD-ORDER-EXACT kernel instead of the interpreted HOF fold —
    # bit-identical by construction (functions/veckernels.py pins the
    # left-fold add chain; property-tested), same join/argmin shape, one
    # ArrowEvalPython stage between the N x k join and the aggregate.
    # Time-paired at sf0.1: 1.27 -> 1.00 s median per assignment round
    # (the join+sort machinery floor is ~0.4 s of that); the precondition
    # (non-null array elements) holds for the embedding columns and the
    # mean-derived centroids by schema/construction.
    from spark_stream_analyzer_spark.functions.veckernels import arrow_l2sq

    dist = arrow_l2sq(vec_col, "cvec")
    assign = None
    for t in range(iters):
        pairs = e.join(F.broadcast(cents)).withColumn("_d", dist)
        assign = (
            pairs.groupBy(id_col)
            .agg(F.min(F.struct(F.col("_d"), F.col("cid"))).alias("_m"))
            .select(id_col, F.col("_m.cid").alias("cluster_id"))
        )
        if t < iters - 1:
            cents = centroid_arrays(
                assign.join(e, id_col), "cluster_id", vec_col, "cvec"
            ).select(F.col("cluster_id").alias("cid"), "cvec")
    return assign


def ivf_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    n_cells: int = 8,
    iters: int = 2,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: search the query's ``nprobe`` nearest k-means cells.

    The coarse quantizer is :func:`kmeans_assign`; candidates come from
    an equality join on cell id (same scale shape as sign-LSH, but cells
    adapt to the data distribution — better recall per probe on
    clustered corpora). ``nprobe=1`` probes only the query's own cell;
    ``nprobe>1`` adds its next-nearest cells by centroid distance
    (centroids = per-cell means of the final assignment, an
    n_cells×dim-sized broadcast), the standard IVF recall knob — probe
    cost grows linearly in nprobe, never in corpus size.
    """
    cells = kmeans_assign(emb, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col)
    e = _with_norm(emb, vec_col).join(cells, id_col)
    q = e.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col("cluster_id").alias("qcell"),
    )
    if nprobe > 1:
        # per-cell centroid vectors (tiny: n_cells rows), broadcast to
        # rank every cell per query; the query's own cell always probes
        # first (rank 0 via the is-own-cell flag) for nprobe=1 parity
        cents = (
            e.select("cluster_id", F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("cluster_id", "dim")
            .agg(F.avg(F.col("v").cast("double")).alias("c"))
            .groupBy("cluster_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "c"))
                ).alias("dc")
            )
            .select(
                F.col("cluster_id").alias("probe_cell"),
                F.expr("transform(dc, x -> x.c)").alias("cvec"),
            )
        )
        l2 = (
            "aggregate(zip_with(qvec, cvec, (x, y) -> "
            "(cast(x as double) - y) * (cast(x as double) - y)), "
            "cast(0 as double), (acc, v) -> acc + v)"
        )
        w_probe = Window.partitionBy("query_id").orderBy(
            F.desc(F.col("probe_cell") == F.col("qcell")),
            F.asc("d2"),
            F.asc("probe_cell"),
        )
        probes = (
            q.join(F.broadcast(cents))
            .withColumn("d2", F.expr(l2))
            .withColumn("pr", F.row_number().over(w_probe))
            .filter(F.col("pr") <= nprobe)
            .select("query_id", "qvec", "qnorm", "probe_cell")
        )
        join_cond = (F.col("cluster_id") == F.col("probe_cell")) & (
            F.col(id_col) != F.col("query_id")
        )
    else:
        probes = q.select("query_id", "qvec", "qnorm", F.col("qcell").alias("probe_cell"))
        join_cond = (F.col("cluster_id") == F.col("probe_cell")) & (
            F.col(id_col) != F.col("query_id")
        )
    cos = F.expr(TH.spark_dot("qvec", vec_col)) / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc(id_col))
    return (
        e.join(F.broadcast(probes), join_cond)
        .withColumn("cos_raw", cos)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.col("cluster_id").cast("long").alias("cell"),
            "rank",
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


def label_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid stats via posexplode → (label, dim) mean.

    The explode shuffles |rows|×dim small records on a uniform key — at
    100 TB prefer dim-chunked Summarizer-style partial aggregation, but
    the shape (no collect, bounded output = |labels|×dim) already scales.
    """
    exploded = emb.select(
        label_col, F.posexplode(vec_col).alias("dim", "v")
    )
    per_dim = exploded.groupBy(label_col, "dim").agg(
        F.avg(F.col("v").cast("double")).alias("mean_v")
    )
    return per_dim.groupBy(label_col).agg(
        F.round(F.sqrt(F.sum(F.col("mean_v") * F.col("mean_v"))), 6).alias("centroid_norm"),
        F.count("*").cast("long").alias("n_dims"),
    )


def quantize_int8(emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Per-vector int8 scalar quantization with reconstruction stats.

    The storage-compression half of an ANN index build (IVF-SQ8 style):
    symmetric per-vector scale = max(|x|)/127, codes =
    round-half-up(x/scale), plus quantization MSE so recall impact is
    measurable. ``floor(x/scale + 0.5)`` rather than ``round()`` because
    the two engines disagree on rounding mode at exact .5 while floor on
    identical doubles is bit-deterministic. Pure per-row vector
    expressions — one scan, no shuffle; at 100 TB the codes column is
    what ships to the index (4× smaller than float32), the floats stay
    in cold storage.
    """
    maxabs = f"array_max(transform({vec_col}, x -> abs(cast(x as double))))"
    df = emb.withColumn("scale_raw", F.expr(f"{maxabs} / 127.0d"))
    df = df.withColumn(
        "codes",
        F.expr(
            f"case when scale_raw = 0d then transform({vec_col}, x -> 0) "
            f"else transform({vec_col}, x -> "
            "cast(floor(cast(x as double) / scale_raw + 0.5d) as int)) end"
        ),
    )
    sq_err = (
        f"aggregate(zip_with({vec_col}, codes, "
        "(x, c) -> (cast(x as double) - c * scale_raw) * (cast(x as double) - c * scale_raw)), "
        "cast(0 as double), (acc, v) -> acc + v)"
    )
    return df.select(
        id_col,
        F.size(vec_col).cast("long").alias("dim"),
        F.round("scale_raw", 6).alias("scale"),
        F.expr("aggregate(codes, cast(0 as bigint), (acc, c) -> acc + c)").alias("code_sum"),
        F.expr("array_min(codes)").cast("long").alias("code_min"),
        F.expr("array_max(codes)").cast("long").alias("code_max"),
        F.round(F.expr(sq_err) / F.size(vec_col), 6).alias("mse"),
    )


def write_ann_index(
    emb: DataFrame,
    path: str,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the sign-LSH ANN index, PARTITIONED BY bucket.

    The serving-side pattern: index once, query many times. Bucket
    partitioning means a query batch touches only its probe buckets'
    files — partition pruning does the candidate restriction before any
    row is read, so query cost is O(probed buckets), independent of
    corpus size. Stored: id, vector, norm, bucket.
    """
    planes = TH.hyperplanes(n_planes)
    bucket = " + ".join(
        f"(CASE WHEN {TH.spark_dot_lit(vec_col, p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    (
        _with_norm(emb, vec_col)
        .withColumn("bucket", F.expr(bucket))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def ann_topk_against_index(
    spark,
    queries: DataFrame,
    index_path: str,
    k: int = 3,
    n_planes: int = 6,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors for a query batch against a persisted ANN index.

    Queries are bucketed with the same hyperplanes (and, with
    ``multiprobe``, the single-bit-flip neighbor buckets); the join
    against the bucket-partitioned index is an equality join whose index
    side prunes to the probed partitions. Query ids share the id space
    of the index (self-matches are excluded).
    """
    planes = TH.hyperplanes(n_planes)
    bucket = " + ".join(
        f"(CASE WHEN {TH.spark_dot_lit(vec_col, p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    idx = spark.read.parquet(index_path)
    q = _with_norm(queries, vec_col).withColumn("qb", F.expr(bucket))
    probes = (
        F.array(F.col("qb"), *[F.expr(f"int(qb) ^ {1 << i}") for i in range(n_planes)])
        if multiprobe
        else F.array(F.col("qb"))
    )
    q = q.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.explode(probes).alias("probe"),
    )
    cos = F.expr(TH.spark_dot("qvec", vec_col)) / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc(id_col))
    return (
        idx.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("probe")) & (F.col(id_col) != F.col("query_id")),
        )
        .withColumn("cos_raw", cos)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "rank",
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


def pq_recall_audit(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    k: int = 10,
    n_queries: int = 32,
    recall_floor: float = 0.06,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_offset: int = 0,
    emit: str = "verdict",
    expected_recall: float = 0.2,
    band: float = 0.12,
) -> DataFrame:
    """Product quantization end-to-end + measured recall vs exact search
    — one verdict row (the memory-compression half of IVF-PQ ANN).

    The vector splits into ``m`` subvectors; each subspace trains its own
    ``ksub``-centroid codebook (deterministic Lloyd's: init = first ksub
    rows by id, means quantized to 6 decimals — same discipline as
    :func:`kmeans_assign`), so a d-dim float32 vector compresses to m
    bytes (here 64 floats -> 4 codes, 64x). Queries score candidates via
    ADC: per query a tiny m x ksub distance table is computed ONCE
    (driver-side here, a broadcast at scale) and the per-row approximate
    distance is m table lookups on the stored codes — no float math per
    candidate. The audit takes the first ``n_queries`` vectors by id,
    compares ADC top-k against exact L2 top-k (rounded-6 distances,
    id tie-break on both sides), and emits recall@k with a
    ``recall_ok`` verdict bit.

    Scale notes: codebook training is O(iters * m) scans here but runs
    on a bounded SAMPLE at real scale (PQ codebooks need ~100k vectors
    regardless of corpus size); encoding is ONE scan emitting m small
    ints per row; ADC scoring is scan + per-query TopK — the same
    no-all-pairs discipline as every ANN operator in this module. The
    driver exchange is m * ksub * sub_dim floats — KBs, like the k-means
    centroid step.

    ``recall_floor`` derivation (round-4, replacing the round-3 ratchet):
    the floor is pinned from a MEASURED distribution, not the first
    number that passed. With ksub=16, k=10 and disjoint 32-query batches
    at offsets {0,32,64} per corpus, recall@10 measured

    * sf0.001: 0.231 / 0.172 / 0.206   (nq=100: 0.204)
    * sf0.01:  0.241 / 0.144 / 0.153   (nq=100: 0.178)
    * sf0.1:   0.156 / 0.081 / 0.075   (nq=100: 0.105)

    Worst observed batch = 0.075 (sf0.1 — recall@k falls as N grows, so
    the largest corpus is the hard case). Floor = 0.06 ≈ worst − 1σ
    (batch σ ≈ 0.015 by the binomial bound √(p(1−p)/320)), and ≥ 60×
    the random-ranking baseline k/N (≈ 1e-3 at sf0.01). ``recall_ok``
    is the COLLAPSE gate; the ``recall_in_band`` column is the finer
    regression meter the r4/r5 verdicts asked for: 1 iff
    ``|recall − expected_recall| < band``. The round-6 form emitted
    ``floor(recall·5)/5`` pinned to 0.2, but the measured 0.241@sf0.01
    sat only 0.041 above the bucket edge — a benign float-summation or
    corpus shift would flip the gate red without a real regression
    (round-7 advice). The band is instead CENTERED on the per-corpus
    measured value (callers pass it; registry maps sf dir → measured
    recall), so benign drift tolerance is the half-width (lower edge clamped
    to 0.6x expected — r7 review: a plain symmetric band at
    sf0.1's 0.156 center would reach below recall/2) while a
    halved recall exits the band at every corpus and turns the
    driver row red. Raw-number tracking still uses
    ``emit="recall"`` via tools/scale_probe.py.
    """
    e = emb.select(F.col(id_col), F.col(vec_col))
    # bounded: ksub + n_queries rows (codebook seed + query set)
    init = e.orderBy(id_col).limit(max(ksub, query_offset + n_queries)).collect()
    dim = len(init[0][1])
    sub_d = dim // m
    sl = {j: f"slice({vec_col}, {j * sub_d + 1}, {sub_d})" for j in range(m)}
    # per-subspace codebooks: position-indexed centroid lists
    cbs: list[list[list[float]]] = [
        [[float(x) for x in r[1][j * sub_d : (j + 1) * sub_d]] for r in init[:ksub]]
        for j in range(m)
    ]

    def _code_expr(j: int) -> str:
        structs = ", ".join(
            f"struct({TH.spark_l2sq_lit(sl[j], cbs[j][p])} AS d,"
            f" {p} AS c)"
            for p in range(len(cbs[j]))
        )
        return f"array_min(array({structs})).c"

    for t in range(iters - 1):
        for j in range(m):
            means = (
                e.withColumn("code", F.expr(_code_expr(j)))
                .select("code", F.posexplode(F.expr(sl[j])).alias("dm", "v"))
                .groupBy("code", "dm")
                .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("c"))
            ).collect()  # bounded: ksub x subdim codebook rows
            by_code: dict[int, dict[int, float]] = {}
            for r in means:
                by_code.setdefault(int(r.code), {})[int(r.dm)] = float(r.c)
            cbs[j] = [
                [by_code[p][i] for i in range(sub_d)] if p in by_code else cbs[j][p]
                for p in range(len(cbs[j]))
            ]

    coded = e.select(
        F.col(id_col),
        F.col(vec_col),
        *[F.expr(_code_expr(j)).alias(f"code{j}") for j in range(m)],
    )
    queries = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in init[query_offset : query_offset + n_queries]
    ]

    # ALL queries score in ONE scan per side (ADC + exact): the query set
    # rides the plan as a literal array<struct> exploded per row, so
    # n_queries costs one generator rather than 2·n separate scans
    # unioned (the pre-round-4 shape, which capped n_queries at 3 for
    # cost — and a 3-query recall estimate is a coin flip: measured
    # per-3-query-batch recall spans 0.0–0.3 on identical data).
    def _dlit(vals: list[float]) -> str:
        return "array(" + ", ".join(f"cast({float(v)!r} as double)" for v in vals) + ")"

    adc_structs = []
    for qid, qvec in queries:
        dtabs = [
            [
                sum(
                    (a - b) * (a - b)
                    for a, b in zip(qvec[j * sub_d : (j + 1) * sub_d], c)
                )
                for c in cbs[j]
            ]
            for j in range(m)
        ]
        adc_structs.append(
            f"struct(cast({qid} as bigint) AS qid, "
            + ", ".join(f"{_dlit(dtabs[j])} AS t{j}" for j in range(m))
            + ")"
        )
    adc_d = " + ".join(f"element_at(q.t{j}, code{j} + 1)" for j in range(m))
    adc_all = (
        coded.select(
            F.col(id_col),
            *[f"code{j}" for j in range(m)],
            F.explode(F.expr("array(" + ", ".join(adc_structs) + ")")).alias("q"),
        )
        .filter(F.col(id_col) != F.col("q.qid"))
        .select(
            F.col("q.qid").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.round(F.expr(adc_d), 6).alias("d"),
        )
    )
    exact_structs = ", ".join(
        f"struct(cast({qid} as bigint) AS qid, {_dlit(qvec)} AS v)"
        for qid, qvec in queries
    )
    exact_all = (
        e.select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(F.expr(f"array({exact_structs})")).alias("q"),
        )
        .filter(F.col(id_col) != F.col("q.qid"))
        .select(
            F.col("q.qid").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.round(
                F.expr(
                    f"aggregate(zip_with({vec_col}, q.v, "
                    "(a, b) -> (cast(a as double) - b) * (cast(a as double) - b)), "
                    "0.0d, (acc, x) -> acc + x)"
                ),
                6,
            ).alias("d"),
        )
    )

    def _topk(u):
        w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
        return (
            u.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id")
        )

    hits = _topk(adc_all).join(_topk(exact_all), ["query_id", "neighbor_id"])
    if emit == "recall":
        # diagnostic form — raw recall@k, used by tools/scale_probe.py and
        # the offline floor-derivation sweep (never by the verdict row)
        return hits.agg(
            (F.count("*").cast("double") / float(len(queries) * k)).alias("recall")
        )
    recall = F.count("*").cast("double") / float(len(queries) * k)
    return hits.agg(
        F.lit(len(queries)).cast("long").alias("n_queries"),
        F.lit(k).cast("long").alias("k"),
        (recall >= recall_floor).cast("int").alias("recall_ok"),
        # banded regression meter beside the collapse bit (r4/r5 verdict
        # task, r7 advice re-cut): the pipeline is fully deterministic
        # (fixed init, rounded-6 Lloyd's, id tie-breaks), so on a fixed
        # corpus the measured recall is exactly reproducible — the gate
        # is centered on it with the half-width as the upward/benign
        # drift margin, and the LOWER edge additionally clamped to
        # 0.6x expected so a halved recall exits the band at EVERY
        # corpus (a plain symmetric band loses low-side sensitivity
        # when expected - band < expected/2, e.g. 0.156 - 0.1 at
        # sf0.1 — r7 review finding)
        (
            (recall < F.lit(expected_recall + band))
            & (recall >= F.lit(max(expected_recall - band, 0.6 * expected_recall)))
        )
        .cast("int")
        .alias("recall_in_band"),
    )


def rank_fusion(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 5,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked retrieval lists.

    The standard hybrid-retrieval combiner (Cormack et al.'s RRF):
    ``score = Σ_lists 1 / (rrf_k + rank)``, missing-from-a-list
    contributes 0. Inputs are (query_id, neighbor_id, rank, ...) frames
    such as :func:`cosine_topk` / :func:`lsh_topk` output; result is the
    fused top-``k`` per query with deterministic neighbor-id tie-breaks.

    Scale shape: a full outer join on (query_id, neighbor_id) between two
    k-bounded lists — at most 2k rows per query ever shuffle, so fusion
    cost is query-set-bounded no matter the corpus size; the expensive
    part stays inside the retrievers, which are bucketed/broadcast as
    documented on each.
    """
    a = ranked_a.select("query_id", "neighbor_id", F.col("rank").alias("rank_a"))
    b = ranked_b.select("query_id", "neighbor_id", F.col("rank").alias("rank_b"))
    fused = (
        a.join(b, ["query_id", "neighbor_id"], "full_outer")
        .withColumn(
            "rrf_score",
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_b")), F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("neighbor_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "fused_rank",
            F.round("rrf_score", 6).alias("rrf_score"),
        )
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random sign projection (round 11)
# ---------------------------------------------------------------------------

#: Deterministic sign-matrix parameters — integer arithmetic both Spark
#: and DuckDB evaluate bit-identically (no RNG, no engine hash).
JL_MULT_A = 2654435761  # Knuth multiplicative constant
JL_MULT_B = 40503
JL_MOD = 97


def jl_sign_sql(d_expr: str, j: int) -> str:
    """±1 sign of projection row ``d`` (1-based), output dim ``j`` — a
    SQL fragment valid in BOTH Spark SQL and DuckDB (plain integer ``%``
    on non-negative operands), so the oracle reconstructs the identical
    matrix."""
    return (
        f"(CASE WHEN (({d_expr} * {JL_MULT_A} + {j * JL_MULT_B}) "
        f"% {JL_MOD}) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
    )


def random_sign_projection(
    emb: DataFrame,
    out_dim: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a
    deterministic Rademacher (±1) sign matrix: ``r_j = (1/sqrt(k)) ·
    Σ_d x_d · s(d, j)``.

    The JL workhorse of an embedding pipeline at 100 TB: cut 768-d
    vectors to k dims BEFORE the ANN index / pairwise stages so their
    shuffle and state scale with k, not D. Sign projections are
    distance-preserving in expectation (E[‖Px‖²] = ‖x‖², the Achlioptas
    construction) with distortion ~1/√k per pair.

    Scale shape: one whole-row higher-order-function fold per output
    dim — per-row JVM expressions, NO shuffle, NO explode (a
    posexplode+groupBy formulation would exchange D·k rows per vector),
    NO Python. The fold is sequential over the array, so the float sum
    order is deterministic. The sign matrix is pure integer arithmetic
    (``jl_sign_sql``) — no broadcast side data, and the oracle rebuilds
    it exactly.
    """
    inv = 1.0 / float(out_dim) ** 0.5
    comps = [
        (
            F.expr(
                f"aggregate(sequence(1, size({vec_col})), CAST(0.0 AS DOUBLE), "
                f"(acc, d) -> acc + CAST(element_at({vec_col}, d) AS DOUBLE)"
                f" * {jl_sign_sql('d', j)})"
            )
            * inv
        ).alias(f"r{j}")
        for j in range(out_dim)
    ]
    return emb.select(id_col, *comps)


def jl_rerank_recall_audit(
    emb: DataFrame,
    out_dim: int = 8,
    m: int = 32,
    k: int = 5,
    n_queries: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    expected_recall: float | None = None,
    band: float = 0.12,
) -> DataFrame:
    """Measured recall of the JL-coarse → full-dim-rerank ANN pipeline —
    one verdict row (the follow-through on random_sign_projection's
    promise that downstream ANN can run in k dims).

    Pipeline under audit: project corpus + queries to ``out_dim`` dims
    (deterministic sign matrix), take the top-``m`` candidates per query
    by PROJECTED cosine (the cheap scan — at 100 TB this is the stage
    whose cost drops D/k-fold), then rerank ONLY those m candidates with
    full-dimension cosine and keep top-``k``. Recall@k vs exact
    full-dim brute force, self-matches excluded, ties broken by id on
    both sides — fully deterministic, so the measured recall is
    pinnable per corpus.

    Scale shape: both top-k stages are scan + per-query TopK over a
    broadcast query set (no all-pairs); the rerank touches m·n_queries
    full vectors — a key-bounded join, not a scan. The driver sees one
    verdict row.
    """
    e = _with_norm(emb, vec_col)
    pred = F.col(id_col) < n_queries
    truth = cosine_topk(emb, pred, k=k, id_col=id_col, vec_col=vec_col)

    proj = random_sign_projection(
        emb, out_dim=out_dim, vec_col=vec_col, id_col=id_col
    ).select(
        id_col, F.array(*[F.col(f"r{j}") for j in range(out_dim)]).alias("pvec")
    )
    cand = cosine_topk(proj, pred, k=m, id_col=id_col, vec_col="pvec")

    qv = e.filter(pred).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    cv = e.select(F.col(id_col), F.col(vec_col), F.col("norm"))
    cos = F.expr(TH.spark_dot("qvec", vec_col)) / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_full"), F.asc(id_col))
    approx = (
        cand.select("query_id", "neighbor_id")
        .join(cv, F.col("neighbor_id") == F.col(id_col))
        .join(F.broadcast(qv), "query_id")
        .withColumn("cos_full", cos)
        .withColumn("rrank", F.row_number().over(w))
        .filter(F.col("rrank") <= k)
        .select("query_id", "neighbor_id")
    )
    hits = approx.join(truth.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]).count()
    # bounded: the audit's working sets are n_queries*k rows; one number
    recall = hits / float(n_queries * k)
    n_corpus = emb.count()  # bounded: one scalar — sizes the random baseline
    # a RANDOM m-candidate set would score recall ~ m/N; the collapse
    # floor requires the projection to beat random by >= 2x (measured:
    # 3.1x at sf0.001, 7.5x at sf0.01, 12.7x at sf0.1 — the advantage
    # GROWS with N, exactly the regime the pipeline exists for)
    ok = 1 if recall >= 2.0 * m / max(n_corpus, 1) else 0
    if expected_recall is None:
        in_band = 1 if recall >= 0.3 else 0  # lenient drift meter
    else:
        lo = max(expected_recall - band, 0.6 * expected_recall)
        in_band = 1 if lo <= recall <= expected_recall + band else 0
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(n_queries, k, m, out_dim, round(recall, 6), ok, in_band)],
        "n_queries long, k long, m long, out_dim long, recall double,"
        " recall_ok int, recall_in_band int",
    )


def top_pc_power_iteration(
    emb: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal component by distributed power iteration — the
    data-driven dimensionality-reduction primitive beside the JL
    projection (data-independent) and whitening (diagonal-only).

    Never materializes the D×D covariance: each iteration computes
    ``s_i = x̃_i·v`` (per-vector dot against the broadcast iterate) and
    ``w_d = Σ_i x̃_{i,d}·s_i`` (one bounded groupBy(dim) — D combined
    rows), i.e. two map-side-combinable aggregates over the exploded
    (vec, dim, value) stream, which is materialized ONCE. Only the
    D-float iterate crosses the driver per round (the k-means-centroid
    exchange discipline), re-entering as literals.

    Determinism contract (what makes the DuckDB oracle bit-matchable):
    the per-dim centering means and the iterate are ROUND6-quantized
    after every normalization, so both engines run the next iteration
    with IDENTICAL constants — float drift cannot compound across
    iterations (same discipline as kmeans_assign's round6 centroids).
    v0 = 1/√D = 0.125 exactly at D=64.
    """
    from spark_stream_analyzer_spark.functions.materialize import materialize

    dim = len(emb.select(vec_col).first()[0])  # bounded: one row, D known
    means = (
        emb.select(F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("m"))
        .collect()  # bounded: D rows — the centering constants
    )
    mean = [0.0] * dim
    for r in means:
        mean[r.dim] = r.m
    xc = materialize(
        emb.select(
            id_col,
            F.posexplode(vec_col).alias("dim", "raw"),
        ).select(
            id_col,
            "dim",
            (
                F.col("raw").cast("double")
                - F.element_at(
                    F.array(*[F.lit(m) for m in mean]), F.col("dim") + 1
                )
            ).alias("xc"),
        )
    )
    v = [round(1.0 / dim**0.5, 6)] * dim
    lam = 0.0
    for _ in range(iters):
        vlit = F.array(*[F.lit(c) for c in v])
        s = xc.groupBy(id_col).agg(
            F.sum(
                F.col("xc") * F.element_at(vlit, F.col("dim") + 1)
            ).alias("s")
        )
        w_rows = (
            xc.join(s, id_col)
            .groupBy("dim")
            .agg(F.sum(F.col("xc") * F.col("s")).alias("w"))
            .collect()  # bounded: D rows — the next iterate
        )
        w = [0.0] * dim
        for r in w_rows:
            w[r.dim] = r.w
        lam = sum(x * x for x in w) ** 0.5
        v = [round(x / lam, 6) for x in w] if lam > 0 else v
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(d, v[d], round(lam, 6)) for d in range(dim)],
        "dim int, pc double, eigenvalue double",
    )


def logistic_regression_gd(
    emb: DataFrame,
    iters: int = 3,
    lr: float = 10.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """EXT distributed binary logistic regression by full-batch gradient
    descent — the supervised-learning loop completing the iterative
    family beside k-means (assignment), power-iteration PCA
    (eigenvector), and PageRank (fixpoint): a quality-classifier /
    domain-tagger trainer in pure DataFrame ops.

    y = label % 2.  Never materializes anything D×D: per step one
    per-vector dot against the broadcast weight vector (``z_i = x_i·w``),
    a per-row sigmoid, and one bounded ``groupBy(dim)`` gradient
    accumulate (``g_d = Σ_i (p_i − y_i)·x_{i,d} / n``) — two map-side-
    combinable aggregates over the exploded (vec, dim, value) stream,
    materialized ONCE.  Only the D-float weight vector crosses the
    driver per step (the k-means-centroid exchange discipline).

    Determinism contract (the PCA row's round6-iterate discipline
    applied to training): the sigmoid is ROUND6-quantized per row
    (absorbs libm exp drift) and the weights are round6-quantized per
    step, so both engines run every step with IDENTICAL constants; the
    whole loop is oracle-checked as unrolled CTE blocks.  w0 = 0
    exactly, so step 1's probabilities are exactly 0.5 on both engines.
    ACCEPTED RESIDUAL RISK (same class the PCA row documents, ADVICE
    r12): the per-row ``z = Σ x·w`` and the gradient SUM cross engines
    UNQUANTIZED — summation-order drift is absorbed by the round6
    quantization only while the value is not within ~1 ulp of a .5e-6
    boundary, and one early-step boundary flip would propagate.  The
    parity test therefore holds weights to abs=2e-6 rather than exact;
    the driver's hash-exact check has been green because D=64 fold sums
    land well clear of boundaries on this corpus — if it ever flips,
    this note is the diagnosis, not a new bug.
    Returns one row per dim: final weight, plus the training accuracy
    under the final weights (z round6-quantized before the ≥ 0
    decision) repeated per row — the PCA eigenvalue convention.
    """
    from spark_stream_analyzer_spark.functions.materialize import materialize

    head = emb.select(vec_col).first()  # bounded: one row, D known
    if head is None or head[0] is None:
        raise ValueError(
            "logistic_regression_gd: empty embeddings input — no dimension "
            "to train over (guard added per ADVICE r12)"
        )
    dim = len(head[0])
    n = emb.count()
    x = materialize(
        emb.select(
            id_col,
            (F.col(label_col) % 2).cast("double").alias("y"),
            F.posexplode(vec_col).alias("dim", "raw"),
        ).select(id_col, "y", "dim", F.col("raw").cast("double").alias("x"))
    )
    w = [0.0] * dim
    for _ in range(iters):
        wlit = F.array(*[F.lit(c) for c in w])
        p = x.groupBy(id_col, "y").agg(
            F.round(
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -F.sum(F.col("x") * F.element_at(wlit, F.col("dim") + 1))
                    )
                ),
                6,
            ).alias("p")
        )
        g_rows = (
            x.join(p.select(id_col, "p", F.col("y").alias("_py")), id_col)
            .groupBy("dim")
            .agg((F.sum((F.col("p") - F.col("_py")) * F.col("x")) / n).alias("g"))
            .collect()  # bounded: D rows — the next weight vector
        )
        g = [0.0] * dim
        for r in g_rows:
            g[r.dim] = r.g
        w = [round(w[d] - lr * g[d], 6) for d in range(dim)]
    # training accuracy under the FINAL weights, z quantized pre-decision
    wlit = F.array(*[F.lit(c) for c in w])
    acc_row = (
        x.groupBy(id_col, "y")
        .agg(
            F.round(
                F.sum(F.col("x") * F.element_at(wlit, F.col("dim") + 1)), 6
            ).alias("z6")
        )
        .select(
            ((F.col("z6") >= 0).cast("double") == F.col("y"))
            .cast("long")
            .alias("ok")
        )
        .agg(F.round(F.avg("ok"), 6).alias("acc"))
        .collect()[0]  # bounded: ONE row — the scalar training accuracy
    )
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(d, w[d], acc_row.acc) for d in range(dim)],
        "dim int, weight double, train_acc double",
    )


def mmr_rerank(
    emb: DataFrame,
    query_pred: Column,
    m: int = 4,
    pool: int = 8,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXT maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity step a retrieval pipeline runs AFTER the ANN
    candidate fetch: from each query's ``pool``-sized cosine top-k,
    greedily select ``m`` results maximizing
    ``lam * cos(q, d) - (1 - lam) * max_{s in S} cos(d, s)``
    (relevance minus redundancy against the already-selected set S).

    Determinism (the oracle contract): every downstream input is the
    ROUND6-quantized cosine — query-candidate from :func:`cosine_topk`,
    candidate-candidate quantized the same way — so both engines run
    the whole greedy loop on identical 6-decimal constants (the
    kmeans/BPE round6-iterate discipline applied to re-ranking); ties
    break on candidate id ascending via struct-ordered argmax.

    Scale shape: the corpus appears ONLY in the top-k scan and one
    broadcast-semi-join that extracts the candidates' vectors; the
    greedy loop runs on bounded tables (|queries| * pool candidates,
    |queries| * pool^2 pairs, both materialized once) with one
    struct-max aggregation per step — m and pool are the knobs, no
    driver crossing, no per-query window over the corpus.
    """
    from spark_stream_analyzer_spark.functions.materialize import materialize

    cand = materialize(
        cosine_topk(emb, query_pred, k=pool, id_col=id_col, vec_col=vec_col)
    )
    e = _with_norm(emb, vec_col)
    cvecs = e.join(
        F.broadcast(cand.select("query_id", "neighbor_id")),
        e[id_col] == F.col("neighbor_id"),
    ).select(
        "query_id",
        F.col("neighbor_id").alias("cid"),
        F.col(vec_col).alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    a = cvecs.select(
        "query_id",
        F.col("cid").alias("a"),
        F.col("cvec").alias("avec"),
        F.col("cnorm").alias("anorm"),
    )
    b = cvecs.select(
        "query_id",
        F.col("cid").alias("b"),
        F.col("cvec").alias("bvec"),
        F.col("cnorm").alias("bnorm"),
    )
    pair_cos = F.round(
        F.expr(TH.spark_dot("avec", "bvec")) / (F.col("anorm") * F.col("bnorm")), 6
    )
    pairs = materialize(
        a.join(b, "query_id")
        .where(F.col("a") != F.col("b"))
        .select("query_id", "a", "b", pair_cos.alias("pcos"))
    )

    def argmax(df: DataFrame, score: Column, idc: str, step: int) -> DataFrame:
        """Per-query (score desc, id asc) winner via struct-ordered max."""
        s = df.groupBy("query_id").agg(
            F.max(F.struct(score.alias("s"), (-F.col(idc)).alias("ni"))).alias(
                "_m"
            )
        )
        return s.select(
            "query_id",
            (-F.col("_m.ni")).cast("long").alias("sel_id"),
            F.col("_m.s").alias("score"),
            F.lit(step).alias("mmr_rank"),
        )

    # step 1: pure relevance
    sel = argmax(cand, F.col("cosine"), "neighbor_id", 1)
    for step in range(2, m + 1):
        rem = cand.join(
            sel.select("query_id", F.col("sel_id").alias("neighbor_id")),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
        red = (
            pairs.join(
                sel.select("query_id", F.col("sel_id").alias("b")),
                ["query_id", "b"],
            )
            .groupBy("query_id", F.col("a").alias("neighbor_id"))
            .agg(F.max("pcos").alias("maxsim"))
        )
        scored = rem.join(red, ["query_id", "neighbor_id"])
        mmr = F.lit(lam) * F.col("cosine") - F.lit(1.0 - lam) * F.col("maxsim")
        sel = sel.unionByName(
            argmax(scored, mmr, "neighbor_id", step)
        )
    return sel.select(
        "query_id",
        F.col("mmr_rank").cast("long").alias("mmr_rank"),
        F.col("sel_id").alias("vec_id"),
        F.round("score", 6).alias("score"),
    )


#: per-bucket row target for the AUTO plane knob (r13 verdict task 1):
#: expected rows per side per bucket after hashing — small enough that
#: the within-bucket quadratic stays a constant-size task, large enough
#: that a top-k query usually finds k candidates in its bucket.
AUTO_TARGET_BUCKET_ROWS = 16
#: clamp bounds for the derived knob: lo keeps tiny corpora from
#: degenerating to one bucket; hi only bounds the ORACLE-checkable
#: range at test SFs (the operator itself accepts any explicit knob).
AUTO_PLANES_LO = 4
AUTO_PLANES_HI = 30


def derive_n_planes(
    n_a: int,
    n_b: int,
    target_bucket_rows: int = AUTO_TARGET_BUCKET_ROWS,
    lo: int = AUTO_PLANES_LO,
    hi: int = AUTO_PLANES_HI,
) -> int:
    """Scale-safe sign-LSH plane count from the two corpus sizes
    (r13 verdict task 1 — the measured docstring contract made code):
    smallest p with 2**p buckets >= ceil(max(|A|,|B|) / target), clamped
    to [lo, hi].  With buckets ∝ N the expected candidate volume is
    sum over buckets of (N_A/B)(N_B/B) = N_A·N_B/B ∝ N·target — LINEAR
    in corpus size, where any FIXED knob is quadratic (the r13 100×
    probe measured 142× at a pinned 64 buckets and 29× faster once the
    knob scaled — SCALING.md r13).

    Pure INTEGER arithmetic (ceil-div + bit_length) so the DuckDB
    oracle twin (a CASE chain over powers of two) is exactly equal by
    construction — no float log2 boundary risk.
    """
    buckets_needed = -(-max(n_a, n_b, 1) // target_bucket_rows)
    p = (buckets_needed - 1).bit_length() if buckets_needed > 1 else 0
    return max(lo, min(hi, p))


def lsh_corpus_join_topk(
    emb_a: DataFrame,
    emb_b: DataFrame,
    k: int = 3,
    n_planes: int | str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket_rows: int = AUTO_TARGET_BUCKET_ROWS,
) -> DataFrame:
    """TWO-SIDED corpus×corpus ANN join (r12 verdict task 5) — dataset
    alignment / cross-corpus retrieval: for every vector of corpus A,
    its top-k cosine neighbors in corpus B, candidates restricted to
    the SHARED sign-LSH bucket.

    This is the one ANN shape :func:`lsh_topk` cannot serve: there the
    query side is small and broadcast; here BOTH sides are fact-scale,
    so the physical form is a plain equality SHUFFLE join on the bucket
    key — each side is hash-partitioned by bucket once, co-located
    bucket pairs meet on the reducers, and no executor ever sees more
    than its buckets' rows.  Never all-pairs, never a broadcast of a
    corpus, never a cartesian (plan-pinned by
    tests/test_plan_shapes.py::test_corpus_join_is_shuffle_equijoin).
    At 100 TB the bucket count (2^n_planes) is the skew knob — raise
    n_planes (or band like the MinHash path) until the hottest bucket
    fits a reducer; the within-bucket top-k window is per (query, rank),
    bounded by the bucket join's own output.

    Ties break on neighbor id ascending, same contract as every other
    top-k row.

    ``n_planes="auto"`` (the DEFAULT — r13 verdict task 1) derives the
    knob from the two corpus sizes via :func:`derive_n_planes` at the
    cost of two bounded one-row aggregates; pass an explicit int to pin
    a bucket count (the oracle-pinned driver rows do).  ``hyperplanes``
    is prefix-consistent (one seeded LCG), so auto at the same derived
    p is bit-identical to the fixed knob at that p.
    """
    if n_planes == "auto":
        # bounded: two one-row count aggregates, driver-side knob only
        n_planes = derive_n_planes(
            emb_a.count(), emb_b.count(), target_bucket_rows
        )
    planes = TH.hyperplanes(n_planes)
    bucket = " + ".join(
        f"(CASE WHEN {TH.spark_dot_lit(vec_col, p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    a = (
        _with_norm(emb_a, vec_col)
        .withColumn("bucket", F.expr(bucket))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.col("norm").alias("qnorm"),
            F.col("bucket"),
        )
    )
    b = (
        _with_norm(emb_b, vec_col)
        .withColumn("bucket", F.expr(bucket))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nvec"),
            F.col("norm").alias("nnorm"),
            F.col("bucket"),
        )
    )
    cos = F.expr(TH.spark_dot("qvec", "nvec")) / (F.col("qnorm") * F.col("nnorm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        a.join(b, "bucket")
        .withColumn("cos_raw", cos)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("bucket").cast("long").alias("bucket"),
            "rank",
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


def logistic_score(
    emb: DataFrame,
    weights: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """SERVING half of :func:`logistic_regression_gd` (r13) — apply a
    trained weight vector to score every embedding: the quality-filter /
    domain-tagger INFERENCE pass a curation pipeline runs over the full
    corpus after training on a sample.

    Physical shape: ONE scan, pure projection — the weight vector rides
    the plan as literals (D floats), the dot is the JVM-side sequential
    fold, no shuffle, no Python; embarrassingly parallel at any SF.

    Determinism: unlike the trainer's grouped gradient sums (whose
    cross-engine summation-order risk is documented on the train row),
    the serving dot is a SEQUENTIAL left fold over the array — both
    engines produce the bit-identical z, which is round6-quantized
    before the sigmoid; the only residual risk is libm exp's 1-ulp
    drift landing exactly on a .5e-6 rounding boundary of the score
    (the same accepted class as every sigmoid row).  The decision bit
    compares the quantized score to exactly-representable 0.5.
    """
    wlit = F.expr(TH.spark_dot_lit(vec_col, [float(w) for w in weights]))
    z6 = F.round(wlit, 6)
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z6)), 6)
    y = (F.col(label_col) % 2).cast("int")
    pred = (p >= 0.5).cast("int")
    return emb.select(
        id_col,
        y.alias("y"),
        z6.alias("z6"),
        p.alias("score"),
        pred.alias("predicted"),
        (pred == y).cast("int").alias("correct"),
    )
