"""Deterministic dataset splitting / sampling (EXT — training-data
pipeline ops beyond the reference, per the rebuild north star).

Random splits via ``rand()`` are useless for a corpus pipeline: they
change under re-runs, backfills, partition re-ordering, and engine
swaps. Everything here keys off a salted md5 of the row's stable id
(:mod:`..functions.texthash` hash60), which gives:

* **reproducibility** — same row → same bucket, on any engine (the
  DuckDB oracles run the identical md5 expression);
* **scale** — pure per-row map, no shuffle, no driver state; a 100 TB
  split is exactly as parallel as the scan that reads it;
* **stability under growth** — appending new rows never reassigns
  existing ones (the property ``randomSplit`` lacks).

The exact-size variant (``hash_rank_sample_k``) needs one shuffle per
stratum (a ranked window), which is the unavoidable price of an exact
count; at 100 TB prefer the fraction form unless exactness is a hard
requirement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_stream_analyzer_spark.functions import texthash as TH

#: bucket space for fraction→threshold conversion (0.1% granularity)
N_BUCKETS = 10_000


def hash_bucket(id_col: str, salt: str) -> Column:
    """Uniform bucket in [0, N_BUCKETS) from a salted md5 of the id.

    The salt namespaces independent decisions (split vs sample) so they
    are statistically independent of each other.
    """
    keyed = f"concat('{salt}:', cast({id_col} as string))"
    return F.expr(f"{TH.spark_hash60(keyed)} % {N_BUCKETS}")


def duck_hash_bucket(id_col: str, salt: str) -> str:
    """DuckDB twin of :func:`hash_bucket` (oracle side)."""
    keyed = f"concat('{salt}:', CAST({id_col} AS VARCHAR))"
    return f"({TH.duck_hash60(keyed)} % {N_BUCKETS})"


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Assign train/val/test by hash threshold (test = the remainder).

    Adds ``bucket`` and ``split`` columns. Stateless map — composes with
    any upstream filter without re-shuffling.
    """
    b = hash_bucket(id_col, salt)
    t1 = int(train * N_BUCKETS)
    t2 = int((train + val) * N_BUCKETS)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < t1, "train")
        .when(F.col("bucket") < t2, "val")
        .otherwise("test"),
    )


def stratified_hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    strata_col: str = "source",
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of each stratum, deterministically.

    The salt is combined with the stratum so per-stratum selections are
    independent; rows keep/drop independently of data order. The
    deterministic twin of ``df.sampleBy`` (which is seed-stable but not
    engine-portable or append-stable).
    """
    keyed = f"concat('{salt}:', {strata_col}, ':', cast({id_col} as string))"
    b = F.expr(f"{TH.spark_hash60(keyed)} % {N_BUCKETS}")
    return df.withColumn("bucket", b).filter(
        F.col("bucket") < int(fraction * N_BUCKETS)
    )


def hash_rank_sample_k(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    strata_col: str = "source",
    salt: str = "topk",
) -> DataFrame:
    """Exactly ``k`` rows per stratum: the k smallest salted hashes.

    A deterministic reservoir sample. One ranked window per stratum
    (hash shuffle on the stratum key; ties broken by id so the result is
    total-order stable). At scale the window's sort is per-stratum, and
    Spark's TopK (rank <= k) pushes the limit into the sort.
    """
    keyed = f"concat('{salt}:', cast({id_col} as string))"
    h = F.expr(TH.spark_hash60(keyed))
    w = Window.partitionBy(strata_col).orderBy(F.col("h"), F.col(id_col))
    return (
        df.withColumn("h", h)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("h", "rk")
    )


class ChunkWindowsUDTF:
    """Sliding-window document chunker as a Spark 4 Python UDTF (r8,
    verdict task 7) — the one Python-extension API class the engine
    didn't yet exercise (scalar UDF, Pandas UDF, mapInPandas,
    applyInPandasWithState, Python DataSource reader+writer are all
    covered elsewhere).

    One ``eval`` call per input row yields ~len/stride chunk rows:
    (doc_id, chunk_idx, chunk_len, chunk_hash), with chunk_hash the
    same md5-60bit the engine uses everywhere (so the DuckDB oracle is
    exact). Registered arrow-optimized (``useArrow=True``): inputs and
    emitted rows cross the Python boundary in Arrow batches, not
    pickled rows.

    Scale note — this is the EXTENSION-API demonstration, not the
    production path: the equivalent ``sequence``+``explode`` form
    (``doc_chunk_windows``) runs entirely inside whole-stage codegen
    with zero Python workers, and ``test_round8_ops.py`` pins both the
    row-level equality of the two forms and the plan difference
    (Generate inside WholeStageCodegen vs an ArrowEvalPythonUDTF
    boundary). Reach for a UDTF only when the fan-out logic genuinely
    can't be expressed in SQL expressions (tokenizers, parsers with
    state across yielded rows).
    """

    SIZE = 200
    STRIDE = 160

    def eval(self, doc_id, text):  # noqa: ANN001 — UDTF protocol
        import hashlib

        text = text or ""
        for idx, off in enumerate(
            range(0, max(len(text) - 1, 0) + 1, self.STRIDE)
        ):
            chunk = text[off : off + self.SIZE]
            h = int(hashlib.md5(chunk.encode("utf-8")).hexdigest()[:15], 16)
            yield doc_id, idx, len(chunk), h


CHUNK_UDTF_SCHEMA = (
    "doc_id bigint, chunk_idx bigint, chunk_len bigint, chunk_hash bigint"
)


def chunk_windows_udtf(df: DataFrame) -> DataFrame:
    """Apply :class:`ChunkWindowsUDTF` to (doc_id, text) rows via a
    LATERAL table-function join — the SQL surface a UDTF is built for.
    """
    from pyspark.sql.functions import udtf

    spark = df.sparkSession
    fn = udtf(ChunkWindowsUDTF, returnType=CHUNK_UDTF_SCHEMA, useArrow=True)
    spark.udtf.register("ssa_chunk_windows", fn)
    view = f"ssa_chunk_in_{abs(hash(tuple(df.columns))) % 10**8}"
    df.select("doc_id", "text").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT c.* FROM {view}, LATERAL ssa_chunk_windows(doc_id, text) c"
    )


def token_pack_shards(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    order_cols: list[Column] | None = None,
    budget: int = 2000,
    shard_col: str = "shard",
) -> DataFrame:
    """Pack documents into fixed token-budget shards (sequence-packing
    for training-data pipelines): shard = which budget-sized window the
    doc's FIRST token falls in, scanning docs in ``order_cols`` order.

    A naive global window (``Window.orderBy`` with no partition) moves
    the whole corpus through one reducer; this uses the same
    decomposition as :func:`..rank.global_rank`, generalized from
    row-count offsets to token-sum offsets:

    1. ``repartitionByRange`` on the total order (disjoint ordered
       ranges per partition);
    2. local running token sum inside each partition;
    3. add the broadcast per-partition token totals' prefix sum — the
       only single-partition step is a ≤ num-partitions-row window.

    Exact same result as the single-reducer window, one range shuffle +
    one tiny agg of cost. ``order_cols`` must be a total order.
    """
    d = token_start_offsets(df, tokens_col, order_cols, start_col="_start")
    return d.withColumn(
        shard_col,
        F.call_function("div", F.col("_start"), F.lit(int(budget)).cast("long")),
    ).drop("_start")


def token_start_offsets(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    order_cols: list[Column] | None = None,
    start_col: str = "start",
) -> DataFrame:
    """Global first-token offset of each doc when the corpus is
    concatenated in ``order_cols`` order — the exact two-pass prefix-sum
    decomposition documented on :func:`token_pack_shards` (range shuffle
    + local running sum + broadcast per-partition offsets; the only
    single-partition step is a ≤ num-partitions-row window)."""
    order_cols = order_cols if order_cols is not None else [F.col("doc_id")]
    d = df.repartitionByRange(*order_cols).withColumn("_pid", F.spark_partition_id())
    totals = d.groupBy("_pid").agg(F.sum(tokens_col).alias("_t"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off")
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    first_token_pos = (
        F.sum(tokens_col).over(w_local) + F.col("_off") - F.col(tokens_col)
    ).cast("long")
    return (
        d.join(F.broadcast(offsets), "_pid")
        .withColumn(start_col, first_token_pos)
        .drop("_pid", "_off")
    )


def sequence_pack_stats(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    seq_len: int = 256,
    id_col: str = "doc_id",
    order_cols: list[Column] | None = None,
) -> DataFrame:
    """EXT concat-and-chunk sequence packing (the GPT-style training
    layout: concatenate every doc's tokens — EOS included in
    ``tokens_col`` — in ``order_cols`` order, slice the stream into
    fixed ``seq_len``-token training sequences, docs SPLIT at sequence
    boundaries). Per-sequence occupancy stats:

    ``seq_id, n_docs`` (docs overlapping the sequence), ``n_doc_starts``
    (docs whose first token lands here), ``seq_tokens`` (= seq_len
    except the final partial sequence — packing has zero padding),
    ``first_doc_id, last_doc_id``.

    Physical shape: one range shuffle for the global prefix sum
    (:func:`token_start_offsets`), then each doc explodes into only the
    ceil(len/seq_len)+1 sequences it touches — output scales with
    corpus tokens / seq_len, never with doc pairs — and one map-side
    combinable ``groupBy(seq_id)``. Zero-token docs occupy no stream
    positions and are excluded from the span stats (callers that add an
    EOS token never produce one).
    """
    L = F.lit(int(seq_len)).cast("long")
    d = token_start_offsets(df, tokens_col, order_cols, start_col="_s")
    # zero-token rows contribute nothing to the stream: keep them in the
    # prefix sum above (0 tokens shift no offsets) but NOT in the span
    # explode — sequence(first, last) with last < first would silently
    # generate a DESCENDING range and corrupt the per-sequence stats
    d = d.where(F.col(tokens_col) > 0).withColumn(
        "_e", F.col("_s") + F.col(tokens_col).cast("long")
    )
    first_seq = F.call_function("div", F.col("_s"), L)
    last_seq = F.call_function("div", F.col("_e") - F.lit(1).cast("long"), L)
    spans = d.select(
        F.col(id_col),
        F.col("_s"),
        F.col("_e"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    lo = F.greatest(F.col("_s"), F.col("seq_id") * L)
    hi = F.least(F.col("_e"), (F.col("seq_id") + F.lit(1).cast("long")) * L)
    return spans.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("_s") >= F.col("seq_id") * L).cast("long")).alias(
            "n_doc_starts"
        ),
        F.sum(hi - lo).alias("seq_tokens"),
        F.min(id_col).alias("first_doc_id"),
        F.max(id_col).alias("last_doc_id"),
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    strata_col: str = "source",
    salt: str = "mixture",
) -> DataFrame:
    """Deterministic data mixing: sample each stratum so the OUTPUT
    composition matches ``weights``, using as much data as possible.

    The limiting stratum is the one with the least data relative to its
    weight; it is kept whole and every other stratum is downsampled to
    proportion. Selection per stratum = the k smallest salted id hashes
    (exact counts, deterministic, engine-portable) — the same ranked-
    window shape as :func:`hash_rank_sample_k`. The per-stratum counts
    cross the driver once as a |strata|-sized dict (broadcast back);
    rows never do. NOT append-stable by design: admitting new data
    changes the achievable mixture, so re-mixing is the correct
    behavior — pin the output by writing it, not by re-running.

    Strata absent from ``weights`` (or weighted 0) are dropped.
    """
    counts = {
        r[0]: r[1]
        # bounded: one row per stratum label (domain-bounded, not data)
        for r in df.groupBy(strata_col).count().collect()
        if r[0] in weights and weights[r[0]] > 0
    }
    if not counts:
        return df.filter(F.lit(False)).withColumn("mix_rank", F.lit(0).cast("long"))
    scale = min(counts[s] / weights[s] for s in counts)
    quota = [(s, int(weights[s] * scale)) for s in counts]
    quota_df = F.broadcast(
        df.sparkSession.createDataFrame(quota, f"{strata_col} string, _quota long")
    )
    keyed = f"concat('{salt}:', cast({id_col} as string))"
    w = Window.partitionBy(strata_col).orderBy(
        F.expr(TH.spark_hash60(keyed)), F.col(id_col)
    )
    return (
        df.join(quota_df, strata_col)
        .withColumn("mix_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("mix_rank") <= F.col("_quota"))
        .drop("_quota")
    )


def packed_sequences(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    text_col: str = "text",
    budget: int = 2000,
    sep: str = "\n\n",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize :func:`token_pack_shards` shards as training
    sequences: per shard, documents concatenated in id order.

    One groupBy on the shard id after the packing pass; per-group state
    is one shard's documents (~``budget`` tokens), so reducer memory is
    budget-bounded regardless of corpus size. ``array_sort`` on the
    (id, text) structs gives deterministic in-sequence order without a
    sort-within-groups shuffle.
    """
    shards = token_pack_shards(
        df, tokens_col=tokens_col, order_cols=[F.col(id_col)], budget=budget
    )
    parts = F.array_sort(F.collect_list(F.struct(F.col(id_col), F.col(text_col))))
    return shards.groupBy("shard").agg(
        F.array_join(F.transform(parts, lambda x: x[text_col]), sep).alias("sequence"),
        F.sum(tokens_col).cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_docs"),
    )


def weighted_hash_sample(
    df: DataFrame,
    weight_col: Column | str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Per-row Bernoulli sampling with per-ROW keep probability,
    deterministically (quality-weighted downsampling: keep p ∝ a score
    in [0, 1] computed from the row itself).

    ``P(keep) = clamp(weight, 0, 1)``, decided by comparing the row's
    salted-hash bucket against its own weight-scaled threshold — the
    weighted generalization of :func:`stratified_hash_sample` (which is
    this with a constant weight).  Same scale properties: pure per-row
    map, zero shuffle, append-stable, engine-portable.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    b = hash_bucket(id_col, salt)
    thresh = (F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0)) * N_BUCKETS).cast("long")
    return df.withColumn("bucket", b).filter(F.col("bucket") < thresh)
