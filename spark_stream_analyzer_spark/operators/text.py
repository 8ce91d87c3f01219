"""Text-analysis operators for the LLM-data-pipeline surface (EXT).

These are extensions beyond the reference engine (which has no text
processing — its only string ops are CSV splits, reference
``spark/SparkStreamingService.java:135,192``), required by the rebuild's
north star: language-ID, quality scoring, token counting, and document
fingerprinting over a ``documents(doc_id, text, lang, source, n_chars)``
table.

All operators are pure column expressions (whole-stage codegen, no UDFs,
no shuffle) — at 100 TB they are a single scan pass, trivially
partition-parallel. Every hash is the md5-derived 60-bit integer from
:mod:`..functions.texthash`, so each operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.functions import texthash as TH
from spark_stream_analyzer_spark.functions.materialize import materialize


def with_words(df: DataFrame, text_col: str = "text", out: str = "words") -> DataFrame:
    """Normalized word tokens: lower → strip non-alnum runs → split."""
    return df.withColumn(out, F.expr(TH.spark_norm_words(text_col)))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc counting + quality metrics.

    quality_score ∈ [0,1]: length credit (saturates at 50 words) +
    alnum-cleanliness + stopword-density credit — a deterministic stand-in
    for model-based quality filters, same shape as C4/Gopher-style rules.
    """
    df = with_words(df, text_col)
    n_words = F.size("words")
    # sum of word lengths without a higher-order fold (stays in codegen)
    word_len_sum = F.length(F.array_join("words", ""))
    n_tokens = F.expr(
        f"size(regexp_extract_all(lower({text_col}), '{TH.spark_escape(TH.TOKEN_PAT)}', 0))"
    )
    # symbol count as a length delta — avoids materializing a match array
    n_sym = F.length(F.lower(F.col(text_col))) - F.length(
        F.expr(f"regexp_replace(lower({text_col}), '[^a-z0-9\\\\s]', '')")
    )
    n_chars = F.length(text_col)
    en_hits = F.expr(TH.spark_stop_hits("words", TH.STOPWORDS["en"]))

    zero_guard = n_words == 0
    avg_word_len = F.when(zero_guard, F.lit(0.0)).otherwise(
        word_len_sum.cast("double") / n_words
    )
    sym_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        n_sym.cast("double") / n_chars
    )
    stop_ratio = F.when(zero_guard, F.lit(0.0)).otherwise(
        en_hits.cast("double") / n_words
    )
    quality = (
        F.lit(0.4) * F.least(n_words.cast("double") / 50.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(sym_ratio * 4.0, F.lit(1.0)))
        + F.lit(0.3) * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return df.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(sym_ratio, 6).alias("sym_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality_score"),
        (quality >= 0.5).cast("int").alias("is_quality"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID over {en, de, fr, es}, 'und' if no hits.

    Ties break by fixed precedence en > de > fr > es (deterministic for
    the oracle). Scripts outside [a-z0-9] (e.g. zh) normalize to zero
    tokens → 'und'; a production pipeline would add CJK codepoint-range
    votes the same way.
    """
    df = with_words(df, text_col)
    hits = {
        lang: F.expr(TH.spark_stop_hits("words", words)).alias(f"hits_{lang}")
        for lang, words in TH.STOPWORDS.items()
    }
    df = df.select("doc_id", "lang", *hits.values())
    h = {lang: F.col(f"hits_{lang}") for lang in TH.STOPWORDS}
    pred = (
        F.when((h["en"] > 0) & (h["en"] >= h["de"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["es"]), "en")
        .when((h["de"] > 0) & (h["de"] >= h["fr"]) & (h["de"] >= h["es"]), "de")
        .when((h["fr"] > 0) & (h["fr"] >= h["es"]), "fr")
        .when(h["es"] > 0, "es")
        .otherwise("und")
    )
    return df.select(
        "doc_id",
        "lang",
        *[F.col(f"hits_{lang}").cast("long").alias(f"hits_{lang}") for lang in TH.STOPWORDS],
        pred.alias("pred_lang"),
        (pred == F.col("lang")).cast("int").alias("is_match"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", shingle_k: int = 3) -> DataFrame:
    """Exact + content fingerprints.

    ``exact_fp``: 60-bit hash of the raw text (byte-identical dup key).
    ``content_fp``: min shingle-hash — stable under word-order-preserving
    edits outside the minimal shingle (a 1-slot minhash), the cheap
    near-dup prefilter key.
    """
    df = with_words(df, text_col).withColumn(
        "sh", F.expr(TH.spark_shingles("words", shingle_k))
    )
    return df.select(
        "doc_id",
        F.expr(TH.spark_hash60(text_col)).alias("exact_fp"),
        F.expr(
            "coalesce(array_min(transform(sh, s -> "
            + TH.spark_hash60("s")
            + ")), cast(-1 as bigint))"
        ).alias("content_fp"),
        F.size("sh").cast("long").alias("n_shingles"),
    )


def term_stats(df: DataFrame, text_col: str = "text", min_count: int = 2) -> DataFrame:
    """Corpus vocabulary: per-term total count + document frequency.

    The canonical high-cardinality aggregation (word-count at corpus
    scale). One ``explode`` (Generate — row expansion, no shuffle), then
    a (doc_id, term) partial aggregate and a per-term re-aggregate —
    doc_freq falls out of the first level as a plain COUNT(*), so there
    is no expensive distinct aggregate anywhere. At 100 TB the term key
    space is Zipf-skewed; map-side partial aggregation absorbs the hot
    heads ("the", "a") before the shuffle, which is why this shape
    survives skew without salting.
    """
    terms = with_words(df, text_col).select(
        "doc_id", F.explode("words").alias("term")
    )
    per_doc = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tc"))
    return (
        per_doc.groupBy("term")
        .agg(
            F.sum("tc").alias("term_count"),
            F.count("*").alias("doc_freq"),
        )
        .filter(F.col("term_count") >= min_count)
    )


def tfidf_top_terms(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    tfidf = (tc / n_words) * ln((N + 1) / (doc_freq + 1)); ranking is on
    the ROUNDED score with a term tiebreak so the k-boundary is
    deterministic across engines. Three aggregates over one exploded
    scan (per-doc-term tf, per-doc length, per-term doc_freq), a join
    back on term (shuffle — vocab ≪ corpus but not broadcastable at
    scale), a one-row broadcast of the corpus size, and a per-doc TopK
    window.
    """
    from pyspark.sql.window import Window

    n_docs = df.agg(F.count("*").alias("n_docs"))
    terms = with_words(df, text_col).select(
        "doc_id", F.explode("words").alias("term")
    )
    # fold the exploded stream ONCE and MATERIALIZE: three consumers
    # (doc length, doc freq, scoring join) would each re-explode the
    # corpus otherwise — round-6 plan audit measured the explode
    # executing once per consumer with no exchange reuse. The groupBy
    # partial-aggregates map-side, so the fold's one exchange carries
    # combined (doc_id, term) counts, never the raw token stream (a
    # round-6 repartition('term') below the partial agg shipped the raw
    # stream keyed by term alone — stopword keys concentrated into
    # single tasks; dropped on round-7 advice). Downstream shuffles
    # touch only the bounded materialized count table.
    tf = materialize(
        terms.groupBy("doc_id", "term").agg(F.count("*").alias("tc"))
    )
    n_words = tf.groupBy("doc_id").agg(F.sum("tc").alias("n_words"))
    doc_freq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    scored = (
        tf.join(n_words, "doc_id")
        .join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("tc").cast("double") / F.col("n_words"))
                * F.log((F.col("n_docs") + 1).cast("double") / (F.col("doc_freq") + 1)),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "tfidf")
    )


def bm25_top_terms(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k terms per document by BM25 (the retrieval scorer behind
    quality-filtering and retrieval-based curation pipelines).

    ``score = idf * tc*(k1+1) / (tc + k1*(1 - b + b*dl/avgdl))`` with the
    non-negative idf form ``ln(1 + (N - df + 0.5)/(df + 0.5))``.  Same
    dataflow as :func:`tfidf_top_terms` (one exploded scan feeding tf /
    doc-length / doc-freq aggregates, vocab-keyed join back, one-row
    broadcast of the corpus constants, per-doc TopK window); the extra
    avgdl constant rides the same one-row broadcast as N.  Ranking is on
    the ROUNDED score with a term tiebreak so the k-boundary is
    deterministic across engines.
    """
    from pyspark.sql.window import Window

    terms = with_words(df, text_col).select(
        "doc_id", F.explode("words").alias("term")
    )
    # single materialized fold — same rationale as tfidf_top_terms above
    tf = materialize(
        terms.groupBy("doc_id", "term").agg(F.count("*").alias("tc"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tc").alias("dl"))
    doc_freq = tf.groupBy("term").agg(F.count("*").alias("df"))
    consts = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )  # one row
    scored = (
        tf.join(dl, "doc_id")
        .join(doc_freq, "term")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            "term",
            F.round(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tc") * (k1 + 1.0))
                / (
                    F.col("tc")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ).alias("bm25"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("bm25").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "bm25")
    )


#: Gopher-style rule bounds (Rae et al. 2021, table A1 — published
#: heuristics). Word-count floor is tuned to this corpus's length
#: distribution so the filter produces a real keep/drop mix; the rule
#: SET is the point, the constants are deployment knobs.
QUALITY_RULES = {
    "min_words": 30,
    "max_words": 5_000,
    "min_avg_word_len": 2.0,
    "max_avg_word_len": 12.0,
    "max_sym_ratio": 0.10,
    "min_alpha_frac": 0.80,
    "min_distinct_stopwords": 2,
}


def quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-rule composite quality filter: per-rule pass flags + a keep
    decision (keep ⇔ every rule passes).

    Five deterministic rules over one scan (all codegen, no shuffle, no
    UDF): word-count bounds, mean-word-length bounds, symbol-to-char
    ratio cap, alphabetic-word fraction floor, and the ≥2-distinct-
    stopwords requirement (Gopher's "must contain 2 of the/be/to/of/…").
    Emitting the per-rule flags — not just ``keep`` — is deliberate:
    corpus-curation pipelines track WHY documents drop, and the flags
    aggregate into per-rule drop rates for free. At 100 TB this is
    scan-bound like every text op; the flags ride the same projection.
    """
    df = with_words(df, text_col)
    n_words = F.size("words")
    word_len_sum = F.length(F.array_join("words", ""))
    n_chars = F.length(text_col)
    n_sym = F.length(F.lower(F.col(text_col))) - F.length(
        F.expr(f"regexp_replace(lower({text_col}), '[^a-z0-9\\\\s]', '')")
    )
    # words containing >= 1 letter, counted by regex over the clean
    # space-joined token string (same codegen-not-lambda trick as
    # spark_stop_hits; tokens are [a-z0-9]+ so the pattern is exact)
    n_alpha_words = F.expr(
        "size(regexp_extract_all(array_join(words, ' '),"
        " '(?:^| )[0-9]*[a-z][a-z0-9]*(?= |$)', 0))"
    )
    n_distinct_stop = sum(
        F.array_contains("words", w).cast("int")
        for w in TH.STOPWORDS["en"]
    )
    zero = n_words == 0
    avg_word_len = F.when(zero, F.lit(0.0)).otherwise(
        word_len_sum.cast("double") / n_words
    )
    sym_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        n_sym.cast("double") / n_chars
    )
    alpha_frac = F.when(zero, F.lit(0.0)).otherwise(
        n_alpha_words.cast("double") / n_words
    )
    R = QUALITY_RULES
    flags = {
        "ok_word_count": (n_words >= R["min_words"]) & (n_words <= R["max_words"]),
        "ok_avg_word_len": (avg_word_len >= R["min_avg_word_len"])
        & (avg_word_len <= R["max_avg_word_len"]),
        "ok_sym_ratio": sym_ratio <= R["max_sym_ratio"],
        "ok_alpha_frac": alpha_frac >= R["min_alpha_frac"],
        "ok_stopwords": n_distinct_stop >= R["min_distinct_stopwords"],
    }
    n_failed = sum(F.lit(1) - f.cast("int") for f in flags.values())
    return df.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_distinct_stop.cast("long").alias("n_distinct_stop"),
        *[f.cast("int").alias(name) for name, f in flags.items()],
        n_failed.cast("long").alias("n_rules_failed"),
        (n_failed == 0).cast("int").alias("keep"),
    )


#: PII-ish patterns for corpus scrubbing (email, URL, long digit runs).
#: Deliberately simple/deterministic — the production slot for a real
#: PII model; same contract: text in, redacted text + counts out.
REDACT_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "digits": r"\d{6,}",
}


def redact(df: DataFrame, text_col: str = "text", out: str = "redacted") -> DataFrame:
    """Scrub PII-ish spans, keeping per-kind match counts.

    Chained ``regexp_replace`` (one pass per pattern, all codegen, no
    shuffle); counts come from ``regexp_extract_all`` BEFORE replacement
    so they report what was removed. At 100 TB this is scan-bound like
    every other text op.
    """
    expr = F.col(text_col)
    for kind, pat in REDACT_PATTERNS.items():
        df = df.withColumn(
            f"n_{kind}",
            F.expr(
                f"size(regexp_extract_all({text_col}, '{TH.spark_escape(pat)}', 0))"
            ).cast("long"),
        )
        expr = F.regexp_replace(expr, pat, f"<{kind}>")
    return df.withColumn(out, expr)


def bpe_pair_counts(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Top-k adjacent character-pair counts — one BPE merge step.

    The core computation of byte-pair-encoding tokenizer training (the
    merge table is built by repeating exactly this: count all adjacent
    symbol pairs across the corpus, merge the argmax, re-count): every
    normalized word contributes its length-1 adjacent pairs, counted
    globally, ranked with a deterministic pair tiebreak.

    Scale shape: pair generation is a per-row array transform (no
    shuffle); counting is one groupBy over a SMALL key universe
    (|alphabet|² — a few hundred for [a-z0-9]), so the map-side partial
    agg collapses the stream to per-task pair tables before the one
    bounded exchange. The top-k window sorts only the |alphabet|²-row
    count table — never a single-reducer pass over data. An iterated
    BPE trainer would wrap this with the merge applied via translate()
    and a :func:`..functions.materialize.lineage_cut` per round, like
    the duplicate-clusters fixpoint loop.
    """
    from pyspark.sql.window import Window

    words = with_words(df, text_col).select(F.explode("words").alias("w"))
    pairs = words.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "pair", "n")
    )


def bpe_merge_table(df: DataFrame, text_col: str = "text", rounds: int = 3) -> DataFrame:
    """Iterated BPE merge-table training — ``rounds`` merge steps.

    Each round counts adjacent symbol pairs corpus-wide (symbols start
    as characters), picks the argmax (count desc, pair asc — the
    deterministic tiebreak), and APPLIES the merge before the next
    round, exactly how a BPE tokenizer's merge table is built. Merge
    application is a single-pass non-overlapping left-to-right
    ``replace`` on a space-delimited symbol string — both engines
    (Java's String.replace, DuckDB's replace) share that exact
    semantics, so the operator is oracle-checkable; a chain like
    ``a n a n a`` therefore merges alternate occurrences per round and
    the remainder is picked up by a later round (documented deviation
    from re-scanning greedy BPE, which no two engines implement
    identically).

    Scale shape per round: pair generation is a per-row array
    transform; counting collapses map-side onto the bounded pair-key
    universe; ONLY the single argmax row crosses the driver (the
    k-means-centroid exchange discipline) and returns to the plan as a
    literal in the next round's ``replace``. The char-split symbol table is materialized
    once up front (each round re-reads blocks through the accumulated
    replace chain instead of re-deriving the tokenize from raw docs);
    a production trainer (10k+ merges) would ALSO re-materialize every
    few rounds and batch multiple disjoint merges per pass.

    Returns one row per round: ``(round, pair, n)``.
    """
    spark = df.sparkSession
    out_rows = bpe_train_merges(df, text_col=text_col, rounds=rounds)
    return spark.createDataFrame(out_rows, "round int, pair string, n bigint")


def bpe_train_merges(
    df: DataFrame, text_col: str = "text", rounds: int = 3
) -> list[tuple[int, str, int]]:
    """The :func:`bpe_merge_table` training loop, returning the merge
    list ``[(round, pair, n), ...]`` for callers that need the trained
    table as literals (the encode path). One argmax row crosses the
    driver per round — the bounded exchange IS the return value.

    WEIGHTED-DISTINCT rewrite (r14, guide §2.3 "aggregate before you
    shuffle"): the trainer's per-round unit of work is the DISTINCT
    word with its corpus frequency, not the word occurrence — a word's
    pair multiset is a pure function of its string, so summing ``f``
    over distinct words yields bit-identical pair counts to counting
    occurrences (both int64 sums).  One up-front map-side-combinable
    groupBy collapses the corpus to its vocabulary (Heaps' law: at
    100 TB the vocabulary is millions of rows while occurrences are
    trillions), and every round's pair explode, count, and replace
    chain then runs over vocab-scale rows (measured at sf0.1: 270,704
    occurrences → 31 distinct words; trainer 6.8s → see
    OPTIMIZATION_r14.md).  The per-round split is also LET-bound as a
    projected column so each row splits its symbol string once per
    round, not once per pair position (the O(L²)→O(L) re-split fix)."""
    words = with_words(df, text_col).select(F.explode("words").alias("w"))
    wf = words.groupBy("w").agg(F.count("*").alias("f"))
    sdf = wf.select(
        F.expr(
            "concat(' ', array_join(transform(sequence(1, length(w)),"
            " i -> substring(w, i, 1)), ' '), ' ')"
        ).alias("s"),
        "f",
    )
    # pin the weighted char-split symbol table ONCE: every round's pair
    # count and replace chain re-reads it from blocks instead of
    # re-deriving the tokenize + per-char transform from raw docs
    sdf = materialize(sdf)
    out_rows = []
    for rnd in range(1, rounds + 1):
        split_once = sdf.select(
            F.expr("split(trim(s), ' ')").alias("a"), "f"
        )
        pairs = (
            split_once.filter(F.expr("size(a) >= 2"))
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(a) - 1),"
                        " i -> concat(element_at(a, i), ' ',"
                        " element_at(a, i + 1)))"
                    )
                ).alias("pair"),
                "f",
            )
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("f").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()  # ONE row — the argmax merge, kmeans-style exchange
        )
        if not top:
            break
        pair, n = top[0]["pair"], int(top[0]["n"])
        out_rows.append((rnd, pair, n))
        merged = pair.replace(" ", "")
        sdf = sdf.select(
            F.expr(f"replace(s, ' {pair} ', ' {merged} ')").alias("s"), "f"
        )
    return out_rows


#: merge-count gate: at or above this, ``bpe_encode_stats`` swaps the
#: literal replace-chain (one Catalyst ``replace`` node per merge — fine
#: for oracle-scale tables, pathological plan size at production vocabs)
#: for the dictionary-driven Arrow-batched encoder.  64 keeps the
#: oracle-checked 3-merge row on the pure-expression path while every
#: production-vocab caller gets the scalable form automatically.
_BPE_TRIE_MIN_MERGES = 64


def _bpe_encode_chain(df: DataFrame, merges: list[str], text_col: str) -> DataFrame:
    """Literal replace-chain encode: zero Python, zero shuffle."""
    chain = (
        "concat(' ', array_join(transform(sequence(1, length(wd)),"
        " i -> substring(wd, i, 1)), ' '), ' ')"
    )
    for pair in merges:
        merged = pair.replace(" ", "")
        chain = f"replace({chain}, ' {pair} ', ' {merged} ')"
    return with_words(df, text_col).select(
        "doc_id", F.expr(f"transform(words, wd -> trim({chain}))").alias("enc"),
        "words",
    )


def _bpe_encode_word_py(wd: str, pair_ranks: dict, pair_by_rank: dict) -> str:
    """One word through the merge table with EXACTLY the chain's
    semantics: for each merge rank in ascending order, one single-pass
    non-overlapping left-to-right scan.  Ranks whose pair is absent are
    skipped (the chain's ``replace`` is a no-op there), so per-word cost
    scales with the word's own merge activity, not the vocab size — the
    production win over 10k literal replaces.

    ``pair_ranks`` maps each pair to its SORTED LIST of ranks — a trained
    table can contain the SAME pair at several ranks (the trainer's
    single-pass replace leaves unmerged occurrences behind, so a pair can
    win the argmax again next round — the r11 'banana' fixture does), and
    each occurrence in the table is its own chain pass (caught by the
    hypothesis parity test; a last-rank-wins dict silently dropped the
    earlier passes).

    The ``blocked`` flag reproduces the string form's boundary-space
    consumption: ``' a a a a a '.replace(' a a ', ' aa ')`` yields
    ``' aa a aa '`` — after a merge, the trailing delimiter of the match
    is consumed, so the immediately following symbol can never START the
    next match (verified against Spark's ``replace`` and Python's
    ``str.replace``, which share this semantics)."""
    from bisect import bisect_right

    syms = list(wd)
    last = 0
    while True:
        best = None
        for i in range(len(syms) - 1):
            rs = pair_ranks.get((syms[i], syms[i + 1]))
            if not rs:
                continue
            j = bisect_right(rs, last)
            if j < len(rs) and (best is None or rs[j] < best):
                best = rs[j]
        if best is None:
            return " ".join(syms)
        a, b = pair_by_rank[best]
        out: list[str] = []
        i, n, blocked = 0, len(syms), False
        while i < n:
            if not blocked and i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
                blocked = True
            else:
                out.append(syms[i])
                i += 1
                blocked = False
        syms = out
        last = best


def _bpe_encode_trie(df: DataFrame, merges: list[str], text_col: str) -> DataFrame:
    """Dictionary-driven encode for production vocabs: the merge table
    rides the serialized UDF closure to every executor ONCE (broadcast
    semantics — a 10k-merge table is ~100 KB), and each Arrow batch of
    words is encoded in vectorized Python.  Chain-parity is guaranteed
    by :func:`_bpe_encode_word_py` and pinned by
    ``tests/test_llm_ops.py::test_bpe_trie_encoder_parity*``."""
    from pyspark.sql.types import ArrayType, StringType

    pair_ranks: dict = {}
    for r, p in enumerate(merges, start=1):
        pair_ranks.setdefault(tuple(p.split(" ")), []).append(r)
    pair_by_rank = {r: tuple(p.split(" ")) for r, p in enumerate(merges, start=1)}

    def _encode_series(words):
        return words.map(
            lambda ws: [_bpe_encode_word_py(w, pair_ranks, pair_by_rank) for w in ws]
        )

    _encode = F.pandas_udf(_encode_series, ArrayType(StringType()))

    return with_words(df, text_col).select(
        "doc_id", _encode("words").alias("enc"), "words"
    )


def bpe_encode_stats(
    df: DataFrame, merges: list[str], text_col: str = "text"
) -> DataFrame:
    """ENCODE with a trained BPE merge table — the apply half of the
    tokenizer story beside :func:`bpe_merge_table` (train).

    Each doc's words are char-split into space-delimited symbol strings
    and the merge table is applied IN TRAINING ORDER via the same
    single-pass non-overlapping ``replace`` the trainer used (Java and
    DuckDB share that semantics exactly, so encode is oracle-checkable
    end-to-end). Per doc: token count under the trained vocab, merged
    (length≥2) token count, char count, and an md5-60 fingerprint of
    the position-ordered encoded stream — the fingerprint pins the
    exact token geometry, not just counts.

    Scale shape — AUTO-SELECTED by merge count (r11 verdict task):
    below ``_BPE_TRIE_MIN_MERGES`` the merge table is inlined as
    LITERALS in a per-row expression chain over the words array
    (``transform`` keeps word order — no explode, no shuffle, no
    Python); at production vocabs the chain would be thousands of
    nested Catalyst nodes, so the encoder swaps to a broadcast merge
    dictionary applied in an Arrow-batched pandas UDF with identical
    semantics (parity-tested).  Both forms are scan-bound maps,
    embarrassingly parallel at any SF.
    """
    if len(merges) >= _BPE_TRIE_MIN_MERGES:
        enc = _bpe_encode_trie(df, merges, text_col)
    else:
        enc = _bpe_encode_chain(df, merges, text_col)
    return enc.select(
        "doc_id",
        F.expr(
            "aggregate(enc, CAST(0 AS BIGINT),"
            " (a, e) -> a + size(split(e, ' ')))"
        ).alias("n_tokens"),
        F.expr(
            "aggregate(enc, CAST(0 AS BIGINT), (a, e) -> a +"
            " size(filter(split(e, ' '), t -> length(t) >= 2)))"
        ).alias("n_merged_tokens"),
        F.expr(
            "aggregate(words, CAST(0 AS BIGINT), (a, w) -> a + length(w))"
        ).alias("n_chars"),
        F.expr(TH.spark_hash60("array_join(enc, '|')")).alias("stream_hash"),
    )


# ------------------------------------------------- unigram-LM tokenizer (r13)

#: words longer than this are excluded from unigram-LM training AND
#: encode on BOTH engines — the oracle's Viterbi DP is unrolled to this
#: many positions (corpus max is 8; real corpora cap rare mega-tokens
#: the same way — SentencePiece's own default trainer cap is 16 bytes).
_UNI_MAX_WORD = 16
#: candidate piece lengths considered by the DP (seed vocab max length).
#: Lifted 3 -> 6 in r14 (r13 verdict task 3): length <= 3 was a
#: character-trigram-class vocab; <= 6 covers whole short words and
#: common stems, i.e. genuinely SentencePiece-class segmentation.  The
#: DP stays O(L * _UNI_MAX_PIECE) per word with a CONSTANT-size lambda
#: (the candidate CASE grows quadratically in this constant — ~20
#: comparisons at 6 — never with word length or data).
_UNI_MAX_PIECE = 6
#: seed vocab: all single chars + top-96 multi-char substrings
_UNI_SEED_CAP = 96
_UNI_SEED_MIN_CNT = 2
#: vocab-size gate (the ``_BPE_TRIE_MIN_MERGES`` discipline): below it
#: the encode rides the expression DP + broadcast seg-join; at or above
#: it the probs dict ships in an Arrow pandas-UDF closure instead —
#: a production unigram vocab (32k pieces) as a map LITERAL would be
#: thousands of Catalyst nodes re-analyzed per query.
_UNI_TRIE_MIN_VOCAB = 512


def _uni_cand(j: int, wd: str, m: str) -> str:
    """Score of ending position ``i`` with a ``j``-char piece (SQL text,
    evaluated inside the DP lambda): dp[i-j] * p(piece), or -1 when the
    position can't fit the piece.  Out-of-vocab pieces score 0 and are
    never chosen: every single char of every word is in the vocab with
    a Laplace-positive probability, so some candidate is always > 0."""
    return (
        f"IF(i >= {j}, element_at(acc, i - {j} + 1).s * "
        f"coalesce(try_element_at(element_at({m}, {j}), "
        f"substring({wd}, i - {j} + 1, {j})), "
        f"CAST(0.0 AS DOUBLE)), CAST(-1.0 AS DOUBLE))"
    )


def _spark_viterbi_dp(wd: str, m: str) -> str:
    """Product-space Viterbi forward pass as ONE ``aggregate`` HOF:
    acc[k] = (best score, best piece length) for position k-1; the
    lambda is a single O(1)-size expression reused for every position,
    so plan size is constant in word length (an unrolled lateral-alias
    chain would blow up 3^W under alias inlining — measured on BOTH
    engines; the DuckDB oracle's linear form is a recursive CTE over
    positions instead).

    DETERMINISM: scores are PRODUCTS of exactly-representable
    count-ratio doubles — no ln/exp anywhere, so the DP is bit-identical
    across Spark, DuckDB, and the Python Arrow twin (IEEE multiply +
    compare in the same order); ties prefer the LONGER piece via the
    shared longest-first CASE order (c_j wins iff c_j >= every shorter
    candidate — the 3-piece c3 >= c2 >= c1 rule generalized)."""
    c = {j: _uni_cand(j, wd, m) for j in range(1, _UNI_MAX_PIECE + 1)}
    # LET-bind the candidates (r14): higher-order functions are
    # interpreted (CodegenFallback) with no common-subexpression
    # elimination, so the raw CASE re-evaluated each candidate — a map
    # lookup + substring + array index — once per comparison (~2x per
    # WHEN it appears in, ~30 evaluations per position at cap 6).
    # Binding them once per position via the single-element-transform
    # idiom (Spark has no `let`) makes each candidate evaluate exactly
    # once; the comparisons then read struct fields.  Values, compare
    # order, and the longer-piece tie rule are unchanged, so the DP is
    # still bit-identical across Spark, DuckDB, and the Python twin.
    cands = ", ".join(
        f"'c{j}', {c[j]}" for j in range(1, _UNI_MAX_PIECE + 1)
    )
    branches = " ".join(
        f"WHEN {' AND '.join(f'cs.c{j} >= cs.c{i}' for i in range(1, j))} "
        f"THEN named_struct('s', cs.c{j}, 'b', {j})"
        for j in range(_UNI_MAX_PIECE, 1, -1)
    )
    best = (
        f"element_at(transform(array(named_struct({cands})), "
        f"cs -> CASE {branches} ELSE named_struct('s', cs.c1, 'b', 1) END), 1)"
    )
    return (
        f"aggregate(sequence(1, length({wd})), "
        f"array(named_struct('s', CAST(1.0 AS DOUBLE), 'b', 0)), "
        f"(acc, i) -> concat(acc, array({best})))"
    )


def _spark_viterbi_backtrack(wd: str, bp: str) -> str:
    """Walk the backpointer array from the word's end, PREPENDING each
    piece — at most ``length(wd)`` steps, expressed as a second
    ``aggregate`` whose accumulator carries (position, pieces)."""
    # LET-bind the backpointer read (r14): the interpreted lambda would
    # otherwise index the array three times per step (same idiom and
    # same-values argument as the DP's candidate binding)
    return (
        f"aggregate(sequence(1, length({wd})), "
        f"named_struct('q', length({wd}), 'ps', CAST(array() AS ARRAY<STRING>)), "
        f"(acc, x) -> IF(acc.q > 0, "
        f"element_at(transform(array(element_at({bp}, acc.q)), t -> "
        f"named_struct('q', acc.q - t, "
        f"'ps', concat(array(substring({wd}, acc.q - t + 1, t)), acc.ps))), 1), "
        f"acc), acc -> acc.ps)"
    )


def _prob_map_col(probs: dict):
    """Bounded vocab → ONE array-of-maps column, maps keyed by piece
    LENGTH (index j holds only the length-j pieces, exact double
    literals, sorted keys so the plan is deterministic).

    Length-partitioned (r14): literal-map lookup is a LINEAR key scan in
    interpreted evaluation, and the DP probes the model 6x per char
    position — against the full ~130-piece map that was ~780 string
    comparisons per position.  The DP's length-j candidate can only
    ever hit a length-j piece, so partitioning by length is a pure
    index (identical hits, identical misses → coalesce(…, 0) unchanged)
    that cuts the scan to the length bucket (~6x fewer comparisons).
    Pieces longer than ``_UNI_MAX_PIECE`` are unreachable by the DP by
    construction and the seeding never emits them."""
    by_len: dict[int, list] = {}
    for k, v in sorted(probs.items()):
        # pin the unreachability assumption in code (ADVICE r14): a
        # piece outside 1.._UNI_MAX_PIECE would be silently dropped from
        # the length buckets below and diverge from a naive full-map
        # membership expectation — the DP can never probe it, but a
        # vocab source emitting one means the MODEL is out of contract
        if not 1 <= len(k) <= _UNI_MAX_PIECE:
            raise ValueError(
                f"unigram model piece {k!r} has length {len(k)} outside "
                f"1..{_UNI_MAX_PIECE} — unreachable by the DP and "
                "unrepresentable in the length-partitioned model map"
            )
        by_len.setdefault(len(k), []).append((k, float(v)))
    maps = []
    for j in range(1, _UNI_MAX_PIECE + 1):
        items = by_len.get(j, [])
        if items:
            maps.append(
                F.map_from_arrays(
                    F.array(*[F.lit(k) for k, _ in items]),
                    F.array(*[F.lit(v) for _, v in items]),
                )
            )
        else:
            maps.append(
                F.expr("map()").cast("map<string,double>")
            )
    return F.array(*maps)


def segment_words(wdf: DataFrame, probs: dict, wd_col: str = "wd") -> DataFrame:
    """Viterbi-segment a DISTINCT-word frame under a piece-probability
    model: adds ``ps array<string>``.  The DP runs distributed over the
    word table (bounded by corpus vocabulary — at 100 TB still millions
    of rows, never driver-side); the model rides as a map literal
    (vocab-bounded, the caller gates size via ``_UNI_TRIE_MIN_VOCAB``)."""
    return (
        wdf.withColumn("_m", _prob_map_col(probs))
        .withColumn("_dp", F.expr(_spark_viterbi_dp(wd_col, "_m")))
        .withColumn("_bp", F.expr("transform(slice(_dp, 2, size(_dp) - 1), d -> d.b)"))
        .withColumn("ps", F.expr(_spark_viterbi_backtrack(wd_col, "_bp")))
        .drop("_m", "_dp", "_bp")
    )


def _unigram_word_freq(df: DataFrame, text_col: str) -> DataFrame:
    """(wd, f): corpus-wide frequency of each normalized word within the
    trainable length cap.  ONE map-side-combinable groupBy; the result
    is vocabulary-bounded and materialized once (every EM pass re-reads
    it from blocks — the BPE symbol-table discipline)."""
    return materialize(
        with_words(df, text_col)
        .select(F.explode("words").alias("wd"))
        .filter(F.length("wd") <= _UNI_MAX_WORD)
        .groupBy("wd")
        .agg(F.count("*").alias("f"))
    )


def _unigram_seed_rows(wf: DataFrame) -> list[tuple[str, int]]:
    """Seed vocab [(piece, weighted count)]: every single character plus
    the top ``_UNI_SEED_CAP`` substrings of length 2..``_UNI_MAX_PIECE``
    with count >= ``_UNI_SEED_MIN_CNT`` (count desc, piece asc —
    deterministic).
    Substring counting is a per-row array transform + one bounded-key
    groupBy; ONLY the capped vocab crosses the driver."""
    subs = "concat(" + ", ".join(
        f"IF(length(wd) >= {L}, transform(sequence(1, length(wd) - {L} + 1),"
        f" i -> substring(wd, i, {L})), CAST(array() AS ARRAY<STRING>))"
        for L in range(1, _UNI_MAX_PIECE + 1)
    ) + ")"
    scnt = (
        wf.select("f", F.explode(F.expr(subs)).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("f").alias("cnt"))
    )
    chars = scnt.filter(F.length("piece") == 1)
    multi = (
        scnt.filter((F.length("piece") >= 2) & (F.col("cnt") >= _UNI_SEED_MIN_CNT))
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(_UNI_SEED_CAP)
    )
    rows = chars.unionAll(multi).collect()  # bounded: capped vocab
    return sorted((r["piece"], int(r["cnt"])) for r in rows)


def unigram_train(
    df: DataFrame, text_col: str = "text", iters: int = 2
) -> tuple[list[str], dict, dict]:
    """Hard-EM (Viterbi-EM) unigram-LM tokenizer training — the
    SentencePiece-class trainer beside :func:`bpe_merge_table`:

    1. seed: substring counts → initial probs p = cnt/total (exact
       integer-ratio doubles);
    2. each EM round: Viterbi-segment the distinct-word table under the
       current model (E-step, hard assignment), count corpus-weighted
       piece usage, refit p = (usage+1)/(total+|V|) (M-step,
       Laplace-smoothed so every vocab piece stays usable and every
       word stays segmentable).

    The vocab is FIXED after seeding (a production trainer would also
    prune the tail per round — same loop, one more filter).  Per round
    exactly one vocab-bounded count table crosses the driver (the
    k-means-centroid exchange discipline); all fact-scale work is the
    one materialized word-frequency groupBy.  Returns (vocab, final
    usage counts, final Laplace probs)."""
    wf = _unigram_word_freq(df, text_col)
    seed = _unigram_seed_rows(wf)
    vocab = [p for p, _ in seed]
    total = sum(c for _, c in seed)
    probs = {p: c / total for p, c in seed}
    cnts = {p: c for p, c in seed}
    for _ in range(iters):
        cnts, probs = _unigram_em_step(wf, vocab, probs)
    return vocab, cnts, probs


def _unigram_em_step(
    wf: DataFrame, vocab: list[str], probs: dict
) -> tuple[dict, dict]:
    """One hard-EM step over a FIXED vocab: Viterbi usage counts under
    ``probs`` (one bounded driver exchange), Laplace-refit probs."""
    usage_rows = (
        segment_words(wf, probs)
        .select("f", F.explode("ps").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("f").alias("cnt"))
        .collect()  # bounded: vocab-sized usage table
    )
    usage = {r["piece"]: int(r["cnt"]) for r in usage_rows}
    cnts = {p: usage.get(p, 0) for p in vocab}
    tot_u = sum(cnts.values())
    nv = len(vocab)
    return cnts, {p: (cnts[p] + 1) / (tot_u + nv) for p in vocab}


def unigram_lm_table(df: DataFrame, text_col: str = "text", iters: int = 2) -> DataFrame:
    """The train row: one row per vocab piece with final usage count and
    Laplace prob, ranked (usage desc, piece asc)."""
    spark = df.sparkSession
    vocab, cnts, probs = unigram_train(df, text_col, iters)
    ranked = sorted(vocab, key=lambda p: (-cnts[p], p))
    rows = [
        (r + 1, p, cnts[p], round(probs[p], 6)) for r, p in enumerate(ranked)
    ]
    return spark.createDataFrame(
        rows, "rank bigint, piece string, cnt bigint, prob double"
    )


def _unigram_viterbi_py(wd: str, probs: dict) -> list[str]:
    """Python twin of the expression DP — EXACTLY the same IEEE double
    products and the same longest-first (c_j >= all shorter) tie rule, so the
    Arrow path is bit-identical to the expression path (pinned by
    tests/test_llm_ops.py unigram parity tests)."""
    n = len(wd)
    s = [1.0] + [0.0] * n
    b = [0] * (n + 1)
    for i in range(1, n + 1):
        c = [-1.0]  # pad so c[j] is the candidate for piece length j
        for j in range(1, _UNI_MAX_PIECE + 1):
            c.append(
                s[i - j] * probs.get(wd[i - j : i], 0.0) if i >= j else -1.0
            )
        # longest-first: length j wins iff c[j] >= every shorter
        # candidate — identical tie semantics to the expression CASE
        for j in range(_UNI_MAX_PIECE, 0, -1):
            if j == 1 or all(c[j] >= c[i] for i in range(1, j)):
                s[i], b[i] = c[j], j
                break
    ps: list[str] = []
    q = n
    while q > 0:
        j = b[q]
        ps.append(wd[q - j : q])
        q -= j
    ps.reverse()
    return ps


def _unigram_enc_join(df: DataFrame, probs: dict, text_col: str) -> DataFrame:
    """Expression-path encode: segment the DISTINCT kept-word table once
    (bounded), broadcast-join it back onto the positional word stream,
    re-assemble per-doc order.  One doc_id shuffle at fact scale — the
    Arrow path below is the zero-shuffle production form; this form is
    the oracle-exact pure-JVM twin."""
    d = with_words(df, text_col).withColumn(
        "kept", F.expr(f"filter(words, wd -> length(wd) <= {_UNI_MAX_WORD})")
    )
    wdf = d.select(F.explode("kept").alias("wd")).distinct()
    seg = segment_words(wdf, probs).select(
        "wd", F.array_join("ps", " ").alias("penc")
    )
    ex = d.select("doc_id", F.posexplode("kept").alias("pos", "wd")).join(
        F.broadcast(seg), "wd"
    )
    agg = ex.groupBy("doc_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, penc))), x -> x.penc)"
        ).alias("enc")
    )
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("enc", F.expr("CAST(array() AS ARRAY<STRING>)")).alias("enc"),
    )


def _unigram_enc_arrow(df: DataFrame, probs: dict, text_col: str) -> DataFrame:
    """Arrow-path encode for production vocabs: the probs dict rides the
    serialized UDF closure to executors once (a 32k-piece model is
    ~1 MB); each batch memoizes word → segmentation, so per-batch cost
    scales with DISTINCT words per batch, not occurrences.  Zero
    shuffle — the 100 TB path."""
    from pyspark.sql.types import ArrayType, StringType

    model = dict(probs)

    def _enc_series(words):
        cache: dict = {}

        def enc_word(w):
            e = cache.get(w)
            if e is None:
                e = " ".join(_unigram_viterbi_py(w, model))
                cache[w] = e
            return e

        return words.map(
            lambda ws: [enc_word(w) for w in ws if len(w) <= _UNI_MAX_WORD]
        )

    _enc = F.pandas_udf(_enc_series, ArrayType(StringType()))
    return with_words(df, text_col).select("doc_id", _enc("words").alias("enc"))


def _uni_inline_ps(wd: str, m: str) -> str:
    """The full Viterbi (forward DP + backtrack) as ONE expression over a
    single word — for nesting inside a ``transform`` over a doc's words
    (the pure-projection serving form).  The DP and backpointer arrays
    are LET-bound via single-element ``transform`` arrays so each big
    sub-expression appears exactly once in the plan (Spark has no `let`;
    ``element_at(transform(array(X), x0 -> body), 1)`` is the idiom)."""
    dp = _spark_viterbi_dp(wd, m)
    bp = "transform(slice(dp0, 2, size(dp0) - 1), d -> d.b)"
    bt = _spark_viterbi_backtrack(wd, "bp0")
    return (
        f"element_at(transform(array({dp}), dp0 -> "
        f"element_at(transform(array({bp}), bp0 -> {bt}), 1)), 1)"
    )


def _uni_enc_inline(df: DataFrame, probs: dict, text_col: str) -> DataFrame:
    """Pure-PROJECTION unigram encode: the Viterbi nested inside a
    ``transform`` over each doc's kept words — no distinct operator, no
    join, no shuffle, no Python, no state (the in-STREAM serving form;
    see ``_wp_enc_inline`` for the rationale).

    PER-DOC memoization (r14): the DP runs once per DISTINCT word of
    each doc (``array_distinct`` + positional re-attach, all inside the
    same projection — the plan stays a stateless zero-exchange map), so
    repeated words cost one array lookup instead of a full interpreted
    DP.  Measured at sf0.1 (54 words/doc over a 31-word vocabulary):
    the 4-micro-batch serving stream dropped ~8x; output is identical
    because the DP is a deterministic function of the word string."""
    d = with_words(df, text_col).withColumn(
        "kept", F.expr(f"filter(words, wd -> length(wd) <= {_UNI_MAX_WORD})")
    )
    d = d.withColumn("_m", _prob_map_col(probs))
    ps = _uni_inline_ps("wd", "_m")
    memo = (
        "element_at(transform(array(array_distinct(kept)), dw -> "
        f"element_at(transform(array(transform(dw, wd -> array_join({ps}, ' '))), "
        "encs -> transform(kept, wd2 -> "
        # try_element_at (ADVICE r14): dw = array_distinct(kept) makes
        # every wd2 findable (position >= 1) by construction; `try_`
        # degrades a broken invariant to NULL instead of a runtime
        # error — identical results while the invariant holds
        "try_element_at(encs, CAST(array_position(dw, wd2) AS INT)))), 1)), 1)"
    )
    return d.select("doc_id", F.expr(memo).alias("enc"))


def unigram_encode_stats(
    df: DataFrame, probs: dict, text_col: str = "text", path: str = "auto"
) -> DataFrame:
    """ENCODE with a trained unigram-LM model — the apply half beside
    :func:`unigram_lm_table` (train), auto-selecting the physical path
    by vocab size exactly like ``bpe_encode_stats``: expression DP +
    broadcast seg-join below ``_UNI_TRIE_MIN_VOCAB``, Arrow-batched
    Python DP (bit-identical — see :func:`_unigram_viterbi_py`) at or
    above it.  Per doc: piece count under the model, multi-char piece
    count, char count over encodable words, and the md5-60 fingerprint
    of the position-ordered encoded stream."""
    if path == "inline":
        enc = _uni_enc_inline(df, probs, text_col)
    elif len(probs) >= _UNI_TRIE_MIN_VOCAB:
        enc = _unigram_enc_arrow(df, probs, text_col)
    else:
        enc = _unigram_enc_join(df, probs, text_col)
    return enc.select(
        "doc_id",
        F.expr(
            "aggregate(enc, CAST(0 AS BIGINT), (a, e) -> a + size(split(e, ' ')))"
        ).alias("n_pieces"),
        F.expr(
            "aggregate(enc, CAST(0 AS BIGINT), (a, e) -> a +"
            " size(filter(split(e, ' '), t -> length(t) >= 2)))"
        ).alias("n_multi_pieces"),
        F.expr(
            "aggregate(enc, CAST(0 AS BIGINT), (a, e) -> a +"
            " length(replace(e, ' ', '')))"
        ).alias("n_chars"),
        F.expr(TH.spark_hash60("array_join(enc, '|')")).alias("stream_hash"),
    )


#: pruning keeps every character (segmentability invariant) + this many
#: multi-char pieces by round-2 usage (the SentencePiece prune knob)
_UNI_PRUNE_KEEP_MULTI = 48


def unigram_prune_table(
    df: DataFrame, text_col: str = "text", iters: int = 2,
    keep_multi: int = _UNI_PRUNE_KEEP_MULTI,
) -> DataFrame:
    """The PRUNE-AND-REFIT step a real SentencePiece trainer alternates
    with EM: after ``iters`` hard-EM rounds, keep every character (the
    segmentability invariant) plus the top ``keep_multi`` multi-char
    pieces by usage (count desc, piece asc), Laplace-refit over the
    SHRUNK vocab, run one more Viterbi E-step under the pruned model —
    pieces that lose their high-probability parent redistribute onto
    survivors, which is exactly what pruning is for — and report the
    pruned model's final usage + probs, ranked.

    Same physical discipline as :func:`unigram_train`: the prune
    selection and refit happen on the (driver-side, vocab-bounded)
    count table; the E-step is the distributed DP over the distinct-
    word frame.
    """
    spark = df.sparkSession
    wf = _unigram_word_freq(df, text_col)
    seed = _unigram_seed_rows(wf)
    vocab = [p for p, _ in seed]
    total = sum(c for _, c in seed)
    probs = {p: c / total for p, c in seed}
    cnts = dict(seed)
    for _ in range(iters):
        cnts, probs = _unigram_em_step(wf, vocab, probs)
    chars = [p for p in vocab if len(p) == 1]
    multi = sorted(
        ((p, cnts[p]) for p in vocab if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:keep_multi]
    pvocab = chars + [p for p, _ in multi]
    tot_p = sum(cnts[p] for p in pvocab)
    nv_p = len(pvocab)
    pprobs = {p: (cnts[p] + 1) / (tot_p + nv_p) for p in pvocab}
    fcnts, fprobs = _unigram_em_step(wf, pvocab, pprobs)
    ranked = sorted(pvocab, key=lambda p: (-fcnts[p], p))
    rows = [
        (r + 1, p, fcnts[p], round(fprobs[p], 6)) for r, p in enumerate(ranked)
    ]
    return spark.createDataFrame(
        rows, "rank bigint, piece string, cnt bigint, prob double"
    )


# ---------------------------------------------------------------------------
# WordPiece (BERT-style) greedy longest-match tokenizer (round 14)
# ---------------------------------------------------------------------------

#: same caps as the unigram family: trainable word length and max piece
_WP_MAX_PIECE = 6
#: vocab: every single-char piece (both word-initial and ``##``
#: continuation forms — which makes every kept word segmentable by
#: construction, so the ``[UNK]`` path is provably dead on the driver
#: rows and exercised only by the restricted-vocab unit test) + the top
#: multi-char pieces by weighted count
_WP_SEED_CAP = 96
_WP_SEED_MIN_CNT = 2
#: the ``_BPE_TRIE_MIN_MERGES`` auto-select discipline: below this vocab
#: size the encode is the expression greedy + broadcast seg-join; at or
#: above, the vocab ships in an Arrow pandas-UDF closure
_WP_TRIE_MIN_VOCAB = 512
_WP_UNK = "[UNK]"


def _wordpiece_piece_counts(wf: DataFrame) -> DataFrame:
    """(piece, cnt): corpus-weighted counts of every candidate WordPiece
    — word PREFIXES as-is (the word-initial family) and ``##``-prefixed
    interior substrings (the continuation family), lengths 1..cap.
    Per-row array transform + ONE map-side-combinable groupBy; nothing
    crosses the driver here."""
    pref = (
        f"transform(sequence(1, least(length(wd), {_WP_MAX_PIECE})),"
        f" L -> substring(wd, 1, CAST(L AS INT)))"
    )
    conts = ", ".join(
        # Spark's sequence(a, b) DESCENDS when a > b, so guard emptiness
        f"IF(length(wd) >= {L} + 1,"
        f" transform(sequence(2, length(wd) - {L} + 1),"
        f" i -> concat('##', substring(wd, CAST(i AS INT), {L}))),"
        f" CAST(array() AS ARRAY<STRING>))"
        for L in range(1, _WP_MAX_PIECE + 1)
    )
    return (
        wf.select("f", F.explode(F.expr(f"concat({pref}, {conts})")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("f").alias("cnt"))
    )


def _wp_is_single(piece_col: str) -> str:
    """SQL predicate: piece is a single character in either family."""
    return (
        f"(length({piece_col}) = 1 OR (length({piece_col}) = 3"
        f" AND substring({piece_col}, 1, 2) = '##'))"
    )


def wordpiece_vocab(df: DataFrame, text_col: str = "text") -> tuple[list[str], dict]:
    """Frequency-seeded WordPiece vocab over the corpus: ALL single-char
    pieces (both families — segmentability invariant) + the top
    ``_WP_SEED_CAP`` multi-char pieces with count >= ``_WP_SEED_MIN_CNT``
    (count desc, piece asc — deterministic).  Returns (sorted vocab,
    piece -> weighted count).  Only the capped vocab crosses the driver."""
    wf = _unigram_word_freq(df, text_col)
    pc = _wordpiece_piece_counts(wf)
    singles = pc.filter(F.expr(_wp_is_single("piece")))
    multi = (
        pc.filter(~F.expr(_wp_is_single("piece")))
        .filter(F.col("cnt") >= _WP_SEED_MIN_CNT)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(_WP_SEED_CAP)
    )
    rows = singles.unionAll(multi).collect()  # bounded: capped vocab
    cnts = {r["piece"]: int(r["cnt"]) for r in rows}
    return sorted(cnts), cnts


def wordpiece_vocab_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The vocab row: one row per piece with weighted count and family
    bit, ranked (count desc, piece asc)."""
    spark = df.sparkSession
    vocab, cnts = wordpiece_vocab(df, text_col)
    ranked = sorted(vocab, key=lambda p: (-cnts[p], p))
    rows = [
        (r + 1, p, cnts[p], int(p.startswith("##")))
        for r, p in enumerate(ranked)
    ]
    return spark.createDataFrame(
        rows, "rank bigint, piece string, cnt bigint, is_continuation int"
    )


def _wordpiece_word_py(wd: str, vocab) -> list[str]:
    """Python twin of the expression greedy — identical longest-match
    -first scan and whole-word ``[UNK]`` fallback, so the Arrow path is
    output-identical to the expression path (string comparisons only,
    no floats — nothing to drift)."""
    ps: list[str] = []
    q, n = 0, len(wd)
    while q < n:
        for j in range(min(_WP_MAX_PIECE, n - q), 0, -1):
            cand = wd[q : q + j] if q == 0 else "##" + wd[q : q + j]
            if cand in vocab:
                ps.append(cand)
                q += j
                break
        else:
            return [_WP_UNK]
    return ps


def _set_map_col(pieces) -> "F.Column":
    """Bounded vocab → ONE array-of-maps membership column, indexed by
    CONTENT length (chars after the ``##`` marker for continuations —
    index j holds both families' j-char pieces; sorted keys so the plan
    is deterministic; values are a dummy 1).

    Length-partitioned for the same reason as ``_prob_map_col`` (r14):
    the greedy probes membership once per branch per step, literal-map
    lookup is a linear key scan, and branch j can only ever hit a
    j-content-char piece — identical hits/misses, ~6x fewer string
    comparisons."""
    by_len: dict[int, list] = {}
    for p in sorted(pieces):
        j = len(p) - 2 if p.startswith("##") else len(p)
        # same contract pin as _prob_map_col (ADVICE r14): the greedy
        # never probes content lengths outside 1.._WP_MAX_PIECE, so a
        # piece out there cannot be represented in the length buckets —
        # fail loudly instead of silently dropping it
        if not 1 <= j <= _WP_MAX_PIECE:
            raise ValueError(
                f"WordPiece vocab piece {p!r} has content length {j} "
                f"outside 1..{_WP_MAX_PIECE} — unreachable by the "
                "greedy and unrepresentable in the length-partitioned "
                "membership map"
            )
        by_len.setdefault(j, []).append(p)
    maps = []
    for j in range(1, _WP_MAX_PIECE + 1):
        keys = by_len.get(j, [])
        if keys:
            maps.append(
                F.map_from_arrays(
                    F.array(*[F.lit(k) for k in keys]),
                    F.array(*[F.lit(1) for _ in keys]),
                )
            )
        else:
            maps.append(F.expr("map()").cast("map<string,int>"))
    return F.array(*maps)


def _spark_wp_greedy(wd: str, m: str) -> str:
    """WordPiece greedy longest-match as ONE ``aggregate`` HOF: the
    accumulator carries (chars consumed, pieces); each step takes the
    LONGEST vocab piece at the cursor (word-initial form at offset 0,
    ``##`` continuation after) or collapses the whole word to
    ``[UNK]``.  Every step consumes >= 1 char, so ``length(wd)``
    iterations always suffice; the lambda is a constant-size CASE —
    plan size never grows with word length or data."""

    def cand(j: int) -> str:
        sub = f"substring({wd}, acc.q + 1, {j})"
        return f"IF(acc.q = 0, {sub}, concat('##', {sub}))"

    branches = " ".join(
        f"WHEN acc.q + {j} <= length({wd})"
        f" AND try_element_at(element_at({m}, {j}), {cand(j)}) IS NOT NULL"
        f" THEN named_struct('q', acc.q + {j},"
        f" 'ps', concat(acc.ps, array({cand(j)})))"
        for j in range(_WP_MAX_PIECE, 0, -1)
    )
    step = (
        f"CASE {branches} ELSE named_struct('q', length({wd}),"
        f" 'ps', array('{_WP_UNK}')) END"
    )
    return (
        f"aggregate(sequence(1, length({wd})), "
        f"named_struct('q', 0, 'ps', CAST(array() AS ARRAY<STRING>)), "
        f"(acc, x) -> IF(acc.q >= length({wd}), acc, {step}), "
        f"acc -> acc.ps)"
    )


def wp_segment_words(wdf: DataFrame, vocab, wd_col: str = "wd") -> DataFrame:
    """Greedy-segment a DISTINCT-word frame under a WordPiece vocab:
    adds ``ps array<string>``.  Distributed over the word table (vocab
    rides as a bounded map literal — the caller gates size via
    ``_WP_TRIE_MIN_VOCAB``)."""
    return (
        wdf.withColumn("_m", _set_map_col(vocab))
        .withColumn("ps", F.expr(_spark_wp_greedy(wd_col, "_m")))
        .drop("_m")
    )


def _wp_enc_join(df: DataFrame, vocab, text_col: str) -> DataFrame:
    """Expression-path encode: segment the DISTINCT kept-word table once
    (bounded), broadcast-join back onto the positional word stream —
    the ``_unigram_enc_join`` shape with the greedy in place of the DP."""
    d = with_words(df, text_col).withColumn(
        "kept", F.expr(f"filter(words, wd -> length(wd) <= {_UNI_MAX_WORD})")
    )
    wdf = d.select(F.explode("kept").alias("wd")).distinct()
    seg = wp_segment_words(wdf, vocab).select(
        "wd", F.array_join("ps", " ").alias("penc")
    )
    ex = d.select("doc_id", F.posexplode("kept").alias("pos", "wd")).join(
        F.broadcast(seg), "wd"
    )
    agg = ex.groupBy("doc_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, penc))), x -> x.penc)"
        ).alias("enc")
    )
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("enc", F.expr("CAST(array() AS ARRAY<STRING>)")).alias("enc"),
    )


def _wp_enc_arrow(df: DataFrame, vocab, text_col: str) -> DataFrame:
    """Arrow-path encode for production vocabs: the vocab set rides the
    UDF closure once; per-batch word -> pieces memoization, zero
    shuffle — the 100 TB path (same contract as ``_unigram_enc_arrow``)."""
    from pyspark.sql.types import ArrayType, StringType

    vset = frozenset(vocab)

    def _enc_series(words):
        cache: dict = {}

        def enc_word(w):
            e = cache.get(w)
            if e is None:
                e = " ".join(_wordpiece_word_py(w, vset))
                cache[w] = e
            return e

        return words.map(
            lambda ws: [enc_word(w) for w in ws if len(w) <= _UNI_MAX_WORD]
        )

    _enc = F.pandas_udf(_enc_series, ArrayType(StringType()))
    return with_words(df, text_col).select("doc_id", _enc("words").alias("enc"))


def _wp_enc_inline(df: DataFrame, vocab, text_col: str) -> DataFrame:
    """Pure-PROJECTION encode: the greedy aggregate-HOF nested inside a
    ``transform`` over each doc's kept words — no distinct, no join, no
    shuffle, no Python, no state.  Slightly more compute than the
    seg-join form (no word dedup), but the plan is a stateless
    projection, which is exactly what in-STREAM serving needs (append
    mode, zero state — the ``streaming_tokenize_docs`` shape)."""
    d = with_words(df, text_col).withColumn(
        "kept", F.expr(f"filter(words, wd -> length(wd) <= {_UNI_MAX_WORD})")
    )
    d = d.withColumn("_m", _set_map_col(vocab))
    greedy = _spark_wp_greedy("wd", "_m")
    # PER-DOC memoization (r14): run the interpreted greedy once per
    # DISTINCT word of each doc and re-attach positionally — same
    # stateless zero-exchange projection, identical output (the greedy
    # is a deterministic function of the word string); see
    # ``_uni_enc_inline`` for the measured effect
    memo = (
        "element_at(transform(array(array_distinct(kept)), dw -> "
        f"element_at(transform(array(transform(dw, wd -> array_join({greedy}, ' '))), "
        "encs -> transform(kept, wd2 -> "
        # try_element_at (ADVICE r14) — same invariant note as the
        # unigram memo in _uni_enc_inline
        "try_element_at(encs, CAST(array_position(dw, wd2) AS INT)))), 1)), 1)"
    )
    return d.select("doc_id", F.expr(memo).alias("enc"))


def wordpiece_encode_stats(
    df: DataFrame, vocab, text_col: str = "text", path: str = "auto"
) -> DataFrame:
    """ENCODE with a WordPiece vocab — greedy longest-match-first with
    whole-word ``[UNK]`` fallback (the BERT inference algorithm).
    ``path="auto"`` selects the physical form by vocab size exactly like
    ``bpe_encode_stats`` / ``unigram_encode_stats`` (expression seg-join
    below ``_WP_TRIE_MIN_VOCAB``, Arrow at or above); ``path="inline"``
    forces the pure-projection form streaming serving needs.  Per doc:
    piece count, continuation-piece count, UNK'd word count, char count
    over encodable words, and the md5-60 fingerprint of the
    position-ordered encoded stream."""
    if path == "inline":
        enc = _wp_enc_inline(df, vocab, text_col)
    elif len(vocab) >= _WP_TRIE_MIN_VOCAB:
        enc = _wp_enc_arrow(df, vocab, text_col)
    else:
        enc = _wp_enc_join(df, vocab, text_col)
    return enc.select(
        "doc_id",
        F.expr(
            "aggregate(enc, CAST(0 AS BIGINT), (a, e) -> a + size(split(e, ' ')))"
        ).alias("n_pieces"),
        F.expr(
            "aggregate(enc, CAST(0 AS BIGINT), (a, e) -> a +"
            " size(filter(split(e, ' '), t -> substring(t, 1, 2) = '##')))"
        ).alias("n_continuations"),
        F.expr(
            f"aggregate(enc, CAST(0 AS BIGINT), (a, e) -> a +"
            f" IF(e = '{_WP_UNK}', CAST(1 AS BIGINT), CAST(0 AS BIGINT)))"
        ).alias("n_unk_words"),
        F.expr(
            "aggregate(enc, CAST(0 AS BIGINT), (a, e) -> a +"
            " length(replace(e, ' ', '')))"
        ).alias("n_chars"),
        F.expr(TH.spark_hash60("array_join(enc, '|')")).alias("stream_hash"),
    )


def wordpiece_train_merges(
    df: DataFrame, text_col: str = "text", rounds: int = 3
) -> list[tuple[int, str, str, int, int, int]]:
    """Iterated WordPiece merge training — the published likelihood rule.

    Identical loop shape to :func:`bpe_train_merges` (count → argmax →
    apply via non-overlapping space-delimited ``replace``), with TWO
    WordPiece-specific changes: symbols are two-family (the word's
    first char as-is, every later char ``##``-prefixed, so merges build
    word-initial and continuation pieces with independent statistics),
    and the argmax is scored by the WordPiece likelihood gain
    ``count(ab) / (count(a) * count(b))`` — the pair whose merge most
    raises corpus likelihood under a unigram piece model — instead of
    the raw pair count.  The score is ONE double division of exact
    integer-valued doubles (products < 2^53), bit-identical across
    engines; ties break pair-asc.

    The RIGHT symbol of an adjacent pair is always a continuation (only
    position 1 is word-initial, and merges preserve that), so the merged
    symbol is ``left + right[2:]`` — asserted, not assumed.

    Scale shape per round: pair and symbol counts collapse map-side onto
    the bounded symbol-pair universe; the two count tables join at
    vocab scale (never fact scale); ONLY the argmax row crosses the
    driver and re-enters the next round's plan as a replace literal.
    Returns ``[(round, pair, merged, n_pair, n_left, n_right), ...]``.
    """
    words = with_words(df, text_col).select(F.explode("words").alias("w"))
    # WEIGHTED-DISTINCT rewrite (r14): identical to bpe_train_merges —
    # pair and symbol counts are per-word-string functions, so summing
    # the corpus frequency f over distinct words is bit-identical to
    # counting occurrences, and every round then runs at vocab scale
    wf = words.groupBy("w").agg(F.count("*").alias("f"))
    sdf = wf.select(
        F.expr(
            "concat(' ', array_join(transform(sequence(1, length(w)),"
            " i -> IF(i = 1, substring(w, 1, 1),"
            " concat('##', substring(w, i, 1)))), ' '), ' ')"
        ).alias("s"),
        "f",
    )
    # pin the two-family symbol table once (the bpe_train_merges
    # discipline): each round re-reads blocks through the replace chain
    sdf = materialize(sdf)
    out_rows: list[tuple[int, str, str, int, int, int]] = []
    for rnd in range(1, rounds + 1):
        split_once = sdf.select(
            F.expr("split(trim(s), ' ')").alias("a"), "f"
        )
        pc = (
            split_once.filter(F.expr("size(a) >= 2"))
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(a) - 1),"
                        " i -> concat(element_at(a, i), ' ',"
                        " element_at(a, i + 1)))"
                    )
                ).alias("pair"),
                "f",
            )
            .groupBy("pair")
            .agg(F.sum("f").alias("n"))
        )
        sc = (
            split_once.select(F.explode("a").alias("sym"), "f")
            .groupBy("sym")
            .agg(F.sum("f").alias("c"))
        )
        cl = sc.select(F.col("sym").alias("_l"), F.col("c").alias("nl"))
        cr = sc.select(F.col("sym").alias("_r"), F.col("c").alias("nr"))
        scored = (
            pc.join(cl, F.expr("substring_index(pair, ' ', 1) = _l"))
            .join(cr, F.expr("substring_index(pair, ' ', -1) = _r"))
            .select(
                "pair",
                "n",
                "nl",
                "nr",
                (
                    F.col("n").cast("double")
                    / (F.col("nl").cast("double") * F.col("nr").cast("double"))
                ).alias("score"),
            )
        )
        top = (
            scored.orderBy(F.desc("score"), F.asc("pair")).limit(1).collect()
        )  # ONE row — the argmax merge, kmeans-style exchange
        if not top:
            break
        pair = top[0]["pair"]
        left, right = pair.split(" ", 1)
        assert right.startswith("##"), (
            f"WordPiece invariant broken: right symbol {right!r} is not a "
            "continuation — a word-initial symbol appeared at position >= 2"
        )
        merged = left + right[2:]
        out_rows.append(
            (rnd, pair, merged, int(top[0]["n"]), int(top[0]["nl"]), int(top[0]["nr"]))
        )
        sdf = sdf.select(
            F.expr(f"replace(s, ' {pair} ', ' {merged} ')").alias("s"), "f"
        )
    return out_rows


def wordpiece_merge_table(
    df: DataFrame, text_col: str = "text", rounds: int = 3
) -> DataFrame:
    """The likelihood-trainer row: one row per round with the winning
    pair, its merged symbol, and the three counts behind its score."""
    spark = df.sparkSession
    rows = wordpiece_train_merges(df, text_col=text_col, rounds=rounds)
    return spark.createDataFrame(
        rows,
        "round int, pair string, merged string, n_pair bigint,"
        " n_left bigint, n_right bigint",
    )
