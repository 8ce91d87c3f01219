"""Round-14 OPTIMIZATION invariants — focused pins for the internals the
optimization round changed (the rule: an optimization that changes an
operator's internals gets a test proving the change is value-invisible).

1. Weighted-distinct trainers: BPE / WordPiece merge training now counts
   pairs over DISTINCT words weighted by corpus frequency; must equal a
   brute per-occurrence recount on a repetition-heavy corpus.
2. CC loop (neighbor-min init + double label hop): must equal brute-force
   union-find components on an adversarial mixed graph.
3. Length-partitioned model literals: vocabularies with EMPTY length
   buckets (no pieces of some lengths) must segment identically to the
   Python twin — the try_element_at(empty map) path.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _brute_bpe_round(word_counts: dict[str, int]) -> tuple[str, int]:
    """Per-occurrence pair argmax over char-split words (count desc,
    pair asc) — the pre-r14 trainer's semantics, reimplemented naively."""
    counts: dict[str, int] = {}
    for w, f in word_counts.items():
        syms = list(w)
        for a, b in zip(syms, syms[1:]):
            counts[f"{a} {b}"] = counts.get(f"{a} {b}", 0) + f
    return min(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def test_bpe_trainer_weighted_distinct_equals_per_occurrence(spark):
    from spark_stream_analyzer_spark.operators.text import bpe_train_merges

    # repetition-heavy corpus: few distinct words, many occurrences, a
    # tie candidate ('ab' vs 'ba' counts) to exercise the pair-asc break
    docs = spark.createDataFrame(
        [(0, "abab abab banana"), (1, "abab banana banana"), (2, "cc " * 50)],
        "doc_id long, text string",
    )
    wc: dict[str, int] = {}
    for _, t in docs.collect():
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    pair, n = _brute_bpe_round(wc)
    got = bpe_train_merges(docs, rounds=1)
    assert got[0][1] == pair and got[0][2] == n


def test_wordpiece_trainer_weighted_distinct_counts(spark):
    from spark_stream_analyzer_spark.operators.text import (
        wordpiece_train_merges,
    )

    docs = spark.createDataFrame(
        [(0, "aaa aaa aaa bb"), (1, "aaa bb bb")],
        "doc_id long, text string",
    )
    rows = wordpiece_train_merges(docs, rounds=1)
    rnd, pair, merged, n_pair, n_left, n_right = rows[0]
    # brute per-occurrence two-family counts: 'aaa' x4 -> symbols
    # [a, ##a, ##a], pairs ('a','##a') x4 and ('##a','##a') x4; 'bb' x3
    # -> [b, ##b], pair ('b','##b') x3. Symbols: a:4, ##a:8, b:3, ##b:3.
    # Scores: 4/(4*8)=0.125; 4/(8*8)=0.0625; 3/(3*3)=0.333 -> 'b ##b'.
    assert (pair, merged, n_pair, n_left, n_right) == ("b ##b", "bb", 3, 3, 3)


def _brute_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_duplicate_clusters_equals_union_find_on_mixed_graph(spark):
    """Adversarial mix: a 40-node chain (deep diameter — exercises the
    double hop), a clique, a star whose min id arrives via a leaf, and
    an isolated pair; labels must equal union-find component minima."""
    from spark_stream_analyzer_spark.operators.dedup import (
        duplicate_clusters,
    )

    edges = (
        [(i + 1, i) for i in range(100, 140)]          # descending chain
        + [(200 + i, 200 + j) for i in range(5) for j in range(i)]  # clique
        + [(300, 301), (300, 302), (300, 1)]           # star, min via leaf
        + [(400, 401)]
    )
    brute = _brute_components(edges)
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id for r in duplicate_clusters(df).collect()}
    assert got == brute


def test_unigram_inline_handles_empty_length_buckets(spark):
    """A model whose vocab has NO pieces of lengths 3..6 (single chars +
    one length-2 piece only) must ride the empty per-length maps without
    error and match the Python twin exactly."""
    from spark_stream_analyzer_spark.operators.text import (
        _unigram_viterbi_py,
        unigram_encode_stats,
    )

    probs = {"a": 0.3, "b": 0.2, "n": 0.1, "na": 0.4}
    docs = spark.createDataFrame(
        [(0, "banana ban a"), (1, "nanana")], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_pieces, r.n_multi_pieces)
        for r in unigram_encode_stats(docs, probs, path="inline").collect()
    }
    def enc(text):
        ps = [p for w in text.split() for p in _unigram_viterbi_py(w, probs)]
        return len(ps), sum(1 for p in ps if len(p) >= 2)
    assert out == {0: enc("banana ban a"), 1: enc("nanana")}


def test_wordpiece_inline_handles_empty_length_buckets(spark):
    """Same empty-bucket pin for the greedy's membership maps."""
    from spark_stream_analyzer_spark.operators.text import (
        _wordpiece_word_py,
        wordpiece_encode_stats,
    )

    vocab = ["a", "b", "n", "##a", "##n", "##na", "ba"]  # lengths 1-2 only
    docs = spark.createDataFrame(
        [(0, "banana bq"), (1, "nab")], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_pieces, r.n_unk_words)
        for r in wordpiece_encode_stats(docs, vocab, path="inline").collect()
    }
    vset = frozenset(vocab)
    def enc(text):
        ps = [p for w in text.split() for p in _wordpiece_word_py(w, vset)]
        return len(ps), sum(1 for p in ps if p == "[UNK]")
    assert out == {0: enc("banana bq"), 1: enc("nab")}
