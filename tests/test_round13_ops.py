"""Round-13 operator tests: unigram-LM tokenizer family."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spark_stream_analyzer_spark.operators import text


def _seg_spark(spark, cases, probs):
    """Expression-DP segmentation of many words in ONE job."""
    wdf = spark.createDataFrame([(w,) for w in cases], "wd string")
    rows = text.segment_words(wdf, probs).collect()
    return {r["wd"]: list(r["ps"]) for r in rows}


def test_unigram_viterbi_expression_matches_python_twin(spark):
    """The aggregate-HOF DP and the Arrow path's Python DP must agree
    EXACTLY (pieces, not just counts) over a seeded random sweep of
    words and models — the cross-path parity the bigvocab driver row
    hash-checks end-to-end."""
    rng = random.Random(0x13A)
    alphabet = "abcde"
    # random vocab: all single chars + random 2/3-grams, integer-ratio probs
    pieces = list(alphabet)
    for _ in range(12):
        n = rng.choice((2, 3))
        pieces.append("".join(rng.choice(alphabet) for _ in range(n)))
    pieces = sorted(set(pieces))
    weights = {p: rng.randint(1, 9) for p in pieces}
    total = sum(weights.values())
    probs = {p: w / total for p, w in weights.items()}

    words = list(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, text._UNI_MAX_WORD)))
            for _ in range(60)
        }
    )
    got = _seg_spark(spark, words, probs)
    for w in words:
        assert got[w] == text._unigram_viterbi_py(w, probs), w
        assert "".join(got[w]) == w  # segmentation covers the word exactly


def test_unigram_viterbi_tie_prefers_longer_piece(spark):
    """Engineered exact tie: p(ab) == p(a)*p(b) — the shared
    c3 >= c2 >= c1 CASE order must pick the LONGER piece on both the
    expression path and the Python twin."""
    probs = {"a": 0.25, "b": 0.25, "ab": 0.0625, "c": 0.5}
    assert text._unigram_viterbi_py("ab", probs) == ["ab"]
    assert _seg_spark(spark, ["ab"], probs)["ab"] == ["ab"]
    # and the greedy-looking trap: 'abc' where ab+c beats a+b+c anyway
    assert text._unigram_viterbi_py("abc", probs) == ["ab", "c"]


def test_unigram_encode_paths_bit_identical(spark, sf_dir):
    """Expression/join path vs Arrow path over real docs: identical
    stats AND stream hashes (the _UNI_TRIE_MIN_VOCAB auto-select must
    be invisible in the output)."""
    from spark_stream_analyzer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    _, _, probs = text.unigram_train(docs, iters=2)
    a = sorted(map(tuple, text.unigram_encode_stats(docs, probs).collect()))
    pad = {f"Q{i}": 1e-9 for i in range(text._UNI_TRIE_MIN_VOCAB)}
    b = sorted(
        map(tuple, text.unigram_encode_stats(docs, {**probs, **pad}).collect())
    )
    assert a == b


def test_unigram_encode_empty_and_long_word_edges(spark):
    """Empty docs emit zero counts + the hash of ''; words over the
    length cap are excluded from every stat on both physical paths."""
    long_word = "x" * (text._UNI_MAX_WORD + 1)
    docs = spark.createDataFrame(
        [(0, "aa bb"), (1, ""), (2, f"aa {long_word}")],
        "doc_id long, text string",
    )
    probs = {"a": 0.3, "b": 0.2, "aa": 0.25, "bb": 0.25}
    for model in (probs, {**probs, **{f"Q{i}": 1e-9 for i in range(text._UNI_TRIE_MIN_VOCAB)}}):
        rows = {
            r["doc_id"]: r
            for r in text.unigram_encode_stats(docs, model).collect()
        }
        assert rows[0].n_pieces == 2  # ['aa', 'bb']
        assert rows[0].n_multi_pieces == 2
        assert rows[0].n_chars == 4
        assert rows[1].n_pieces == 0
        assert rows[1].n_chars == 0
        # doc 2: the 17-char word is dropped, only 'aa' encodes
        assert rows[2].n_pieces == 1
        assert rows[2].n_chars == 2
        # empty stream hash == hash of '' (not NULL)
        assert rows[1].stream_hash is not None


def test_unigram_train_model_shape(spark, sf_dir):
    """Vocab always contains every corpus character (segmentability
    invariant), probs are a Laplace distribution over the fixed vocab
    (sum == (total+|V|-adjusted) 1), ranks are dense from 1."""
    from spark_stream_analyzer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    vocab, cnts, probs = text.unigram_train(docs, iters=2)
    chars = {
        c
        for (w,) in docs.select(
            F.explode(F.expr(text.TH.spark_norm_words("text")))
        ).collect()
        for c in w
        if len(w) <= text._UNI_MAX_WORD
    }
    assert chars <= set(vocab)
    assert set(cnts) == set(vocab) == set(probs)
    assert all(p > 0 for p in probs.values())
    assert abs(sum(probs.values()) - 1.0) < 1e-9
    tbl = text.unigram_lm_table(docs, iters=2).collect()
    assert [r["rank"] for r in tbl] == list(range(1, len(vocab) + 1))
    # ranked by (cnt desc, piece asc)
    key = [(-r["cnt"], r["piece"]) for r in tbl]
    assert key == sorted(key)


def test_unigram_prune_keeps_chars_and_caps_multi(spark, sf_dir):
    """Pruning must never drop a character (segmentability), must cap
    multi-char pieces at keep_multi, and the reported probs must be a
    proper Laplace distribution over the pruned vocab."""
    from spark_stream_analyzer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    full = {r["piece"] for r in text.unigram_lm_table(docs, iters=2).collect()}
    pruned = text.unigram_prune_table(docs, iters=2, keep_multi=5).collect()
    pieces = [r["piece"] for r in pruned]
    chars_full = {p for p in full if len(p) == 1}
    assert {p for p in pieces if len(p) == 1} == chars_full
    assert sum(1 for p in pieces if len(p) >= 2) <= 5
    assert set(pieces) <= full
    assert [r["rank"] for r in pruned] == list(range(1, len(pieces) + 1))
    assert all(r["prob"] > 0 for r in pruned)


def test_unigram_viterbi_is_globally_optimal():
    """OPTIMALITY, not just parity: for every word short enough to
    enumerate exhaustively, the DP's product score must equal the max
    over ALL segmentations into pieces of length 1-3 (out-of-vocab
    pieces score 0), under several random models."""
    rng = random.Random(0xD9)

    def all_segs(w):
        if not w:
            yield []
            return
        for j in (1, 2, 3):
            if len(w) >= j:
                for rest in all_segs(w[j:]):
                    yield [w[:j]] + rest

    def score(seg, probs):
        s = 1.0
        for p in seg:
            s *= probs.get(p, 0.0)
        return s

    alphabet = "abc"
    for _ in range(5):
        pieces = sorted(
            set(alphabet)
            | {
                "".join(rng.choice(alphabet) for _ in range(rng.choice((2, 3))))
                for _ in range(6)
            }
        )
        w8 = {p: rng.randint(1, 9) for p in pieces}
        total = sum(w8.values())
        probs = {p: c / total for p, c in w8.items()}
        for _ in range(20):
            word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            got = text._unigram_viterbi_py(word, probs)
            best = max(score(s, probs) for s in all_segs(word))
            assert score(got, probs) == best, (word, got, best)


def test_logreg_score_consistency(spark, sf_dir):
    """Serving-row invariants: predicted == (score >= 0.5), correct ==
    (predicted == y), score == round6(sigmoid(z6)), one row per vector."""
    import math

    from spark_stream_analyzer_spark.operators import similarity
    from spark_stream_analyzer_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    w_rows = similarity.logistic_regression_gd(emb, iters=3).collect()
    weights = [r["weight"] for r in sorted(w_rows, key=lambda r: r["dim"])]
    rows = similarity.logistic_score(emb, weights).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert r.predicted == int(r.score >= 0.5)
        assert r.correct == int(r.predicted == r.y)
        assert abs(r.score - round(1.0 / (1.0 + math.exp(-r.z6)), 6)) < 1e-12
