"""Round-14 operator tests: auto-derived sign-LSH plane knob."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.operators import similarity


def test_derive_n_planes_formula_pins():
    """Pin the derived knob at the corpus sizes that matter: the test
    fixtures, the r13 100x probe corpus (where the derived 13 planes =
    8,192 buckets is EXACTLY the configuration SCALING.md r13 measured
    as 29x faster than the fixed 64-bucket knob), and both clamps."""
    d = similarity.derive_n_planes
    assert d(250, 250) == 4          # sf0.001 / sf0.01 halves -> lo clamp
    assert d(1000, 1000) == 6        # sf0.1 halves
    assert d(100_000, 100_000) == 13  # the r13 100x probe corpus
    assert d(1, 1) == similarity.AUTO_PLANES_LO
    assert d(10**12, 1) == similarity.AUTO_PLANES_HI
    # asymmetric corpora: the LARGER side drives the knob
    assert d(100_000, 10) == 13
    # exact power boundaries: ceil semantics, no off-by-one
    t = similarity.AUTO_TARGET_BUCKET_ROWS
    assert d(t * 16, 1) == 4          # exactly 16 buckets needed -> 2^4
    assert d(t * 16 + 1, 1) == 5      # one row past -> next power
    assert d(t * 17, 1) == 5


def test_derive_n_planes_matches_sql_case_chain():
    """The DuckDB oracle twin (integer ceil-div + CASE chain over powers
    of two) must equal the Python derivation for every corpus size in a
    boundary-dense grid — the cross-engine knob-formula pin the auto
    driver row's n_planes RESULT column re-checks on real counts."""
    t = similarity.AUTO_TARGET_BUCKET_ROWS
    lo, hi = similarity.AUTO_PLANES_LO, similarity.AUTO_PLANES_HI
    case = " ".join(f"WHEN bn <= {1 << k} THEN {k}" for k in range(17))
    sizes = sorted(
        {1, 2, t - 1, t, t + 1, 250, 1000, 2000}
        | {t * (1 << k) for k in range(14)}
        | {t * (1 << k) + 1 for k in range(14)}
    )
    con = duckdb.connect()
    for n in sizes:
        got = con.execute(
            f"SELECT GREATEST({lo}, LEAST({hi}, CASE {case} ELSE 99 END))"
            f" FROM (SELECT ({n} + {t} - 1) // {t} AS bn)"
        ).fetchone()[0]
        assert got == similarity.derive_n_planes(n, 1), n


def test_unigram_long_piece_dp_parity(spark):
    """r13 verdict task 3 (piece cap 3 -> 6): the expression DP and the
    Python twin must agree EXACTLY on models containing pieces of every
    length up to _UNI_MAX_PIECE, including whole-word pieces and
    engineered long-vs-short ties."""
    import random

    from spark_stream_analyzer_spark.operators import text

    assert text._UNI_MAX_PIECE == 6
    rng = random.Random(0x14A)
    alphabet = "abcd"
    pieces = list(alphabet)
    for n in (2, 3, 4, 5, 6):
        for _ in range(4):
            pieces.append("".join(rng.choice(alphabet) for _ in range(n)))
    pieces = sorted(set(pieces))
    weights = {p: rng.randint(1, 9) for p in pieces}
    total = sum(weights.values())
    probs = {p: w / total for p, w in weights.items()}
    words = list(
        {
            "".join(
                rng.choice(alphabet)
                for _ in range(rng.randint(1, text._UNI_MAX_WORD))
            )
            for _ in range(80)
        }
        # every vocab piece as its own word: a 6-char piece must win
        # over any split of itself whenever its prob beats the product
        | set(pieces)
    )
    wdf = spark.createDataFrame([(w,) for w in words], "wd string")
    got = {r["wd"]: list(r["ps"]) for r in text.segment_words(wdf, probs).collect()}
    for w in words:
        assert got[w] == text._unigram_viterbi_py(w, probs), w
        assert "".join(got[w]) == w


def test_unigram_long_tie_prefers_longer_piece(spark):
    """Engineered EXACT tie at length 6: p(abcabc) == p(abc)^2 — the
    longest-first CASE must pick the 6-char piece on both paths."""
    from spark_stream_analyzer_spark.operators import text

    probs = {"a": 0.5, "b": 0.5, "c": 0.5, "abc": 0.25, "abcabc": 0.0625}
    assert text._unigram_viterbi_py("abcabc", probs) == ["abcabc"]
    wdf = spark.createDataFrame([("abcabc",)], "wd string")
    assert list(text.segment_words(wdf, probs).collect()[0]["ps"]) == ["abcabc"]


def test_corpus_join_auto_equals_pinned_at_derived_knob(spark, sf_dir):
    """auto is a knob DERIVATION, not a different algorithm: the auto
    join must be row-identical to the fixed-knob join at the derived
    plane count (hyperplanes() prefix-consistency makes this exact)."""
    from spark_stream_analyzer_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    np_derived = similarity.derive_n_planes(a.count(), b.count())
    auto = similarity.lsh_corpus_join_topk(a, b, k=3).collect()
    pinned = similarity.lsh_corpus_join_topk(a, b, k=3, n_planes=np_derived).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, pinned))
    assert len(auto) > 0


# --------------------------------------------------------------- GIF (task 4)


def _gif_fixture(doc_id: int):
    w = 3 + doc_id % 5
    h = 2 + doc_id % 4
    v = doc_id % 200
    return [[(v + r) & 0xFF] * w for r in range(h)], w, h, v


def test_gif_roundtrip_witnesses():
    """Closed-form witnesses across interlaced and sequential payloads:
    row-order (top/bottom), dictionary resets (one CLEAR per row), and
    palette-mapped values."""
    from spark_stream_analyzer_spark.operators import multimodal as mm

    for doc_id in range(20):
        rows, w, h, v = _gif_fixture(doc_id)
        m = mm.decode_gif(mm.encode_gif(rows, w, h, interlace=doc_id % 2 == 0))
        assert (m["width"], m["height"]) == (w, h)
        assert m["top_left"] == v and m["bottom_left"] == v + h - 1
        assert m["mean_pixel"] == v + (h - 1) / 2
        assert m["n_clear_codes"] == h
        assert m["interlaced"] == (doc_id % 2 == 0)


def test_gif_lzw_width_growth_roundtrip():
    """The encoder CLEAR-flushes per row, so only a LONG single row can
    grow the dictionary: one seeded pseudo-random 12000-px row must
    drive the code width through 10/11/12 bits and across the 4096-entry
    cap, and decode byte-identically — a width-rule mismatch between
    encoder and decoder desyncs the bitstream and raises, it cannot pass
    silently.  The fixture images (<= 35 px) never leave 9 bits, which
    is exactly why this test exists."""
    import random

    from spark_stream_analyzer_spark.operators import multimodal as mm

    rng = random.Random(0x61F)
    row = [rng.randrange(256) for _ in range(12000)]
    data = mm._lzw_encode_rows([bytes(row)], 8)
    idx, n_clear, max_width = mm._lzw_decode(data, 8, len(row))
    assert idx == bytes(row)
    assert n_clear == 1
    assert max_width == 12  # grew 9 -> 12 and survived the 4096 cap
    # and end-to-end through the container (sub-block framing at 255)
    m = mm.decode_gif(mm.encode_gif([row], 12000, 1))
    assert m["n_pixels"] == 12000
    assert m["top_left"] == row[0]


def test_gif_interlace_order_is_spec_permutation():
    from spark_stream_analyzer_spark.operators import multimodal as mm

    assert mm._gif_interlace_order(5) == [0, 4, 2, 1, 3]
    assert mm._gif_interlace_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    for h in range(1, 40):
        assert sorted(mm._gif_interlace_order(h)) == list(range(h))


def test_gif_untrusted_payload_hardening():
    """Truncation, corruption and gated features must raise NAMED
    errors, never return garbage stats."""
    import pytest

    from spark_stream_analyzer_spark.operators import multimodal as mm

    rows, w, h, _ = _gif_fixture(3)
    good = mm.encode_gif(rows, w, h)
    with pytest.raises(NotImplementedError, match="not a GIF"):
        mm.decode_gif(b"PNGstuff")
    with pytest.raises(ValueError, match="truncated GIF"):
        mm.decode_gif(good[:20])
    with pytest.raises(ValueError, match="no trailer|past end|ends before"):
        mm.decode_gif(good[:-2])
    # corrupt a byte inside the LZW stream: must fail the pixel-count or
    # dictionary check, never silently misdecode into a full image
    body = bytearray(good)
    lzw_at = 13 + 768 + 10 + 1 + 1  # header+GCT+descriptor+mcs+len byte
    body[lzw_at] ^= 0xFF
    with pytest.raises(ValueError):
        mm.decode_gif(bytes(body))
    # extension blocks are skipped, not fatal: splice a GCE before the
    # image descriptor
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = good[: 13 + 768] + gce + good[13 + 768 :]
    assert mm.decode_gif(spliced)["width"] == w
    # two image descriptors = animation -> gated
    img_part = good[13 + 768 : -1]
    with pytest.raises(NotImplementedError, match="animated"):
        mm.decode_gif(good[:-1] + img_part + b"\x3b")


# ------------------------------------------- weighted-median auto (task 5)


def test_weighted_median_auto_paths_agree(spark, sf_dir):
    """Force BOTH physical paths through the auto entry point (threshold
    above / below the fixture's largest group) and assert identical
    medians — the provably-path-independent contract the driver row's
    oracle relies on."""
    from spark_stream_analyzer_spark.functions.median import (
        weighted_median_grouped_auto,
    )
    from spark_stream_analyzer_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")

    def run(threshold):
        return sorted(
            map(
                tuple,
                weighted_median_grouped_auto(
                    li,
                    ["l_returnflag", "l_linestatus"],
                    "l_extendedprice",
                    "l_quantity",
                    udaf_max_group_rows=threshold,
                ).collect(),
            )
        )

    udaf_side = run(10**9)  # every group fits -> pandas UDAF
    bisect_side = run(0)    # nothing fits -> value-domain bisection
    assert udaf_side == bisect_side
    assert len(udaf_side) > 0


def test_weighted_median_auto_filters_like_bisection(spark):
    """Zero/negative weights and NULL values are dropped and zero-total
    groups omitted IDENTICALLY on both paths."""
    from spark_stream_analyzer_spark.functions.median import (
        weighted_median_grouped_auto,
    )

    df = spark.createDataFrame(
        [
            ("a", 1.0, 2),
            ("a", 5.0, 0),      # zero weight: ignored
            ("a", 9.0, 1),
            ("b", None, 3),     # NULL value: ignored
            ("b", 7.0, -4),     # negative weight: ignored
            ("c", 4.0, 1),
        ],
        "g string, v double, w long",
    )
    for threshold in (10**9, 0):
        got = {
            r["g"]: r["wmedian"]
            for r in weighted_median_grouped_auto(
                df, ["g"], "v", "w", udaf_max_group_rows=threshold
            ).collect()
        }
        # a: weights (2 @ 1.0, 1 @ 9.0), total 3, ceil(3/2)=2 -> 1.0
        # b: all rows filtered -> group omitted; c: single row -> 4.0
        assert got == {"a": 1.0, "c": 4.0}, (threshold, got)


# ---------------------------------------------------------------- z-order


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    # zorder_key's equal-width MSB-aligned placement: first dimension's
    # bit j at output bit 2j+1, second dimension's at 2j
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j + 1)
        z |= ((y >> j) & 1) << (2 * j)
    return z


def test_zvalue_matches_python_reference(spark):
    """The zorder_key delegation IS the Morton interleave: check against
    a direct Python bit-twiddle on edge and random-ish points."""
    import pyspark.sql.functions as F

    from spark_stream_analyzer_spark.operators.layout import zvalue_2d

    pts = [
        (0, 0),
        (1, 0),
        (0, 1),
        (65535, 65535),
        (65535, 0),
        (0, 65535),
        (12345, 54321),
        (40000, 1),
        (32768, 32767),
    ]
    df = spark.createDataFrame(pts, "x long, y long").select(
        "x", "y", zvalue_2d(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton_py(r.x, r.y), (r.x, r.y, r.z)


def test_zvalue_locality_beats_linear_on_box_query(spark):
    """The property the audit row measures, pinned on a synthetic uniform
    grid where the expected counts are exact: for a centered 2-D box over
    a 64x64 uniform grid, 64 z-range buckets touch strictly fewer rows
    than 64 1-D range buckets."""
    import pyspark.sql.functions as F

    from spark_stream_analyzer_spark.operators.layout import zvalue_2d

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    # quantize is identity here (values already < 2^6): shift into the
    # 16-bit grid so the 64-bucket split uses the same top-6-bit rule
    df = grid.select(
        "x",
        "y",
        F.shiftright(
            zvalue_2d(F.shiftleft("x", 10), F.shiftleft("y", 10)), 26
        ).alias("zb"),
        F.shiftright(F.shiftleft("x", 10), 10).alias("lb"),
    )
    in_box = F.col("x").between(28, 35) & F.col("y").between(28, 35)
    stats = df.groupBy("zb").agg(
        F.count(F.lit(1)).alias("n"), F.max(in_box.cast("int")).alias("hit")
    )
    z_scanned = stats.filter("hit = 1").agg(F.sum("n")).collect()[0][0]
    lstats = df.groupBy("lb").agg(
        F.count(F.lit(1)).alias("n"), F.max(in_box.cast("int")).alias("hit")
    )
    l_scanned = lstats.filter("hit = 1").agg(F.sum("n")).collect()[0][0]
    # 8x8 box = 64 selected rows; z-buckets are 8x8 tiles -> exactly 4
    # tiles (256 rows); the 1-D layout scans all y for 8 x-values but
    # buckets group 64 x-values... x in [28,35] spans buckets of the
    # 6-bit x alone -> 8 of 64 lb buckets, each a full column (64 rows)
    assert z_scanned == 4 * 64, z_scanned
    assert l_scanned == 8 * 64, l_scanned
    assert z_scanned < l_scanned


# ------------------------------------------------------------- wordpiece


def test_wordpiece_greedy_matches_python_reference(spark):
    """The expression greedy and the Python twin must produce identical
    segmentations, including longest-match-first tie behavior and the
    whole-word [UNK] fallback under a RESTRICTED vocab (the path the
    driver rows provably never take — all-singles vocab)."""
    from spark_stream_analyzer_spark.operators import text

    vocab = {"un", "##able", "##b", "##le", "u", "##n", "##a", "x"}
    words = ["unable", "unb", "xq", "u", "zzz"]
    # Python reference
    py = {w: text._wordpiece_word_py(w, vocab) for w in words}
    assert py["unable"] == ["un", "##able"]  # longest continuation wins
    assert py["unb"] == ["un", "##b"]
    assert py["xq"] == ["[UNK]"]  # '##q' missing -> whole word UNKs
    assert py["u"] == ["u"]
    assert py["zzz"] == ["[UNK]"]  # 'z' not even word-initial
    wdf = spark.createDataFrame([(w,) for w in words], "wd string")
    got = {
        r["wd"]: list(r["ps"])
        for r in text.wp_segment_words(wdf, vocab).collect()
    }
    assert got == py, (got, py)


def test_wordpiece_arrow_path_parity(spark, sf_dir):
    """Auto-select: padding the vocab past the gate flips the plan to
    ArrowEvalPython but must not change one output value (string
    membership only — no float drift surface)."""
    import pyspark.sql.functions as F

    from spark_stream_analyzer_spark.operators import text
    from spark_stream_analyzer_spark.plans.q_llm import _docs

    docs = _docs(spark, sf_dir).limit(80)
    vocab, _ = text.wordpiece_vocab(docs)
    small = text.wordpiece_encode_stats(docs, vocab)
    assert "ArrowEvalPython" not in small._jdf.queryExecution().executedPlan().toString()
    pad = [f"Q{i}" for i in range(text._WP_TRIE_MIN_VOCAB)]
    big = text.wordpiece_encode_stats(docs, list(vocab) + pad)
    assert "ArrowEvalPython" in big._jdf.queryExecution().executedPlan().toString()
    a = {r["doc_id"]: tuple(r)[1:] for r in small.collect()}
    b = {r["doc_id"]: tuple(r)[1:] for r in big.collect()}
    assert a == b
    # the all-singles invariant: no UNKs anywhere on the real corpus
    assert small.agg(F.sum("n_unk_words")).collect()[0][0] == 0


def test_wordpiece_likelihood_beats_raw_count(spark):
    """The WordPiece score n(ab)/(n(a)n(b)) must pick a rare-but-
    EXCLUSIVE pair over the most frequent one: 'qz' appears 3 times and
    q/z appear nowhere else (score 3/(3*3)=1/3), while 'ab' appears 6
    times but a and b are everywhere (score 6/(9*9)); raw-count BPE
    would merge 'ab' first."""
    from spark_stream_analyzer_spark.operators import text

    docs = spark.createDataFrame(
        [(1, "qzab qzab qzab ab ab ab aa bb")], "doc_id long, text string"
    )
    rows = text.wordpiece_train_merges(docs, rounds=1)
    (rnd, pair, merged, n, nl, nr) = rows[0]
    assert pair == "q ##z" and merged == "qz"  # merged strips the right '##'
    assert (n, nl, nr) == (3, 3, 3)
    bpe = text.bpe_train_merges(docs, rounds=1)
    assert bpe[0][1] != pair  # the raw-count rule picks differently


def test_wordpiece_inline_path_is_stateless_projection(spark, sf_dir):
    """The serving form: inline greedy must equal the seg-join path
    value-for-value, with NO Python stage and NO exchange in its plan
    (what lets it run as an append-mode stateless stream projection)."""
    from spark_stream_analyzer_spark.operators import text
    from spark_stream_analyzer_spark.plans.q_llm import _docs

    docs = _docs(spark, sf_dir).limit(60)
    vocab, _ = text.wordpiece_vocab(docs)
    inline = text.wordpiece_encode_stats(docs, vocab, path="inline")
    plan = inline._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "Exchange" not in plan, plan
    join = text.wordpiece_encode_stats(docs, vocab)
    a = sorted(map(tuple, inline.collect()))
    b = sorted(map(tuple, join.collect()))
    assert a == b


def test_unigram_inline_path_is_stateless_projection(spark, sf_dir):
    """The unigram serving form: the LET-bound inline Viterbi must equal
    the seg-join path value-for-value with NO Python stage and NO
    exchange — what lets streaming_unigram_docs run append-mode."""
    from spark_stream_analyzer_spark.operators import text
    from spark_stream_analyzer_spark.plans.q_llm import _docs

    docs = _docs(spark, sf_dir).limit(60)
    _, _, probs = text.unigram_train(docs, iters=2)
    inline = text.unigram_encode_stats(docs, probs, path="inline")
    plan = inline._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "Exchange" not in plan, plan
    a = sorted(map(tuple, inline.collect()))
    b = sorted(map(tuple, text.unigram_encode_stats(docs, probs).collect()))
    assert a == b
