"""Property-based tests (SURVEY §5: rebuild test strategy) — hypothesis
generates adversarial field values; a Python re-implementation of the
wire contract is the independent oracle for the columnar parsers, and
set identities check the hash/shingle layer.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import Row

from spark_stream_analyzer_spark.operators import dedup
from spark_stream_analyzer_spark.sources.wire import parse_kill_lines

# CSV fields: no commas (the wire format has no quoting); printable ascii
FIELD = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters=","),
    max_size=8,
)
WORD = st.text(alphabet="abcdefg", min_size=1, max_size=4)


def expected_kill_fanout(killer: str, victim: str, assister: str) -> int:
    n = 0
    if killer != "":
        n += 1
    if victim != "":
        n += 1
    if assister != "" and assister != "0":
        n += 1
    return n


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 99), FIELD, FIELD, FIELD),
        min_size=1,
        max_size=8,
    )
)
def test_kill_parser_fanout_and_fields(spark, lines):
    rows, expected = [], 0
    for tick, rnd, killer, victim, assister in lines:
        cols = ["x"] * 13
        cols[1], cols[2] = str(tick), str(rnd)
        cols[3], cols[4] = killer, "K_ID"
        cols[7], cols[8] = victim, "V_ID"
        cols[11], cols[12] = assister, "A_ID"
        rows.append(Row(value=",".join(cols)))
        expected += expected_kill_fanout(killer, victim, assister)
    out = parse_kill_lines(spark.createDataFrame(rows)).collect()
    assert len(out) == expected
    for ev in out:
        assert ev.type in ("kill", "death", "assist")
        assert ev.steam_id in ("K_ID", "V_ID", "A_ID")
        # integer-division second: floor(tick/128) stays in the tick range
        assert 0 <= ev.second and ev.second * 128 <= 10**6
        assert 0 <= ev.round <= 99


@settings(max_examples=8, deadline=None)
@given(st.lists(WORD, min_size=0, max_size=12))
def test_minhash_identity_and_shingle_bounds(spark, words):
    """jaccard(x, x) = 1 via identical signatures; shingle count ≤ n-k+1."""
    text = " ".join(words)
    df = spark.createDataFrame(
        [Row(doc_id=0, text=text, lang="en", source="t", n_chars=len(text)),
         Row(doc_id=1, text=text, lang="en", source="t", n_chars=len(text))]
    )
    sig = dedup.minhash_signatures(df)
    rows = {r.doc_id: r for r in sig.collect()}
    assert [rows[0][f"mh{j}"] for j in range(16)] == [rows[1][f"mh{j}"] for j in range(16)]
    n_sh = rows[0].asDict()["sh"]
    assert len(n_sh) <= max(0, len(words) - 2)  # ≤ n-k+1 with k=3 (distinct may shrink)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=1,
            max_size=16,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_int8_quantization_invariants(spark, vectors):
    """Codes stay in [-127, 127] and per-element reconstruction error is
    bounded by scale/2 — for arbitrary float vectors, zero vectors
    included."""
    from spark_stream_analyzer_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in enumerate(vectors)],
        "vec_id: long, embedding: array<float>",
    )
    for r in quantize_int8(df).collect():
        assert -127 <= r.code_min <= r.code_max <= 127
        scale = max(abs(float(x)) for x in vectors[r.vec_id]) / 127.0
        # mse <= (scale/2)^2 since every element's error is <= scale/2
        assert r.mse <= (scale / 2.0) ** 2 + 1e-9


@settings(max_examples=8, deadline=None)
@given(st.lists(st.lists(WORD, min_size=0, max_size=12), min_size=1, max_size=8))
def test_tfidf_topk_is_ranked_and_bounded(spark, docs):
    """Per doc: at most k rows, scores non-increasing in output rank
    order, and every returned term occurs in that document."""
    from spark_stream_analyzer_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id: long, text: string",
    )
    rows = tfidf_top_terms(df, k=3).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        assert len(rs) <= 3
        scores = [r.tfidf for r in sorted(rs, key=lambda r: (-r.tfidf, r.term))]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            assert r.term in docs[doc_id]


def test_int_div_matches_java_semantics_at_full_long_range(spark):
    """Truncate-toward-zero like Java long division, exact beyond 2^53
    (where a double round-trip silently loses low bits)."""
    from pyspark.sql import functions as F

    from spark_stream_analyzer_spark.functions.scalar import int_div

    cases = [
        (7, 2), (-7, 2), (7, -2), (-7, -2), (0, 5), (1, 128),
        (2**62 + 3, 3), (-(2**62 + 3), 3), (2**63 - 1, 7),
        (9007199254740995, 2), (-(2**63) + 1, 128), (10**18 + 1, 10**6),
    ]
    rows = [
        (a, b, abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1))
        for a, b in cases
    ]
    df = spark.createDataFrame(rows, "a long, b long, expected long")
    bad = df.filter(int_div(F.col("a"), F.col("b")) != F.col("expected"))
    assert bad.count() == 0


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.text(alphabet="ab", min_size=0, max_size=6), min_size=2, max_size=10),
    st.randoms(use_true_random=False),
    st.integers(1, 2),
)
def test_fuzzy_pairs_complete_vs_bruteforce(spark, base, rnd, max_dist):
    """Symmetric-delete blocking must find EXACTLY the brute-force
    dist<=d pairs for d in {1, 2} — including pairs created by
    adversarial stacked edits (insert/delete/substitute) on tiny
    repeated-alphabet strings, where blocking schemes typically lose
    pairs."""
    from spark_stream_analyzer_spark.operators.fuzzy import fuzzy_pairs

    names = list(base)
    for s in base[:4]:  # plant guaranteed near neighbors
        p = rnd.randrange(len(s) + 1)
        names.append(s[:p] + "a" + s[p:])           # insertion
        if s:
            names.append(s[:p] + s[p + 1:] if p < len(s) else s[:-1])  # deletion
        if max_dist == 2:  # stacked double edits for the d=2 frontier
            q = rnd.randrange(len(s) + 2)
            t = s[:p] + "b" + s[p:]
            names.append(t[:q] + "a" + t[q:])        # double insertion
            if len(t) > 1:
                names.append(t[: min(q, len(t) - 1)] + t[min(q, len(t) - 1) + 1 :])
    rows = [(i, n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "name", max_dist=max_dist).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for (i, a) in rows
        for (j, b) in rows
        if i < j and _lev(a, b) <= max_dist
    }
    assert got == want


# ---------------------------------------------------- round-4b operators


def _brute_islands(days: set[int]) -> tuple[int, int, int]:
    """(n_active_days, n_streaks, longest) by linear scan — the obvious
    Python re-derivation, independent of the window-trick identity."""
    ds = sorted(days)
    streaks, cur = [], 1
    for a, b in zip(ds, ds[1:]):
        if b == a + 1:
            cur += 1
        else:
            streaks.append(cur)
            cur = 1
    streaks.append(cur)
    return len(ds), len(streaks), max(streaks)


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(
        st.integers(1, 5),  # user_id
        st.sets(st.integers(0, 40), min_size=1, max_size=15),  # active days
        min_size=1,
        max_size=5,
    )
)
def test_activity_islands_matches_bruteforce(spark, tmp_path_factory, per_user):
    import datetime as dt

    rows, eid = [], 0
    for uid, days in per_user.items():
        for day in days:
            eid += 1
            ts = dt.datetime(1970, 1, 1) + dt.timedelta(days=day, hours=eid % 3)
            rows.append((eid, uid, ts, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    d = tmp_path_factory.mktemp("islands_prop")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    got = {
        r["user_id"]: (r["n_active_days"], r["n_streaks"], r["longest_streak"])
        for r in QUERIES["events_activity_islands"].build(spark, str(d)).collect()
    }
    want = {uid: _brute_islands(days) for uid, days in per_user.items()}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=20)
)
def test_state_intervals_cover_and_collapse(spark, tmp_path_factory, states):
    """Intervals must partition the event sequence: counts sum to n,
    consecutive-equal states never split, adjacent intervals differ."""
    import datetime as dt

    rows = [
        (i, 1, dt.datetime(1970, 1, 1) + dt.timedelta(seconds=100 * i), s, 1.0, "{}")
        for i, s in enumerate(states)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    d = tmp_path_factory.mktemp("intervals_prop")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    out = sorted(
        QUERIES["events_state_intervals"].build(spark, str(d)).collect(),
        key=lambda r: r["seg_id"],
    )
    # run-length encoding of states is the independent expectation
    rle = []
    for s in states:
        if rle and rle[-1][0] == s:
            rle[-1][1] += 1
        else:
            rle.append([s, 1])
    assert [(r["state"], r["n_events"]) for r in out] == [tuple(x) for x in rle]
    assert out[-1]["valid_to_sec"] is None  # open current interval
    # each interval's valid_to equals the next interval's valid_from
    for a, b in zip(out, out[1:]):
        assert a["valid_to_sec"] == b["valid_from_sec"]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 8), st.sets(st.integers(1, 6), min_size=2, max_size=4)),
        min_size=2,
        max_size=8,
    )
)
def test_triangle_count_matches_bruteforce(spark, tmp_path_factory, orders):
    """Oriented wedge-join triangle enumeration == brute force over the
    support-thresholded co-occurrence graph."""
    from itertools import combinations

    rows, lid = [], 0
    for ok, parts in orders:
        for p in parts:
            lid += 1
            rows.append((ok, p, lid))
    # brute-force edges: distinct (order, part); pairs in >= 2 orders
    baskets = {}
    for ok, parts in orders:
        baskets.setdefault(ok, set()).update(parts)
    from collections import Counter

    support = Counter()
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            support[(a, b)] += 1
    edges = {e for e, n in support.items() if n >= 2}
    tri_count = Counter()
    nodes = sorted({x for e in edges for x in e})
    for a, b, c in combinations(nodes, 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            for x in (a, b, c):
                tri_count[x] += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long, lid long")
    d = tmp_path_factory.mktemp("tri_prop")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    got = {
        r["part"]: r["n_triangles"]
        for r in QUERIES["part_triangle_count"].build(spark, str(d)).collect()
    }
    assert got == dict(tri_count)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.sampled_from("ab"), min_size=0, max_size=17))
def test_intradoc_chunks_match_bruteforce(spark, tmp_path_factory, letters):
    words = list(letters)
    text = " ".join(words)
    chunks = [" ".join(words[i : i + 4]) for i in range(0, len(words), 4)]
    n_dup = len(chunks) - len(set(chunks))
    df = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path_factory.mktemp("chunk_prop")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    r = QUERIES["text_intradoc_dup_chunks"].build(spark, str(d)).collect()[0]
    assert r["n_chunks"] == len(chunks)
    assert r["n_dup_chunks"] == n_dup


@given(
    st.lists(
        st.tuples(st.integers(0, 2**11 - 1), st.integers(0, 2**5 - 1)),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(max_examples=12, deadline=None)
def test_zorder_key_matches_reference_and_is_injective(spark, pairs):
    """zorder_key == a pure-Python MSB-aligned Morton reference on random
    in-range (user, day) pairs, and distinct pairs map to distinct keys
    (injectivity — what makes sorting by z a lossless clustering)."""
    from pyspark.sql import functions as F

    from spark_stream_analyzer_spark.sources.layout import zorder_key

    bu, bd = 11, 5

    def ref(u, d):
        order = []
        for j in range(max(bu, bd)):
            if j < bu:
                order.append((u, bu - 1 - j))
            if j < bd:
                order.append((d, bd - 1 - j))
        total = bu + bd
        z = 0
        for idx, (val, bit) in enumerate(order):
            z |= ((val >> bit) & 1) << (total - 1 - idx)
        return z

    df = spark.createDataFrame(pairs, "u long, d long")
    z = zorder_key([(F.col("u"), bu), (F.col("d"), bd)])
    got = {(r.u, r.d): r.z for r in df.withColumn("z", z).collect()}
    expect = {(u, d): ref(u, d) for u, d in pairs}
    assert got == expect
    assert len(set(got.values())) == len(pairs)


# ---------------------------------------------------- round-9 operators


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 9), min_size=1, max_size=60),
    st.integers(1, 7),
)
def test_global_ntile_and_dense_rank_match_builtins(spark, values, n):
    """The distributed decompositions must reproduce the built-in
    single-reducer windows EXACTLY — ntile bucket boundaries (including
    the ceil/floor split when N % n != 0, and N < n) and dense_rank over
    a heavily-tied value column — on random small-domain data where ties
    cross range-partition boundaries."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from spark_stream_analyzer_spark.operators.rank import (
        global_dense_rank,
        global_ntile,
        global_rank,
    )

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(5)
    order = [F.desc("v"), F.asc("id")]
    w = Window.orderBy(F.desc("v"), F.asc("id"))

    got = {
        (r.id): (r.rnk, r.tile, r.drnk)
        for r in global_dense_rank(
            global_ntile(
                global_rank(df, order, rank_col="rnk"), order, n, tile_col="tile"
            ),
            F.col("v"),
            dense_col="drnk",
            desc=True,
        ).collect()
    }
    want = {
        r.id: (r.rnk, r.tile, r.drnk)
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rnk"),
            F.ntile(n).over(w).cast("long").alias("tile"),
            F.dense_rank().over(Window.orderBy(F.desc("v"))).cast("long").alias("drnk"),
        ).collect()
    }
    assert got == want


def test_global_dense_rank_ranks_nulls_like_builtin(spark):
    """NULL values must be RANKED (asc_nulls_first / desc_nulls_last,
    Spark's window defaults), not silently dropped by the join-back
    (r10, ADVICE: the plain equality join ate NULL rows)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from spark_stream_analyzer_spark.operators.rank import global_dense_rank

    rows = [(0, 3), (1, None), (2, 3), (3, 1), (4, None), (5, 7)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(4)
    for desc in (False, True):
        order = F.desc("v") if desc else F.asc("v")
        got = {
            r.id: r.drnk
            for r in global_dense_rank(
                df, F.col("v"), dense_col="drnk", desc=desc
            ).collect()
        }
        want = {
            r.id: r.drnk
            for r in df.select(
                "id",
                F.dense_rank()
                .over(Window.orderBy(order))
                .cast("long")
                .alias("drnk"),
            ).collect()
        }
        assert got == want, f"desc={desc}"


def test_fuzzy_pairs_empty_and_short_strings(spark):
    """Empty strings must not emit ''-deletion keys from Spark's
    descending sequence(1, 0) pitfall (r10, ADVICE) — and completeness
    must hold anyway: ''~'a' at d=1 and ''~'ab', 'a'~'b' at d=2 are all
    still found (the '' key comes from the string itself / deletions of
    NON-empty strings, never from deleting '')."""
    from spark_stream_analyzer_spark.operators.fuzzy import fuzzy_pairs

    rows = [(0, ""), (1, "a"), (2, "ab"), (3, "b"), (4, "xyz")]
    df = spark.createDataFrame(rows, "id long, name string")
    for max_dist in (1, 2):
        got = {
            (r.id_a, r.id_b): r.dist
            for r in fuzzy_pairs(df, "id", "name", max_dist=max_dist).collect()
        }
        names = dict(rows)
        want = {}
        for a in range(len(rows)):
            for b in range(a + 1, len(rows)):
                d = _lev(names[a], names[b])
                if d <= max_dist:
                    want[(a, b)] = d
        assert got == want, f"max_dist={max_dist}"


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # group
            st.integers(-50, 50),  # value (small domain -> heavy ties)
            st.integers(0, 5),  # weight (0s must be ignorable)
        ),
        min_size=1,
        max_size=80,
    )
)
def test_grouped_weighted_median_matches_bruteforce(spark, rows):
    """The distributed bisection must reproduce the pinned definition
    min{x : 2*cumw(x) >= total} exactly — across ties, zero weights,
    single-value groups, and through MULTIPLE bisection passes
    (buckets=2, finish_threshold=1 forces the deepest loop path)."""
    from spark_stream_analyzer_spark.functions.median import (
        grouped_weighted_median,
    )

    df = spark.createDataFrame(rows, "g long, v long, w long").repartition(4)
    got = {
        r.g: r.wm
        for r in grouped_weighted_median(
            df, ["g"], "v", "w", buckets=2, finish_threshold=1, max_passes=64
        )
        .withColumnRenamed("wmedian", "wm")
        .collect()
    }
    want = {}
    by_g: dict[int, list[tuple[int, int]]] = {}
    for g, v, w in rows:
        if w > 0:
            by_g.setdefault(g, []).append((v, w))
    for g, vw in by_g.items():
        vw.sort()
        total = sum(w for _, w in vw)
        cum = 0
        for v, w in vw:
            cum += w
            if 2 * cum >= total:
                want[g] = float(v)
                break
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(-30, 30)),
        min_size=1,
        max_size=60,
    )
)
def test_grouped_exact_percentiles_match_pinned_arithmetic(spark, rows):
    """The multi-target bisection must reproduce the PINNED interpolated
    percentile (pos = 1+(n-1)p; x_k + (pos-k)(x_{k+1}-x_k)) bit-exactly —
    Python doubles evaluate the identical IEEE expression tree, so
    equality here is exact, not approximate."""
    import math

    from spark_stream_analyzer_spark.functions.median import (
        grouped_exact_percentiles,
    )

    ps = [0.0, 0.5, 0.9, 1.0]
    df = spark.createDataFrame(rows, "g long, v long").repartition(4)
    got = {
        r.g: (r.p0, r.p1, r.p2, r.p3)
        for r in grouped_exact_percentiles(
            df, ["g"], "v", ps, buckets=2, finish_threshold=1, max_passes=64
        ).collect()
    }
    want = {}
    by_g: dict[int, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        vs.sort()
        n = len(vs)
        out = []
        for p in ps:
            pos = 1.0 + (float(n - 1) * p)
            k = int(math.floor(pos))
            f = pos - math.floor(pos)
            lo = float(vs[k - 1])
            hi = float(vs[min(k + 1, n) - 1])
            out.append(lo + f * (hi - lo))
        want[g] = tuple(out)
    assert got == want


def test_fuzzy_d2_candidate_count_bounded(spark):
    """The order-2 deletion blocking must stay LINEAR on a corpus of
    distinct names (like the LSH hot-band test: bound the candidate set,
    not just the verified output). Per-string key count obeys the
    1 + L + L(L-1)/2 closed form, and the block-join candidate total
    stays a small constant times n — not the n(n-1)/2 clique."""
    from pyspark.sql import functions as F

    import random

    from spark_stream_analyzer_spark.operators.fuzzy import _deletion_keys

    # names must be genuinely far apart (sequential Customer#-style ids
    # are NOT: two ids in the same hundred differ by <=2 substitutions,
    # so their quadratic pair set is true OUTPUT, not blocking waste)
    rng = random.Random(42)
    n = 300
    rows = [
        (i, "".join(rng.choice("0123456789abcdef") for _ in range(16)))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    keys = df.select(
        "id",
        F.explode(F.array_distinct(F.expr(_deletion_keys("name", 2)))).alias("blk"),
    )
    ln = 16
    per_string = keys.groupBy("id").count().agg(F.max("count")).first()[0]
    assert per_string <= 1 + ln + ln * (ln - 1) // 2
    # candidate pairs BEFORE levenshtein verification: block sizes are
    # O(1) for well-separated names, so the candidate total is linear
    cand = (
        keys.groupBy("blk")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .first()[0]
    )
    assert cand is None or cand <= 5 * n, f"candidate blowup: {cand} for n={n}"


def _brute_spans(corpus: list[list[str]], w: int):
    """Hash-free reference for duplicated_spans: gram STRINGS, covered
    positions, union of windows merged when they touch."""
    grams = {}  # gram tuple -> set of doc indices
    for d, words in enumerate(corpus):
        for i in range(len(words) - w + 1):
            grams.setdefault(tuple(words[i : i + w]), set()).add(d)
    out = []
    for d, words in enumerate(corpus):
        cov = sorted(
            i + 1
            for i in range(len(words) - w + 1)
            if len(grams[tuple(words[i : i + w])]) >= 2
        )
        spans = []
        for p in cov:
            if spans and p - spans[-1][1] <= w:  # windows touch/overlap
                spans[-1][1] = p
            else:
                spans.append([p, p])
        ivals = [(p0, p1 + w - 1) for p0, p1 in spans]
        dup = sum(b - a + 1 for a, b in ivals)
        out.append(
            {
                "n_words": len(words),
                "n_spans": len(ivals),
                "longest": max((b - a + 1 for a, b in ivals), default=0),
                "dup_words": dup,
            }
        )
    return out


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("aa bb cc dd".split()), min_size=0, max_size=14),
        min_size=2,
        max_size=6,
    )
)
def test_duplicated_spans_matches_bruteforce(spark, corpus):
    """duplicated_spans vs a hash-free Python reference (r9): catches
    gram-hash or island-merge bugs the shared-hash DuckDB oracle cannot
    (both engines hash identically). Tiny alphabet forces heavy gram
    collisions ACROSS docs — the interesting regime."""
    w = 3
    rows = [
        Row(doc_id=i, text=" ".join(words)) for i, words in enumerate(corpus)
    ]
    got = {
        r.doc_id: r
        for r in dedup.duplicated_spans(
            spark.createDataFrame(rows, "doc_id long, text string"), gram_w=w
        ).collect()
    }
    want = _brute_spans(corpus, w)
    for i, exp in enumerate(want):
        g = got[i]
        assert (g.n_words, g.n_spans, g.longest_span_words, g.dup_words) == (
            exp["n_words"],
            exp["n_spans"],
            exp["longest"],
            exp["dup_words"],
        ), (i, corpus)


def test_weighted_median_bisection_agrees_with_udaf(spark):
    """Cross-implementation coherence: the fact-scale bisection and the
    bounded-groups Arrow UDAF implement ONE pinned definition — run both
    on the same (returnflag, linestatus) grouping and require identical
    medians (the UDAF is the r9 contract, the bisection the r10 removal
    of its scale asterisk; a definition drift between them would be
    invisible to their separate oracles)."""
    from pyspark.sql import functions as F

    from spark_stream_analyzer_spark.functions.median import (
        grouped_weighted_median,
    )
    from spark_stream_analyzer_spark.functions.udafs import weighted_median

    li = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_extendedprice").cast("double").alias("v"),
            F.col("l_quantity").cast("long").alias("w"),
        )
    )
    udaf = {
        (r.l_returnflag, r.l_linestatus): r.m
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(weighted_median("v", "w").alias("m"))
        .collect()
    }
    bis = {
        (r.l_returnflag, r.l_linestatus): r.m
        for r in grouped_weighted_median(
            li,
            ["l_returnflag", "l_linestatus"],
            "v",
            "w",
            buckets=8,
            finish_threshold=16,
            median_col="m",
        ).collect()
    }
    assert bis == udaf


def test_kmeans_join_form_matches_literal_form(spark):
    """The scalable-k join assignment must reproduce the
    literal-expression form EXACTLY at a shared k — same id-seeded init,
    same round6 centroid grid, same (dist, cid) tie-break; a drift here
    would silently change every downstream IVF/SemDeDup clustering."""
    from spark_stream_analyzer_spark.operators.similarity import (
        kmeans_assign,
        kmeans_assign_join,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lit = {
        r.vec_id: r.cluster_id
        for r in kmeans_assign(emb, k=8, iters=2).collect()
    }
    jn = {
        r.vec_id: r.cluster_id
        for r in kmeans_assign_join(emb, k=8, iters=2).collect()
    }
    assert jn == lit


@settings(max_examples=300, deadline=None)
@given(
    word=st.text(alphabet="ab", min_size=0, max_size=14),
    merge_idx=st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=8),
)
def test_bpe_word_encoder_matches_string_replace_chain(word, merge_idx):
    """_bpe_encode_word_py must equal the literal chain semantics — a
    sequential single-pass non-overlapping ``str.replace`` per merge on
    the space-delimited symbol string (verified identical to Spark's
    ``replace``) — on RANDOM words over a tiny alphabet with RANDOM merge
    tables drawn from the pairs that actually arise there. The 2-letter
    alphabet maximizes runs and merge-created-symbol collisions, the
    regime where the boundary-space consumption subtlety bites
    (' a a a a a ' -> ' aa a aa ', not the fixpoint's 'aa aa a')."""
    from spark_stream_analyzer_spark.operators.text import _bpe_encode_word_py

    # candidate merge pool over symbols reachable in <= 2 merges
    pool = ["a a", "a b", "b a", "b b", "aa a", "ab b", "ba a", "aabb aabb"]
    merges = []
    for i in merge_idx:  # duplicates allowed — a repeated pair is a no-op
        merges.append(pool[i])

    # reference: the chain exactly as the Spark expression applies it
    s = " " + " ".join(word) + " " if word else "  "
    for pair in merges:
        s = s.replace(f" {pair} ", f" {pair.replace(' ', '')} ")
    expect = s.strip()

    pair_ranks = {}
    for r, p in enumerate(merges, start=1):
        pair_ranks.setdefault(tuple(p.split(" ")), []).append(r)
    pair_by_rank = {r: tuple(p.split(" ")) for r, p in enumerate(merges, start=1)}
    got = _bpe_encode_word_py(word, pair_ranks, pair_by_rank)
    assert got == expect, (word, merges)
