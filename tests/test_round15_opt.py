"""Round-15 optimization invariants.

Every optimization this round must be provably value-identical:

* the Arrow-batched vector kernels (functions/veckernels.py) must be
  BIT-equal to the pinned interpreted SQL folds on adversarial inputs
  (signed zeros, subnormals, infinities, NaN, empty arrays, unequal
  lengths, NULL arrays);
* the SemDeDup prune rewritten as a LEFT SEMI join must keep the exact
  pruned set of the pair-projection + DISTINCT form (EXISTS semantics).
"""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.functions import texthash as TH
from spark_stream_analyzer_spark.functions.veckernels import arrow_dot, arrow_l2sq


def _bits(x):
    return None if x is None else struct.pack(">d", x)


# adversarial vector pairs: equal-length pairs exercising every float
# regime the fold can see, plus the null/length edge cases
_ADVERSARIAL = [
    ([], []),
    ([0.0], [-0.0]),
    ([-0.0, -0.0], [0.0, 0.0]),
    ([-0.0, -0.0], [-0.0, -0.0]),  # products -0.0: seed keeps +0.0
    ([1e308, -1e308, 1.0], [1.0, 1.0, 1.0]),  # overflow then inf arithmetic
    ([float("inf"), 1.0], [1.0, 1.0]),
    ([float("-inf"), float("inf")], [1.0, 1.0]),  # inf + -inf = NaN
    ([float("nan"), 2.0], [3.0, 4.0]),
    ([5e-324, 5e-324, -5e-324], [1.0, 1.0, 1.0]),  # subnormals
    ([0.1, 0.2, 0.3], [0.3, 0.2, 0.1]),
    ([1.0, 1e-16, -1.0], [1.0, 1.0, 1.0]),  # cancellation: order matters
    ([1e-16, 1.0, -1.0], [1.0, 1.0, 1.0]),  # ... and this order differs
    ([2.5] * 64, [4.0 - 1.5] * 64),
    (list(float(i) * 0.7 for i in range(17)), list(float(i) * -1.3 for i in range(17))),
    # unequal lengths -> NULL on both paths (zip_with null-pad twin)
    ([1.0, 2.0], [1.0]),
    ([1.0], [1.0, 2.0]),
    (None, [1.0]),
    ([1.0], None),
    (None, None),
]


@pytest.fixture(scope="module")
def _adv_df(spark):
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(_ADVERSARIAL)],
        "i long, a array<double>, b array<double>",
    )


def test_arrow_dot_bit_equal_to_sql_fold(spark, _adv_df):
    rows = _adv_df.select(
        "i",
        F.expr(TH.spark_dot("a", "b")).alias("sql"),
        arrow_dot("a", "b").alias("arw"),
    ).collect()
    assert len(rows) == len(_ADVERSARIAL)
    for r in rows:
        if r.sql is not None and math.isnan(r.sql):
            # PINNED boundary caveat (veckernels docstring): a NaN fold
            # result serializes through Arrow as NULL — callers are
            # contractually bound to finite inputs, where this case is
            # unreachable
            assert r.arw is None, r
        else:
            assert _bits(r.sql) == _bits(r.arw), (r.i, r.sql, r.arw)


def test_arrow_l2sq_bit_equal_to_sql_fold(spark, _adv_df):
    rows = _adv_df.select(
        "i",
        F.expr(TH.spark_l2sq("a", "b")).alias("sql"),
        arrow_l2sq("a", "b").alias("arw"),
    ).collect()
    for r in rows:
        if r.sql is not None and math.isnan(r.sql):
            # same pinned NaN-over-Arrow caveat as the dot test
            assert r.arw is None, r
        else:
            assert _bits(r.sql) == _bits(r.arw), (r.i, r.sql, r.arw)


def test_arrow_dot_bit_equal_on_random_batch(spark):
    """Volume pass across Arrow batch boundaries: deterministic pseudo-
    random dim-64 vectors, bit-compared against the SQL fold."""
    import random

    rnd = random.Random(1518)
    data = [
        (
            i,
            [rnd.uniform(-10, 10) for _ in range(64)],
            [rnd.uniform(-10, 10) for _ in range(64)],
        )
        for i in range(2500)
    ]
    df = spark.createDataFrame(data, "i long, a array<double>, b array<double>")
    bad = df.select(
        F.expr(TH.spark_dot("a", "b")).alias("sql"),
        arrow_dot("a", "b").alias("arw"),
        F.expr(TH.spark_l2sq("a", "b")).alias("sql2"),
        arrow_l2sq("a", "b").alias("arw2"),
    ).where(
        # bit-compare through the double bits cast (NaN-free data)
        (F.expr("cast(sql as string)") != F.expr("cast(arw as string)"))
        | (F.col("sql") != F.col("arw"))
        | (F.col("sql2") != F.col("arw2"))
    )
    assert bad.count() == 0


def test_semdedup_semi_join_prune_matches_brute_force(spark):
    """The LEFT SEMI prune must reproduce the EXISTS rule exactly on a
    planted geometry: prune i iff some better-ranked j in the same
    cluster has cos(i, j) >= tau (brute force recomputed in Python with
    the same left-fold dot)."""
    from spark_stream_analyzer_spark.operators.dedup import semdedup_keep_list

    # two planted clusters: near-duplicate rays (prune) + orthogonals
    vecs = {
        1: [1.0, 0.0, 0.0, 0.0],
        2: [0.9999, 0.01, 0.0, 0.0],   # ~ray of 1
        3: [0.0, 1.0, 0.0, 0.0],       # orthogonal to both
        4: [1.0, 0.0, 0.0, 0.0],       # exact dup of 1
        5: [0.0, 0.0, 1.0, 0.0],
        6: [0.0, 0.0, -1.0, 0.0],      # anti-parallel: cos -1, never pruned
        7: [0.0, 0.0, 0.999, 0.04],
        8: [0.0, 0.0, 0.0, 1.0],
    }
    emb = spark.createDataFrame(
        [(k, v) for k, v in sorted(vecs.items())],
        "vec_id long, embedding array<double>",
    )
    assign = spark.createDataFrame(
        [(k, 0 if k <= 4 else 1) for k in sorted(vecs)],
        "vec_id long, cluster_id long",
    )
    tau = 0.3
    out = {
        r.vec_id: (r.kept, r.centroid_cos)
        for r in semdedup_keep_list(emb, assign, tau=tau).collect()
    }

    # brute force with the same pinned rules
    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    import math as m

    def centroid(ids):
        d = len(vecs[ids[0]])
        return [
            round(sum(vecs[i][j] for i in ids) / len(ids), 6) for j in range(d)
        ]

    expected_kept = {}
    for cid, ids in ((0, [1, 2, 3, 4]), (1, [5, 6, 7, 8])):
        c = centroid(ids)
        cn = m.sqrt(fold_dot(c, c))
        cosc = {
            i: fold_dot(vecs[i], c) / (m.sqrt(fold_dot(vecs[i], vecs[i])) * cn)
            for i in ids
        }
        ranked = sorted(ids, key=lambda i: (cosc[i], i))
        for pos, i in enumerate(ranked):
            pruned = any(
                fold_dot(vecs[j], vecs[i])
                / (
                    m.sqrt(fold_dot(vecs[j], vecs[j]))
                    * m.sqrt(fold_dot(vecs[i], vecs[i]))
                )
                >= tau
                for j in ranked[:pos]
            )
            expected_kept[i] = not pruned
    assert {k: v[0] for k, v in out.items()} == expected_kept
    # sanity on the geometry: the anti-parallel vector must survive
    assert out[6][0] is True
    # and at least one planted duplicate must actually prune
    assert not all(v[0] for v in out.values())


def test_loop_aqe_toggle_is_value_invisible(spark, monkeypatch):
    """SSA_LOOP_AQE=off must change ONLY the physical execution of the
    iterative loop bodies (fewer runtime-replanning jobs), never a
    value: CC labelings and bisection medians must be identical under
    both settings."""
    import os

    from spark_stream_analyzer_spark.functions.median import (
        grouped_weighted_median,
    )
    from spark_stream_analyzer_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)]  # 20 two-node components
        + [(i, i + 2) for i in range(100, 140)],  # one long chain
        "doc_a long, doc_b long",
    )
    df = spark.createDataFrame(
        [(i % 7, float((i * 37) % 101), 1 + i % 3) for i in range(500)],
        "g long, v double, w long",
    )

    def run_both(fn):
        monkeypatch.delenv("SSA_LOOP_AQE", raising=False)
        on = fn()
        monkeypatch.setenv("SSA_LOOP_AQE", "off")
        try:
            off = fn()
        finally:
            monkeypatch.delenv("SSA_LOOP_AQE", raising=False)
        return on, off

    on, off = run_both(
        lambda: {
            (r.doc_id, r.cluster_id)
            for r in duplicate_clusters(pairs).collect()
        }
    )
    assert on == off and len(on) > 0
    # AQE conf restored after the loops
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"

    on, off = run_both(
        lambda: {
            (r.g, r.wm)
            for r in grouped_weighted_median(
                df, ["g"], "v", "w", buckets=4, finish_threshold=2,
                median_col="wm",
            ).collect()
        }
    )
    assert on == off and len(on) == 7
