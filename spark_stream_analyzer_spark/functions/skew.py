"""Skew-mitigation utilities for hot-key joins (100 TB concern; SURVEY §4
'skewed keys hurt').

AQE's skew-join splitting (on in session.py) handles most runtime skew by
splitting oversized partitions, but it only works for sort-merge joins
with both sides shuffled. ``salted_join`` is the explicit fallback for
the pathological case — one giant key against a broadcast-too-big dim:
salt fans EACH big-side row into one of ``n_salt`` sub-keys and
replicates the small side across all salts, so the hot key's rows spread
over ``n_salt`` tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salt fan-out.

    ``how`` is restricted to inner/left/left_semi: the small side is
    replicated ``n_salt`` times, so right/full-outer would emit ``n_salt``
    duplicates for each unmatched small-side key.

    The salt assignment only needs to spread big-side rows (each row gets
    exactly ONE salt, so join results are exact); it is derived from a
    hash of the row's content, which is stable under task retries —
    unlike ``monotonically_increasing_id``, whose values depend on
    runtime partitioning. Caveat: fully identical big-side rows land on
    the same salt, so salting cannot spread a key whose rows are exact
    duplicates (rare in fact tables with line-level ids). Output columns
    = big's ∪ small's minus the duplicate join key, like a plain join.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: the "
            "replicated small side would duplicate unmatched right rows"
        )
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt)),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>"))
    salted_small = small.withColumn("_salt", salts)
    out = salted_big.join(salted_small, [on, "_salt"], how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-level (salted) aggregation for hot group keys.

    ``aggs`` maps output column → (input column, fn) where fn ∈
    {sum, count, min, max} — the decomposable aggregates (count re-sums
    at the merge level). Level 1 aggregates on (keys..., salt) so a hot
    key's rows spread over ``n_salt`` reducers; level 2 merges the
    ≤ n_salt partial rows per key.

    Spark's own map-side partial aggregation already does this when the
    hot key is spread across input partitions; explicit salting is for
    the residual case — a high-cardinality AND hot-key mix where the
    hash-agg map spills and one reducer still receives a mega-key's
    partials alongside millions of others.

    The salt is a DETERMINISTIC content hash over every column (like
    :func:`salted_join`), not ``monotonically_increasing_id``: a row-id
    salt is nondeterministic under shuffle-fetch-failure recomputation
    (the same row can land on a different salt in the regenerated map
    output while some reducers already consumed the old output — and
    nondeterministic SQL expressions do NOT mark the stage indeterminate
    for Spark's rollback, which only the round-robin-repartition case
    got; r10 review), silently double- or under-counting partials.
    Trade-off, documented: rows that are FULLY identical (every column)
    concentrate on one salt — real fact rows carry ids/timestamps, so
    the spread survives; a corpus of byte-identical rows should be
    pre-aggregated first anyway.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    level1 = [
        {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[fn](col).alias(out)
        for out, (col, fn) in aggs.items()
    ]
    level2 = [merge_fn[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt)),
    )
    return salted.groupBy(*keys, "_salt").agg(*level1).groupBy(*keys).agg(*level2)
