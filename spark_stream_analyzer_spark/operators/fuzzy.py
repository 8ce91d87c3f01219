"""Fuzzy matching (entity resolution): edit-distance pair join with
symmetric-delete (SymSpell) blocking.

Completeness argument (why no pair within distance d is ever missed, for
the supported d in {1, 2}): if ``levenshtein(a, b) <= d``, align a and b
under an optimal edit script with at most d operations; deleting from a
every position that the script substitutes or deletes, and from b every
position that the script substitutes or inserts, removes at most d
characters from EACH side and leaves the identical common subsequence —
so the order-d deletion neighborhoods of a and b intersect (this is the
SymSpell invariant; for d=1 it reduces to the familiar per-case
argument: substitution at p → both drop p; indel → the shorter string is
a deletion of the longer).

Key cardinality grows with the corpus (keys are near-full strings), so
block sizes stay O(1) and candidates stay linear — unlike fixed-arity
blocks (a 2-char suffix has ~alphabet² blocks whose sizes grow O(n),
making candidates O(n²)). The order-2 neighborhood is O(L²) keys per
string (L = string length, ~1+L+L(L-1)/2 before dedup) — for entity
names (L <= ~30) that is a few hundred keys, a constant per row, not a
function of corpus size. Keys are hashed to 64-bit for the join — a
hash collision only ADDS a candidate, which the exact ``levenshtein``
verification then rejects. Property-tested against brute force on
adversarial generated strings (``tests/test_properties.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _del1(s: str) -> str:
    """SQL array expr: every single-character deletion of string expr ``s``.

    Guarded for the empty string: ``sequence(1, 0)`` yields the DESCENDING
    ``[1, 0]`` (Spark sequence walks toward stop), which would emit two
    spurious ''-deletion keys and funnel all short strings into one shared
    '' block — a quadratic hot block on short-string corpora (r10, ADVICE).
    """
    return (
        f"CASE WHEN length({s}) >= 1 THEN "
        f"transform(sequence(1, length({s})), i -> "
        f"concat(substring({s}, 1, i - 1), "
        f"substring({s}, i + 1, length({s})))) "
        f"ELSE array() END"
    )


def _deletion_keys(name_col: str, max_dist: int) -> str:
    """SQL array expr: hashed order-``max_dist`` deletion neighborhood of
    ``name_col`` (the string itself, all 1-deletions, and for d=2 all
    2-deletions as deletions-of-deletions)."""
    parts = [f"array({name_col})", _del1(name_col)]
    if max_dist == 2:
        parts.append(f"flatten(transform({_del1(name_col)}, t -> {_del1('t')}))")
    neigh = f"concat({', '.join(parts)})"
    return f"transform({neigh}, s -> xxhash64(s))"


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs with ``levenshtein <= max_dist`` (``max_dist`` in {1, 2}:
    the order-d deletion neighborhood is complete exactly for distance d).

    Returns ``id_a < id_b`` pairs with the exact ``dist``. The explicit
    repartition roots both join sides in one exchange (ReuseExchange),
    so the deletion-neighborhood explode runs once — measured 4.5×
    faster than the unpartitioned string-key join at sf0.1.
    """
    if max_dist not in (1, 2):
        raise ValueError(
            "symmetric-delete blocking implemented for max_dist in {1, 2}"
        )
    keys = df.select(
        F.col(id_col).alias("_fid"),
        F.col(name_col).alias("_fname"),
        F.explode(
            F.array_distinct(F.expr(_deletion_keys(name_col, max_dist)))
        ).alias("blk"),
    ).repartition("blk")
    b = keys.select(
        F.col("_fid").alias("_gid"),
        F.col("_fname").alias("_gname"),
        F.col("blk").alias("b_blk"),
    )
    return (
        keys.join(
            b, (F.col("blk") == F.col("b_blk")) & (F.col("_fid") < F.col("_gid"))
        )
        .withColumn("dist", F.levenshtein(F.col("_fname"), F.col("_gname")).cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("_fid").alias("id_a"),
            F.col("_gid").alias("id_b"),
            "dist",
        )
        .distinct()
    )
