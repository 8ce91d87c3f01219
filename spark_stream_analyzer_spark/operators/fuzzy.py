"""Fuzzy matching (entity resolution): edit-distance pair join with
symmetric-delete (SymSpell) blocking.

Completeness argument (why no pair within distance 1 is ever missed):
for strings a, b with ``levenshtein(a, b) <= 1``,

* substitution at position p → deleting p from each yields the same
  string, so their deletion neighborhoods intersect;
* insertion/deletion → the shorter string IS a member of the longer
  string's deletion neighborhood (and of its own, via the identity
  entry);
* identical strings share the identity entry.

Key cardinality grows with the corpus (keys are near-full strings), so
block sizes stay O(1) and candidates stay linear — unlike fixed-arity
blocks (a 2-char suffix has ~alphabet² blocks whose sizes grow O(n),
making candidates O(n²)). Keys are hashed to 64-bit for the join — a
hash collision only ADDS a candidate, which the exact ``levenshtein``
verification then rejects. Property-tested against brute force on
adversarial generated strings (``tests/test_properties.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs with ``levenshtein <= max_dist`` (``max_dist`` must be 1:
    the single-deletion neighborhood is complete exactly for distance 1).

    Returns ``id_a < id_b`` pairs with the exact ``dist``. The explicit
    repartition roots both join sides in one exchange (ReuseExchange),
    so the deletion-neighborhood explode runs once — measured 4.5×
    faster than the unpartitioned string-key join at sf0.1.
    """
    if max_dist != 1:
        raise ValueError("symmetric-delete blocking is complete only for max_dist=1")
    keys = df.select(
        F.col(id_col).alias("_fid"),
        F.col(name_col).alias("_fname"),
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(concat(array({name_col}), "
                    f"transform(sequence(1, length({name_col})), i -> "
                    f"concat(substring({name_col}, 1, i - 1), "
                    f"substring({name_col}, i + 1, length({name_col}))))), "
                    "s -> xxhash64(s))"
                )
            )
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
