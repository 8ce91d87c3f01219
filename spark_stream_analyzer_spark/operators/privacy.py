"""Privacy-audit operators (EXT): k-anonymity / l-diversity class audit.

The release-gate complement to :mod:`.text`'s PII redaction: before a
dataset (or a training corpus's metadata) ships, audit how identifying
its quasi-identifier combinations are.  A row is k-anonymous iff at
least ``k`` rows share its full quasi-identifier (QI) tuple; a class is
l-diverse iff its sensitive attribute takes at least ``l`` distinct
values (k-anonymity alone fails to homogeneity attacks: a class of 50
rows that all share one sensitive value identifies the attribute, not
the person).

Scale shape: ONE hash aggregation on the QI tuple — count is
map-side-combinable; the exact distinct runs as Spark's standard
two-phase distinct aggregate (partial on (QI, sensitive), final on QI).
No window, no join, no driver data.  At 100 TB this is a plain groupBy;
skewed QI classes (the whole point — big classes are the SAFE ones)
cost nothing beyond their partial rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_classes(
    df: DataFrame,
    qi_cols: list[Column],
    qi_names: list[str],
    sensitive: Column,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Per-equivalence-class audit: size (k-anonymity) and sensitive
    diversity (l-diversity), with violation flags.

    Output: one row per QI class — ``qi_names... , class_size,
    sensitive_distinct, k_anonymous, l_diverse``.  Class count is
    bounded by the QI domain product (the caller BANDS continuous
    attributes — an unbanded float QI makes every row its own class,
    which the audit would then correctly report as 100% singletons).
    """
    named = [c.alias(n) for c, n in zip(qi_cols, qi_names)]
    return (
        df.select(*named, sensitive.alias("_sens"))
        .groupBy(*qi_names)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct("_sens").alias("sensitive_distinct"),
        )
        .select(
            *qi_names,
            "class_size",
            "sensitive_distinct",
            (F.col("class_size") >= k).alias("k_anonymous"),
            (F.col("sensitive_distinct") >= l).alias("l_diverse"),
        )
    )
