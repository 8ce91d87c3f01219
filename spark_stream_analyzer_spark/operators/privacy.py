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


def dp_noisy_release(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    clip: float = 100.0,
    eps_count: float = 0.25,
    eps_sum: float = 0.25,
    seed: str = "dp",
) -> DataFrame:
    """EXT differential-privacy aggregate release (r11): per-group count
    and clipped sum with Laplace noise — the publish-side counterpart of
    the :func:`k_anonymity_classes` audit (that row tells you a release
    is unsafe; this one makes a release safe by mechanism, not by
    auditing the data).

    Mechanism: under add/remove-one-row adjacency the count has
    sensitivity 1 and the sum, after clipping ``value_col`` into
    ``[0, clip]``, has sensitivity ``clip``; each gets Laplace noise of
    scale ``sensitivity / eps``.  Groups partition the rows, so by
    parallel composition the whole release costs
    ``max(eps_count + eps_sum)`` per row's group, not the sum over
    groups.

    Determinism (the oracle contract — a seeded PRNG, not secure
    randomness; a production release swaps the uniform source for a
    CSPRNG behind the same inverse-CDF): the Laplace draw is the
    inverse CDF ``-b * sign(t) * ln(1 - 2|t|)`` over
    ``t = u - 0.5``, with ``u`` the md5-60bit hash of
    ``seed || ':' || group`` scaled by 2^-60 — every operation is the
    same IEEE double expression shape on Spark and DuckDB (the ln drift
    between libm implementations is absorbed by round6, the corpus-wide
    discipline for log-bearing rows).  ``1 - 2|t|`` is floored at 1e-12
    so a pathological hash can never produce ln(0).

    Scale shape: one map-side-combinable groupBy over the fact, then a
    per-group projection — noise needs no data beyond the group key, so
    nothing about the mechanism changes at 100 TB.
    """
    from spark_stream_analyzer_spark.functions import texthash as TH

    two60 = float(1 << 60)

    def lap(tag: str, b: float) -> Column:
        u = (
            F.expr(TH.spark_hash60(f"concat('{seed}:{tag}:', {group_col})"))
            / F.lit(two60)
        )
        t = u - F.lit(0.5)
        return (
            F.lit(-b)
            * F.signum(t)
            * F.log(F.greatest(F.lit(1e-12), F.lit(1.0) - F.lit(2.0) * F.abs(t)))
        )

    from spark_stream_analyzer_spark.functions.scalar import msum6

    # msum6, not sum(double): the clipped addends are money-like
    # (<= 6 decimals, non-negative), and a float sum's partial-agg
    # order drift could flip the round6 of the released value
    clipped = F.least(F.greatest(F.col(value_col), F.lit(0.0)), F.lit(clip))
    g = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        msum6(clipped).alias("_s"),
    )
    return g.select(
        group_col,
        F.round(F.col("_n") + lap("c", 1.0 / eps_count), 6).alias("noisy_count"),
        F.round(F.col("_s") + lap("s", clip / eps_sum), 6).alias("noisy_sum"),
        F.lit(float(eps_count + eps_sum)).alias("epsilon"),
        F.lit(float(clip)).alias("clip_bound"),
    )
