"""Vectorized (Arrow grouped-agg) pandas UDAFs — the custom-AGGREGATE
extension class (SURVEY §2.10 allows Arrow-batched Python where built-in
expressions can't express the semantics; row-at-a-time remains banned).

The UDAF here is a weighted median, which Spark has no built-in for
(``percentile_approx`` is unweighted and approximate; ``median`` is
unweighted).  The definition is pinned exactly so a DuckDB oracle can
reproduce it bit-for-bit:

    wmedian(v, w) = min { x : sum(w | v' <= x) * 2 >= sum(w) }

i.e. the lower weighted median with integer weights — every comparison
is int64, so there is no float-boundary ambiguity between engines; ties
in v are handled by RANGE-frame semantics (the cumulative weight of a
value includes ALL rows tied at that value), which makes qualification
of each distinct value deterministic regardless of intra-tie order.

Scale shape: grouped-agg pandas UDFs execute per GROUP after a hash
shuffle on the group keys — map-side partial aggregation does not apply
(the median is not algebraic), so per-group data must fit an Arrow
batch.  Callers should not pick this path by hand:
``functions.median.weighted_median_grouped_auto`` (r14) measures the
largest group and selects this UDAF for bounded groups (here:
returnflag × linestatus — 6 cells in the driver's synthetic data, 4 in
TPC-H proper) or the ``functions.median`` value-domain bisection when
any group is fact-sized — same pinned definition, same filtered facts,
provably the same answer either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_median(v: pd.Series, w: pd.Series) -> float:
    """Lower weighted median of ``v`` with int64 weights ``w``."""
    order = np.argsort(v.values, kind="mergesort")
    vv = np.asarray(v.values)[order]
    ww = np.asarray(w.values)[order].astype("int64")
    cum = np.cumsum(ww)
    total = int(cum[-1])
    # first position whose cumulative weight reaches half (ceil for odd
    # totals): identical to the SQL RANGE-frame qualification because
    # searchsorted can only land inside a tie group when that group's
    # final cumulative weight also qualifies — the VALUE picked is the
    # same either way
    idx = int(np.searchsorted(cum, (total + 1) // 2))
    return float(vv[idx])
