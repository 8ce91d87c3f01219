"""Arrow-batched vector kernels with FOLD-ORDER-EXACT semantics.

The pinned dot / squared-L2 forms in :mod:`.texthash` (``spark_dot`` /
``spark_l2sq``) are sequential left folds over the dimensions — the
bit-exact twins of the DuckDB oracle expressions.  As Spark HOFs they
are CodegenFallback: every pair evaluated interpreted, ~10 expression
nodes per dimension (r14 measured the dim-64 fold at ~7 µs/pair; the
codegen-unroll attempt regressed 3-4x from expression blowup and was
reverted).  These kernels move the same fold to an Arrow-batched pandas
UDF (guide §4.2: hand whole batches to vectorized native code) while
preserving the EXACT floating-point result:

* the element kernel runs first, vectorized over the whole batch
  (``p = a*b`` for dot, ``p = (a-b)*(a-b)`` for l2sq — the same single
  IEEE op sequence per element the SQL lambda performs);
* the accumulation then walks the DIMENSIONS one vectorized step at a
  time: ``acc = acc + p[:, j]`` for j = 0..d-1.  Per row this is the
  identical chain of float64 additions the SQL ``aggregate`` seed/merge
  performs (seed ``0.0d``, then one add per element, left to right) —
  vectorizing ACROSS rows cannot change any row's op order.  Notably
  ``np.dot`` / ``np.sum`` are NOT used: both use pairwise/BLAS
  summation orders that differ from the left fold in the last ulp.

Sign-of-zero note: the seed is +0.0 and IEEE round-to-nearest gives
``(+0.0) + (-0.0) == +0.0``, so the fold can never produce ``-0.0``
unless an intermediate sum is a true negative — exactly as in the SQL
fold; the two paths agree bit-for-bit on every input (property-pinned
in tests/test_round15_opt.py against adversarial arrays: subnormals,
infinities, NaN, signed zeros, empty and length-mismatched arrays).

Null semantics mirror ``zip_with`` + ``aggregate``: a NULL array on
either side → NULL; unequal lengths → NULL (``zip_with`` null-pads the
shorter side, the padded product is NULL, and ``acc + NULL`` poisons
the fold); two empty arrays → the seed, +0.0.  Two boundary caveats
are PINNED (tests) rather than handled, because the Arrow boundary
cannot represent them: (1) a NULL *element* inside an array arrives in
the Arrow batch as NaN, so the kernel computes NaN where the SQL fold
returns NULL; (2) a NaN *result* (NaN input, or inf - inf arithmetic)
serializes back through ``pyarrow.Array.from_pandas`` as NULL where
the SQL fold returns NaN.  Callers must therefore only bind these
kernels to columns whose elements are provably non-null and finite —
the embedding parquet columns and the round6-mean centroids derived
from them are, by schema and construction, and every value the
consuming operators compare (distances, cosines) is then bit-identical
to the interpreted fold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold_series(a: pd.Series, b: pd.Series, kernel) -> pd.Series:
    ax, bx = a.tolist(), b.tolist()
    n = len(ax)

    def fold_block(A: np.ndarray, B: np.ndarray) -> np.ndarray:
        P = kernel(A, B)
        acc = np.zeros(P.shape[0], dtype=np.float64)
        for j in range(P.shape[1]):
            # one vectorized step per DIMENSION: per row this is the
            # same left-to-right float64 add chain as the SQL fold
            acc = acc + P[:, j]
        return acc

    # fast path: every row present with one shared non-zero length
    # (the overwhelmingly common batch — fixed-dim embeddings)
    if n and ax[0] is not None and len(ax[0]):
        d0 = len(ax[0])
        if all(
            x is not None and y is not None and len(x) == len(y) == d0
            for x, y in zip(ax, bx)
        ):
            return pd.Series(
                fold_block(
                    np.stack(ax).astype(np.float64, copy=False),
                    np.stack(bx).astype(np.float64, copy=False),
                )
            )

    out: list = [None] * n
    by_len: dict[int, list[int]] = {}
    for i, (x, y) in enumerate(zip(ax, bx)):
        if x is None or y is None:
            continue  # NULL array -> NULL (zip_with twin)
        if len(x) != len(y):
            continue  # zip_with null-pads -> fold poisons to NULL
        by_len.setdefault(len(x), []).append(i)
    for d, idxs in by_len.items():
        if d == 0:
            for i in idxs:
                out[i] = 0.0  # empty fold returns the seed, +0.0
            continue
        A = np.stack([ax[i] for i in idxs]).astype(np.float64, copy=False)
        B = np.stack([bx[i] for i in idxs]).astype(np.float64, copy=False)
        acc = fold_block(A, B)
        for r, i in enumerate(idxs):
            out[i] = float(acc[r])
    # object dtype so None survives as SQL NULL (a float64 Series would
    # coerce it to NaN)
    return pd.Series(out, dtype="object")


def _dot_fn(a: pd.Series, b: pd.Series) -> pd.Series:
    return _fold_series(a, b, lambda A, B: A * B)


def _l2sq_fn(a: pd.Series, b: pd.Series) -> pd.Series:
    return _fold_series(a, b, lambda A, B: (A - B) * (A - B))


# pandas_udf parses its DDL return type against the ACTIVE session, so
# the UDFs are built lazily on first use (module import must stay
# session-free — tests and tools import this before any session exists)
_UDFS: dict = {}


def _udf(name: str):
    u = _UDFS.get(name)
    if u is None:
        u = F.pandas_udf({"dot": _dot_fn, "l2sq": _l2sq_fn}[name], "double")
        _UDFS[name] = u
    return u


def arrow_dot(a: Column | str, b: Column | str) -> Column:
    """Fold-order-exact dot product — Arrow twin of ``TH.spark_dot``."""
    return _udf("dot")(F.col(a) if isinstance(a, str) else a,
                       F.col(b) if isinstance(b, str) else b)


def arrow_l2sq(a: Column | str, b: Column | str) -> Column:
    """Fold-order-exact squared L2 — Arrow twin of ``TH.spark_l2sq``."""
    return _udf("l2sq")(F.col(a) if isinstance(a, str) else a,
                        F.col(b) if isinstance(b, str) else b)
