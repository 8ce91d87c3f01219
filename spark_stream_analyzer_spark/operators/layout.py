"""Space-filling-curve data layout (Morton / Z-order) — EXT, round 14.

The reference has no data-layout surface at all (its storage is a JDBC
table written by Spring — SURVEY §2.8); at 100 TB the dominant scan cost
is decided by HOW rows are laid out across files, because parquet
file/row-group min-max statistics prune a scan only when each file's
bounding box over the filtered columns is TIGHT.  A 1-D sort gives tight
boxes on one column and full-range boxes on every other; interleaving
the bits of two (or more) columns into a single Morton code and
range-bucketing on it gives every bucket a small bounding RECTANGLE, so
multi-dimensional predicates prune on all filtered columns at once —
the layout Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's z-ordered
rewrites apply before exactly this kind of scan.

Everything here is pure integer column expressions (shift / mask / add
over disjoint bits), whole-stage-codegen JVM-side, and every step has an
exact SQL mirror (``zvalue_sql``) so the registry rows stay
oracle-checked: quantization is min-max integer scaling with floor
division (both engines floor for non-negative operands), and the bit
interleave is a 2·bits-term sum of ``((q >> i) & 1) << k`` terms —
identical arithmetic in Spark and DuckDB by construction.

At cluster scale the bucket id is the thing you ``repartitionByRange``
and write on; the registry rows keep the bucket count at 64 so the
per-bucket bounding-box audit stays a bounded (<=64-row) result.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def minmax_quantize(col_expr: str, lo, hi, bits: int) -> Column:
    """Scale SQL expression ``col_expr`` in ``[lo, hi]`` to ``[0, 2^bits)``.

    ``lo``/``hi`` are ints (from a bounded one-row aggregate) or SQL
    expressions; floor division keeps the map deterministic and exactly
    mirrorable in SQL (non-negative operands, both engines floor).  A
    degenerate column (``hi == lo``) maps to 0 via the GREATEST guard.
    """
    scale = (1 << bits) - 1
    return F.expr(
        f"CAST((({col_expr}) - ({lo})) * {scale} "
        f"DIV GREATEST(1, ({hi}) - ({lo})) AS LONG)"
    )


def minmax_quantize_sql(expr: str, lo, hi, bits: int) -> str:
    """The DuckDB mirror of :func:`minmax_quantize` (same arithmetic)."""
    scale = (1 << bits) - 1
    return (
        f"CAST((({expr}) - ({lo})) * {scale} "
        f"// GREATEST(1, ({hi}) - ({lo})) AS BIGINT)"
    )


def zvalue_2d(qx: Column, qy: Column, bits: int = 16) -> Column:
    """Morton code of two equal-width quantized coordinates — a thin
    wrapper over the repo's ONE interleave implementation,
    ``sources/layout.py:zorder_key`` (MSB-aligned; with equal widths
    that places ``qx``'s bit j at output bit 2j+1 and ``qy``'s at 2j).
    ``qx``/``qy`` must already be non-negative longs < ``2^bits``; the
    result is < ``2^(2*bits)`` — flat shift/mask/or expressions, no
    UDF, no loop at runtime.
    """
    from spark_stream_analyzer_spark.sources.layout import zorder_key

    return zorder_key([(qx, bits), (qy, bits)])


def zvalue_2d_sql(qx: str, qy: str, bits: int = 16) -> str:
    """The DuckDB mirror of :func:`zvalue_2d` — the same 2·bits disjoint
    bit terms ``zorder_key`` emits for two equal-width dimensions (first
    column's bit j lands at output bit 2j+1, second's at 2j)."""
    terms = []
    for j in range(bits):
        terms.append(f"((({qx}) >> {j}) & 1) * {1 << (2 * j + 1)}")
        terms.append(f"((({qy}) >> {j}) & 1) * {1 << (2 * j)}")
    return "(" + " + ".join(terms) + ")"


def zvalue_3d(q0: Column, q1: Column, q2: Column, bits: int = 10) -> Column:
    """Morton code of three equal-width quantized coordinates — same
    ``zorder_key`` delegation as :func:`zvalue_2d` (equal widths place
    dim i's bit j at output bit ``3j + (2 - i)``); result < 2^(3*bits).
    """
    from spark_stream_analyzer_spark.sources.layout import zorder_key

    return zorder_key([(q0, bits), (q1, bits), (q2, bits)])


def zvalue_3d_sql(q0: str, q1: str, q2: str, bits: int = 10) -> str:
    """The DuckDB mirror of :func:`zvalue_3d` (3·bits disjoint terms)."""
    terms = []
    for j in range(bits):
        for i, q in enumerate((q0, q1, q2)):
            terms.append(f"((({q}) >> {j}) & 1) * {1 << (3 * j + (2 - i))}")
    return "(" + " + ".join(terms) + ")"
