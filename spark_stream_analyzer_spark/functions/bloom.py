"""Explicit Bloom-filter runtime semi-join pruning (EXT; SURVEY §2.10
scale ops — no reference counterpart; the reference's only join
machinery is JPA-side lookup, ``spark/SparkStreamingService.java``).

Spark's own ``InjectRuntimeFilter`` rule builds exactly this shape — a
``BloomFilterAggregate`` on the creation side, ``BloomFilterMightContain``
on the application side — but keeps both expressions OUT of the SQL
FunctionRegistry (they are internal-only; ``bloom_filter_agg`` resolves
to UNRESOLVED_ROUTINE from user SQL) and only fires above a 10 GB
application-side scan threshold, so a user plan cannot request one at
will. This module is the same design as a first-class portable
operator:

* **build** (``bloom_build_words``): ``num_hashes`` positions per key
  via ``pmod(xxhash64(key, seed_i), num_bits)``, OR-folded into
  ``num_bits/64`` long words — the explode + groupBy(word) partial-
  aggregates map-side, so the one exchange carries at most
  ``num_bits/64`` combined rows regardless of key count, and the same
  bound caps the driver collect;
* **probe** (``bloom_might_contain``): the word table is embedded as a
  literal array; membership is ``num_hashes`` array lookups + bitwise
  ANDs — whole-stage-codegen scalar expressions, no shuffle, no Python —
  applied as a fact-scan filter BEFORE the join exchange, so the shuffle
  carries only rows that can match (plus the bloom's false positives,
  which the exact join downstream removes).

Never a false negative: both sides compute identical deterministic
positions (fixed integer seeds, same xxhash64), so every true key
passes the probe; result correctness therefore never depends on the FP
rate. Sizing: ~16 bits/key at k=4 gives well under 1% FP (2 KB of
filter per 1 000 keys). The regime where this pays at 100 TB: the
creation side is too big to broadcast (so the join is shuffle-hash /
sort-merge and the fact side must fully exchange) but its bloom is
still KBs — the probe then cuts the fact exchange to ~the join
selectivity. When the dim side fits a broadcast, Spark's own
broadcast join already filters pre-shuffle and the bloom adds nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 14
DEFAULT_NUM_HASHES = 4


def _bit_mask(pos: Column) -> Column:
    """``1L << (pos % 64)`` — via call_function: the Python ``shiftleft``
    wrapper only takes a literal int shift, the SQL function takes any
    int column."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), pos.bitwiseAND(63).cast("int")
    )


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_bits))
        for seed in range(num_hashes)
    ]


def bloom_build_words(
    df: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> list[int]:
    """Distributed bloom build → ``num_bits/64`` longs on the driver.

    ``num_bits`` must be a multiple of 64. The word table (not the keys)
    is what crosses to the driver, bounded by construction at
    ``num_bits/64`` rows however many keys the frame holds.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("pos")
    rows = (
        df.select(pos)
        .select(
            F.shiftright("pos", 6).cast("int").alias("w"),
            _bit_mask(F.col("pos")).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("m"))
        .collect()  # bounded: <= num_bits/64 rows (256 at the default),
        # independent of key count — the word table IS the filter
    )
    words = [0] * n_words
    for r in rows:
        words[r.w] = r.m
    return words


def bloom_might_contain(
    words: list[int],
    key: Column,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Membership probe column: True for every inserted key (never a
    false negative), True with probability ~FP-rate for absent keys.

    ``num_hashes`` MUST equal the build's — a probe computing more
    hashes than were inserted would false-negative (the no-FN guarantee
    holds only for identical position sets). ``num_bits`` needs no
    mirroring: it is recovered from ``len(words)``.

    The word list is a foldable literal array — Catalyst constant-folds
    it, and the probe stays inside whole-stage codegen.
    """
    num_bits = len(words) * 64
    arr = F.array(*[F.lit(w) for w in words])
    cond = F.lit(True)
    for p in _positions(key, num_bits, num_hashes):
        word = F.element_at(arr, F.shiftright(p, 6).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_bit_mask(p)) != 0)
    return cond
