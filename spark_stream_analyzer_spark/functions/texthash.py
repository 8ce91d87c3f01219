"""Cross-engine text/hash primitives for the LLM-data-pipeline operators.

Every dedup / fingerprint / similarity operator must be verifiable by the
driver's DuckDB oracle, so the *only* hash primitive used anywhere is
md5 — the one hash both engines compute identically — reduced to a 60-bit
integer (15 hex chars < 2^63, so it is overflow-safe in BIGINT
arithmetic on both sides). Each helper here comes in two forms:

* a Spark SQL expression-string builder (used via ``F.expr``) — strings,
  not Column objects, so the identical fragment can be embedded in
  generated DuckDB SQL where the dialects agree;
* a DuckDB SQL fragment builder for the oracle side.

All derived constants (minhash coefficients, simhash width, LSH
hyperplanes) are generated from a fixed LCG so both sides embed the same
literals. No randomness at runtime anywhere.

Scale note: all of these are per-row array expressions (whole-stage
codegen, no shuffle, no UDF) — at 100 TB they cost one scan; the only
shuffles in the operators built on top are the explicit band-bucket /
candidate-pair joins.
"""

from __future__ import annotations

# Mersenne prime 2^31-1: minhash universe. a*h+b stays < 2^62 (no overflow).
P31 = 2_147_483_647

MINHASH_K = 16  #: signature length
LSH_BANDS = 8  #: bands over the signature
LSH_ROWS = MINHASH_K // LSH_BANDS  #: rows per band

SIMHASH_BITS = 32

#: word-normalization regex (both engines: lower → strip non-alnum runs)
NONWORD = "[^a-z0-9]+"
#: BPE-ish token pattern: alnum runs or single non-space symbol
TOKEN_PAT = r"[a-z0-9]+|[^a-z0-9\s]"

STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "you", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "je", "pas", "pour"),
    "es": ("el", "los", "las", "y", "es", "uno", "una", "que", "no", "por"),
}


def spark_escape(pattern: str) -> str:
    """Escape a regex for embedding in a Spark SQL string literal.

    Spark's SQL parser processes backslash escapes inside '…' literals
    (DuckDB does not), so the same regex needs doubled backslashes on the
    Spark side only.
    """
    return pattern.replace("\\", "\\\\")


def _lcg(seed: int):
    state = seed & 0xFFFFFFFFFFFFFFFF
    while True:
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield state


def minhash_coeffs(k: int = MINHASH_K) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs for h_j(x) = (a*x + b) mod P31."""
    g = _lcg(0xC0FFEE)
    return [(1 + next(g) % (P31 - 1), next(g) % P31) for _ in range(k)]


def hyperplanes(n_planes: int = 6, dim: int = 64) -> list[list[float]]:
    """Deterministic random-hyperplane matrix for sign-LSH, values in [-1, 1)."""
    g = _lcg(0x5EED)
    return [
        [round((next(g) / float(1 << 64)) * 2.0 - 1.0, 6) for _ in range(dim)]
        for _ in range(n_planes)
    ]


# ---------------------------------------------------------------- Spark SQL

def spark_hash60(expr: str) -> str:
    """60-bit integer from md5 — Spark side."""
    return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"


def spark_norm_words(expr: str) -> str:
    """lower → strip non-alnum → split → drop empties (array<string>).

    ``array_remove`` instead of a ``filter(... w -> w != '')`` lambda:
    higher-order functions are CodegenFallback in Spark (interpreted
    per row, and they knock the whole projection out of whole-stage
    codegen); ``array_remove`` is a plain collection expression with
    codegen, and empties only ever arise as the '' token of a blank
    document (NONWORD collapses separator runs to single spaces).
    """
    return (
        f"array_remove(split(trim(regexp_replace(lower({expr}), '{NONWORD}', ' ')),"
        " ' '), '')"
    )


def spark_shingles(words_expr: str, k: int = 3) -> str:
    """Distinct k-word shingles; empty array when the doc is shorter than k.

    Built as a zip_with chain over k aligned slices — 10× faster than the
    per-index transform+slice form (measured at sf0.1: 0.9s vs 10.3s for
    the postings explode), because it runs k-1 vectorized array ops per
    row instead of one interpreted lambda per shingle.
    """
    n_keep = f"greatest(size({words_expr}) - {k - 1}, 0)"
    acc = f"slice({words_expr}, 1, {n_keep})"
    for j in range(2, k + 1):
        acc = (
            f"zip_with({acc}, slice({words_expr}, {j}, {n_keep}),"
            f" (x{j}, y{j}) -> concat(x{j}, ' ', y{j}))"
        )
    return f"array_distinct({acc})"


def spark_minhash_value(hs_expr: str, a: int, b: int) -> str:
    """One minhash slot over pre-hashed shingles (``hs``: array<bigint>, already mod P31)."""
    return (
        f"coalesce(array_min(transform({hs_expr},"
        f" h -> ({a} * h + {b}) % {P31})), {P31})"
    )


def spark_dot(a_expr: str, b_expr: str) -> str:
    """Left-fold double dot product (bit-exact twin of :func:`duck_dot`)."""
    return (
        f"aggregate(zip_with({a_expr}, {b_expr},"
        " (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )


def spark_dot_lit(a_expr: str, vec: list[float]) -> str:
    """Dot product against a literal vector (hyperplane projections)."""
    lits = ", ".join(f"cast({v} as double)" for v in vec)
    return (
        f"aggregate(zip_with({a_expr}, array({lits}),"
        " (x, y) -> cast(x as double) * y),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )


def spark_l2sq_lit(a_expr: str, vec: list[float]) -> str:
    """Squared L2 distance to a literal vector (left-fold, bit-exact twin
    of :func:`duck_l2sq` when the operands match)."""
    lits = ", ".join(f"cast({v!r} as double)" for v in vec)
    return (
        f"aggregate(zip_with({a_expr}, array({lits}),"
        " (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )


def spark_l2sq(a_expr: str, b_expr: str) -> str:
    """Squared L2 between two array columns (left-fold over dims —
    bit-exact twin of :func:`duck_l2sq`: the 0-seeded fold and DuckDB's
    first-element-seeded list_reduce agree exactly because 0 + x == x
    in IEEE doubles)."""
    return (
        f"aggregate(zip_with({a_expr}, {b_expr},"
        " (x, y) -> (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )


def spark_stop_hits(words_expr: str, stopwords: tuple[str, ...]) -> str:
    """Count of tokens (with multiplicity) that are in the stopword set.

    Counted by regex over the space-joined token string rather than a
    ``filter`` lambda (higher-order functions are CodegenFallback —
    interpreted, and they un-codegen the surrounding projection). Tokens
    are clean ``[a-z0-9]+`` runs separated by single spaces, so
    ``(?:^| )word(?= |$)`` matches exactly the stopword tokens; the
    lookahead keeps the trailing separator unconsumed so consecutive
    stopwords all match. Each word is regex-ESCAPED: the function is
    public and takes arbitrary tuples, and an unescaped metacharacter
    ("c++") would diverge from duck_stop_hits' exact list membership —
    the bit-parity contract this module exists for (r10 review).
    """
    import re as _re

    # spark_escape doubles the escape backslashes: Spark's SQL parser
    # consumes single backslashes inside '…' literals (see its docstring)
    alt = "|".join(spark_escape(_re.escape(w)) for w in stopwords)
    return (
        f"size(regexp_extract_all(array_join({words_expr}, ' '),"
        f" '(?:^| )(?:{alt})(?= |$)', 0))"
    )


# ---------------------------------------------------------------- DuckDB SQL

def duck_hash60(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def duck_norm_words(expr: str) -> str:
    return (
        f"list_filter(string_split(trim(regexp_replace(lower({expr}),"
        f" '{NONWORD}', ' ', 'g')), ' '), w -> w != '')"
    )


def duck_shingles(words_expr: str, k: int = 3) -> str:
    return (
        f"list_distinct(CASE WHEN len({words_expr}) >= {k} THEN "
        f"list_transform(generate_series(1, len({words_expr}) - {k} + 1),"
        f" i -> array_to_string({words_expr}[i:i + {k - 1}], ' ')) "
        "ELSE [] END)"
    )


def duck_minhash_value(hs_expr: str, a: int, b: int) -> str:
    return (
        f"coalesce(list_min(list_transform({hs_expr},"
        f" h -> ({a} * h + {b}) % {P31})), {P31})"
    )


def duck_simhash(hw_expr: str, bits: int = SIMHASH_BITS) -> str:
    # DuckDB's list_aggregate(..., 'sum') over BIGINT widens to HUGEINT
    # (int128); a type-sensitive comparator then sees int128 vs Spark's
    # int64 even when values are equal.  The outer CAST pins the emitted
    # type to BIGINT at every call site (the value always fits: it is a
    # sum of distinct bits of one 60-bit word).
    return (
        f"CAST(list_aggregate(list_transform(generate_series(0, {bits - 1}), i -> "
        f"CASE WHEN list_aggregate(list_transform({hw_expr},"
        " h -> CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0"
        " THEN (1::BIGINT << i) ELSE 0::BIGINT END), 'sum') AS BIGINT)"
    )


def duck_dot(a_expr: str, b_expr: str, dim: int = 64) -> str:
    # list_reduce is a left fold like Spark's aggregate; 0.0 + x1 == x1 in
    # IEEE754, so both sides produce bit-identical doubles.
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}),"
        f" i -> {a_expr}[i]::DOUBLE * {b_expr}[i]::DOUBLE), (x, y) -> x + y)"
    )


def duck_dot_lit(a_expr: str, vec: list[float]) -> str:
    lits = ", ".join(f"{v}::DOUBLE" for v in vec)
    return (
        f"list_reduce(list_transform(generate_series(1, {len(vec)}),"
        f" i -> {a_expr}[i]::DOUBLE * [{lits}][i]), (x, y) -> x + y)"
    )


def duck_l2sq(a_expr: str, b_expr: str, dim: int = 64) -> str:
    """Squared L2 between two list columns, sequential fold over dims."""
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}),"
        f" i -> ({a_expr}[i]::DOUBLE - {b_expr}[i]::DOUBLE)"
        f" * ({a_expr}[i]::DOUBLE - {b_expr}[i]::DOUBLE)), (x, y) -> x + y)"
    )


def duck_stop_hits(words_expr: str, stopwords: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{w}'" for w in stopwords)
    return f"len(list_filter({words_expr}, w -> list_contains([{arr}], w)))"


# --- sliding-gram rolling hash (r9, duplicated_spans) ---------------------
#
# One md5 per WORD, then every sliding w-gram's key is a double 31-bit
# polynomial over the word hashes (B1/B2 chains mod P31, packed to a
# 62-bit key) — pure int64 arithmetic on both engines, no per-gram md5 /
# string build.  Collision odds at the pair level ~2^-62 vs the ~15
# expected 31-bit collisions a single chain would give on a 250k-gram
# corpus.

GRAM_B1 = 1_000_003
GRAM_B2 = 1_000_033


def _poly_chain(elem_fmt: str, w: int, b: int) -> str:
    """Nested Horner chain over w elements; elements must already be < P31
    so every intermediate stays < 2^51 (no int64 overflow)."""
    expr = elem_fmt.format(k=0)
    for k in range(1, w):
        expr = f"(({expr}) * {b} + {elem_fmt.format(k=k)}) % {P31}"
    return expr


def spark_word_hashes(words_expr: str) -> str:
    """array<bigint>: md5-60 % P31 per word — Spark side."""
    return f"transform({words_expr}, x -> {spark_hash60('x')} % {P31})"


def spark_gram_hash(hw_expr: str, i_expr: str, w: int) -> str:
    """62-bit sliding-gram key at 1-based position ``i_expr`` — Spark side."""
    e1 = _poly_chain(f"element_at({hw_expr}, {i_expr} + {{k}})", w, GRAM_B1)
    e2 = _poly_chain(f"element_at({hw_expr}, {i_expr} + {{k}})", w, GRAM_B2)
    return f"({e1}) * 2147483648 + ({e2})"


def duck_word_hashes(words_expr: str) -> str:
    return f"list_transform({words_expr}, x -> {duck_hash60('x')} % {P31})"


def duck_gram_hash(hw_expr: str, i_expr: str, w: int) -> str:
    e1 = _poly_chain(f"{hw_expr}[{i_expr} + {{k}}]", w, GRAM_B1)
    e2 = _poly_chain(f"{hw_expr}[{i_expr} + {{k}}]", w, GRAM_B2)
    return f"({e1}) * 2147483648 + ({e2})"
