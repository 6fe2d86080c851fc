"""Text column-expression builders shared by dedup and text-analysis
operators — all native Catalyst expressions (no UDFs), with matching
DuckDB SQL fragment generators so every operator is oracle-checkable.

Cross-engine hashing: both Spark and DuckDB expose ``md5`` over UTF-8
strings with identical lowercase-hex output, so minhash/fingerprint
operators hash with md5 and compare/min lexicographically — bit-identical
in both engines, and cheap JVM-side in Spark (whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the fixtures are space-separated word
    soup, FIXTURES.md)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings; empty array when < n tokens.

    Native ``transform(sequence(...))`` — per-row array op, no shuffle.
    """
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tok, i + F.lit(j)) for j in range(n)]
    )
    return F.when(
        F.size(tok) >= n,
        F.transform(F.sequence(F.lit(1), F.size(tok) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))


def sql_word_shingles(text_expr: str, n: int = 3) -> str:
    """DuckDB fragment mirroring :func:`word_shingles` (1-based list
    indexing; ``range(1, m)`` is empty when m ≤ 1)."""
    ws = f"string_split({text_expr}, ' ')"
    concat = " || ' ' || ".join(f"{ws}[i+{j}]" for j in range(n))
    return f"list_transform(range(1, len({ws}) - {n - 2}), i -> {concat})"


def minhash_component(shingle_arr: Column, seed: int) -> Column:
    """One minhash signature component: lexicographic min of
    ``md5(seed ':' shingle)`` over the shingle set.

    Standard minhash with the hash family h_seed(x) = md5(seed||x); the
    min of a permutation-like hash over the set, so
    P[minhash_a == minhash_b] ≈ Jaccard(a, b).  Stays array-native —
    signature computation is embarrassingly parallel, no shuffle.
    """
    return F.array_min(
        F.transform(shingle_arr, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def sql_minhash_component(shingles_sql: str, seed: int) -> str:
    return (
        f"list_min(list_transform({shingles_sql}, s -> md5('{seed}:' || s)))"
    )


#: sliced minhash family: one md5 per (seed, shingle) yields FOUR
#: independent 8-hex-char components (32-hex digest / 8) — 4× fewer
#: digest computations than one-md5-per-component for the same number
#: of signature components
SLICES_PER_MD5 = 4
SLICE_OFFSETS = (1, 9, 17, 25)


def minhash_component_sliced(hashed_arr: Column, offset: int) -> Column:
    """Min over one 8-hex-char slice of per-shingle md5 digests.

    ``hashed_arr`` must be the PRE-COMPUTED ``transform(sh, md5(...))``
    array, projected once per seed so the digest work is shared by all
    four slice components (Catalyst evaluates a named projection column
    once per row).  The slice is taken per-shingle BEFORE the min — a
    slice of the min digest would be a different (wrong) statistic.
    """
    return F.array_min(
        F.transform(hashed_arr, lambda h: F.substring(h, offset, 8))
    )


def sql_minhash_component_sliced(
    shingles_sql: str, seed: int, offset: int
) -> str:
    """DuckDB mirror of the sliced component, inlined over the raw
    shingle list (the oracle runs at sf0.01 — clarity over digest
    reuse there)."""
    return (
        f"list_min(list_transform({shingles_sql},"
        f" s -> substr(md5('{seed}:' || s), {offset}, 8)))"
    )


def jaccard_sets(a: Column, b: Column) -> Column:
    """Exact Jaccard over two *distinct-element* string arrays; integer
    set sizes divided once → deterministic double in both engines."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter / union


def sql_jaccard_sets(a: str, b: str) -> str:
    inter = f"len(list_filter({a}, x -> list_contains({b}, x)))"
    return f"({inter} / (len({a}) + len({b}) - {inter}))"


#: hex-nibble value of character i (1-based) of an md5 hex digest —
#: portable hex→int without engine-specific conv()
_HEX = "0123456789abcdef"


def nibble(md5_col: Column, i: int) -> Column:
    c = F.substring(md5_col, i, 1)
    expr = F.lit(15)
    out = None
    for v, ch in enumerate(_HEX[:-1]):
        out = (
            F.when(c == ch, v) if out is None else out.when(c == ch, v)
        )
    return out.otherwise(expr).cast("int")


def sql_nibble(md5_expr: str, i: int) -> str:
    whens = " ".join(
        f"WHEN '{ch}' THEN {v}" for v, ch in enumerate(_HEX[:-1])
    )
    return f"(CASE substr({md5_expr}, {i}, 1) {whens} ELSE 15 END)"


def km_hash_pair(col: Column) -> tuple[Column, Column]:
    """Kirsch–Mitzenmacher double-hash pair ``(h1, h2)`` from the two
    md5 halves of ``col`` — the shared derivation behind the Bloom
    filter's bit positions and the Count-Min sketch's bucket rows.
    Both are exact int64 < 2^32 (so ``h1 + k·h2`` stays far under
    2^63 for any small k — no overflow in either engine), and ``h2``
    is forced ODD so the probe stride never collapses on a
    power-of-two modulus.  The DuckDB twin is the literal
    ``CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)`` /
    ``... substr(md5(x), 9, 8) ...) | 1`` pair embedded in each
    consumer's oracle SQL — change one, change all."""
    h = F.md5(col)
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint").bitwiseOR(1)
    return h1, h2


def km_positions(col: Column, k: int, modulus: int) -> Column:
    """Array of ``k`` double-hashed positions ``(h1 + i·h2) % modulus``
    — Bloom bit positions (k probes × bit-table size) and CMS bucket
    columns (depth × width) are both instances of this one expression."""
    h1, h2 = km_hash_pair(col)
    return F.array(*[((h1 + F.lit(i) * h2) % modulus) for i in range(k)])
