"""Text primitives shared by the dedup / text-analysis operators.

All JVM-side expressions (split / transform / filter / md5) — no
Python UDFs — so tokenization stays inside whole-stage codegen and,
critically, is reproducible in ANSI SQL for the DuckDB oracles.

Hash scheme: every pseudo-random value derives from ``md5`` (the one
cryptographic hash both Spark and standard SQL engines expose), so
MinHash signatures, SimHash bits and fingerprints are engine-portable
by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties removed."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, " "), lambda x: x != "")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def shingles_of_tokens(
    toks: Column, n: int = 3, sep: str = "_", distinct: bool = True
) -> Column:
    """Word n-gram shingles (distinct by default) from an already-
    materialized token-array COLUMN (not an expression!).

    CRITICAL perf note: ``toks`` must be a plain column reference.
    Passing the tokenization expression directly would re-evaluate
    split+filter once per array element inside the transform lambda —
    O(tokens²) per document (measured 5× slowdown on the shingle
    stage). Callers project tokens first, then call this.
    """
    # guard: sequence(0, -1) would produce a DESCENDING sequence, so
    # short documents must map to an explicitly empty shingle set.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            sep, *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(grams) if distinct else grams


def shingles(text: Column | str, n: int = 3, sep: str = "_") -> Column:
    """Distinct word n-gram shingles straight from a text column.
    Convenience form for small inputs/tests; hot paths should project
    ``tokens()`` first and use ``shingles_of_tokens`` (see its note).
    """
    return shingles_of_tokens(tokens(text), n, sep)


def doc_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted
    distinct token set. Equal fingerprints ⇔ equal token sets."""
    return F.md5(F.array_join(F.array_sort(distinct_tokens(text)), " "))


def minhash_base_hashes(item: Column) -> tuple[Column, Column]:
    """Two independent 48-bit integer hashes from ONE md5 of the item
    (hex digits 1-12 and 17-28).

    MinHash family member i is then ``h1 + i·h2`` (classic double
    hashing): i ≤ 15 keeps values < 2^53, no overflow, and the
    arithmetic is bit-identical in any SQL engine via
    ``('0x' || substr(md5(s), 1, 12))::BIGINT``. One md5 per item
    instead of one per (item, family) — 16× fewer hashes.
    """
    h = F.md5(item)
    h1 = F.conv(F.substring(h, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 17, 12), 16, 10).cast("long")
    return h1, h2


def tokens_sql(col_name: str) -> str:
    """SQL-string form of ``tokens`` (single parsed expression — the
    Column/lambda form costs dozens of Py4J round-trips to build; see
    PERF.md round-2b). Semantics identical: whitespace split, empties
    removed."""
    return f"filter(split({col_name}, ' '), x -> x != '')"


def shingles_sql(
    tok_col: str, n: int = 3, sep: str = "_", distinct: bool = True
) -> str:
    """SQL-string form of ``shingles_of_tokens`` over an
    already-materialized token-array COLUMN NAME (same perf caveat:
    the referenced column must be a plain projection, or the
    tokenizer re-evaluates per element)."""
    parts = ", ".join(
        f"element_at({tok_col}, CAST(i + {j + 1} AS INT))" for j in range(n)
    )
    grams = (
        f"CASE WHEN size({tok_col}) >= {n} THEN "
        f"transform(sequence(0, size({tok_col}) - {n}), "
        f"i -> concat_ws('{sep}', {parts})) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    return f"array_distinct({grams})" if distinct else grams
