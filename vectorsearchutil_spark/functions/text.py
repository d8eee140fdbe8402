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


def shingles(text: Column | str, n: int = 3, sep: str = "_") -> Column:
    """Distinct word n-gram shingles as joined strings.

    Built with transform-over-index so the whole thing is one codegen
    expression: shingle_i = toks[i] ++ sep ++ ... ++ toks[i+n-1].
    """
    toks = tokens(text)
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
    return F.array_distinct(grams)


def doc_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted
    distinct token set. Equal fingerprints ⇔ equal token sets."""
    return F.md5(F.array_join(F.array_sort(distinct_tokens(text)), " "))


def minhash_value(seed: int, item: Column) -> Column:
    """One MinHash family member: h_seed(item) = md5('seed:item').

    Min over a set of these hex strings is a valid min-hash (any
    total order over a uniform hash works); identical in SQL:
    ``min(md5(seed || ':' || item))``.
    """
    return F.md5(F.concat(F.lit(f"{seed}:"), item))


def simhash_votes(token_col: Column, weight_col: Column, bits: int = 32) -> list[Column]:
    """Per-token weighted ±w votes for a ``bits``-wide SimHash.

    Bit j of a token = parity of hex digit j of md5(token) — cheap,
    deterministic, and expressible in any SQL dialect via
    ``ascii(substr(md5(tok), j+1, 1)) % 2``. Votes are weighted by
    term frequency (standard SimHash), which is what discriminates
    documents drawn from a shared vocabulary.
    Returns ``bits`` vote columns (±weight) to be summed per document.
    """
    votes = []
    h = F.md5(token_col)
    for j in range(bits):
        bit = F.ascii(F.substring(h, j + 1, 1)) % 2
        votes.append((weight_col * (bit * 2 - 1)).alias(f"v{j}"))
    return votes
