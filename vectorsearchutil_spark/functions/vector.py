"""Vector math as Catalyst higher-order-function expressions.

The reference computes distances inside faiss at float32
(``vsu/base/VectorSearchBase.py:74-75`` serializes vectors as float32
bytes) and cosine/softmax scores in torch
(``vsu/text/_classes.py:33-41``, ``vsu/image/_classes.py:28-34``).

Here every operation is a built-in higher-order function
(``zip_with`` + ``aggregate`` + ``transform``) over
``array<double>`` columns, so the whole expression stays JVM-side
inside whole-stage codegen — no Python in the hot path. Summation is
in array order, which makes results bit-reproducible and lets the
DuckDB oracles match at full precision.

At 100 TB these expressions are narrow (no shuffle): a distance
column over a scanned partition is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return col.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise dot product of two array columns (double precision)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_squared(a: Column | str, b: Column | str) -> Column:
    """Squared euclidean distance between two array columns."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance; matches the reference's faiss-L2 ordering
    (``vsu/base/VectorSearchBase.py:193-201``)."""
    return F.sqrt(l2_squared(a, b))


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array column."""
    col = _as_double(a)
    return F.sqrt(
        F.aggregate(
            F.zip_with(col, col, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def normalize(a: Column | str) -> Column:
    """L2-normalize an array column (reference: CLIP encoders normalize
    at encode time, ``vsu/image/_classes.py:43,52``; E5 zero-shot
    normalizes at score time, ``vsu/text/_classes.py:33-35``)."""
    col = _as_double(a)
    return F.transform(col, lambda x: x / l2_norm(col))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; the reference's zero-shot score is this ×100
    (``vsu/text/_classes.py:36``). Zero-norm input → NULL (ANSI mode
    would otherwise raise on the division)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def finite_vector(col: Column | str) -> Column:
    """True when the vector is non-null and every component is finite
    (no NaN / ±Inf) — the "participates in distances" predicate. A
    non-finite component poisons any distance, centroid, or codebook
    it touches (np.argmin over NaN, Decimal rounding, ANSI casts all
    die), so fit/collect chokepoints exclude such rows, exactly like
    NULL payloads (round-5 NaN/Inf registry sweep)."""
    c = _as_double(col)
    return c.isNotNull() & ~F.exists(
        c, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )


#: DuckDB-side mirror of :func:`finite_vector` over the ``embedding``
#: column — lives HERE (not queries.py) so both the live registry and
#: the pending lane can embed it in oracles without a circular import.
FINITE_VEC_SQL = (
    "embedding IS NOT NULL AND NOT COALESCE(list_contains("
    "list_transform(embedding::DOUBLE[], x -> isnan(x) OR isinf(x)),"
    " true), false)"
)


def lit_vector(values) -> Column:
    """Literal array<double> column from a Python sequence, built as
    ONE parsed SQL expression. ``F.array(*[F.lit(v) ...])`` costs a
    Py4J round-trip per element (~hundreds of ms of driver overhead
    for a 64-dim query vector); the parser takes the whole literal at
    once. ``repr(float)`` is the shortest round-tripping decimal, and
    Java's Double.parseDouble is correctly rounded, so the JVM sees
    bit-identical doubles."""
    body = ", ".join(lit_double_sql(v) for v in values)
    return F.expr(f"array({body})")


def lit_double_sql(v) -> str:
    """One double as SQL literal text. repr gives 'nan'/'inf'/'-inf',
    which the SQL parser reads as COLUMN NAMES — the non-finite
    literals must be spelled explicitly (found by the round-5 NaN/Inf
    registry sweep via a NaN-poisoned probe vector)."""
    f = float(v)
    if f != f:
        return "double('NaN')"
    if f == float("inf"):
        return "double('Infinity')"
    if f == float("-inf"):
        return "double('-Infinity')"
    return f"{f!r}D"


def round_half_up(col, dp: int):
    """Cross-engine-deterministic decimal rounding:
    ``floor(x·10^dp + 0.5) / 10^dp`` — the SAME IEEE ops in Spark and
    any SQL engine, unlike ``F.round``/``ROUND`` which diverge on
    half-way-boundary doubles (Spark rounds the exact binary
    expansion via BigDecimal HALF_UP; DuckDB rounds the scaled
    double — found as a real sf0.1 flip in the MAD z-score, round 5).
    Oracles must spell the identical floor form.
    """
    from pyspark.sql import functions as F

    scale = float(10 ** dp)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
