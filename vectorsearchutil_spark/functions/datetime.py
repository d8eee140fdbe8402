"""Timezone-proof datetime expression helpers.

The engine's canonical timestamp read type is ``TIMESTAMP_NTZ``
(sources/readers.py:load_table): the benchmark parquet is TZ-naive and
DuckDB oracles are TZ-naive, and NTZ is the only Spark type whose
``collect()`` round-trip and calendar functions never consult a
timezone. Two consequences for expression code:

* ``CAST(ts AS DOUBLE)`` — legal on TIMESTAMP (epoch seconds), ILLEGAL
  on NTZ. Use :func:`epoch_seconds` / :func:`epoch_micros`, built on
  ``timestamp_diff`` from a literal NTZ epoch, which is fully
  session-timezone-independent (no NTZ→LTZ hop at all).
* ``date_trunc`` RETURNS session-zone ``TIMESTAMP`` even for NTZ input.
  Use :func:`trunc_ntz`, which casts the result straight back to NTZ —
  value-identity under the engine's UTC session pin, and keeps raw
  truncated timestamps collect-proof on non-UTC hosts (PySpark's
  ``TimestampType.fromInternal`` converts through the Python process
  local zone at ``collect()``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def _epoch_ntz() -> Column:
    # NTZ epoch literal — diffs against it never consult a timezone.
    # Built lazily: F.expr needs an active SparkContext at call time.
    return F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since 1970-01-01 00:00:00 (naive), as BIGINT.

    Works on TIMESTAMP_NTZ and TIMESTAMP alike; for NTZ it is computed
    without any timezone conversion, so the result is identical on
    every host.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND", _epoch_ntz(), c.cast("timestamp_ntz")
    )


def epoch_seconds(col: Column | str) -> Column:
    """Fractional epoch seconds (DOUBLE) — the NTZ-safe replacement
    for ``ts.cast("double")``."""
    return epoch_micros(col) / F.lit(1000000.0)


def trunc_ntz(unit: str, col: Column | str) -> Column:
    """``date_trunc`` that stays TIMESTAMP_NTZ (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc(unit, c).cast("timestamp_ntz")
