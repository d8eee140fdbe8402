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

def epoch_micros(col: Column | str) -> Column:
    """Microseconds since 1970-01-01 00:00:00 (naive), as BIGINT.

    Works on TIMESTAMP_NTZ and TIMESTAMP alike. Implementation note:
    the purest form — ``timestamp_diff`` against an NTZ epoch literal
    — consults no timezone at all, but it is not whole-stage-codegen
    friendly and measured 2× slower in bucket-explode hot paths
    (events_incident_overlap_join 0.97 → 2.0 s at sf0.1). The shipped
    form hops NTZ→TIMESTAMP→unix_micros, which is value-identical
    UNDER THE ENGINE'S UTC SESSION PIN (`sources/readers.py:
    _pin_session_confs`, applied to every session at the load_table
    boundary) and stays inside codegen. The TZ parity gate
    (tests/test_tz_parity.py: TZ=America/New_York, both parquet read
    configs, vs DuckDB oracles) is the enforcement that the pin
    actually reaches every calendar query on hostile hosts.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_seconds(col: Column | str) -> Column:
    """Fractional epoch seconds (DOUBLE) — the NTZ-safe replacement
    for ``ts.cast("double")`` (see :func:`epoch_micros` for the
    UTC-pin contract)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def trunc_ntz(unit: str, col: Column | str) -> Column:
    """``date_trunc`` that stays TIMESTAMP_NTZ (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc(unit, c).cast("timestamp_ntz")
