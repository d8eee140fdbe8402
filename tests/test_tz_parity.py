"""Environment-portability gate (VERDICT r6 "Next round" #3).

Round 6's driver-red rows were timezone/read-config flips that no test
could catch because the whole suite shares one machine config (UTC JVM,
NTZ-inferring parquet reader). This gate launches the calendar-
sensitive registry slice in FRESH subprocess JVMs under
``TZ=America/New_York`` — once with Spark 4's NTZ parquet mapping and
once with the legacy LTZ mapping (``inferTimestampNTZ=false``, the
pre-4.x default the judge showed flips orders_yoy_growth /
events_cusum_changepoint) — and compares every query against its
DuckDB oracle with the driver-strict comparator.

Both runs must be ALL GREEN: the engine's ``load_table`` boundary
(sources/readers.py) is responsible for making host TZ and parquet
timestamp mapping unobservable to query code.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(ROOT, "tools", "probe_tz_parity.py")


@pytest.mark.parametrize(
    "tz,ntz",
    [
        # hour-offset zone with DST, both parquet read mappings
        ("America/New_York", "true"),
        ("America/New_York", "false"),
        # half-hour-offset zone (+5:30): catches offset-minute bugs
        # that whole-hour zones cannot (minute-granularity windows,
        # sub-hour bucket arithmetic)
        ("Asia/Kolkata", "true"),
        ("Asia/Kolkata", "false"),
    ],
)
def test_tz_parity_hostile_zones(tz: str, ntz: str) -> None:
    env = dict(os.environ)
    env["TZ"] = tz
    # a fresh JVM in the child picks TZ up as its default zone; drop
    # any inherited gateway so the child cannot attach to this suite's
    # UTC JVM
    for k in ("PYSPARK_GATEWAY_PORT", "PYSPARK_GATEWAY_SECRET"):
        env.pop(k, None)
    proc = subprocess.run(
        [sys.executable, PROBE, "--ntz", ntz],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        cwd=ROOT,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, (
        f"TZ parity probe (inferTimestampNTZ={ntz}) failed "
        f"(exit {proc.returncode}):\n{tail}\n--- stderr tail ---\n"
        + "\n".join(proc.stderr.splitlines()[-15:])
    )
    assert "ALL GREEN" in proc.stdout, tail
