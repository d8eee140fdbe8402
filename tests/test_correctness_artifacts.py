"""CI decode of committed driver CORRECTNESS artifacts.

VERDICT r8 "Next round" #8: decode_probes.py's expected-value table
becomes a pytest assertion against each committed CORRECTNESS_r{N}
artifact, so a future driver-side regression is caught by reading the
artifact in CI rather than by a human running the decoder.

Three layers, weakest to strongest:

1. Env canaries (every artifact that contains them): the driver runs
   Spark 4.1.2, reads parquet NANOS as NTZ under JVM UTC, and its two
   DuckDB engines are 1.0.0 — any drift here is the FIRST thing to
   know about a red round.
2. Hash echoes: both driver engines must reproduce the builder's
   committed digests (PROBES_r08.txt) — i.e. the driver's engines
   compute our values, regardless of its comparator's verdict.
3. Full-green gate for artifacts from round 9 on: the round-8 root
   cause (HUGEINT oracle output) is fixed and type-linted
   (tests/test_oracle_types.py), so ANY non-green row in a committed
   r9+ driver artifact is a regression this test must surface.
   (The r8 artifact is exempt: it legitimately carries the 7
   diagnosed HUGEINT reds.)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from decode_probes import EXPECT, _green  # noqa: E402

#: first round whose committed artifact must be 100% green (the
#: HUGEINT fix landed in round 9; earlier artifacts carry known,
#: diagnosed reds that the VERDICT/ROADMAP history documents)
FULL_GREEN_FROM_ROUND = 9


def _artifacts() -> list[tuple[int, str]]:
    out = []
    for p in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            out.append((int(m.group(1)), p))
    return out


ARTIFACTS = _artifacts()


@pytest.mark.parametrize(
    "rnd,path", ARTIFACTS, ids=[f"r{r:02d}" for r, _ in ARTIFACTS]
)
def test_env_canaries_match_expected(rnd, path):
    art = json.load(open(path))
    checked = 0
    for name in (
        "env_spark_version",
        "env_fingerprint",
        "env_fingerprint_duckdb",
    ):
        row = art.get(name)
        if row is None:  # canary not in that round's window
            continue
        checked += 1
        assert row.get("spark_rows") == EXPECT[name], (
            f"{path}: {name} decoded {row.get('spark_rows')}, expected "
            f"{EXPECT[name]} — the driver ENVIRONMENT drifted; run "
            f"`python tools/decode_probes.py {os.path.basename(path)}`"
        )
    if rnd >= 8:
        assert checked == 3, f"{path}: round-8+ window lost its canaries"


@pytest.mark.parametrize(
    "rnd,path", ARTIFACTS, ids=[f"r{r:02d}" for r, _ in ARTIFACTS]
)
def test_hash_echoes_match_committed_digests(rnd, path):
    art = json.load(open(path))
    for name, exp in EXPECT.items():
        if not name.startswith("hashecho_"):
            continue
        row = art.get(name)
        if row is None:
            continue
        assert row.get("spark_rows") == exp, (
            f"{path}: {name} spark digest {row.get('spark_rows')} != "
            f"committed {exp} — the driver's SPARK computed different "
            "values (H1)"
        )
        assert row.get("oracle_rows") == exp, (
            f"{path}: {name} oracle digest {row.get('oracle_rows')} != "
            f"committed {exp} — the driver's DUCKDB computed different "
            "values"
        )


@pytest.mark.parametrize(
    "rnd,path",
    [(r, p) for r, p in ARTIFACTS if r >= FULL_GREEN_FROM_ROUND],
    ids=[
        f"r{r:02d}" for r, _ in ARTIFACTS if r >= FULL_GREEN_FROM_ROUND
    ],
)
def test_round9_plus_artifacts_fully_green(rnd, path):
    art = json.load(open(path))
    assert art, f"{path} is empty"
    bad = {}
    for name, row in art.items():
        if row.get("err") == "no_oracle":
            # rows-only check: driver records spark_rows only
            if not row.get("spark_rows"):
                bad[name] = row
        elif not _green(row):
            bad[name] = row
    assert not bad, (
        f"{path}: non-green rows in a post-fix driver artifact — "
        f"regression: {json.dumps(bad, indent=1)[:2000]}"
    )
