"""tools/decode_probes.py is the instrument that READS the round-8
diagnosis out of a driver CORRECTNESS artifact — a wrong decode would
misdirect round 9, so every branch is pinned against synthetic
artifacts here (no Spark involved)."""

from __future__ import annotations

import json
import subprocess
import sys

TOOL = "/root/repo/tools/decode_probes.py"

GREEN = {
    "rows_match": True,
    "schema_match": True,
    "hash_match": True,
    "err": None,
}


def _base_artifact():
    art = {
        "env_spark_version": dict(GREEN, spark_rows=40102, oracle_rows=40102),
        "env_fingerprint": dict(GREEN, spark_rows=11440, oracle_rows=11440),
        "env_fingerprint_duckdb": dict(
            GREEN, spark_rows=10000, oracle_rows=10000
        ),
        "hashecho_yoy_growth": dict(
            GREEN, spark_rows=21007, oracle_rows=21007
        ),
        "hashecho_rfm_scores": dict(
            GREEN, spark_rows=66164, oracle_rows=66164
        ),
        "hashecho_kaplan_meier": dict(
            GREEN, spark_rows=3097, oracle_rows=3097
        ),
        "orders_yoy_growth": dict(GREEN, spark_rows=80, oracle_rows=80),
        "customer_rfm_scores": dict(GREEN, spark_rows=1500, oracle_rows=1500),
        "events_kaplan_meier": dict(GREEN, spark_rows=9, oracle_rows=9),
        "orders_yoy_growth_ppm": dict(GREEN, spark_rows=80, oracle_rows=80),
        "events_kaplan_meier_ppm": dict(GREEN, spark_rows=9, oracle_rows=9),
        "orders_yoy_monthly": dict(GREEN, spark_rows=80, oracle_rows=80),
        "customer_rfm_percust": dict(GREEN, spark_rows=1500, oracle_rows=1500),
        "rfm_ntile_fixture": dict(GREEN, spark_rows=42, oracle_rows=42),
    }
    return art


def _run(tmp_path, art):
    p = tmp_path / "art.json"
    p.write_text(json.dumps(art))
    proc = subprocess.run(
        [sys.executable, TOOL, str(p)], capture_output=True, text=True
    )
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def test_all_green_decodes_clean(tmp_path):
    out = _run(tmp_path, _base_artifact())
    assert "driver Spark IS 4.1.2" in out
    assert "read_code 1" in out
    assert "values match everywhere" in out
    assert "14/14 green" in out


def test_foreign_spark_version_decodes(tmp_path):
    art = _base_artifact()
    art["env_spark_version"].update(
        spark_rows=40001, hash_match=False, rows_match=False
    )
    out = _run(tmp_path, art)
    assert "DRIVER SPARK IS 4.0.1" in out
    assert "H1" in out


def test_comparator_hypothesis_h2(tmp_path):
    """Original red, echo matches expected on both sides => H2."""
    art = _base_artifact()
    art["customer_rfm_scores"].update(hash_match=False)
    out = _run(tmp_path, art)
    assert "customer_rfm_scores: RED" in out
    assert "DRIVER'S HASHER/COMPARATOR (H2)" in out


def test_driver_spark_values_hypothesis_h1(tmp_path):
    """Echo's spark digest moved while its oracle digest holds => H1."""
    art = _base_artifact()
    art["events_kaplan_meier"].update(hash_match=False)
    art["hashecho_kaplan_meier"].update(
        spark_rows=5555, rows_match=False, hash_match=False
    )
    out = _run(tmp_path, art)
    assert "SPARK computed different VALUES" in out


def test_internally_consistent_but_different(tmp_path):
    """Both engines agree with each other, not with us => data/env."""
    art = _base_artifact()
    art["hashecho_yoy_growth"].update(
        spark_rows=7777, oracle_rows=7777, rows_match=True, hash_match=True
    )
    out = _run(tmp_path, art)
    assert "different-but-internally-consistent" in out


def test_float_channel_twin_read(tmp_path):
    art = _base_artifact()
    art["orders_yoy_growth"].update(hash_match=False)
    # echo also reads H2 here; the twin line adds the float-channel call
    out = _run(tmp_path, art)
    assert "twin orders_yoy_growth_ppm: green" in out
    # original red + twin green => float repr message
    assert "FLOAT REPRESENTATION" in out


def test_env_fingerprint_numeric_decode(tmp_path):
    art = _base_artifact()
    art["env_fingerprint"].update(
        spark_rows=21740, rows_match=False, hash_match=False
    )
    out = _run(tmp_path, art)
    assert "read_code 2" in out  # 21740 = 2*10000 + 300 + 1440
    assert "offset 300 min" in out


def test_missing_probe_reports_not_in_window(tmp_path):
    art = _base_artifact()
    del art["rfm_ntile_fixture"]
    out = _run(tmp_path, art)
    assert "rfm_ntile_fixture: NOT IN WINDOW" in out


def test_sentinels_decode_as_sentinels_not_versions(tmp_path):
    art = _base_artifact()
    art["env_spark_version"].update(
        spark_rows=9999997, rows_match=False, hash_match=False
    )
    art["env_fingerprint"].update(
        spark_rows=7560, rows_match=False, hash_match=False
    )  # 0*10000 + 6120 + 1440: read unknown + tz-unreadable sentinel
    art["env_fingerprint_duckdb"].update(
        spark_rows=9999998, rows_match=False, hash_match=False
    )
    out = _run(tmp_path, art)
    assert "UNPARSABLE" in out
    assert "999.99.97" not in out
    assert "JVM tz UNREADABLE (sentinel 6120)" in out
    assert "python duckdb module absent" in out


def test_env_canaries_report_absent_and_errored(tmp_path):
    art = _base_artifact()
    del art["env_fingerprint_duckdb"]
    art["env_fingerprint"].update(
        spark_rows=None, rows_match=None, hash_match=None, err="boom"
    )
    out = _run(tmp_path, art)
    assert "env_fingerprint: errored (boom)" in out
    assert "env_fingerprint_duckdb: NOT IN WINDOW" in out
