"""Decode a CORRECTNESS_r{N}.json artifact against the round-8
diagnostic probes (PROBES_r08.txt) and PRINT the diagnosis.

Usage: python tools/decode_probes.py CORRECTNESS_r08.json

The round-8 window was built so the driver's answer on the 3 sticky
red rows (orders_yoy_growth / customer_rfm_scores /
events_kaplan_meier) is readable from the artifact alone; this tool
is the reading. It answers, per instrument:

* env_spark_version     -> the driver's Spark version, decoded
* env_fingerprint       -> read mapping + JVM UTC offset (+ label bit)
* env_fingerprint_duckdb-> the driver's DuckDB version, decoded
* hashecho_*            -> which ENGINE's computed values moved, or
                           neither (=> the driver's comparator)
* *_ppm twins           -> whether the float channel is implicated
* decomposition probes  -> which subexpression of rfm/yoy diverges
"""

from __future__ import annotations

import json
import sys

EXPECT = {
    "env_spark_version": 40102,
    "env_fingerprint": 11440,
    "env_fingerprint_duckdb": 10000,
    "hashecho_yoy_growth": 21007,
    "hashecho_rfm_scores": 66164,
    "hashecho_kaplan_meier": 3097,
}

REDS = ("orders_yoy_growth", "customer_rfm_scores", "events_kaplan_meier")
ECHO_OF = {
    "orders_yoy_growth": "hashecho_yoy_growth",
    "customer_rfm_scores": "hashecho_rfm_scores",
    "events_kaplan_meier": "hashecho_kaplan_meier",
}
TWIN_OF = {
    "orders_yoy_growth": "orders_yoy_growth_ppm",
    "events_kaplan_meier": "events_kaplan_meier_ppm",
}


def _green(row) -> bool:
    return bool(
        row
        and row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_r08.json"
    art = json.load(open(path))

    def row(name):
        return art.get(name)

    print(f"== decoding {path} ==\n")

    # --- environment canaries -------------------------------------
    r = row("env_spark_version")
    if r is None:
        print("env_spark_version: NOT IN WINDOW")
    else:
        n = r.get("spark_rows")
        if n == EXPECT["env_spark_version"]:
            print("env_spark_version: 40102 -> driver Spark IS 4.1.2")
        elif n is None:
            print(f"env_spark_version: errored ({r.get('err')})")
        elif n == 9999997:
            # the canary's own sentinel, NOT a version: the driver's
            # spark.version did not parse as maj.min.patch
            print(
                "env_spark_version: 9999997 SENTINEL -> the driver's"
                " spark.version string is UNPARSABLE (custom build"
                " string?) — version unknown, not a named release"
            )
        else:
            maj, rem = divmod(int(n), 10000)
            mi, pa = divmod(rem, 100)
            print(
                f"env_spark_version: {n} -> DRIVER SPARK IS {maj}.{mi}.{pa}"
                " (!= 4.1.2) — hypothesis H1 (driver Spark semantics)"
                " has a named build to reproduce against"
            )
    r = row("env_fingerprint")
    if r is None:
        print("env_fingerprint: NOT IN WINDOW")
    else:
        n = r.get("spark_rows")
        if n is None:
            print(f"env_fingerprint: errored ({r.get('err')})")
        else:
            code, off = divmod(int(n), 10000)
            off -= 1440
            off_s = (
                f"JVM UTC offset {off} min"
                if off != 6120
                else "JVM tz UNREADABLE (sentinel 6120)"
            )
            print(
                f"env_fingerprint: rows {n} -> read_code {code} "
                f"({{1:'NTZ',2:'LTZ',3:'nanos-long',4:'nanos+conf-set',0:'unknown'}}"
                f".get({code})), {off_s}; "
                f"schema_match={r.get('schema_match')} "
                "(False => a version/zone STRING in the label differs)"
            )
    r = row("env_fingerprint_duckdb")
    if r is None:
        print("env_fingerprint_duckdb: NOT IN WINDOW")
    else:
        n = r.get("spark_rows")
        m = r.get("oracle_rows")
        sent = {
            9999999: "SENTINEL: version string unparsable",
            9999998: "SENTINEL: python duckdb module absent",
            None: f"errored ({r.get('err')})",
        }
        print(
            "env_fingerprint_duckdb: python-duckdb "
            f"{sent.get(n, n)} vs oracle engine {sent.get(m, m)} "
            "(10000 = 1.0.0)"
        )
    print()

    # --- the three instruments, per red row -----------------------
    for red in REDS:
        rrow = row(red)
        state = (
            "GREEN" if _green(rrow) else
            ("absent" if rrow is None else "RED")
        )
        print(f"{red}: {state}")
        if rrow is None:
            continue
        echo = row(ECHO_OF[red])
        exp = EXPECT[ECHO_OF[red]]
        # what the echo concluded, for gating the twin read below
        # (ADVICE r8: the twin's float-representation conclusion must
        # not contradict an H1 echo in the same decode)
        echo_read = "absent"
        if echo is None:
            print("  echo: NOT IN WINDOW")
        else:
            s, o = echo.get("spark_rows"), echo.get("oracle_rows")
            print(f"  echo: spark_rows={s} oracle_rows={o} expected={exp}")
            if s == exp and o == exp:
                echo_read = "H2"
                if state == "RED":
                    print(
                        "  => BOTH driver engines computed OUR values while"
                        " the original row stayed red: the divergence is"
                        " the DRIVER'S HASHER/COMPARATOR (H2)."
                    )
                else:
                    print("  => values match everywhere (consistent with green)")
            elif s != exp and o == exp:
                echo_read = "H1"
                print(
                    "  => the driver's SPARK computed different VALUES for"
                    f" this query (H1): its digest {s} != expected {exp}"
                    " while its DuckDB agrees with us."
                )
            elif s == exp and o != exp:
                print(
                    "  => the driver's DUCKDB computed different values"
                    f" (oracle digest {o} != {exp}) — cross-check the"
                    " duckdb canary."
                )
            elif s is not None and s == o:
                print(
                    "  => BOTH driver engines agree WITH EACH OTHER on"
                    f" digest {s} != our {exp}: the driver computes"
                    " different-but-internally-consistent values —"
                    " suspect its parquet data or a shared env dimension."
                )
            else:
                print("  => engines disagree with us AND each other; read row")
        twin = TWIN_OF.get(red)
        if twin:
            t = row(twin)
            if t is None:
                print(f"  twin {twin}: NOT IN WINDOW")
            else:
                tg = "green" if _green(t) else f"red ({t})"
                print(f"  twin {twin}: {tg}")
                if _green(t) and state == "RED":
                    if echo_read == "H1":
                        # the echo already proved different VALUES —
                        # a float-representation claim would
                        # contradict it within one decode (ADVICE r8)
                        print(
                            "  => integer twin green + float original"
                            " red, but the echo above already"
                            " implicates different VALUES (H1) — read"
                            " the echo conclusion first; the twin"
                            " alone is not float-representation"
                            " evidence here."
                        )
                    else:
                        print(
                            "  => integer twin green + float original"
                            " red: consistent with a FLOAT"
                            " REPRESENTATION channel in the driver's"
                            " hasher."
                        )
    print()

    # --- rfm decomposition ----------------------------------------
    print("rfm decomposition:")
    for probe, meaning_red, meaning_green in (
        (
            "customer_rfm_percust",
            "base aggregate diverges (datediff/cents/anchor)",
            "base aggregate matches",
        ),
        (
            "rfm_ntile_fixture",
            "exact_ntile arithmetic itself diverges on driver Spark"
            " (no table read involved)",
            "exact_ntile matches on the literal fixture",
        ),
        (
            "orders_yoy_monthly",
            "yoy month grid diverges (year/month/cents/label)",
            "yoy month grid matches",
        ),
    ):
        p = row(probe)
        if p is None:
            print(f"  {probe}: NOT IN WINDOW")
        else:
            print(
                f"  {probe}: "
                + ("green -> " + meaning_green if _green(p)
                   else f"RED -> {meaning_red} ({p})")
            )

    print("\nwindow totals:")
    n_green = sum(1 for v in art.values() if _green(v))
    print(f"  {n_green}/{len(art)} green")
    for k, v in art.items():
        if not _green(v):
            print(f"  not-green: {k}: {v}")


if __name__ == "__main__":
    main()
