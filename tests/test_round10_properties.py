"""Hypothesis properties pinning the round-10 wave to naive
definitions on arbitrary generated data (the round-8 program —
tests/test_round8_properties.py — extended to the new operators).

Replication discipline: integer/cents fixpoints reproduce EXACTLY
(equality is bitwise); z/p/ratio doubles reproduce through the SAME
IEEE op sequence in Python (Horner polynomial, squaring chain,
left-fold) so quantized outputs still compare equal; the one libm
call that can 1-ulp-flip between Python and the JVM (ln in the
elasticity fixpoint) compares within a tolerance instead.
"""

from __future__ import annotations

import calendar
import hashlib
import math
from collections import defaultdict
from datetime import datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st

BASE = datetime(2024, 1, 1)


def _day_ts(d: int, i: int = 0) -> datetime:
    return BASE + timedelta(days=d, seconds=i % 86_400)


def _cents(v: float) -> int:
    return int(math.floor(v * 100.0 + 0.5))


def _q(x: float, dp: int) -> float:
    s = 10.0 ** dp
    return math.floor(x * s + 0.5) / s


def _nsf(x: float) -> float:
    """normal_sf's exact op sequence (Horner + squaring chain)."""
    d1, d2, d3 = 0.0498673470, 0.0211410061, 0.0032776263
    d4, d5, d6 = 0.0000380036, 0.0000488906, 0.0000053830
    t = 1.0 + x * (d1 + x * (d2 + x * (d3 + x * (d4 + x * (d5 + x * d6)))))
    t2 = t * t
    t4 = t2 * t2
    t8 = t4 * t4
    return 0.5 / (t8 * t8)


def _grid(rows):
    """(type, day) -> summed cents (None when no finite value)."""
    g = defaultdict(lambda: None)
    for t, d, v in rows:
        if v is not None and math.isfinite(v):
            cur = g[(t, d)]
            g[(t, d)] = (cur or 0) + _cents(v)
        else:
            g.setdefault((t, d), None)
    return g


ev_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(0, 7),
        st.floats(-50, 50, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=60,
)


def _ev_df(spark, rows):
    return spark.createDataFrame(
        [(t, _day_ts(d, i), float(v)) for i, (t, d, v) in enumerate(rows)],
        "event_type string, ts timestamp_ntz, value double",
    )


# ------------------------------------------------------------------
# mann_kendall_daily + fdr_bh_trend
# ------------------------------------------------------------------


def _naive_mk(rows):
    g = _grid(rows)
    per_type = defaultdict(list)
    for (t, d), vc in g.items():
        per_type[t].append((d, vc))
    out = {}
    for t, pts in per_type.items():
        pts.sort()
        n = len(pts)
        if n < 2:
            continue  # no pairs: absent (inner join on s)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                a, b = pts[i][1], pts[j][1]
                if a is None or b is None:
                    continue
                s += (b > a) - (b < a)
        ties = defaultdict(int)
        for _, vc in pts:
            ties[vc] += 1
        tie_term = sum(c * (c - 1) * (2 * c + 5) for c in ties.values())
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        var_s = float(var18) / 18.0
        if var18 > 0 and s != 0:
            z = (float(s) - (1.0 if s > 0 else -1.0)) / math.sqrt(var_s)
        else:
            z = 0.0
        p = 2.0 * _nsf(abs(z))
        out[t] = (n, s, _q(var_s, 6), _q(z, 6), _q(min(p, 1.0), 6))
    return out


@settings(max_examples=5, deadline=None)
@given(ev_rows)
def test_mann_kendall_matches_naive(spark, rows):
    from vectorsearchutil_spark.operators.analytics import mann_kendall_daily

    got = {
        r["event_type"]: (
            r["n_days"], r["s_stat"], r["var_s"], r["z_mk"], r["p_value"]
        )
        for r in mann_kendall_daily(_ev_df(spark, rows)).collect()
    }
    assert got == _naive_mk(rows)


@settings(max_examples=5, deadline=None)
@given(ev_rows)
def test_fdr_bh_matches_naive_step_up(spark, rows):
    from vectorsearchutil_spark.operators.analytics import fdr_bh_trend

    got = {
        r["event_type"]: (r["p_rank"], r["bh_threshold"], r["rejected"])
        for r in fdr_bh_trend(_ev_df(spark, rows)).collect()
    }
    mk = _naive_mk(rows)
    order = sorted(mk.items(), key=lambda kv: (kv[1][4], kv[0]))
    m = len(order)
    passing = [
        i + 1
        for i, (_, v) in enumerate(order)
        if v[4] <= 0.1 * (i + 1) / m
    ]
    k = max(passing) if passing else 0
    want = {
        t: (i + 1, _q(0.1 * (i + 1) / m, 6), (i + 1) <= k)
        for i, (t, _) in enumerate(order)
    }
    assert got == want


# ------------------------------------------------------------------
# ewma_forecast_daily
# ------------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(ev_rows)
def test_ewma_forecast_matches_naive_fold(spark, rows):
    from vectorsearchutil_spark.operators.analytics import (
        ewma_forecast_daily,
    )

    got = {
        r["event_type"]: (
            r["n_days"], r["wape"], r["mae_cents"], r["next_forecast_cents"]
        )
        for r in ewma_forecast_daily(_ev_df(spark, rows)).collect()
    }
    g = _grid(rows)
    per_type = defaultdict(list)
    for (t, d), vc in g.items():
        if vc is not None:
            per_type[t].append((d, float(vc)))
    want = {}
    for t, pts in per_type.items():
        pts.sort()
        vals = [v for _, v in pts]
        n = len(vals)
        if n < 2:
            continue
        s = vals[0]
        es = 0
        asum = 0
        for i in range(1, n):
            es += int(math.floor(abs(vals[i] - s) * 1e2 + 0.5))
            asum += int(math.floor(abs(vals[i]) * 1e2 + 0.5))
            s = 0.3 * vals[i] + 0.7 * s
        wape = _q(float(es) / float(asum), 6) if asum > 0 else None
        mae = _q(float(es) / 1e2 / float(n - 1), 4)
        want[t] = (n, wape, mae, _q(s, 4))
    assert got == want


# ------------------------------------------------------------------
# dau_mau_stickiness
# ------------------------------------------------------------------

ud_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 70)),
    min_size=1,
    max_size=60,
)


@settings(max_examples=5, deadline=None)
@given(ud_rows)
def test_dau_mau_matches_bruteforce_window(spark, rows):
    from vectorsearchutil_spark.operators.analytics import (
        dau_mau_stickiness,
    )

    df = spark.createDataFrame(
        [(u, _day_ts(d, i)) for i, (u, d) in enumerate(rows)],
        "user_id long, ts timestamp_ntz",
    )
    got = {
        r["day"]: (r["dau"], r["mau"], r["stickiness"])
        for r in dau_mau_stickiness(df).collect()
    }
    active = defaultdict(set)  # day int -> users
    for u, d in rows:
        active[d].add(u)
    want = {}
    for d, users in active.items():
        mau_users = set()
        for d2, u2 in active.items():
            if d - 29 <= d2 <= d:
                mau_users |= u2
        dau, mau = len(users), len(mau_users)
        want[(BASE + timedelta(days=d)).date()] = (
            dau, mau, _q(float(dau) / float(mau), 6)
        )
    assert got == want


# ------------------------------------------------------------------
# nelson_aalen
# ------------------------------------------------------------------

surv_rows = st.lists(
    st.tuples(
        st.integers(0, 5),
        st.sampled_from(["signup", "purchase", "view"]),
        st.integers(0, 9),
    ),
    min_size=1,
    max_size=40,
)


def _epoch(ts: datetime) -> int:
    return calendar.timegm(ts.timetuple())


@settings(max_examples=5, deadline=None)
@given(surv_rows)
def test_nelson_aalen_matches_naive(spark, rows):
    from vectorsearchutil_spark.operators.analytics import nelson_aalen

    df = spark.createDataFrame(
        [
            (u, ty, _day_ts(d, i))
            for i, (u, ty, d) in enumerate(rows)
        ],
        "user_id long, event_type string, ts timestamp_ntz",
    )
    got = [
        (r["delay_days"], r["n_at_risk"], r["n_events"], r["cum_hazard"])
        for r in nelson_aalen(df).collect()
    ]
    got.sort()

    per = defaultdict(lambda: [None, None, None])  # s, c, seen
    for i, (u, ty, d) in enumerate(rows):
        e = _epoch(_day_ts(d, i))
        p = per[u]
        if ty == "signup":
            p[0] = e if p[0] is None else min(p[0], e)
        if ty == "purchase":
            p[1] = e if p[1] is None else min(p[1], e)
        p[2] = e if p[2] is None else max(p[2], e)
    pu2 = {u: p for u, p in per.items() if p[0] is not None}
    if not pu2:
        assert got == []
        return
    hmax = max(p[2] for p in pu2.values())
    ev = defaultdict(int)
    cens = defaultdict(int)
    n_total = len(pu2)
    for p in pu2.values():
        s, c, _ = p
        if c is not None and c >= s:
            ev[c // 86400 - s // 86400] += 1
        else:
            cens[hmax // 86400 - s // 86400] += 1
    days = sorted(set(ev) | set(cens))
    want = []
    hsum = 0
    removed = 0
    for d in days:
        n_at_risk = n_total - removed
        d_ev = ev.get(d, 0)
        if n_at_risk > 0:
            hsum += int(
                math.floor(float(d_ev) / float(n_at_risk) * 1e9 + 0.5)
            )
        if d_ev > 0:
            want.append((d, n_at_risk, d_ev, _q(hsum / 1e9, 6)))
        removed += d_ev + cens.get(d, 0)
    assert got == sorted(want)


# ------------------------------------------------------------------
# diff_in_diff
# ------------------------------------------------------------------

did_rows = st.lists(
    st.tuples(
        st.integers(0, 9),
        st.integers(0, 9),
        st.floats(-50, 50, allow_nan=False, allow_infinity=False),
    ),
    min_size=2,
    max_size=60,
)


@settings(max_examples=5, deadline=None)
@given(did_rows)
def test_diff_in_diff_matches_naive_cells(spark, rows):
    from vectorsearchutil_spark.operators.analytics import diff_in_diff

    df = spark.createDataFrame(
        [(u, _day_ts(d, i), float(v)) for i, (u, d, v) in enumerate(rows)],
        "user_id long, ts timestamp_ntz, value double",
    )
    r = diff_in_diff(df).collect()[0]

    def treated(uid):
        h = hashlib.md5(f"did:{uid}".encode()).hexdigest()[:8]
        return int(h, 16) / 2**32 < 0.5

    d0 = min(d for _, d, _ in rows)
    d1 = max(d for _, d, _ in rows)
    mid = math.floor((d1 - d0) / 2)
    cells = defaultdict(lambda: [0, 0])
    for u, d, v in rows:
        key = (treated(u), (d - d0) > mid)
        cells[key][0] += 1
        cells[key][1] += _cents(v)

    def mean(key):
        n, s = cells.get(key, (0, 0))
        return float(s) / float(n) if n else None

    tp, t0 = mean((True, True)), mean((True, False))
    cp, c0 = mean((False, True)), mean((False, False))
    assert r["n_events"] == len(rows)
    for gotv, wantv in (
        (r["pre_treat"], t0),
        (r["post_treat"], tp),
        (r["pre_control"], c0),
        (r["post_control"], cp),
    ):
        assert gotv == (None if wantv is None else _q(wantv / 100.0, 4))
    if None not in (tp, t0, cp, c0):
        assert r["did_estimate"] == _q(
            ((tp - t0) - (cp - c0)) / 100.0, 4
        )
    else:
        assert r["did_estimate"] is None


# ------------------------------------------------------------------
# trigram_stupid_backoff
# ------------------------------------------------------------------

doc_rows = st.lists(
    st.tuples(
        st.integers(1, 30),
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda r: r[0],
)


@settings(max_examples=5, deadline=None)
@given(doc_rows)
def test_trigram_backoff_matches_naive(spark, rows):
    from vectorsearchutil_spark.operators.textanalysis import (
        trigram_stupid_backoff,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in rows], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["sbo_score"])
        for r in trigram_stupid_backoff(df).collect()
    }

    def in_ref(did):
        h = hashlib.md5(f"sbo:{did}".encode()).hexdigest()[:8]
        return int(h, 16) / 2**32 < 0.5

    tc = defaultdict(int)
    bc = defaultdict(int)
    uc = defaultdict(int)
    nn = 0
    for did, ws in rows:
        if not in_ref(did):
            continue
        for i in range(len(ws) - 2):
            tc[(ws[i], ws[i + 1], ws[i + 2])] += 1
        for i in range(len(ws) - 1):
            bc[(ws[i], ws[i + 1])] += 1
        for w in ws:
            uc[w] += 1
            nn += 1
    want = {}
    for did, ws in rows:
        tris = [
            (ws[i], ws[i + 1], ws[i + 2]) for i in range(len(ws) - 2)
        ]
        if not tris:
            continue
        sp = 0
        for w1, w2, w3 in tris:
            if (w1, w2, w3) in tc:
                s = float(tc[(w1, w2, w3)]) / float(bc[(w1, w2)])
            elif (w2, w3) in bc:
                s = 0.4 * (float(bc[(w2, w3)]) / float(uc[w2]))
            elif nn > 0:
                s = 0.4 * (0.4 * (float(uc.get(w3, 0)) / float(nn)))
            else:
                s = 0.0
            sp += int(math.floor(s * 1e6 + 0.5))
        want[did] = (len(tris), _q(sp / 1e6 / len(tris), 6))
    assert got == want


# ------------------------------------------------------------------
# loo_source_influence + quality_ece (shared quality metric)
# ------------------------------------------------------------------

STOP = {"the", "a", "of", "and", "to", "is", "in", "on"}

qdoc_rows = st.lists(
    st.tuples(
        st.integers(1, 40),
        st.sampled_from(["s1", "s2", "s3"]),
        st.lists(
            st.sampled_from(["the", "of", "cat", "dog", "runs"]),
            min_size=0,
            max_size=20,
        ),
    ),
    min_size=1,
    max_size=16,
    unique_by=lambda r: r[0],
)


def _quality(ws):
    n = len(ws)
    if n == 0:
        return None
    stop = sum(1 for w in ws if w in STOP)
    raw = min(1.0, n / 100.0) * (1.0 - stop * 1.0 / n)
    # Spark F.round = BigDecimal HALF_UP on the double's exact binary
    # expansion — Python round() is banker's, so go through Decimal
    return float(
        Decimal(raw).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )


@settings(max_examples=5, deadline=None)
@given(qdoc_rows)
def test_loo_influence_matches_naive(spark, rows):
    from vectorsearchutil_spark.operators.textanalysis import (
        loo_source_influence,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws), s) for i, s, ws in rows],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: (
            r["n_docs"], r["source_mean"], r["loo_mean"], r["influence"]
        )
        for r in loo_source_influence(df).collect()
    }
    q4 = defaultdict(list)
    for i, s, ws in rows:
        q = _quality(ws)
        if q is not None:
            q4[s].append(int(math.floor(q * 10000.0 + 0.5)))
    n = sum(len(v) for v in q4.values())
    tot = sum(sum(v) for v in q4.values())
    want = {}
    for s, v in q4.items():
        ns, ss = len(v), sum(v)
        src_mean = _q(float(ss) / (10000.0 * float(ns)), 6)
        if n > ns:
            loo = float(tot - ss) / (10000.0 * float(n - ns))
            infl = _q(float(tot) / (10000.0 * float(n)) - loo, 6)
            loo = _q(loo, 6)
        else:
            loo = None
            infl = None
        want[s] = (ns, src_mean, loo, infl)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(qdoc_rows)
def test_quality_ece_matches_naive(spark, rows):
    from vectorsearchutil_spark.operators.textanalysis import quality_ece

    df = spark.createDataFrame(
        [(i, " ".join(ws), s) for i, s, ws in rows],
        "doc_id long, text string, source string",
    )
    got = {
        r["bin"]: (
            r["n_docs"], r["avg_conf"], r["frac_pos"], r["ece_contrib"]
        )
        for r in quality_ece(df).collect()
    }
    docs = []
    per_src = defaultdict(list)
    for i, s, ws in rows:
        q = _quality(ws)
        if q is not None:
            qi = int(math.floor(q * 10000.0 + 0.5))
            docs.append((s, q, qi))
            per_src[s].append(qi)
    if not docs:
        assert got == {}
        return
    ranked = sorted(
        per_src.items(),
        key=lambda kv: (-(float(sum(kv[1])) / float(len(kv[1]))), kv[0]),
    )
    top = math.ceil(len(ranked) / 2.0)
    pos = {s for s, _ in ranked[:top]}
    bins = defaultdict(lambda: [0, 0, 0])
    for s, q, qi in docs:
        b = min(9, int(math.floor(q * 10.0)))
        bins[b][0] += 1
        bins[b][1] += qi
        bins[b][2] += 1 if s in pos else 0
    n = len(docs)
    want = {}
    for b, (nb, sq, sy) in bins.items():
        conf = float(sq) / (10000.0 * float(nb))
        acc = float(sy) / float(nb)
        want[b] = (
            nb,
            _q(conf, 6),
            _q(acc, 6),
            _q(float(nb) / float(n) * abs(acc - conf), 6),
        )
    assert got == want


# ------------------------------------------------------------------
# price_elasticity — ln is the one true libm call (tolerance compare)
# ------------------------------------------------------------------

li_rows = st.lists(
    st.tuples(
        st.integers(1, 3),  # partkey -> brand
        st.floats(0.5, 50, allow_nan=False, allow_infinity=False),
        st.floats(1.0, 1000, allow_nan=False, allow_infinity=False),
    ),
    min_size=2,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(li_rows)
def test_price_elasticity_matches_naive_ols(spark, rows):
    import pytest

    from vectorsearchutil_spark.operators.analytics import price_elasticity

    li = spark.createDataFrame(
        [(i, pk, float(q), float(ep)) for i, (pk, q, ep) in enumerate(rows)],
        "l_orderkey long, l_partkey long, l_quantity double,"
        " l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, "B1"), (2, "B2"), (3, "B1")], "p_partkey long, p_brand string"
    )
    got = {
        r["p_brand"]: (r["n_obs"], r["elasticity"], r["ln_q_intercept"])
        for r in price_elasticity(li, part).collect()
    }
    brand_of = {1: "B1", 2: "B2", 3: "B1"}
    per = defaultdict(list)
    for pk, q, ep in rows:
        lx = int(math.floor(math.log(ep / q) * 1e9 + 0.5))
        ly = int(math.floor(math.log(q) * 1e9 + 0.5))
        per[brand_of[pk]].append((lx, ly))
    for brand, pts in per.items():
        n = float(len(pts))
        sx = float(sum(p[0] for p in pts))
        sy = float(sum(p[1] for p in pts))
        sxx = float(sum(p[0] * p[0] for p in pts))
        sxy = float(sum(p[0] * p[1] for p in pts))
        den = n * sxx - sx * sx
        gn, ge, gi = got[brand]
        assert gn == len(pts)
        if den != 0:
            slope = (n * sxy - sx * sy) / den
            icept = (sy - slope * sx) / (n * 1e9)
            # ln 1-ulp flips move the 1e9 fixpoint by ±1 → tolerance
            assert ge == pytest.approx(slope, abs=1e-4)
            assert gi == pytest.approx(icept, abs=1e-4)
        else:
            assert ge is None and gi is None


# ------------------------------------------------------------------
# template_clusters
# ------------------------------------------------------------------

tmpl_rows = st.lists(
    st.tuples(
        st.integers(1, 30),
        st.text(
            alphabet="ab1 \t\n.,!x",
            min_size=0,
            max_size=20,
        ),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda r: r[0],
)


@settings(max_examples=5, deadline=None)
@given(tmpl_rows)
def test_template_clusters_matches_naive(spark, rows):
    import re

    from vectorsearchutil_spark.operators.textanalysis import (
        template_clusters,
    )

    df = spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows],
        "doc_id long, text string, n_chars long",
    )
    got = {
        r["template_hash"]: (
            r["n_docs"], r["example_doc_id"], r["total_chars"]
        )
        for r in template_clusters(df).collect()
    }
    groups = defaultdict(list)
    for i, t in rows:
        sk = re.sub(r"[A-Za-z0-9]+", "x", t)
        sk = re.sub(r"[ \t\n\f\r]+", " ", sk)
        sk = sk.strip(" ")  # Spark trim strips SPACES only
        groups[hashlib.md5(sk.encode("utf-8")).hexdigest()].append((i, len(t)))
    want = {
        h: (
            len(m),
            min(i for i, _ in m),
            sum(c for _, c in m),
        )
        for h, m in groups.items()
        if len(m) >= 2
    }
    assert got == want
