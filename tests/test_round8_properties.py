"""Hypothesis properties pinning the round-8 wave statistics to their
naive definitions on arbitrary generated data — the same program that
covers ntile/lorenz/theilsen/funnel/triangle (tests/test_properties.py),
extended to the newly promoted stats (spearman, kendall tau-b,
transition entropy, max drawdown, Hill estimator).

Replication discipline: integer/cents fixpoints are reproduced
EXACTLY (the operators' moment sums are exact integers, so equality
is bitwise); the two places a genuine double FOLD or libm call sits
inside the operator (entropy term sum; hill's ln) compare within one
quantization step instead.
"""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

BASE = datetime(2024, 1, 1)


def _day_ts(d: int, i: int = 0) -> datetime:
    # distinct intra-day second per row keeps (ts, id) orders stable
    return BASE + timedelta(days=d, seconds=i % 86_400)


def _cents(v: float) -> int:
    return int(math.floor(v * 100.0 + 0.5))


def _q6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _dbl_midranks(vals):
    """2*midrank per element = 2*rank_min + ties − 1, exact ints."""
    out = []
    for v in vals:
        rank_min = 1 + sum(1 for o in vals if o < v)
        ties = sum(1 for o in vals if o == v)
        out.append(2 * rank_min + ties - 1)
    return out


# ------------------------------------------------------------------
# spearman_daily
# ------------------------------------------------------------------

ev_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(0, 7),
        st.floats(-50, 50, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=5, deadline=None)
@given(ev_rows)
def test_spearman_daily_matches_naive_midrank(spark, rows):
    from vectorsearchutil_spark.operators.analytics import spearman_daily

    df = spark.createDataFrame(
        [(t, _day_ts(d, i), float(v)) for i, (t, d, v) in enumerate(rows)],
        "event_type string, ts timestamp_ntz, value double",
    )
    got = {
        r["event_type"]: (r["n_days"], r["spearman_rho"])
        for r in spearman_daily(df).collect()
    }

    grid = defaultdict(lambda: [0, 0])  # (type, day) -> [n, v_cents]
    for t, d, v in rows:
        g = grid[(t, d)]
        g[0] += 1
        g[1] += _cents(v)
    per_type = defaultdict(list)
    for (t, d), (n, vc) in grid.items():
        per_type[t].append((n, vc))
    want = {}
    for t, pts in per_type.items():
        xs = _dbl_midranks([p[0] for p in pts])
        ys = _dbl_midranks([p[1] for p in pts])
        n = len(pts)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        prod = float(denx) * float(deny)
        rho = None if prod == 0.0 else _q6(float(num) / math.sqrt(prod))
        want[t] = (n, rho)
    assert got == want


# ------------------------------------------------------------------
# kendall_tau_daily
# ------------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(ev_rows)
def test_kendall_daily_matches_naive_pairs(spark, rows):
    from vectorsearchutil_spark.operators.analytics import kendall_tau_daily

    df = spark.createDataFrame(
        [(t, _day_ts(d, i), float(v)) for i, (t, d, v) in enumerate(rows)],
        "event_type string, ts timestamp_ntz, value double",
    )
    got = {
        r["event_type"]: (
            r["n_pairs"], r["concordant"], r["discordant"], r["tau_b"]
        )
        for r in kendall_tau_daily(df).collect()
    }

    grid = defaultdict(lambda: [0, 0])
    for t, d, v in rows:
        g = grid[(t, d)]
        g[0] += 1
        g[1] += _cents(v)
    per_type = defaultdict(list)  # type -> [(day, n, vc)]
    for (t, d), (n, vc) in grid.items():
        per_type[t].append((d, n, vc))
    want = {}
    for t, pts in per_type.items():
        pts.sort()
        C = D = tx = ty = n0 = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                n0 += 1
                dx = pts[i][1] - pts[j][1]
                dy = pts[i][2] - pts[j][2]
                if dx == 0:
                    tx += 1
                if dy == 0:
                    ty += 1
                if (dx > 0 and dy > 0) or (dx < 0 and dy < 0):
                    C += 1
                elif (dx > 0 and dy < 0) or (dx < 0 and dy > 0):
                    D += 1
        if n0 == 0:
            # a single-day type emits no pair rows at all
            continue
        prod = (float(n0) - float(tx)) * (float(n0) - float(ty))
        tau = None if prod == 0.0 else _q6((C - D) / math.sqrt(prod))
        want[t] = (n0, C, D, tau)
    assert got == want


# ------------------------------------------------------------------
# transition_entropy
# ------------------------------------------------------------------

seq_rows = st.lists(
    st.tuples(st.integers(0, 3), st.sampled_from(["x", "y", "z"])),
    min_size=2,
    max_size=60,
)


@settings(max_examples=5, deadline=None)
@given(seq_rows)
def test_transition_entropy_matches_naive_bigrams(spark, rows):
    from vectorsearchutil_spark.operators.analytics import (
        transition_entropy,
    )

    df = spark.createDataFrame(
        [
            (int(u), t, _day_ts(0, i), int(i))
            for i, (u, t) in enumerate(rows)
        ],
        "user_id long, event_type string, ts timestamp_ntz,"
        " event_id long",
    )
    got = {
        r["from_type"]: (
            r["n_transitions"], r["n_next_types"], r["h_bits"], r["share"]
        )
        for r in transition_entropy(df).collect()
    }

    byuser = defaultdict(list)
    for i, (u, t) in enumerate(rows):
        byuser[u].append((i, t))  # event_id == insertion order == ts order
    trans = defaultdict(int)
    for u, seq in byuser.items():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    n_all = sum(trans.values())
    per_from = defaultdict(dict)
    for (a, b), c in trans.items():
        per_from[a][b] = c
    assert set(got) == set(per_from)
    for a, nexts in per_from.items():
        ni = sum(nexts.values())
        h = sum(
            -(c / ni) * math.log2(c / ni) for c in nexts.values()
        )
        g = got[a]
        assert g[0] == ni
        assert g[1] == len(nexts)
        # the entropy term sum is a true double fold inside the
        # engine (order unspecified) — compare within one 1e-6 step
        assert g[2] is not None and abs(g[2] - _q6(h)) <= 1e-6 + 1e-12
        assert g[3] == _q6(ni / n_all)


# ------------------------------------------------------------------
# max_drawdown_daily
# ------------------------------------------------------------------

dd_rows = st.lists(
    st.tuples(
        st.integers(0, 9),
        st.floats(-100, 100, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=5, deadline=None)
@given(dd_rows)
def test_max_drawdown_matches_naive_scan(spark, rows):
    from vectorsearchutil_spark.operators.analytics import (
        max_drawdown_daily,
    )

    df = spark.createDataFrame(
        [(_day_ts(d, i), float(v)) for i, (d, v) in enumerate(rows)],
        "ts timestamp_ntz, value double",
    )
    (r,) = max_drawdown_daily(df).collect()

    daily = defaultdict(int)
    for d, v in rows:
        daily[d] += _cents(v)
    cum = peak = 0
    best = None  # (dd, day, peak) with earliest-day tie-break on max dd
    first = True
    for d in sorted(daily):
        cum = cum + daily[d]
        peak = cum if first else max(peak, cum)
        first = False
        dd = peak - cum
        if best is None or dd > best[0]:
            best = (dd, d, peak)
    want_day = (BASE + timedelta(days=best[1])).strftime("%Y-%m-%d")
    assert r["n_days"] == len(daily)
    assert r["max_drawdown"] == math.floor(best[0] + 0.5) / 100.0
    assert r["trough_day"] == want_day
    assert r["peak_at_trough"] == math.floor(best[2] + 0.5) / 100.0


# ------------------------------------------------------------------
# hill_tail_index
# ------------------------------------------------------------------

hill_rows = st.lists(
    st.floats(0.001, 1e6, allow_nan=False, allow_infinity=False),
    min_size=5,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(hill_rows)
def test_hill_matches_naive_order_stats(spark, xs):
    from vectorsearchutil_spark.operators.analytics import hill_tail_index

    k = 3
    df = spark.createDataFrame(
        [("t", float(x)) for x in xs],
        "event_type string, value double",
    )
    out = hill_tail_index(df, k=k).collect()
    pos = sorted((x for x in xs if x > 0), reverse=True)
    if len(pos) < k + 1:
        assert out == []
        return
    (r,) = out
    xk1 = pos[k]
    want = sum(math.log(x / xk1) for x in pos[:k]) / k
    assert r["k"] == k
    # ln is libm (JVM vs CPython may differ in the last ulp, and the
    # engine quantizes each term to 1e-9 before the exact sum) —
    # allow one 1e-6 output step plus the k-term nano slack
    assert abs(r["hill"] - _q6(want)) <= 1e-6 + k * 1e-9
    # alpha = 1/hill is computed from the UNROUNDED nano sum, so
    # compare against the unquantized naive value — and only when the
    # reciprocal is well-conditioned (a near-flat tail has hill→0
    # where nano-level noise amplifies as 1/hill² and the check would
    # test arithmetic conditioning, not the operator)
    if want > 1e-3:
        assert abs(r["alpha"] - 1.0 / want) <= (1.0 / want) * 1e-5 + 1e-5


# ------------------------------------------------------------------
# rolling_corr_daily
# ------------------------------------------------------------------

rc_rows = st.lists(
    st.tuples(
        st.sampled_from(["purchase", "click", "view"]),
        st.integers(0, 12),
        st.floats(-40, 40, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=80,
)


@settings(max_examples=5, deadline=None)
@given(rc_rows)
def test_rolling_corr_matches_naive_moments(spark, rows):
    from vectorsearchutil_spark.operators.analytics import (
        rolling_corr_daily,
    )

    df = spark.createDataFrame(
        [(t, _day_ts(d, i), float(v)) for i, (t, d, v) in enumerate(rows)],
        "event_type string, ts timestamp_ntz, value double",
    )
    W = 3
    got = {
        r["day"]: r["rolling_corr"]
        for r in rolling_corr_daily(df, window_days=W).collect()
    }

    daily = defaultdict(lambda: [0, 0])  # observed day -> [x, y]
    for t, d, v in rows:
        g = daily[d]
        if t == "purchase":
            g[0] += _cents(v)
        elif t == "click":
            g[1] += _cents(v)
    days = sorted(daily)
    want = {}
    for i, d in enumerate(days):
        if i + 1 < W:
            continue  # window not full yet (rows-based, observed days)
        win = [daily[days[j]] for j in range(i - W + 1, i + 1)]
        sx = sum(p[0] for p in win)
        sy = sum(p[1] for p in win)
        sxx = sum(p[0] * p[0] for p in win)
        syy = sum(p[1] * p[1] for p in win)
        sxy = sum(p[0] * p[1] for p in win)
        num = W * sxy - sx * sy
        dx = W * sxx - sx * sx
        dy = W * syy - sy * sy
        prod = float(dx) * float(dy)
        day_str = (BASE + timedelta(days=d)).strftime("%Y-%m-%d")
        want[day_str] = (
            None if prod == 0.0 else _q6(float(num) / math.sqrt(prod))
        )
    assert got == want


# ------------------------------------------------------------------
# completeness_gaps
# ------------------------------------------------------------------

cg_rows = st.lists(
    st.tuples(st.sampled_from(["x", "y"]), st.integers(0, 40)),
    min_size=1,
    max_size=60,
)


@settings(max_examples=5, deadline=None)
@given(cg_rows)
def test_completeness_gaps_matches_naive(spark, rows):
    from vectorsearchutil_spark.operators.analytics import (
        completeness_gaps,
    )

    df = spark.createDataFrame(
        [
            (t, BASE + timedelta(hours=h, minutes=i % 60))
            for i, (t, h) in enumerate(rows)
        ],
        "event_type string, ts timestamp_ntz",
    )
    got = {
        r["event_type"]: (
            r["n_expected_hours"],
            r["n_present_hours"],
            r["n_missing_hours"],
            r["longest_gap_hours"],
        )
        for r in completeness_gaps(df).collect()
    }

    base_h = int(BASE.timestamp()) // 3600  # UTC session, NTZ data
    per = defaultdict(set)
    for t, h in rows:
        per[t].add(base_h + h)
    g0 = min(min(s) for s in per.values())
    g1 = max(max(s) for s in per.values())
    want = {}
    for t, hs in per.items():
        span = g1 - g0 + 1
        srt = sorted(hs)
        internal = max(
            (b - a - 1 for a, b in zip(srt, srt[1:])), default=0
        )
        longest = max(internal, srt[0] - g0, g1 - srt[-1])
        want[t] = (span, len(hs), span - len(hs), longest)
    assert got == want


# ------------------------------------------------------------------
# seasonal_naive_wape
# ------------------------------------------------------------------

wape_rows = st.lists(
    st.tuples(
        st.integers(0, 20),
        st.floats(-100, 100, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=5, deadline=None)
@given(wape_rows)
def test_seasonal_naive_wape_matches_naive(spark, rows):
    from vectorsearchutil_spark.operators.analytics import (
        seasonal_naive_wape,
    )

    LAG = 7
    df = spark.createDataFrame(
        [(_day_ts(d, i), float(v)) for i, (d, v) in enumerate(rows)],
        "o_orderdate timestamp_ntz, o_totalprice double",
    )
    (r,) = seasonal_naive_wape(df, lag_days=LAG).collect()

    daily = defaultdict(int)
    for d, v in rows:
        daily[d] += _cents(v)
    scored = [
        (daily[d] - daily[d - LAG], abs(daily[d] - daily[d - LAG]), abs(daily[d]))
        for d in daily
        if d - LAG in daily
    ]
    n = len(scored)
    assert r["n_days_scored"] == n
    if n == 0:
        assert r["wape"] is None and r["mae"] is None and r["bias"] is None
        return
    se = sum(e for e, _, _ in scored)
    sae = sum(a for _, a, _ in scored)
    say = sum(y for _, _, y in scored)
    assert r["wape"] == (None if say == 0 else _q6(sae / say))
    assert r["mae"] == math.floor(sae / n / 100.0 * 100 + 0.5) / 100
    assert r["bias"] == (None if say == 0 else _q6(se / say))


# ------------------------------------------------------------------
# fano_daily
# ------------------------------------------------------------------

fano_rows = st.lists(
    st.tuples(st.sampled_from(["p", "q"]), st.integers(0, 10)),
    min_size=1,
    max_size=60,
)


@settings(max_examples=5, deadline=None)
@given(fano_rows)
def test_fano_matches_naive_zero_filled(spark, rows):
    from vectorsearchutil_spark.operators.analytics import fano_daily

    df = spark.createDataFrame(
        [(t, _day_ts(d, i)) for i, (t, d) in enumerate(rows)],
        "event_type string, ts timestamp_ntz",
    )
    got = {
        r["event_type"]: (r["n_days"], r["n_events"], r["fano_factor"])
        for r in fano_daily(df).collect()
    }

    d0 = min(d for _, d in rows)
    d1 = max(d for _, d in rows)
    types = {t for t, _ in rows}
    want = {}
    for t in types:
        counts = [
            sum(1 for tt, dd in rows if tt == t and dd == d)
            for d in range(d0, d1 + 1)
        ]
        n = len(counts)
        s = sum(counts)
        q = sum(c * c for c in counts)
        num = float(n * q - s * s)
        den = float(n - 1) * float(s)
        want[t] = (n, s, None if den == 0.0 else _q6(num / den))
    assert got == want


# ------------------------------------------------------------------
# _int_value_quantiles — the shared helper behind
# orders_ship_delay_quantiles / docs_token_quantiles /
# multimodal_storage_budget: one property covers all three consumers
# ------------------------------------------------------------------

q_rows = st.lists(
    st.tuples(st.sampled_from(["g1", "g2"]), st.integers(-20, 20)),
    min_size=1,
    max_size=80,
)


@settings(max_examples=5, deadline=None)
@given(q_rows, st.sampled_from([[0.5], [0.5, 0.9, 0.99], [0.01, 1.0]]))
def test_int_value_quantiles_match_type1_order_stats(spark, rows, ps):
    from vectorsearchutil_spark.operators.analytics import (
        _int_value_quantiles,
    )

    names = [f"q{int(p * 100)}" for p in ps]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {
        r["g"]: (r["n"], tuple(r[nm] for nm in names))
        for r in _int_value_quantiles(df, "g", "v", ps, names).collect()
    }

    groups = defaultdict(list)
    for g, v in rows:
        groups[g].append(v)
    want = {}
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        qs = tuple(vals[max(math.ceil(p * n), 1) - 1] for p in ps)
        want[g] = (n, qs)
    assert got == want


# ------------------------------------------------------------------
# scd2_build — interval partition validity on arbitrary changelogs
# ------------------------------------------------------------------

scd_rows = st.lists(
    st.tuples(
        st.integers(0, 3),                      # key
        st.sampled_from(["upsert", "delete"]),  # op
        st.integers(0, 30),                     # payload
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(scd_rows)
def test_scd2_intervals_partition_history(spark, rows):
    from vectorsearchutil_spark.operators.cdc import scd2_build

    # unique, strictly increasing seq per row = arrival order (the
    # caller contract: no duplicate (key, seq))
    df = spark.createDataFrame(
        [(k, op, p, i) for i, (k, op, p) in enumerate(rows)],
        "k long, op string, payload long, seq long",
    )
    out = scd2_build(df, "k", "seq").collect()

    per_key = defaultdict(list)
    for i, (k, op, p) in enumerate(rows):
        per_key[k].append((i, op, p))
    want = set()
    for k, seq in per_key.items():
        for idx, (i, op, p) in enumerate(seq):
            if op == "delete":
                continue
            nxt = seq[idx + 1][0] if idx + 1 < len(seq) else None
            want.add((k, p, i, nxt, nxt is None))
    got = {
        (r["k"], r["payload"], r["valid_from_seq"], r["valid_to_seq"],
         r["is_current"])
        for r in out
    }
    assert got == want
    # structural invariants: per key, versions chain without overlap
    # and at most one current
    chains = defaultdict(list)
    for k, p, f, t, cur in got:
        chains[k].append((f, t, cur))
    for k, ivs in chains.items():
        ivs.sort()
        assert sum(1 for _, t, _ in ivs if t is None) <= 1
        for (f1, t1, _), (f2, _, _) in zip(ivs, ivs[1:]):
            assert t1 is not None and t1 <= f2


# ------------------------------------------------------------------
# text-side wave operators (ASCII-token generated corpora)
# ------------------------------------------------------------------

word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
doc_text = st.lists(word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["s1", "s2"]), doc_text),
        min_size=1,
        max_size=15,
    )
)
def test_diversity_indices_match_naive(spark, docs):
    from vectorsearchutil_spark.operators.textanalysis import (
        diversity_indices,
    )

    df = spark.createDataFrame(docs, "source string, text string")
    got = {
        r["source"]: (
            r["n_tokens"], r["vocab"], r["ttr"], r["gini_simpson"],
            r["shannon_bits"],
        )
        for r in diversity_indices(df).collect()
    }

    per = defaultdict(lambda: defaultdict(int))
    for s, t in docs:
        for w in t.split(" "):
            if w:
                per[s][w] += 1
    # a source whose docs are all empty still has a (source, token)
    # group only if a token exists; zero-token sources emit no row
    want_keys = {s for s, cnts in per.items() if cnts}
    assert set(got) == want_keys
    for s in want_keys:
        cnts = per[s]
        n = sum(cnts.values())
        vocab = len(cnts)
        s2 = sum(c * c for c in cnts.values())
        clogc = sum(c * math.log2(c) for c in cnts.values())
        g = got[s]
        assert g[0] == n and g[1] == vocab
        assert g[2] == _q6(vocab / n)
        assert g[3] == _q6(1.0 - s2 / (n * n))
        # the c·log2 c fold is a true double sum inside the engine
        assert abs(g[4] - _q6(math.log2(n) - clogc / n)) <= 1e-6 + 1e-12


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.text(alphabet="abc ", min_size=0, max_size=40),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_boilerplate_prefix_matches_naive(spark, docs):
    from vectorsearchutil_spark.operators.textanalysis import (
        boilerplate_prefixes,
    )

    P = 6
    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(docs)],
        "doc_id long, source string, text string",
    )
    got = {
        r["source"]: (
            r["n_docs"], r["top_prefix"], r["top_prefix_docs"],
            r["top_prefix_share"],
        )
        for r in boilerplate_prefixes(df, prefix_chars=P).collect()
    }

    per = defaultdict(list)
    for s, t in docs:
        per[s].append(t[:P])
    want = {}
    for s, prefixes in per.items():
        cnt = defaultdict(int)
        for p in prefixes:
            cnt[p] += 1
        mx = max(cnt.values())
        top = min(p for p, c in cnt.items() if c == mx)
        want[s] = (len(prefixes), top, mx, _q6(mx / len(prefixes)))
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(word, min_size=0, max_size=10).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_ngram_novelty_matches_naive_first_wins(spark, texts):
    from vectorsearchutil_spark.operators.textanalysis import ngram_novelty

    N = 2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_ratio"])
        for r in ngram_novelty(df, n=N).collect()
    }

    def grams(t):
        toks = [w for w in t.split(" ") if w]
        return {
            " ".join(toks[i : i + N]) for i in range(len(toks) - N + 1)
        }

    seen_intro = {}  # gram -> first doc_id
    per_doc = {}
    for i, t in enumerate(texts):
        g = grams(t)
        per_doc[i] = g
        for x in g:
            seen_intro.setdefault(x, i)
    want = {}
    for i, g in per_doc.items():
        if not g:
            continue  # docs with no n-gram emit no row
        novel = sum(1 for x in g if seen_intro[x] == i)
        want[i] = (len(g), novel, _q6(novel / len(g)))
    assert got == want


# ------------------------------------------------------------------
# interpurchase_median — lag gaps + the shared quantile helper,
# end-to-end vs a naive per-customer scan
# ------------------------------------------------------------------

ip_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 25)),  # (cust, day)
    min_size=1,
    max_size=50,
)


@settings(max_examples=5, deadline=None)
@given(ip_rows)
def test_interpurchase_median_matches_naive(spark, rows):
    from vectorsearchutil_spark.operators.analytics import (
        interpurchase_median,
    )

    seg_of = {0: "A", 1: "A", 2: "B", 3: "B", 4: "C"}
    orders = spark.createDataFrame(
        [(c, i, _day_ts(d)) for i, (c, d) in enumerate(rows)],
        "o_custkey long, o_orderkey long, o_orderdate timestamp_ntz",
    )
    customer = spark.createDataFrame(
        [(c, s) for c, s in seg_of.items()],
        "c_custkey long, c_mktsegment string",
    )
    got = {
        r["segment"]: (r["n_gaps"], r["median_days"], r["p90_days"])
        for r in interpurchase_median(orders, customer).collect()
    }

    bycust = defaultdict(list)
    for i, (c, d) in enumerate(rows):
        bycust[c].append((d, i))  # order by (date, orderkey=i)
    gaps = defaultdict(list)
    for c, seq in bycust.items():
        seq.sort()
        for (d1, _), (d2, _) in zip(seq, seq[1:]):
            gaps[seg_of[c]].append(d2 - d1)
    want = {}
    for s, g in gaps.items():
        g.sort()
        n = len(g)
        q = lambda p: g[max(math.ceil(p * n), 1) - 1]  # noqa: E731
        want[s] = (n, q(0.5), q(0.9))
    assert got == want


# ------------------------------------------------------------------
# norm_anova — exact quantized moments vs a naive Python replication
# ------------------------------------------------------------------

vec_rows = st.lists(
    st.tuples(
        st.sampled_from(["l0", "l1", "l2"]),
        st.lists(
            st.floats(-5, 5, allow_nan=False, allow_infinity=False),
            min_size=3,
            max_size=3,
        ),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(vec_rows)
def test_norm_anova_matches_naive_moments(spark, rows):
    from vectorsearchutil_spark.operators.analytics import norm_anova

    df = spark.createDataFrame(
        [(lbl, [float(x) for x in v]) for lbl, v in rows],
        "label string, embedding array<double>",
    )
    (r,) = norm_anova(df).collect()

    per = defaultdict(list)
    for lbl, v in rows:
        n2 = 0.0
        for x in v:  # same index-order IEEE fold as the JVM accumulate
            n2 += x * x
        per[lbl].append(int(math.floor(n2 * 1e6 + 0.5)))
    n = sum(len(g) for g in per.values())
    k = len(per)
    assert r["n"] == n and r["k_labels"] == k
    S = float(sum(sum(g) for g in per.values()))
    Q = float(sum(q * q for g in per.values() for q in g))
    B = sum(float(sum(g)) * float(sum(g)) / float(len(g)) for g in per.values())
    ssb = B - S * S / n
    ssw = Q - B
    if k - 1 == 0 or n - k == 0 or ssw / (n - k) == 0.0:
        assert r["f_stat"] is None
        return
    f = (ssb / (k - 1)) / (ssw / (n - k))
    # _B is a double fold over the (small) label set inside the
    # engine — order unspecified, compare within one 1e-6 step plus
    # relative slack for the fold noise amplified through the ratio
    assert r["f_stat"] is not None
    assert abs(r["f_stat"] - _q6(f)) <= 1e-6 + abs(f) * 1e-9 + 1e-12
