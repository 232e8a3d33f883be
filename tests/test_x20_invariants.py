"""Semantic invariants for the x20-series operators — independent
pure-Python recomputes (full EM replay, risk-set replay, KS scan) plus
definitional identities."""

from __future__ import annotations

import hashlib
import math
import statistics
from collections import defaultdict

import pandas as pd


def test_gmm_em_matches_pure_python(spark, sf_smoke):
    """x282: replay initialization and all five 6dp-pinned EM rounds in
    Python; every parameter must agree and the weight stay in (0,1)."""
    from social_warner_spark.queries.x20_series import (
        GMM_ROUNDS,
        GMM_TYPE,
        x282_gmm_em,
    )

    r = x282_gmm_em(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    xs = ev[ev["event_type"] == GMM_TYPE]["value"].to_list()
    q = statistics.quantiles(xs, n=4, method="inclusive")
    mu1, mu2 = round(q[0], 6), round(q[2], 6)
    sd = round(statistics.stdev(xs), 6)
    sd1 = sd2 = sd
    p1 = 0.5
    for _ in range(GMM_ROUNDS):
        gs = []
        for x in xs:
            f1 = math.exp(-((x - mu1) ** 2) / (2 * sd1 * sd1)) / sd1
            f2 = math.exp(-((x - mu2) ** 2) / (2 * sd2 * sd2)) / sd2
            gs.append(p1 * f1 / (p1 * f1 + (1 - p1) * f2))
        sg = sum(gs)
        sg2 = len(xs) - sg
        nmu1 = round(sum(g * x for g, x in zip(gs, xs)) / sg, 6)
        nmu2 = round(sum((1 - g) * x for g, x in zip(gs, xs)) / sg2, 6)
        np1 = round(sg / len(xs), 6)
        sd1 = round(
            math.sqrt(
                sum(g * (x - nmu1) ** 2 for g, x in zip(gs, xs)) / sg
            ),
            6,
        )
        sd2 = round(
            math.sqrt(
                sum((1 - g) * (x - nmu2) ** 2 for g, x in zip(gs, xs)) / sg2
            ),
            6,
        )
        mu1, mu2, p1 = nmu1, nmu2, np1
    assert r.n_values == len(xs)
    assert abs(r.mu1 - mu1) < 1e-6 and abs(r.mu2 - mu2) < 1e-6
    assert abs(r.sd1 - sd1) < 1e-6 and abs(r.sd2 - sd2) < 1e-6
    assert abs(r.p1 - p1) < 1e-6
    assert 0.0 < r.p1 < 1.0 and r.sd1 > 0 and r.sd2 > 0


def test_daily_correlation_matches_pandas(spark, sf_smoke):
    """x283: pandas corr over the complete-day grid; every r in
    [-1, 1] and the pair count is k(k-1)/2."""
    from social_warner_spark.queries.x20_series import x283_daily_correlation

    rows = x283_daily_correlation(spark, sf_smoke).collect()
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    cell = (
        ev.groupby(["day", "event_type"])["value"].mean().round(6).unstack()
    )
    cell = cell.dropna()
    k = cell.shape[1]
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        want = cell[r.t1].corr(cell[r.t2])
        assert r.n_days == len(cell)
        assert abs(r.pearson_r - round(want, 6)) < 1e-6
        assert -1.0 <= r.pearson_r <= 1.0


def test_diff_in_diffs_matches_pure_python(spark, sf_smoke):
    """x284: replay the hash split, user-period means, and the 2x2
    algebra; DiD must equal the explicit four-mean combination."""
    from social_warner_spark.queries.x20_series import (
        DID_SALT,
        x284_diff_in_diffs,
    )

    r = x284_diff_in_diffs(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    lo, hi = ev["ts"].min(), ev["ts"].max()
    split = lo + (hi - lo) / 2
    cells = defaultdict(list)
    for (uid, post), g in ev.groupby(
        ["user_id", ev["ts"] >= split]
    ):
        h = hashlib.md5(f"{DID_SALT}{uid}".encode()).hexdigest()
        arm = "treated" if int(h[:8], 16) % 2 == 0 else "control"
        cells[(arm, post)].append(g["value"].mean())
    m = {k: sum(v) / len(v) for k, v in cells.items()}
    vn = {
        k: statistics.variance(v) / len(v) for k, v in cells.items()
    }
    did = (
        m[("treated", True)]
        - m[("treated", False)]
        - (m[("control", True)] - m[("control", False)])
    )
    se = math.sqrt(sum(vn.values()))
    assert abs(r.treated_pre - round(m[("treated", False)], 6)) < 1e-6
    assert abs(r.treated_post - round(m[("treated", True)], 6)) < 1e-6
    assert abs(r.control_pre - round(m[("control", False)], 6)) < 1e-6
    assert abs(r.control_post - round(m[("control", True)], 6)) < 1e-6
    assert abs(r.did - round(did, 6)) < 1e-6
    assert abs(r.se - round(se, 6)) < 1e-6
    assert abs(r.t_stat - round(did / se, 6)) < 1e-5


def test_nelson_aalen_matches_pure_python_and_km_bound(spark, sf_smoke):
    """x285: replay the risk sets in Python; H must be nondecreasing
    and exp(-H) must lower-bound... equal-ish the KM survival (the
    classical inequality S_KM <= exp(-H))."""
    from social_warner_spark.queries.x20_series import x285_nelson_aalen

    rows = x285_nelson_aalen(spark, sf_smoke).collect()
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    subj = []
    for uid, g in ev.groupby("user_id"):
        views = g[g["event_type"] == "view"]
        if not len(views):
            continue
        t0 = views["ts"].min()
        pur = g[(g["event_type"] == "purchase") & (g["ts"] > t0)]
        if len(pur):
            dur = (pur["ts"].min() - t0).value // 1000
            e = 1
        else:
            dur = (g["ts"].max() - t0).value // 1000
            e = 0
        if dur > 0:
            subj.append((dur, e))
    times = sorted({d for d, e in subj if e})
    h = v = 0.0
    km = 1.0
    idx = 0
    prev_h = -1.0
    for t in times:
        if idx >= len(rows):
            break
        nr = sum(1 for d, _ in subj if d >= t)
        dd = sum(1 for d, e in subj if d == t and e)
        h += dd / nr
        v += dd / (nr * nr)
        km *= 1 - dd / nr
        row = rows[idx]
        assert (row.t_us, row.n_risk, row.d_events) == (t, nr, dd)
        assert abs(row.cum_hazard - round(h, 6)) < 1e-6
        assert abs(row.var_h - round(v, 6)) < 1e-6
        assert row.cum_hazard >= prev_h
        prev_h = row.cum_hazard
        assert km <= math.exp(-h) + 1e-9
        idx += 1


def test_ks_exponential_matches_pure_python(spark, sf_smoke):
    """x286: full scan of the empirical CDF steps in Python; D in
    (0, 1]."""
    from social_warner_spark.queries.x20_series import (
        KS_US,
        x286_ks_exponential,
    )

    r = x286_ks_exponential(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    secs = ev["ts"].diff().dt.total_seconds().dropna()
    xs = sorted(x for x in secs if x > 0)
    n = len(xs)
    lam = 1.0 / (sum(xs) / n)
    d = 0.0
    # step CDF over distinct values
    from collections import Counter

    cnt = Counter(xs)
    cum = 0
    for x in sorted(cnt):
        lo = cum / n
        cum += cnt[x]
        hi = cum / n
        fx = 1.0 - math.exp(-lam * x)
        d = max(d, abs(hi - fx), abs(lo - fx))
    assert r.n_intervals == n
    assert abs(r.lambda_mle - round(lam, 6)) < 1e-6
    assert abs(r.ks_d - round(d, 6)) < 1e-6
    assert abs(r.ks_stat - round(d * math.sqrt(n), 6)) < 1e-5
    assert 0.0 < r.ks_d <= 1.0
