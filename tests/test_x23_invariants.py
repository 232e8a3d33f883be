"""Semantic invariants for the x23-series operators — independent
pure-Python recomputes (Prim replay, stump scan, Murphy identity) plus
definitional bounds."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd


def test_circular_hours_matches_pure_python(spark, sf_smoke):
    """x297: recompute resultant vectors from 6dp-rounded trig;
    rbar in [0,1], mean_hour in [0,24)."""
    from social_warner_spark.queries.x23_series import x297_circular_hours

    got = {r.event_type: r for r in x297_circular_hours(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    tau = 2.0 * math.pi / 24.0
    acc = defaultdict(lambda: [0, 0.0, 0.0])
    for t, ts in zip(ev["event_type"], ev["ts"]):
        th = (ts.hour + ts.minute / 60.0) * tau
        a = acc[t]
        a[0] += 1
        a[1] += round(math.sin(th), 6)
        a[2] += round(math.cos(th), 6)
    for t, (n, ss, sc) in acc.items():
        r = got[t]
        rbar = math.sqrt(ss * ss + sc * sc) / n
        md = math.atan2(ss, sc) * 24.0 / (2.0 * math.pi)
        if md < 0:
            md += 24.0
        assert r.n == n
        assert abs(r.rbar - round(rbar, 6)) < 1e-6
        assert abs(r.mean_hour - round(md, 6)) < 1e-6
        assert abs(r.rayleigh_z - round(n * rbar * rbar, 6)) < 1e-5
        assert 0.0 <= r.rbar <= 1.0
        assert 0.0 <= r.mean_hour < 24.0


def test_decision_stump_matches_exhaustive_scan(spark, sf_smoke):
    """x298: scan every threshold in Python; gain must be the max and
    nonnegative."""
    from social_warner_spark.queries.x23_series import (
        STUMP_LANG,
        x298_decision_stump,
    )

    r = x298_decision_stump(spark, sf_smoke).collect()[0]
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    pts = sorted(
        zip(d["n_chars"], (d["lang"] == STUMP_LANG).astype(int))
    )
    n = len(pts)
    np_ = sum(y for _, y in pts)

    def h(p):
        out = 0.0
        if p > 0:
            out -= p * math.log2(p)
        if p < 1:
            out -= (1 - p) * math.log2(1 - p)
        return out

    best = None
    xs = sorted({x for x, _ in pts})
    cums = {}
    nl = pl = 0
    it = iter(pts)
    import itertools

    grouped = defaultdict(lambda: [0, 0])
    for x, y in pts:
        grouped[x][0] += 1
        grouped[x][1] += y
    for x in xs:
        nl += grouped[x][0]
        pl += grouped[x][1]
        if nl >= n:
            continue
        gain = round(
            h(np_ / n)
            - (nl / n * h(pl / nl) + (n - nl) / n * h((np_ - pl) / (n - nl))),
            6,
        )
        if best is None or gain > best[0] or (gain == best[0] and x < best[1]):
            if best is None or gain > best[0]:
                best = (gain, x, nl, pl)
    gain, x, nl, pl = best
    assert r.threshold == x
    assert (r.n_left, r.n_right) == (nl, n - nl)
    assert abs(r.info_gain - gain) < 1e-6
    assert r.info_gain >= 0.0


def test_brier_murphy_identity(spark, sf_smoke):
    """x299: the exact Murphy identity brier = reliability -
    resolution + uncertainty + within_bin_var must hold, and a pandas
    recompute must agree."""
    from social_warner_spark.queries.x23_series import (
        BRIER_BINS,
        BRIER_LANG,
        x299_brier_decomposition,
    )

    r = x299_brier_decomposition(spark, sf_smoke).collect()[0]
    assert (
        abs(
            r.brier
            - (
                r.reliability
                - r.resolution
                + r.uncertainty
                + r.within_bin_var
                - 2 * r.within_bin_cov
            )
        )
        < 5e-6
    )
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    s = d["n_chars"].astype(float)
    p = (s - s.min()) / (s.max() - s.min())
    y = (d["lang"] == BRIER_LANG).astype(float)
    b = (p * BRIER_BINS).astype(int).clip(upper=BRIER_BINS - 1)
    brier = ((p - y) ** 2).mean()
    assert r.n == len(d)
    assert abs(r.brier - round(brier, 6)) < 1e-6
    assert abs(r.uncertainty - round(y.mean() * (1 - y.mean()), 6)) < 1e-6
    rel = sum(
        len(g) * (p[g.index].mean() - y[g.index].mean()) ** 2
        for _, g in d.groupby(b)
    ) / len(d)
    assert abs(r.reliability - round(rel, 6)) < 1e-6


def test_source_mst_matches_prim_replay(spark, sf_smoke):
    """x300: rebuild the JSD matrix and run textbook Prim in Python;
    the edge sequence must agree step for step, and total MST weight
    must be minimal vs a Kruskal recompute."""
    from social_warner_spark.queries.x21_series import x291_jsd_source_matrix
    from social_warner_spark.queries.x23_series import x300_source_mst

    rows = x300_source_mst(spark, sf_smoke).collect()
    jsd = {
        (r.s1, r.s2): r.jsd
        for r in x291_jsd_source_matrix(spark, sf_smoke).collect()
    }
    srcs = sorted({s for pair in jsd for s in pair})
    n = len(srcs)

    def dist(a, b):
        if a == b:
            return float("inf")
        return jsd.get((a, b), jsd.get((b, a)))

    tree = [srcs[0]]
    edges = []
    while len(tree) < n:
        best = None
        for v in srcs:
            if v in tree:
                continue
            dv = min(dist(u, v) for u in tree)
            # argmin u in insertion order
            uv = next(u for u in tree if dist(u, v) == dv)
            if best is None or dv < best[0] or (
                dv == best[0] and srcs.index(v) < srcs.index(best[2])
            ):
                if best is None or dv < best[0]:
                    best = (dv, uv, v)
        edges.append(best)
        tree.append(best[2])
    assert len(rows) == n - 1
    for row, (d, u, v) in zip(rows, edges):
        assert (row.s_from, row.s_to) == (u, v)
        assert abs(row.jsd - round(d, 6)) < 1e-6
    # minimality: total weight equals Kruskal's
    import heapq

    parent = {s: s for s in srcs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    kw = 0.0
    for d, (a, b) in sorted(
        (v, k) for k, v in jsd.items()
    ):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            kw += d
    assert abs(sum(r.jsd for r in rows) - round(kw, 4)) < 1e-3


def test_stl_strengths_matches_pandas(spark, sf_smoke):
    """x301: replay the centered-MA decomposition; strengths in
    [0,1]."""
    from social_warner_spark.queries.x23_series import (
        STL_PERIOD,
        x301_stl_strengths,
    )

    r = x301_stl_strengths(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    ys = ev.groupby("day")["value"].sum().round(6).sort_index()
    t = ys.rolling(STL_PERIOD, center=True).mean().round(6)
    df = pd.DataFrame({"y": ys, "t": t}).dropna()
    df["dow"] = df.index.dayofweek
    seas = (df["y"] - df["t"]).groupby(df["dow"]).mean().round(6)
    df["s"] = df["dow"].map(seas)
    df["r"] = df["y"] - df["t"] - df["s"]
    vr = df["r"].var()
    ft = max(0.0, 1 - vr / (df["t"] + df["r"]).var())
    fs = max(0.0, 1 - vr / (df["s"] + df["r"]).var())
    assert r.n_days == len(df)
    assert abs(r.trend_strength - round(ft, 6)) < 1e-5
    assert abs(r.seasonal_strength - round(fs, 6)) < 1e-5
    assert 0.0 <= r.trend_strength <= 1.0
    assert 0.0 <= r.seasonal_strength <= 1.0
