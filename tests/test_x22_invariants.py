"""Semantic invariants for the x22-series operators — independent
pure-Python recomputes plus definitional identities."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd


def test_readability_matches_pure_python(spark, sf_smoke):
    """x292: recompute words/sentences/syllables per doc in Python."""
    from social_warner_spark.queries.x22_series import x292_readability

    got = {r.source: r for r in x292_readability(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    acc = defaultdict(list)
    for src, txt in zip(d["source"], d["text"]):
        toks = txt.strip().split()
        w = len(toks)
        if w == 0:
            continue
        s = max(1, len(re.findall(r"[.!?]", txt)))
        syl = len(re.findall(r"[aeiouy]+", txt.lower())) + sum(
            1 for t in toks if not re.search(r"[aeiouyAEIOUY]", t)
        )
        acc[src].append((w, s, syl))
    for src, rows in acc.items():
        fre = [
            206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
            for w, s, syl in rows
        ]
        fkg = [
            0.39 * (w / s) + 11.8 * (syl / w) - 15.59
            for w, s, syl in rows
        ]
        r = got[src]
        assert r.n_docs == len(rows)
        assert abs(r.avg_flesch - round(sum(fre) / len(fre), 6)) < 1e-5
        assert abs(r.avg_grade - round(sum(fkg) / len(fkg), 6)) < 1e-5
        assert r.syl_per_word > 0


def test_expected_steps_matches_pure_python(spark, sf_smoke):
    """x293: replay the journey matrix and the 25-round t = 1 + Mt
    iteration; every state >= 1 (at least the absorbing hop)."""
    from social_warner_spark.queries.x17_series import (
        MKV_CHANNELS,
        MKV_CONV,
        MKV_ROUNDS,
    )
    from social_warner_spark.queries.x22_series import x293_expected_steps

    got = {r.state: r.expected_steps for r in x293_expected_steps(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    edges = []
    for uid, g in ev.groupby("user_id"):
        types = g["event_type"].to_list()
        conv = MKV_CONV in types
        cut = types.index(MKV_CONV) if conv else len(types)
        touches = [t for t in types[:cut] if t != MKV_CONV]
        prev = "START"
        for t in touches:
            edges.append((prev, t))
            prev = t
        edges.append((prev, "CONV" if conv else "NOCONV"))
    cnt = Counter(edges)
    tot = Counter(s for s, _ in edges)
    w = {(s, d): round(c / tot[s], 6) for (s, d), c in cnt.items()}
    states = list(MKV_CHANNELS) + ["START"]
    t = {s: 0.0 for s in states}
    for _ in range(MKV_ROUNDS):
        t = {
            s: round(
                1.0
                + sum(
                    w.get((s, c), 0.0) * t[c] for c in MKV_CHANNELS
                ),
                6,
            )
            for s in states
        }
    for s in states:
        assert abs(got[s] - t[s]) < 1e-6
        assert got[s] >= 1.0


def test_fano_matches_pure_python(spark, sf_smoke):
    """x294: recompute spans and population dispersion per user."""
    from social_warner_spark.queries.x22_series import (
        FANO_HI,
        FANO_LO,
        x294_fano_burstiness,
    )

    got = {r.dispersion_class: r for r in x294_fano_burstiness(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    classes = defaultdict(list)
    for uid, g in ev.groupby("user_id"):
        daily = g.groupby("day").size()
        span = (daily.index.max() - daily.index.min()).days + 1
        tot = daily.sum()
        sq = (daily**2).sum()
        mean = tot / span
        var = sq / span - mean * mean
        fano = round(var / mean, 6)
        cls = (
            "bursty"
            if fano > FANO_HI
            else "regular"
            if fano < FANO_LO
            else "poisson_like"
        )
        classes[cls].append((fano, span))
    assert set(got) == set(classes)
    for cls, rows in classes.items():
        r = got[cls]
        assert r.n_users == len(rows)
        assert abs(r.avg_fano - round(sum(f for f, _ in rows) / len(rows), 6)) < 1e-5
        assert abs(
            r.avg_span_days - round(sum(s for _, s in rows) / len(rows), 6)
        ) < 1e-5


def test_weibull_fit_matches_pure_python(spark, sf_smoke):
    """x295: recompute the linearized-CCDF regression; k > 0, R^2 in
    [0,1], and k ~ 1 would match x286's exponential hypothesis."""
    from social_warner_spark.queries.x22_series import x295_weibull_fit

    r = x295_weibull_fit(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    secs = ev["ts"].diff().dt.total_seconds().dropna()
    xs = sorted(x for x in secs if x > 0)
    n = len(xs)
    cnt = Counter(xs)
    cum = 0
    pts = []
    for x in sorted(cnt):
        cum += cnt[x]
        fx = cum / n
        if fx < 1.0:
            pts.append(
                (round(math.log(x), 6), round(math.log(-math.log(1 - fx)), 6))
            )
    m = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    syy = sum(p[1] * p[1] for p in pts)
    k = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    b = (sy - k * sx) / m
    r2 = (m * sxy - sx * sy) ** 2 / (
        (m * sxx - sx * sx) * (m * syy - sy * sy)
    )
    assert (r.n_intervals, r.n_grid_points) == (n, m)
    assert abs(r.shape_k - round(k, 6)) < 1e-5
    assert abs(r.scale_lambda - round(math.exp(-b / k), 6)) < 1e-4
    assert abs(r.r2 - round(r2, 6)) < 1e-5
    assert r.shape_k > 0 and 0.0 <= r.r2 <= 1.0


def test_powerlaw_gof_matches_pure_python(spark, sf_smoke):
    """x296: rebuild the degree tail, alpha, and the KS walk."""
    from social_warner_spark.queries.x16_series import PL_XMIN
    from social_warner_spark.queries.x22_series import x296_powerlaw_gof

    r = x296_powerlaw_gof(spark, sf_smoke).collect()[0]
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    nbrs = defaultdict(set)
    for _, g in li.groupby("l_orderkey"):
        pks = sorted(set(g["l_partkey"]))
        for i in range(len(pks)):
            for j in range(i + 1, len(pks)):
                nbrs[pks[i]].add(pks[j])
                nbrs[pks[j]].add(pks[i])
    tail = sorted(
        len(s) for s in nbrs.values() if len(s) >= PL_XMIN
    )
    n = len(tail)
    alpha = round(
        1.0 + n / sum(math.log(d / (PL_XMIN - 0.5)) for d in tail), 6
    )
    cnt = Counter(tail)
    seen = 0
    d_max = 0.0
    for deg in sorted(cnt):
        emp = (n - seen) / n
        fit = (deg / (PL_XMIN - 0.5)) ** (-(alpha - 1.0))
        d_max = max(d_max, abs(emp - fit))
        seen += cnt[deg]
    assert (r.n_tail, r.alpha) == (n, alpha)
    assert abs(r.ks_d - round(d_max, 6)) < 1e-6
    assert 0.0 <= r.ks_d <= 1.0
