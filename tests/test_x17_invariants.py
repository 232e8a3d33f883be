"""Semantic invariants for the x17-series operators — full independent
pure-Python reimplementations (no Spark, no DuckDB) compared exactly,
plus definitional bounds."""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

import pandas as pd


def _daily_totals(sf_dir: str):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    return ev.groupby("day")["value"].sum().round(6).sort_index()


def test_theil_sen_matches_pure_python(spark, sf_smoke):
    """x267: statistics.median over all pairwise slopes / residuals."""
    from social_warner_spark.queries.x17_series import x267_theil_sen

    r = x267_theil_sen(spark, sf_smoke).collect()[0]
    ys = _daily_totals(sf_smoke).to_list()
    n = len(ys)
    slopes = [
        (ys[j] - ys[i]) / (j - i)
        for i in range(n)
        for j in range(i + 1, n)
    ]
    slope = round(statistics.median(slopes), 6)
    resid = [ys[t] - slope * (t + 1) for t in range(n)]
    assert (r.n_days, r.n_pairs) == (n, len(slopes))
    assert abs(r.slope - slope) < 1e-6
    assert abs(r.intercept - round(statistics.median(resid), 6)) < 1e-6


def test_mann_kendall_matches_pure_python(spark, sf_smoke):
    """x268: S, tie-corrected variance, continuity-corrected Z."""
    from social_warner_spark.queries.x17_series import (
        MK_Z,
        x268_mann_kendall,
    )

    r = x268_mann_kendall(spark, sf_smoke).collect()[0]
    ys = _daily_totals(sf_smoke).to_list()
    n = len(ys)
    s = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = defaultdict(int)
    for y in ys:
        ties[y] += 1
    corr = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - corr) / 18.0
    z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var) if s < 0 else 0.0
    assert (r.n_days, r.s_stat) == (n, s)
    assert abs(r.var_s - round(var, 6)) < 1e-6
    assert abs(r.z - round(z, 6)) < 1e-6
    want = "increasing" if z > MK_Z else "decreasing" if z < -MK_Z else "no_trend"
    assert r.trend == want


def _ivf_replay(sf_dir: str, nlist: int):
    """Replicate ivf_centroids(iters=1) + ivf_assign exactly (rounded
    cosine, lowest-cluster tie-break, 6dp-rounded means)."""
    import numpy as np

    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r.vec_id): np.array(r.embedding, dtype=np.float64)
        for r in e.itertuples()
    }
    ids = sorted(vecs)

    def cos(a, b):
        return round(
            float(a @ b) / (math.sqrt(float(a @ a)) * math.sqrt(float(b @ b))),
            6,
        )

    cents = {c: vecs[ids[c]] for c in range(nlist)}

    def assign(cs):
        out = {}
        for v in ids:
            best = max(
                range(nlist), key=lambda c: (cos(vecs[v], cs[c]), -c)
            )
            out[v] = best
        return out

    a0 = assign(cents)
    cent1 = {}
    dim = len(next(iter(vecs.values())))
    for c in range(nlist):
        members = [vecs[v] for v in ids if a0[v] == c]
        cent1[c] = __import__("numpy").array(
            [round(float(sum(m[d] for m in members)) / len(members), 6) for d in range(dim)]
        )
    return vecs, ids, cent1, assign(cent1), cos


def test_cluster_quality_matches_pure_python(spark, sf_smoke):
    """x269: full numpy replay of the IVF partition, then silhouette,
    scatter and Davies-Bouldin per the definitions."""
    from social_warner_spark.queries.x17_series import (
        IVF_NLIST,
        x269_cluster_quality,
    )

    got = {r.cluster: r for r in x269_cluster_quality(spark, sf_smoke).collect()}
    vecs, ids, cent1, own, cos = _ivf_replay(sf_smoke, IVF_NLIST)
    per = defaultdict(list)
    sil = defaultdict(list)
    for v in ids:
        d = {c: 1.0 - cos(vecs[v], cent1[c]) for c in range(IVF_NLIST)}
        a = d[own[v]]
        b = min(d[c] for c in range(IVF_NLIST) if c != own[v])
        per[own[v]].append(a)
        sil[own[v]].append((b - a) / max(a, b) if max(a, b) > 0 else 0.0)
    scatter = {c: round(sum(per[c]) / len(per[c]), 6) for c in per}
    assert set(got) == set(per)
    tot = 0
    for c in per:
        tot += len(per[c])
        assert got[c].n_vecs == len(per[c])
        assert abs(got[c].mean_silhouette - round(sum(sil[c]) / len(sil[c]), 6)) < 1e-6
        assert -1.0 <= got[c].mean_silhouette <= 1.0
        assert abs(got[c].scatter - scatter[c]) < 1e-6
        db = max(
            (scatter[c] + scatter[j]) / (1.0 - cos(cent1[c], cent1[j]))
            for j in per
            if j != c
        )
        assert abs(got[c].db_ratio - round(db, 6)) < 1e-6
    assert tot == len(ids)


def test_markov_attribution_matches_pure_python(spark, sf_smoke):
    """x270: rebuild journeys, the transition matrix, and the 25-round
    6dp-pinned value iteration (baseline + each removal) in Python."""
    from social_warner_spark.queries.x17_series import (
        MKV_CHANNELS,
        MKV_CONV,
        MKV_ROUNDS,
        x270_markov_attribution,
    )

    got = {r.channel: r for r in x270_markov_attribution(spark, sf_smoke).collect()}
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
    cnt = defaultdict(int)
    tot = defaultdict(int)
    for s, d in edges:
        cnt[(s, d)] += 1
        tot[s] += 1
    states = list(MKV_CHANNELS) + ["START"]
    w = {
        (s, d): round(c / tot[s], 6) for (s, d), c in cnt.items()
    }

    def solve(rm):
        p = {s: 0.0 for s in states}
        for _ in range(MKV_ROUNDS):
            nxt = {}
            for i, s in enumerate(states):
                if i == rm:
                    nxt[s] = 0.0
                    continue
                v = w.get((s, "CONV"), 0.0)
                for j, c in enumerate(MKV_CHANNELS):
                    if j == rm:
                        continue
                    v += w.get((s, c), 0.0) * p[c]
                nxt[s] = round(v, 6)
            p = nxt
        return p["START"]

    p_base = solve(-1)
    res = {}
    for j, c in enumerate(MKV_CHANNELS):
        pr = solve(j)
        res[c] = round(max(0.0, 1 - pr / p_base), 6) if p_base > 0 else 0.0
    te = sum(res.values())
    for c in MKV_CHANNELS:
        assert abs(got[c].p_base - p_base) < 1e-6
        assert abs(got[c].removal_effect - res[c]) < 1e-6
        share = round(res[c] / te, 6) if te > 0 else 0.0
        assert abs(got[c].attribution_share - share) < 1e-6
        assert 0.0 <= got[c].removal_effect <= 1.0
    assert abs(sum(r.attribution_share for r in got.values()) - 1.0) < 1e-4


def test_harmonic_regression_matches_pure_python(spark, sf_smoke):
    """x271: recompute the Cramer solution and R^2 from the same
    6dp-rounded regressors in Python; R^2 in [0,1], amplitude >= 0."""
    from social_warner_spark.queries.x17_series import (
        HARM_PERIOD,
        x271_harmonic_regression,
    )

    r = x271_harmonic_regression(spark, sf_smoke).collect()[0]
    ys = _daily_totals(sf_smoke).to_list()
    n = len(ys)
    tau = 2.0 * math.pi / HARM_PERIOD
    x1 = [round(math.sin((t + 1) * tau), 6) for t in range(n)]
    x2 = [round(math.cos((t + 1) * tau), 6) for t in range(n)]
    s1, s2 = sum(x1), sum(x2)
    s11 = sum(a * a for a in x1)
    s12 = sum(a * b for a, b in zip(x1, x2))
    s22 = sum(b * b for b in x2)
    sy = sum(ys)
    sy1 = sum(y * a for y, a in zip(ys, x1))
    sy2 = sum(y * b for y, b in zip(ys, x2))
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    a0 = round(
        (
            sy * (s11 * s22 - s12 * s12)
            - s1 * (sy1 * s22 - s12 * sy2)
            + s2 * (sy1 * s12 - s11 * sy2)
        )
        / det,
        6,
    )
    b1 = round(
        (
            n * (sy1 * s22 - s12 * sy2)
            - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * sy2 - sy1 * s2)
        )
        / det,
        6,
    )
    b2 = round(
        (
            n * (s11 * sy2 - sy1 * s12)
            - s1 * (s1 * sy2 - sy1 * s2)
            + sy * (s1 * s12 - s11 * s2)
        )
        / det,
        6,
    )
    assert r.n_days == n
    assert abs(r.a0 - a0) < 1e-6
    assert abs(r.b1 - b1) < 1e-6
    assert abs(r.b2 - b2) < 1e-6
    ybar = sy / n
    sse = sum(
        (y - (a0 + b1 * a + b2 * b)) ** 2
        for y, a, b in zip(ys, x1, x2)
    )
    sst = sum((y - ybar) ** 2 for y in ys)
    assert abs(r.r2 - round(1 - sse / sst, 6)) < 1e-6
    assert 0.0 <= r.r2 <= 1.0
    assert r.amplitude >= 0.0
    assert abs(r.amplitude - round(math.hypot(b1, b2), 6)) < 1e-6
