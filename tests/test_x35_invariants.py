"""Semantic invariants for the x35-series operators — independent
pure-Python recomputes plus definitional identities."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd


def test_randomized_response_matches_pure_python(spark, sf_smoke):
    """x357: replay the perturbation; debiased estimates must be far
    closer to truth than the raw observed counts for skewed types."""
    from social_warner_spark.queries.x35_series import (
        RR_K,
        RR_P,
        x357_randomized_response,
    )

    rows = {r.event_type: r for r in x357_randomized_response(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    types = sorted(ev["event_type"].unique())
    obs = Counter()
    tru = Counter(ev["event_type"])
    for eid, t in zip(ev["event_id"], ev["event_type"]):
        u = int(hashlib.md5(f"rr|{eid}".encode()).hexdigest()[:8], 16) / 4294967296.0
        if u < RR_P:
            obs[t] += 1
        else:
            u2 = int(hashlib.md5(f"rr2|{eid}".encode()).hexdigest()[:8], 16) / 4294967296.0
            obs[types[int(u2 * RR_K)]] += 1
    n = len(ev)
    q = (1 - RR_P) / RR_K
    for t in types:
        r = rows[t]
        assert r.observed == obs[t]
        assert r.true_count == tru[t]
        deb = (obs[t] - n * q) / RR_P
        assert abs(r.debiased - round(deb, 6)) < 1e-6
    # estimator is unbiased in expectation; on this draw the total
    # debiased mass must equal n exactly (sum of linear transforms)
    tot_deb = sum(r.debiased for r in rows.values())
    assert abs(tot_deb - n) < 1e-3


def test_weighted_jaccard_matches_pure_python(spark, sf_smoke):
    """x358: recompute IDF-weighted similarity per pair; scores stay
    in [0,1]."""
    from social_warner_spark.operators.dedup import exact_jaccard_pairs
    from social_warner_spark.queries.common import T
    from social_warner_spark.queries.x35_series import (
        WJ_SAMPLE_MIN,
        x358_weighted_jaccard,
    )

    rows = {(r.a, r.b): r for r in x358_weighted_jaccard(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    shingles = {}
    for i, t in zip(d["doc_id"], d["text"]):
        toks = t.strip().split()
        shingles[i] = {
            " ".join(toks[k : k + 3]) for k in range(len(toks) - 2)
        }
    df = Counter()
    for s in shingles.values():
        df.update(s)
    nd = len(d)
    idf = {g: math.log(nd / c) for g, c in df.items()}
    pairs = exact_jaccard_pairs(
        T(spark, sf_smoke, "documents"), WJ_SAMPLE_MIN
    ).collect()
    assert len(rows) == len(pairs)
    for p in pairs:
        sa, sb = shingles[p.doc_id_a], shingles[p.doc_id_b]
        wi = sum(idf[g] for g in sa & sb)
        wu = sum(idf[g] for g in sa) + sum(idf[g] for g in sb) - wi
        r = rows[(p.doc_id_a, p.doc_id_b)]
        assert abs(r.weighted_jaccard - round(wi / wu, 6)) < 1e-6
        assert 0.0 <= r.weighted_jaccard <= 1.0


def test_price_volume_mix_identity(spark, sf_smoke):
    """x359: the bridge must close exactly (algebraic identity) and
    match a pandas recompute."""
    from social_warner_spark.queries.x35_series import (
        PVM_Y0,
        PVM_Y1,
        x359_price_volume_mix,
    )

    rows = {r.l_returnflag: r for r in x359_price_volume_mix(spark, sf_smoke).collect()}
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    li["y"] = li["l_shipdate"].dt.year
    li["rev"] = li["l_extendedprice"] * (1 - li["l_discount"])
    li = li[li["y"].isin([PVM_Y0, PVM_Y1])]
    for flag, g in li.groupby("l_returnflag"):
        g0 = g[g["y"] == PVM_Y0]
        g1 = g[g["y"] == PVM_Y1]
        if not len(g0) or not len(g1):
            assert flag not in rows
            continue
        q0, r0 = g0["l_quantity"].sum(), g0["rev"].sum()
        q1, r1 = g1["l_quantity"].sum(), g1["rev"].sum()
        r = rows[flag]
        assert abs(r.delta - round(r1 - r0, 2)) < 0.02
        assert abs(
            r.volume_effect - round((q1 - q0) * (r0 / q0), 2)
        ) < 0.02
        assert r.bridge_closes
        # identity
        assert abs(r.delta - (r.volume_effect + r.price_effect)) < 0.05


def test_peak_nms_matches_pure_python(spark, sf_smoke):
    """x360: replay local maxima + greedy suppression; kept peaks are
    pairwise separated by > NMS_SEP days."""
    from social_warner_spark.queries.x35_series import (
        NMS_SEP,
        NMS_TOP,
        x360_peak_nms,
    )

    rows = x360_peak_nms(spark, sf_smoke).collect()
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    ys = ev.groupby("day")["value"].sum().round(6).sort_index().to_list()
    cands = [
        (ys[i], i + 1)
        for i in range(1, len(ys) - 1)
        if ys[i] > ys[i - 1] and ys[i] > ys[i + 1]
    ]
    cands.sort(key=lambda t: (-t[0], t[1]))
    kept = []
    for y, t in cands:
        if all(abs(t - t0) > NMS_SEP for t0 in kept):
            kept.append(t)
    want = sorted(
        ((ys[t - 1], t) for t in kept), key=lambda p: (-p[0], p[1])
    )[:NMS_TOP]
    assert len(rows) == min(NMS_TOP, len(want))
    for r, (y, t) in zip(rows, want):
        assert r.day_idx == t
        assert abs(r.height - y) < 1e-6
    ts = [r.day_idx for r in rows]
    assert all(
        abs(a - b) > NMS_SEP for i, a in enumerate(ts) for b in ts[i + 1 :]
    )


def test_churn_sweep_matches_pure_python(spark, sf_smoke):
    """x361: replay idle-day computation; churn is nonincreasing in
    the window."""
    from social_warner_spark.queries.x35_series import (
        CH_WINDOWS,
        x361_churn_sweep,
    )

    rows = {r.window_days: r for r in x361_churn_sweep(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    hz = ev["ts"].max()
    idle = ev.groupby("user_id")["ts"].max().apply(
        lambda t: (hz - t).days
    )
    prev = None
    for w in CH_WINDOWS:
        r = rows[w]
        churned = int((idle >= w).sum())
        assert r.n_users == len(idle)
        assert r.n_churned == churned
        assert abs(r.churn_rate - round(churned / len(idle), 6)) < 1e-6
        if prev is not None:
            assert r.n_churned <= prev
        prev = r.n_churned
