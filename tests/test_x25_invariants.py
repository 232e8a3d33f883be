"""Semantic invariants for the x25-series operators — independent
pure-Python recomputes (LPA+modularity replay, rich-club subgraphs,
PSI replay, numpy eigen cross-check) plus definitional bounds."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd


def _lpa_python(sf_dir, iters):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    j = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    e0 = {
        (int(c) * 2, int(s) * 2 + 1)
        for c, s in zip(j["o_custkey"], j["l_suppkey"])
    }
    nodes = [int(c) * 2 for c in cust["c_custkey"]] + [
        int(s) * 2 + 1 for s in supp["s_suppkey"]
    ]
    nbrs = defaultdict(list)
    for a, b in e0:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lbl = {n: n for n in nodes}
    for _ in range(iters):
        new = {}
        for n in nodes:
            if not nbrs[n]:
                new[n] = lbl[n]
                continue
            votes = Counter(lbl[m] for m in nbrs[n])
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lbl = new
    return e0, nodes, nbrs, lbl


def test_modularity_matches_pure_python(spark, sf_smoke):
    """x307: replay LPA + Newman-Girvan Q; Q in [-0.5, 1]."""
    from social_warner_spark.queries.x14_series import LPA_ITERS
    from social_warner_spark.queries.x25_series import x307_modularity

    r = x307_modularity(spark, sf_smoke).collect()[0]
    e0, nodes, nbrs, lbl = _lpa_python(sf_smoke, LPA_ITERS)
    m = len(e0)
    mc = Counter()
    for a, b in e0:
        if lbl[a] == lbl[b]:
            mc[lbl[a]] += 1
    dc = Counter()
    for n in nodes:
        dc[lbl[n]] += len(nbrs[n])
    q = sum(
        mc.get(c, 0) / m - (dc[c] / (2 * m)) ** 2 for c in dc
    )
    assert r.m_edges == m
    assert r.n_communities == len(dc)
    assert abs(r.modularity - round(q, 6)) < 1e-6
    assert -0.5 <= r.modularity <= 1.0
    cov = sum(mc.values()) / m
    assert abs(r.coverage - round(cov, 6)) < 1e-6


def test_rich_club_matches_pure_python(spark, sf_smoke):
    """x308: materialize each threshold subgraph in Python; phi in
    [0,1] and nodes/edges shrink as k grows."""
    from social_warner_spark.queries.x25_series import RC_KS, x308_rich_club

    rows = {r.k: r for r in x308_rich_club(spark, sf_smoke).collect()}
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    nbrs = defaultdict(set)
    for _, g in li.groupby("l_orderkey"):
        pks = sorted(set(g["l_partkey"]))
        for i in range(len(pks)):
            for j in range(i + 1, len(pks)):
                nbrs[pks[i]].add(pks[j])
                nbrs[pks[j]].add(pks[i])
    prev_nodes = None
    for k in RC_KS:
        rich = {n for n, s in nbrs.items() if len(s) > k}
        ek = sum(
            1
            for n in rich
            for mo in nbrs[n]
            if mo in rich and n < mo
        )
        r = rows[k]
        assert r.n_nodes == len(rich)
        assert r.n_edges == ek
        if len(rich) > 1:
            phi = 2 * ek / (len(rich) * (len(rich) - 1))
            assert abs(r.phi - round(phi, 6)) < 1e-6
            assert 0.0 <= r.phi <= 1.0
        else:
            assert r.phi is None
        if prev_nodes is not None:
            assert r.n_nodes <= prev_nodes
        prev_nodes = r.n_nodes


def test_psi_matches_pure_python(spark, sf_smoke):
    """x309: replay midpoint split, decile cuts, smoothing, PSI."""
    from social_warner_spark.queries.x25_series import (
        PSI_BINS,
        x309_psi,
    )

    got = {r.event_type: r for r in x309_psi(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    lo, hi = ev["ts"].min(), ev["ts"].max()
    cut = lo + (hi - lo) / 2
    for t, g in ev.groupby("event_type"):
        ref = g[g["ts"] < cut]["value"]
        curv = g[g["ts"] >= cut]["value"]
        cuts = [
            round(ref.quantile(i / PSI_BINS, interpolation="linear"), 6)
            for i in range(1, PSI_BINS)
        ]

        def bins(vals):
            c = Counter()
            for v in vals:
                b = 1 + sum(v > cv for cv in cuts)
                c[b] += 1
            return c

        rb, cb = bins(ref), bins(curv)
        psi = 0.0
        for b in range(1, PSI_BINS + 1):
            p = (rb.get(b, 0) + 0.5) / (len(ref) + 0.5 * PSI_BINS)
            q = (cb.get(b, 0) + 0.5) / (len(curv) + 0.5 * PSI_BINS)
            psi += (p - q) * math.log(p / q)
        assert abs(got[t].psi - round(psi, 6)) < 1e-6
        assert got[t].psi >= 0.0 or got[t].psi > -1e-9


def test_g_test_matches_pure_python_and_chi2_agreement(spark, sf_smoke):
    """x310: recompute G; G and chi2 should be close (same table,
    second-order equivalence) and both nonnegative."""
    from social_warner_spark.queries.x25_series import x310_g_test

    r = x310_g_test(spark, sf_smoke).collect()[0]
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    tab = pd.crosstab(d["lang"], d["source"])
    n = tab.values.sum()
    g = 0.0
    for i in range(tab.shape[0]):
        for j in range(tab.shape[1]):
            o = tab.values[i, j]
            e = tab.sum(axis=1).values[i] * tab.sum(axis=0).values[j] / n
            if o > 0:
                g += 2 * o * math.log(o / e)
    assert abs(r.g_stat - round(g, 6)) < 1e-5
    assert r.g_stat >= 0.0 and r.chi2 >= 0.0
    assert r.df == (tab.shape[0] - 1) * (tab.shape[1] - 1)
    # second-order agreement on a well-populated table
    assert abs(r.g_stat - r.chi2) < 0.5 * max(r.chi2, 1.0)


def test_eigen_gap_matches_numpy(spark, sf_smoke):
    """x311: the DEFLATED power iteration must exactly match a
    faithful Python replay, and its estimates must bracket numpy's
    true spectrum from below (fixed-round Rayleigh estimates)."""
    import numpy as np

    from social_warner_spark.queries.x25_series import (
        EG_DIM,
        EG_ROUNDS,
        x311_eigen_gap,
    )

    r = x311_eigen_gap(spark, sf_smoke).collect()[0]
    e = pd.read_parquet(f"{sf_smoke}/embeddings.parquet")
    X = np.array([list(v) for v in e["embedding"]], dtype=np.float64)
    G = X.T @ X
    # faithful replay
    v = np.full(EG_DIM, 0.125)
    for _ in range(EG_ROUNDS):
        w = G @ v
        lam1 = float(np.sqrt((w * w).sum()))
        v = w / lam1
    u = np.full(EG_DIM, 0.125)
    for _ in range(EG_ROUNDS):
        w = G @ u
        w = w - float(w @ v) * v
        lam2 = float(np.sqrt((w * w).sum()))
        u = w / lam2
    assert abs(r.lambda1 - round(lam1, 6)) < 1e-4
    assert abs(r.lambda2 - round(lam2, 6)) < 1e-4
    ev = np.sort(np.linalg.eigvalsh(G))[::-1]
    # fixed-round estimates are Rayleigh-type LOWER bounds on the true
    # eigenvalues (||Gv|| <= lambda_max for unit v); with this corpus's
    # near-degenerate top pair (ev1/ev0 ~ 0.9) five rounds converge
    # slowly, so assert the bracketing rather than tight agreement.
    assert r.lambda1 <= ev[0] + 1e-6
    assert r.lambda1 >= 0.7 * ev[0]
    assert r.lambda2 <= r.lambda1
    assert r.lambda2 > 0
    assert r.gap > 0
