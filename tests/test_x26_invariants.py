"""Semantic invariants for the x26-series operators — independent
pure-Python recomputes (banding-curve integration, motif scan, OLS
F-tests, Viterbi replay) plus definitional bounds."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd


def test_lsh_planner_matches_pure_python(spark, sf_smoke):
    """x312: recompute the observed-pair banding masses per config;
    s50 must decrease as bands grow and FN/FP trade off."""
    from social_warner_spark.operators.dedup import exact_jaccard_pairs
    from social_warner_spark.queries.x26_series import (
        LSH_CONFIGS,
        LSH_SAMPLE_MIN,
        LSH_TARGET,
        x312_lsh_planner,
    )
    from social_warner_spark.queries.common import T

    rows = {(r.b, r.r): r for r in x312_lsh_planner(spark, sf_smoke).collect()}
    sims = [
        r.jaccard
        for r in exact_jaccard_pairs(
            T(spark, sf_smoke, "documents"), LSH_SAMPLE_MIN
        )
        .select("jaccard")
        .collect()
    ]
    for b, rr in LSH_CONFIGS:
        fn = sum(
            1 - (1 - (1 - s**rr) ** b)
            for s in sims
            if s >= LSH_TARGET
        )
        fp = sum(
            1 - (1 - s**rr) ** b for s in sims if s < LSH_TARGET
        )
        row = rows[(b, rr)]
        assert row.n_pairs == len(sims)
        assert abs(row.expected_fn - round(fn, 6)) < 1e-5
        assert abs(row.expected_fp - round(fp, 6)) < 1e-5
        assert abs(row.s50 - round((1 / b) ** (1 / rr), 6)) < 1e-6
    s50s = [rows[c].s50 for c in LSH_CONFIGS]
    assert s50s == sorted(s50s)  # more rows per band -> higher s50


def test_temporal_motifs_match_pure_python(spark, sf_smoke):
    """x313: scan every user's ordered pairs within the window."""
    from social_warner_spark.queries.x26_series import (
        MOTIF_WINDOW_MIN,
        x313_temporal_motifs,
    )

    got = {
        (r.type_a, r.type_b): r.n_motifs
        for r in x313_temporal_motifs(spark, sf_smoke).collect()
    }
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    want = Counter()
    win = MOTIF_WINDOW_MIN * 60 * 1_000_000
    for uid, g in ev.groupby("user_id"):
        rows = list(zip(g["ts"], g["event_id"], g["event_type"]))
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                dt = (rows[j][0] - rows[i][0]).value // 1000
                if dt > win:
                    break
                want[(rows[i][2], rows[j][2])] += 1
    assert got == dict(want)


def test_granger_matches_pure_python(spark, sf_smoke):
    """x314: recompute both OLS fits and F statistics with numpy."""
    import numpy as np

    from social_warner_spark.queries.x26_series import (
        GRANGER_X,
        GRANGER_Y,
        x314_granger_precedence,
    )

    r = x314_granger_precedence(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    x = (
        ev[ev["event_type"] == GRANGER_X].groupby("day").size()
    )
    y = (
        ev[ev["event_type"] == GRANGER_Y].groupby("day").size()
    )
    days = sorted(set(x.index) | set(y.index))
    xs = [float(x.get(d, 0)) for d in days]
    ys = [float(y.get(d, 0)) for d in days]

    def direction(dep, own, other):
        yv = dep[1:]
        ol = own[:-1]
        xl = other[:-1]
        n = len(yv)
        A = np.column_stack([np.ones(n), ol, xl])
        coef, *_ = np.linalg.lstsq(A, yv, rcond=None)
        coef = np.round(coef, 6)
        sse_u = float(((yv - A @ coef) ** 2).sum())
        Ar = np.column_stack([np.ones(n), ol])
        cr, *_ = np.linalg.lstsq(Ar, yv, rcond=None)
        cr = np.round(cr, 6)
        sse_r = float(((yv - Ar @ cr) ** 2).sum())
        return n, sse_u, sse_r

    n, su, sr = direction(np.array(ys), np.array(ys), np.array(xs))
    f_xy = (sr - su) / (su / (n - 3))
    n2, su2, sr2 = direction(np.array(xs), np.array(xs), np.array(ys))
    f_yx = (sr2 - su2) / (su2 / (n2 - 3))
    assert r.n_days == n
    assert abs(r.f_click_to_purchase - round(f_xy, 6)) < 1e-3
    assert abs(r.f_purchase_to_click - round(f_yx, 6)) < 1e-3
    assert r.f_click_to_purchase >= -1e-9
    assert 0.0 <= r.r2_gain_xy <= 1.0


def test_rec_coverage_matches_pure_python(spark, sf_smoke):
    """x315: recompute coverage/Gini/ILD from the collected rec
    lists; coverage in (0,1], Gini in [0,1), ILD in [0,1)."""
    from social_warner_spark.queries.x18_series import x273_item_item_cf
    from social_warner_spark.queries.x26_series import x315_rec_coverage

    r = x315_rec_coverage(spark, sf_smoke).collect()[0]
    recs = x273_item_item_cf(spark, sf_smoke).collect()
    part = pd.read_parquet(f"{sf_smoke}/part.parquet")
    price = dict(zip(part["p_partkey"], part["p_retailprice"]))
    lists = defaultdict(list)
    expo = Counter()
    for row in recs:
        lists[row.i].append((row.rk, row.j))
        expo[row.j] += 1
    assert r.n_lists == len(lists)
    assert r.n_recommended == len(expo)
    assert abs(
        r.catalog_coverage - round(len(expo) / len(part), 6)
    ) < 1e-6
    es = sorted(expo.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(es)
    tot = sum(e for _, e in es)
    gini = 2 * sum((i + 1) * e for i, (_, e) in enumerate(es)) / (
        n * tot
    ) - (n + 1) / n
    assert abs(r.exposure_gini - round(gini, 6)) < 1e-6
    ds = []
    for i, lst in lists.items():
        lst.sort()
        for a in range(len(lst)):
            for b in range(a + 1, len(lst)):
                pa, pb = price[lst[a][1]], price[lst[b][1]]
                ds.append(abs(pa - pb) / (pa + pb))
    assert abs(r.avg_ild - round(sum(ds) / len(ds), 6)) < 1e-6
    assert 0.0 < r.catalog_coverage <= 1.0
    assert 0.0 <= r.avg_ild < 1.0


def test_burst_detection_matches_viterbi_replay(spark, sf_smoke):
    """x316: full Python Viterbi with the same rounding and tie
    rules; episodes must match exactly and be disjoint."""
    from social_warner_spark.queries.x26_series import (
        BURST_GAMMA,
        BURST_INJ_HI,
        BURST_INJ_LO,
        BURST_INJ_X,
        BURST_S,
        x316_burst_detection,
    )

    rows = x316_burst_detection(spark, sf_smoke).collect()
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    cs = ev.groupby("day").size().sort_index().astype(float).to_list()
    cs = [
        round(c * BURST_INJ_X, 6)
        if BURST_INJ_LO <= t <= BURST_INJ_HI
        else c
        for t, c in enumerate(cs, start=1)
    ]
    n = len(cs)
    lam0 = round(sum(cs) / n, 6)
    lam1 = round(lam0 * BURST_S, 6)
    gam = round(BURST_GAMMA * math.log(n), 6)
    c0, c1 = 0.0, gam
    p0, p1 = [], []
    for c in cs:
        e0 = lam0 - c * math.log(lam0)
        e1 = lam1 - c * math.log(lam1)
        nc0 = round(min(c0, c1) + e0, 6)
        nc1 = round(min(c0 + gam, c1) + e1, 6)
        np0 = (p0 if c0 <= c1 else p1) + [0]
        np1 = (p0 if c0 + gam <= c1 else p1) + [1]
        c0, c1, p0, p1 = nc0, nc1, np0, np1
    path = p0 if c0 <= c1 else p1
    episodes = []
    start = None
    for i, s in enumerate(path, start=1):
        if s == 1 and start is None:
            start = i
        if s == 0 and start is not None:
            episodes.append((start, i - start))
            start = None
    if start is not None:
        episodes.append((start, n - start + 1))
    assert len(rows) == len(episodes)
    # the injected window must be detected (its last day can fall
    # under the breakeven count — require covering LO..HI-1)
    assert any(
        r.start_day_idx <= BURST_INJ_LO
        and r.start_day_idx + r.length_days >= BURST_INJ_HI - 1
        for r in rows
    )
    for row, (st, ln) in zip(rows, episodes):
        assert (row.start_day_idx, row.length_days) == (st, ln)
        assert row.n_days == n
    # episodes are disjoint and ordered
    ends = [r.start_day_idx + r.length_days for r in rows]
    starts = [r.start_day_idx for r in rows]
    assert all(e <= s for e, s in zip(ends, starts[1:]))
