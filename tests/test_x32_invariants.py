"""Semantic invariants for the x32-series operators — independent
pure-Python recomputes plus planner-curve identities."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd


def test_rank_aggregation_invariants(spark, sf_smoke):
    """x342: Borda points bounded by 3k; Copeland bounded by
    candidates-1; the Borda top-1 must rank first in at least one
    model's list (it cannot be universally absent)."""
    from social_warner_spark.queries.x32_series import RA_K, x342_rank_aggregation

    rows = x342_rank_aggregation(spark, sf_smoke).collect()
    assert rows
    seen = set()
    prev = None
    for r in rows:
        assert 0 <= r.borda <= 3 * RA_K
        assert r.copeland >= 0
        assert r.doc_id not in seen
        seen.add(r.doc_id)
        if prev is not None:
            assert r.borda <= prev
        prev = r.borda
    top = rows[0]
    assert min(top.r1, top.r2, top.r3) <= RA_K  # present somewhere


def test_term_burstiness_matches_pure_python(spark, sf_smoke):
    """x343: recompute cf/df and the Poisson expectation for the
    pool; burstiness >= 1 - eps (E[df] >= df can fail only when a
    term spreads MORE evenly than Poisson — verify against data)."""
    from social_warner_spark.queries.x32_series import (
        TB_POOL,
        TB_TOP,
        x343_term_burstiness,
    )

    rows = x343_term_burstiness(spark, sf_smoke).collect()
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    cf = Counter()
    df = Counter()
    for i, t in zip(d["doc_id"], d["text"]):
        toks = t.strip().split()
        cf.update(toks)
        for w in set(toks):
            df[w] += 1
    nd = len(d)
    pool = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:TB_POOL]
    scored = []
    for tok, c in pool:
        e = nd * (1 - math.exp(-c / nd))
        scored.append((round(e / df[tok], 6), tok, c, df[tok], round(e, 6)))
    scored.sort(key=lambda t: (-t[0], t[1]))
    want = scored[:TB_TOP]
    assert len(rows) == len(want)
    for r, (b, tok, c, dfo, e) in zip(rows, want):
        assert (r.tok, r.cf, r.df) == (tok, c, dfo)
        assert abs(r.burstiness - b) < 1e-6
        assert abs(r.expected_df - e) < 1e-6


def test_histogram_design_matches_pure_python(spark, sf_smoke):
    """x344: recompute both SSEs; equi-depth occupancy skew must be
    (near) 1 and equi-width SSE differs from equi-depth as measured."""
    from social_warner_spark.queries.x32_series import (
        HD_BUCKETS,
        x344_histogram_design,
    )

    rows = {r.scheme: r for r in x344_histogram_design(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")["value"]
    lo, hi = ev.min(), ev.max()

    def sse_of(groups):
        tot = 0.0
        for g in groups:
            if len(g):
                m = sum(g) / len(g)
                tot += sum((v - m) ** 2 for v in g)
        return tot

    wbins = defaultdict(list)
    for v in ev:
        b = min(HD_BUCKETS - 1, int((v - lo) / (hi - lo) * HD_BUCKETS))
        wbins[b].append(v)
    r = rows["equi_width"]
    assert r.n_buckets == len(wbins)
    assert abs(r.sse - round(sse_of(wbins.values()), 6)) < 1e-2
    cuts = [
        round(ev.quantile(i / HD_BUCKETS, interpolation="linear"), 6)
        for i in range(1, HD_BUCKETS)
    ]
    dbins = defaultdict(list)
    for v in ev:
        dbins[sum(v > c for c in cuts)].append(v)
    rd = rows["equi_depth"]
    assert rd.n_buckets == len(dbins)
    assert abs(rd.sse - round(sse_of(dbins.values()), 6)) < 1e-2
    assert rd.occupancy_skew < rows["equi_width"].occupancy_skew + 1e-9


def test_session_gap_planner_matches_pure_python(spark, sf_smoke):
    """x345: replay sessionization per gap; session counts must be
    nonincreasing in the gap and >= n_users."""
    from social_warner_spark.queries.x32_series import (
        SG_GAPS,
        x345_session_gap_planner,
    )

    rows = {r.gap_min: r for r in x345_session_gap_planner(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    nu = ev["user_id"].nunique()
    prev = None
    for g in SG_GAPS:
        total = 0
        for _, grp in ev.groupby("user_id"):
            ds = grp["ts"].diff().dt.total_seconds().dropna()
            total += 1 + int((ds > g * 60).sum())
        r = rows[g]
        assert r.n_sessions == total
        assert abs(r.sessions_per_user - round(total / nu, 6)) < 1e-6
        assert r.n_sessions >= nu
        if prev is not None:
            assert r.n_sessions <= prev
        prev = r.n_sessions


def test_partition_advisor_matches_pure_python(spark, sf_smoke):
    """x346: recompute every candidate's stats; skew >= 1."""
    from social_warner_spark.queries.x32_series import (
        PA_MOD,
        x346_partition_advisor,
    )

    rows = {r.partition_key: r for r in x346_partition_advisor(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    cands = {
        "event_type": ev["event_type"],
        "day": ev["ts"].dt.floor("D").astype(str),
        "hour": ev["ts"].dt.floor("h").astype(str),
        f"user_mod{PA_MOD}": (ev["user_id"] % PA_MOD).astype(str),
    }
    for name, keys in cands.items():
        cnt = keys.value_counts()
        r = rows[name]
        assert r.n_partitions == len(cnt)
        assert r.max_rows == cnt.max()
        assert abs(r.mean_rows - round(cnt.mean(), 6)) < 1e-6
        assert abs(r.skew_ratio - round(cnt.max() / cnt.mean(), 6)) < 1e-6
        small = (cnt < cnt.mean() / 4).sum()
        assert abs(
            r.small_partition_share - round(small / len(cnt), 6)
        ) < 1e-6
        assert r.skew_ratio >= 1.0
