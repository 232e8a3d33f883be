"""Semantic invariants for the x18-series operators — independent
pure-Python recomputes plus definitional identities (waterfall
conservation, CF symmetry-of-support, rank-sum identities)."""

from __future__ import annotations

import math
import statistics
from collections import Counter, defaultdict

import pandas as pd


def test_filter_waterfall_matches_pure_python(spark, sf_smoke):
    """x272: recompute all four flags per doc; solo/seq/unique counts
    and survivor conservation must hold exactly."""
    from social_warner_spark.queries.x18_series import (
        WF_LANG,
        WF_MAX_REP,
        WF_MIN_ALPHA,
        WF_MIN_TOKENS,
        x272_filter_waterfall,
    )

    got = {r.rule: r for r in x272_filter_waterfall(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    flags = []
    for _, row in d.iterrows():
        toks = row["text"].strip().split()
        rep = 1.0 - len(set(toks)) / len(toks)
        alpha = sum(c.isascii() and c.isalpha() for c in row["text"]) / len(
            row["text"]
        )
        flags.append(
            (
                len(toks) < WF_MIN_TOKENS,
                row["lang"] != WF_LANG,
                rep > WF_MAX_REP,
                alpha < WF_MIN_ALPHA,
            )
        )
    names = ["min_tokens", "lang_keep", "max_repetition", "min_alpha_ratio"]
    survivors = len(flags)
    for i, name in enumerate(names):
        solo = sum(f[i] for f in flags)
        seq = sum(f[i] and not any(f[j] for j in range(i)) for f in flags)
        uniq = sum(
            f[i] and not any(f[j] for j in range(4) if j != i) for f in flags
        )
        survivors -= seq
        r = got[name]
        assert (r.n_flagged, r.n_removed_seq, r.n_unique) == (solo, seq, uniq)
        assert r.survivors_after == survivors
    # conservation: final survivors == docs passing every rule
    assert survivors == sum(not any(f) for f in flags)


def test_item_item_cf_matches_brute_force(spark, sf_smoke):
    """x273: rebuild co-occurrence and cosine from order sets in
    Python; ranked rows must agree for every probe item."""
    from social_warner_spark.queries.x18_series import (
        CF_MAX_ITEM,
        CF_TOPK,
        x273_item_item_cf,
    )

    got = defaultdict(list)
    for r in x273_item_item_cf(spark, sf_smoke).collect():
        got[r.i].append((r.rk, r.j, r.co, r.cos))
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    orders = {
        ok: set(g["l_partkey"]) for ok, g in li.groupby("l_orderkey")
    }
    supp = Counter()
    co = Counter()
    for items in orders.values():
        for pk in items:
            supp[pk] += 1
        for i in items:
            if i >= CF_MAX_ITEM:
                continue
            for j in items:
                if j != i:
                    co[(i, j)] += 1
    want = defaultdict(list)
    for (i, j), c in co.items():
        want[i].append(
            (round(c / math.sqrt(supp[i] * supp[j]), 6), j, c)
        )
    for i, lst in want.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        top = lst[:CF_TOPK]
        rows = sorted(got[i])
        assert len(rows) == len(top)
        for (rk, j, c, cos), (wcos, wj, wc) in zip(rows, top):
            assert (j, c) == (wj, wc)
            assert abs(cos - wcos) < 1e-6
    assert set(got) == set(want)


def test_kruskal_wallis_matches_pure_python(spark, sf_smoke):
    """x274: average ranks + H + tie correction recomputed in Python."""
    from social_warner_spark.queries.x18_series import x274_kruskal_wallis

    r = x274_kruskal_wallis(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ranks = ev["value"].rank(method="average")
    n = len(ev)
    h = (
        12.0
        / (n * (n + 1))
        * sum(
            len(g) * (ranks[g.index].mean() ** 2)
            for _, g in ev.groupby("event_type")
        )
        - 3.0 * (n + 1)
    )
    t = ev["value"].value_counts()
    c = 1.0 - float((t**3 - t).sum()) / (n**3 - n)
    assert (r.n, r.k_groups) == (n, ev["event_type"].nunique())
    assert abs(r.h - round(h, 6)) < 1e-6
    assert abs(r.h_adjusted - round(h / c, 6)) < 1e-6
    assert r.h_adjusted >= r.h - 1e-9  # C <= 1


def test_brown_forsythe_matches_pure_python(spark, sf_smoke):
    """x275: median-centered one-way ANOVA F recomputed in Python."""
    from social_warner_spark.queries.x18_series import x275_brown_forsythe

    r = x275_brown_forsythe(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    zs, groups = [], []
    for t, g in ev.groupby("event_type"):
        md = round(statistics.median(g["value"]), 6)
        z = (g["value"] - md).abs()
        zs.extend(z)
        groups.append(list(z))
    n, k = len(zs), len(groups)
    zbar = sum(zs) / n
    ssb = sum(len(g) * (sum(g) / len(g) - zbar) ** 2 for g in groups)
    ssw = sum(
        (v - sum(g) / len(g)) ** 2 for g in groups for v in g
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (r.n, r.k_groups, r.df1, r.df2) == (n, k, k - 1, n - k)
    assert abs(r.f_stat - round(f, 6)) < 1e-5
    assert r.f_stat >= 0.0


def test_friedman_matches_pure_python(spark, sf_smoke):
    """x276: day-blocked average ranks and chi2 recomputed in Python;
    rank-sum identity sum(mean_rank) == k(k+1)/2 must hold."""
    from social_warner_spark.queries.x18_series import (
        FRIEDMAN_K,
        x276_friedman,
    )

    got = {r.event_type: r for r in x276_friedman(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    cell = (
        ev.groupby(["day", "event_type"])["value"].mean().round(6).reset_index()
    )
    counts = cell.groupby("day").size()
    fulldays = set(counts[counts == FRIEDMAN_K].index)
    cell = cell[cell["day"].isin(fulldays)]
    ranks = defaultdict(list)
    for _, g in cell.groupby("day"):
        rk = g["value"].rank(method="average")
        for t, rv in zip(g["event_type"], rk):
            ranks[t].append(rv)
    k = FRIEDMAN_K
    nb = len(fulldays)
    mr = {t: round(sum(v) / len(v), 6) for t, v in ranks.items()}
    chi = round(
        12.0 * nb / (k * (k + 1)) * sum((m - (k + 1) / 2) ** 2 for m in mr.values()),
        6,
    )
    for t, m in mr.items():
        assert got[t].n_blocks == nb
        assert abs(got[t].mean_rank - m) < 1e-6
        assert abs(got[t].chi2 - chi) < 1e-4
        assert got[t].df == k - 1
    assert abs(sum(r.mean_rank for r in got.values()) - k * (k + 1) / 2) < 1e-4
