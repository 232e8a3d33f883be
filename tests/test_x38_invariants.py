"""Semantic invariants for the x38-series operators — independent
pure-Python recomputes plus calibration identities."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd


def test_lww_vs_arrival_matches_pure_python(spark, sf_smoke):
    """x372: replay both apply orders; disagreements only on amended
    orders and the silent delta is nonpositive (LWW keeps the
    uplifted price whenever they disagree... the ARRIVAL order may
    drop it)."""
    from social_warner_spark.queries.x27_series import (
        BT_LAG_DAYS,
        BT_MOD,
        BT_UPLIFT,
    )
    from social_warner_spark.queries.x38_series import x372_lww_vs_arrival

    r = x372_lww_vs_arrival(spark, sf_smoke).collect()[0]
    o = pd.read_parquet(f"{sf_smoke}/orders.parquet")
    n_dis = 0
    d_rev = 0.0
    for k, p in zip(o["o_orderkey"], o["o_totalprice"]):
        if k % BT_MOD != 0:
            continue
        p0, p1 = float(p), round(float(p) * BT_UPLIFT, 2)
        a0 = int(hashlib.md5(f"arr|{k}#0".encode()).hexdigest()[:8], 16)
        a1 = int(hashlib.md5(f"arr|{k}#1".encode()).hexdigest()[:8], 16)
        p_arr = p0 if a0 > a1 else p1
        if p_arr != p1:
            n_dis += 1
            d_rev += p1 - p_arr
    assert r.n_orders == len(o)
    assert r.n_disagree == n_dis
    assert abs(r.silent_delta - round(d_rev, 2)) < 0.02
    assert r.silent_delta >= 0  # LWW >= arrival when they disagree


def test_ratio_bridge_identity(spark, sf_smoke):
    """x373: delta = numerator + denominator + remainder exactly, and
    the remainder is second-order small vs the delta terms."""
    from social_warner_spark.queries.x38_series import x373_ratio_bridge

    r = x373_ratio_bridge(spark, sf_smoke).collect()[0]
    assert abs(
        r.delta
        - (r.numerator_effect + r.denominator_effect + r.remainder)
    ) < 5e-6
    assert abs(r.remainder) <= abs(r.numerator_effect) + abs(
        r.denominator_effect
    ) + 1e-6


def test_birthday_audit_matches_pure_python(spark, sf_smoke):
    """x374: replay the 16-bit prefix histogram; observed collisions
    of distinct texts sit near the birthday expectation."""
    from social_warner_spark.queries.x38_series import (
        BD_BITS,
        x374_birthday_audit,
    )

    r = x374_birthday_audit(spark, sf_smoke).collect()[0]
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    hist = Counter(
        int(hashlib.md5(t.encode()).hexdigest()[: BD_BITS // 4], 16)
        for t in d["text"]
    )
    obs = sum(c * (c - 1) // 2 for c in hist.values())
    n = len(d)
    exp = n * (n - 1) / 2 / 2**BD_BITS
    assert r.n_docs == n
    assert r.n_distinct_hashes == len(hist)
    assert r.observed_collision_pairs == obs
    assert abs(r.expected_collision_pairs - round(exp, 6)) < 1e-6


def test_variance_methods_matches_pure_python(spark, sf_smoke):
    """x375: recompute all three SEs; both adjusted methods must not
    exceed the raw SE by more than noise."""
    from social_warner_spark.queries.x38_series import (
        VM_STRATA,
        x375_variance_methods,
    )

    rows = {r.method: r for r in x375_variance_methods(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    lo, hi = ev["ts"].min(), ev["ts"].max()
    cut = lo + (hi - lo) / 2
    g = ev.groupby("user_id").apply(
        lambda u: pd.Series(
            {
                "y": u.loc[u["ts"] >= cut, "value"].mean(),
                "x": u.loc[u["ts"] < cut, "value"].mean(),
                "cnt": len(u),
            }
        ),
        include_groups=False,
    ).dropna()
    n = len(g)
    raw_se = math.sqrt(g["y"].var() / n)
    assert abs(rows["raw"].se - round(raw_se, 6)) < 1e-6
    theta = round(g["x"].cov(g["y"]) / g["x"].var(), 6)
    yc = g["y"] - theta * g["x"]
    assert abs(rows["cuped"].se - round(math.sqrt(yc.var() / n), 6)) < 1e-6
    gs = g.sort_values(["cnt"], ascending=False, kind="mergesort")
    gs = g.sort_index().sort_values(
        ["cnt"], ascending=False, kind="mergesort"
    )
    # post-stratified recompute via the same ntile assignment
    g2 = g.reset_index().sort_values(
        ["cnt", "user_id"], ascending=[False, True]
    )
    base, extra = divmod(n, VM_STRATA)
    sizes = [base + (1 if i < extra else 0) for i in range(VM_STRATA)]
    idx = 0
    wv = 0.0
    for sz in sizes:
        chunk = g2.iloc[idx : idx + sz]
        idx += sz
        wv += sz * chunk["y"].var()
    ps_se = math.sqrt(wv / n / n)
    assert abs(rows["post_stratified"].se - round(ps_se, 6)) < 1e-6
    assert rows["cuped"].se <= rows["raw"].se + 1e-9


def test_raking_converges(spark, sf_smoke):
    """x376: after 5 IPF rounds both margins sit near uniform and the
    total weight is ~1."""
    from social_warner_spark.queries.x38_series import x376_raking

    r = x376_raking(spark, sf_smoke).collect()[0]
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    n_cells = d.groupby(["lang", "source"]).ngroups
    assert r.n_cells == n_cells
    assert abs(r.total_weight - 1.0) < 1e-3
    assert r.max_lang_margin_err < 1e-3
    assert r.max_source_margin_err < 1e-4
