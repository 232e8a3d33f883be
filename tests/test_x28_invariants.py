"""Semantic invariants for the x28-series operators — independent
pure-Python recomputes plus structural identities."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd


def _daily(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    return ev.groupby("day")["value"].sum().round(6).sort_index().to_list()


def test_multi_changepoint_matches_recursive_scan(spark, sf_smoke):
    """x322: exhaustive depth-2 segmentation scan in Python; the
    level-1 row must equal x263's answer and children must reduce
    their parent's SSE."""
    from social_warner_spark.queries.x16_series import CP_MIN_SEG
    from social_warner_spark.queries.x28_series import (
        x322_multi_changepoint,
    )

    rows = {r.segment: r for r in x322_multi_changepoint(spark, sf_smoke).collect()}
    ys = _daily(sf_smoke)
    n = len(ys)

    def sse(seg):
        if not seg:
            return 0.0
        m = sum(seg) / len(seg)
        return sum((v - m) ** 2 for v in seg)

    def best(lo, hi):
        # split s in (lo+MIN .. hi-MIN], segment is ys[lo:hi]
        out = None
        for s in range(lo + CP_MIN_SEG, hi - CP_MIN_SEG + 1):
            c = round(sse(ys[lo:s]) + sse(ys[s:hi]), 6)
            if out is None or c < out[0]:
                out = (c, s)
        return out

    c1, b1 = best(0, n)
    r1 = rows["full_series"]
    assert r1.split_idx == b1
    assert abs(r1.split_sse - c1) < 1e-4
    for seg, lo, hi in (
        ("left_of_cp1", 0, b1),
        ("right_of_cp1", b1, n),
    ):
        got = rows.get(seg)
        want = best(lo, hi)
        if want is None:
            assert got is None
            continue
        c, s = want
        assert got.split_idx == s
        assert abs(got.split_sse - c) < 1e-4
        assert abs(got.parent_sse - round(sse(ys[lo:hi]), 6)) < 1e-4
        assert got.split_sse <= got.parent_sse + 1e-9
        assert got.kept == (got.gain_share >= 0.1)


def test_power_planner_matches_pure_python(spark, sf_smoke):
    """x323: recompute the power algebra; n must shrink as MDE grows
    (monotone planning curve)."""
    from social_warner_spark.queries.x28_series import (
        PW_MDES,
        PW_Z_ALPHA,
        PW_Z_BETA,
        x323_power_planner,
    )

    rows = {r.mde: r for r in x323_power_planner(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    mu = ev["value"].mean()
    var = ev["value"].var()
    k = (PW_Z_ALPHA + PW_Z_BETA) ** 2
    prev = None
    for m in PW_MDES:
        need = math.ceil(2 * k * var / (m * mu) ** 2)
        r = rows[m]
        assert r.n_per_arm == need
        assert abs(r.abs_delta - round(m * mu, 6)) < 1e-6
        if prev is not None:
            assert r.n_per_arm <= prev
        prev = r.n_per_arm


def test_chao1_matches_pure_python(spark, sf_smoke):
    """x324: recompute hapax/dis counts; chao1 >= vocab and coverage
    in (0, 1]."""
    from social_warner_spark.queries.x28_series import x324_chao1_richness

    got = {r.source: r for r in x324_chao1_richness(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    for src, g in d.groupby("source"):
        f = Counter()
        for t in g["text"]:
            f.update(t.strip().split())
        v = len(f)
        f1 = sum(1 for c in f.values() if c == 1)
        f2 = sum(1 for c in f.values() if c == 2)
        chao = v + f1 * f1 / (2 * max(f2, 1))
        r = got[src]
        assert (r.vocab, r.f1, r.f2) == (v, f1, f2)
        assert abs(r.chao1 - round(chao, 6)) < 1e-6
        assert r.chao1 >= r.vocab
        assert 0.0 < r.coverage <= 1.0


def test_merkle_root_matches_pure_python_and_sensitivity(spark, sf_smoke):
    """x325: recompute the full tree in Python; flipping one document
    must change the root (the property the structure exists for)."""
    from social_warner_spark.queries.x28_series import (
        MK_FAN,
        MK_LEAF,
        x325_merkle_root,
    )

    r = x325_merkle_root(spark, sf_smoke).collect()[0]
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")

    def build(rows):
        leaves = defaultdict(list)
        for i, t, lg in rows:
            h = hashlib.md5(f"{i}|{t}|{lg}".encode()).hexdigest()
            leaves[i // MK_LEAF].append((i, h))
        lh = {
            k: hashlib.md5(
                "".join(h for _, h in sorted(v)).encode()
            ).hexdigest()
            for k, v in leaves.items()
        }
        mids = defaultdict(list)
        for k, h in lh.items():
            mids[k // MK_FAN].append((k, h))
        mh = {
            k: hashlib.md5(
                "".join(h for _, h in sorted(v)).encode()
            ).hexdigest()
            for k, v in mids.items()
        }
        root = hashlib.md5(
            "".join(mh[k] for k in sorted(mh)).encode()
        ).hexdigest()
        return root, len(lh), len(mh)

    rows = list(zip(d["doc_id"], d["text"], d["lang"]))
    root, nl, nm = build(rows)
    assert (r.root_hash, r.n_leaves, r.n_mid_nodes) == (root, nl, nm)
    # sensitivity: one flipped char changes the root
    rows2 = rows.copy()
    i0, t0, l0 = rows2[0]
    rows2[0] = (i0, t0 + "!", l0)
    root2, _, _ = build(rows2)
    assert root2 != root


def test_quantile_ci_matches_pure_python(spark, sf_smoke):
    """x326: recompute the rank interval; ci_lo <= p95 <= ci_hi."""
    from social_warner_spark.queries.x28_series import (
        QCI_P,
        QCI_Z,
        x326_quantile_ci,
    )

    got = {r.event_type: r for r in x326_quantile_ci(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    for t, g in ev.groupby("event_type"):
        vs = sorted(g["value"])
        n = len(vs)
        r_pt = math.ceil(QCI_P * n)
        half = QCI_Z * math.sqrt(n * QCI_P * (1 - QCI_P))
        r_lo = max(1, math.ceil(QCI_P * n - half))
        r_hi = min(n, math.ceil(QCI_P * n + half))
        r = got[t]
        assert r.n == n
        assert r.p95 == vs[r_pt - 1]
        assert r.ci_lo == vs[r_lo - 1]
        assert r.ci_hi == vs[r_hi - 1]
        assert r.ci_lo <= r.p95 <= r.ci_hi
