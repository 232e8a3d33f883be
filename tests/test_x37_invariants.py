"""Semantic invariants for the x37-series operators — independent
pure-Python recomputes plus definitional identities."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd


def test_rank_movers_matches_pure_python(spark, sf_smoke):
    """x367: replay the half-split ranks for the pool."""
    from social_warner_spark.queries.x37_series import (
        RM_POOL,
        RM_TOP,
        x367_rank_movers,
    )

    rows = x367_rank_movers(spark, sf_smoke).collect()
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    mid = d["doc_id"].quantile(0.5, interpolation="linear")
    cf = Counter()
    c1 = Counter()
    c2 = Counter()
    for i, t in zip(d["doc_id"], d["text"]):
        toks = t.strip().split()
        cf.update(toks)
        (c1 if i <= mid else c2).update(toks)
    pool = [
        t for t, _ in sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:RM_POOL]
    ]
    r1 = {
        t: i + 1
        for i, t in enumerate(
            sorted(pool, key=lambda t: (-c1[t], t))
        )
    }
    r2 = {
        t: i + 1
        for i, t in enumerate(
            sorted(pool, key=lambda t: (-c2[t], t))
        )
    }
    want = sorted(
        pool, key=lambda t: (-abs(r1[t] - r2[t]), t)
    )[:RM_TOP]
    assert len(rows) == RM_TOP
    for r, t in zip(rows, want):
        assert r.tok == t
        assert (r.rank_h1, r.rank_h2) == (r1[t], r2[t])
        assert r.rank_delta == r2[t] - r1[t]


def test_clarity_score_matches_pure_python(spark, sf_smoke):
    """x368: replay the feedback LM and corpus LM KL; clarity >= 0 is
    NOT guaranteed over the intersection support, but the recompute
    must agree exactly."""
    from social_warner_spark.queries.x21_series import _bm25_ranked
    from social_warner_spark.queries.x37_series import (
        CL_FDOCS,
        x368_clarity_score,
    )

    r = x368_clarity_score(spark, sf_smoke).collect()[0]
    fb_ids = {
        row.doc_id
        for row in _bm25_ranked(spark, sf_smoke, CL_FDOCS).collect()
    }
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    fq = Counter()
    cq = Counter()
    for i, t in zip(d["doc_id"], d["text"]):
        toks = t.strip().split()
        cq.update(toks)
        if i in fb_ids:
            fq.update(toks)
    qt, ct = sum(fq.values()), sum(cq.values())
    kl = sum(
        (c / qt) * math.log2((c / qt) / (cq[t] / ct))
        for t, c in fq.items()
    )
    assert r.n_feedback == len(fb_ids)
    assert r.n_terms == len(fq)
    assert abs(r.clarity_bits - round(kl, 6)) < 1e-5


def test_doc_typicality_matches_pure_python(spark, sf_smoke):
    """x369: recompute centroid cosines for the reported docs;
    most-typical scores exceed least-typical."""
    from social_warner_spark.queries.x37_series import x369_doc_typicality

    rows = x369_doc_typicality(spark, sf_smoke).collect()
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    nd = len(d)
    tf = {}
    df = Counter()
    for i, t in zip(d["doc_id"], d["text"]):
        c = Counter(t.strip().split())
        tf[i] = c
        df.update(c.keys())
    idf = {t: math.log(nd / c) for t, c in df.items()}
    w = {
        i: {t: c * idf[t] for t, c in cs.items()} for i, cs in tf.items()
    }
    cent = defaultdict(float)
    for ws in w.values():
        for t, x in ws.items():
            cent[t] += x / nd
    cn = math.sqrt(sum(x * x for x in cent.values()))
    for r in rows:
        ws = w[r.doc_id]
        dot = sum(x * cent[t] for t, x in ws.items())
        dn = math.sqrt(sum(x * x for x in ws.values()))
        assert abs(r.typicality - round(dot / (dn * cn), 6)) < 1e-6
    most = [r.typicality for r in rows if r.end == "most_typical"]
    least = [r.typicality for r in rows if r.end == "least_typical"]
    assert min(most) >= max(least)


def test_stopword_discovery_matches_pure_python(spark, sf_smoke):
    """x370: recompute coverage-qualified tokens; coverage > 0.5 for
    all and idf < ln 2."""
    from social_warner_spark.queries.x37_series import (
        SW_MIN_DF_SHARE,
        x370_stopword_discovery,
    )

    rows = x370_stopword_discovery(spark, sf_smoke).collect()
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    nd = len(d)
    cf = Counter()
    df = Counter()
    for t in d["text"]:
        toks = t.strip().split()
        cf.update(toks)
        df.update(set(toks))
    want = sorted(
        (
            (t, cf[t], df[t])
            for t in df
            if df[t] > SW_MIN_DF_SHARE * nd
        ),
        key=lambda x: (-x[1], x[0]),
    )
    assert len(rows) == len(want)
    for r, (t, c, dfo) in zip(rows, want):
        assert (r.tok, r.cf, r.df) == (t, c, dfo)
        assert r.doc_coverage > SW_MIN_DF_SHARE
        assert r.idf < math.log(2) + 1e-9


def test_label_budget_curve_matches_pure_python(spark, sf_smoke):
    """x371: replay subset fitting and holdout scoring; the 100%%
    budget threshold equals x298's full-data stump."""
    from social_warner_spark.queries.x23_series import (
        STUMP_LANG,
        x298_decision_stump,
    )
    from social_warner_spark.queries.x37_series import (
        LB_BUDGETS,
        x371_label_budget_curve,
    )

    rows = {r.budget_pct: r for r in x371_label_budget_curve(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    d["y"] = (d["lang"] == STUMP_LANG).astype(int)
    d["h"] = [
        int(hashlib.md5(f"lb|{i}".encode()).hexdigest()[:8], 16) % 100
        for i in d["doc_id"]
    ]

    def fit(pool):
        pts = sorted(zip(pool["n_chars"], pool["y"]))
        n = len(pts)
        np_ = sum(y for _, y in pts)

        def hh(p):
            out = 0.0
            if p > 0:
                out -= p * math.log2(p)
            if p < 1:
                out -= (1 - p) * math.log2(1 - p)
            return out

        grouped = defaultdict(lambda: [0, 0])
        for x, y in pts:
            grouped[x][0] += 1
            grouped[x][1] += y
        best = None
        nl = pl = 0
        for x in sorted(grouped):
            nl += grouped[x][0]
            pl += grouped[x][1]
            if nl >= n:
                continue
            g = round(
                hh(np_ / n)
                - (
                    nl / n * hh(pl / nl)
                    + (n - nl) / n * hh((np_ - pl) / (n - nl))
                ),
                6,
            )
            if best is None or g > best[0]:
                best = (g, x)
        return best[1]

    for b in LB_BUDGETS:
        pool = d[d["h"] < b]
        thr = fit(pool)
        hold = d[d["h"] >= b] if b < 100 else d
        acc = ((hold["n_chars"] <= thr).astype(int) == hold["y"]).mean()
        r = rows[b]
        assert r.threshold == thr
        assert r.n_eval == len(hold)
        assert abs(r.accuracy - round(acc, 6)) < 1e-6
    full = x298_decision_stump(spark, sf_smoke).collect()[0]
    assert rows[100].threshold == full.threshold
