"""Semantic invariants for the x29-series operators — independent
pure-Python recomputes plus structural identities."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd


def test_forecast_reconcile_matches_pure_python(spark, sf_smoke):
    """x327: replay the look-back means; top-down forecasts must sum
    to the total base forecast (coherence by construction)."""
    from social_warner_spark.queries.x29_series import (
        FR_LOOKBACK,
        x327_forecast_reconcile,
    )

    rows = x327_forecast_reconcile(spark, sf_smoke).collect()
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    mx = ev["day"].max()
    lb = ev[(mx - ev["day"]).dt.days < FR_LOOKBACK]
    cell = lb.groupby(["day", "event_type"]).size()
    per = {
        t: round(g.mean(), 6)
        for t, g in cell.groupby(level="event_type")
    }
    tot = round(cell.groupby(level="day").sum().mean(), 6)
    grand = cell.sum()
    for r in rows:
        assert abs(r.base_fc - per[r.event_type]) < 1e-6
        share = cell.groupby(level="event_type").sum()[r.event_type] / grand
        assert abs(r.top_down_fc - round(tot * share, 6)) < 1e-5
        assert abs(r.total_base_fc - tot) < 1e-6
    # coherence: top-down children sum to the parent
    assert abs(sum(r.top_down_fc for r in rows) - tot) < 1e-3
    bu = round(sum(r.base_fc for r in rows), 6)
    assert abs(rows[0].bottom_up_total - bu) < 1e-5


def test_shesd_matches_pure_python(spark, sf_smoke):
    """x328: replay the decomposition + robust z; ranking must match
    and |z| nonincreasing."""
    from social_warner_spark.queries.x29_series import (
        SH_SCALE,
        SH_TOP,
        SH_Z,
        x328_shesd_anomalies,
    )

    rows = x328_shesd_anomalies(spark, sf_smoke).collect()
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    ys = ev.groupby("day")["value"].sum().round(6).sort_index()
    t = ys.rolling(7, center=True).mean().round(6)
    df = pd.DataFrame({"y": ys, "t": t}).dropna()
    df["dow"] = df.index.dayofweek
    seas = (df["y"] - df["t"]).groupby(df["dow"]).mean().round(6)
    df["r"] = df["y"] - df["t"] - df["dow"].map(seas)
    med = round(df["r"].median(), 6)
    mad = round((df["r"] - med).abs().median(), 6)
    df["z"] = (SH_SCALE * (df["r"] - med) / mad).round(6)
    want = sorted(
        zip(df.index, df["z"]), key=lambda kv: (-abs(kv[1]), kv[0])
    )[:SH_TOP]
    assert len(rows) == min(SH_TOP, len(df))
    for r, (day, z) in zip(rows, want):
        assert pd.Timestamp(r.day) == day
        assert abs(r.z - z) < 1e-5
        assert r.is_anomaly == (abs(r.z) > SH_Z)
    zs = [abs(r.z) for r in rows]
    assert zs == sorted(zs, reverse=True)


def test_target_encoding_matches_pure_python(spark, sf_smoke):
    """x329: recompute both encodings; the leakage ordering
    corr_naive >= corr_loo must hold."""
    from social_warner_spark.queries.x29_series import (
        TE_LANG,
        x329_target_encoding,
    )

    rows = {r.source: r for r in x329_target_encoding(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    d["y"] = (d["lang"] == TE_LANG).astype(float)
    ys, naives, loos = [], [], []
    for src, g in d.groupby("source"):
        n, sy = len(g), g["y"].sum()
        r = rows[src]
        assert r.n_docs == n
        assert abs(r.naive_enc - round(sy / n, 6)) < 1e-6
        loo = (sy - g["y"]) / (n - 1)
        assert abs(r.loo_std - round(loo.std(), 6)) < 1e-6
        ys.extend(g["y"])
        naives.extend([sy / n] * n)
        loos.extend(loo)
    cn = pd.Series(ys).corr(pd.Series(naives))
    cl = pd.Series(ys).corr(pd.Series(loos))
    any_row = next(iter(rows.values()))
    assert abs(any_row.corr_naive - round(cn, 6)) < 1e-6
    assert abs(any_row.corr_loo - round(cl, 6)) < 1e-6
    assert any_row.corr_naive >= any_row.corr_loo  # the leakage gap


def test_medoid_canonicals_matches_pure_python(spark, sf_smoke):
    """x330: replay clusters, sampled distances, and both policies;
    the medoid policy can never be worse."""
    from social_warner_spark.operators.dedup import (
        exact_jaccard_pairs,
        neardup_clusters,
    )
    from social_warner_spark.queries.common import T
    from social_warner_spark.queries.x29_series import (
        MED_SAMPLE_MIN,
        MED_THRESHOLD,
        x330_medoid_canonicals,
    )

    r = x330_medoid_canonicals(spark, sf_smoke).collect()[0]
    d = T(spark, sf_smoke, "documents")
    labels = defaultdict(list)
    for row in neardup_clusters(d, threshold=MED_THRESHOLD).collect():
        labels[row.cluster_id].append(row.doc_id)
    sims = {}
    for p in exact_jaccard_pairs(d, MED_SAMPLE_MIN).collect():
        sims[(p.doc_id_a, p.doc_id_b)] = p.jaccard
        sims[(p.doc_id_b, p.doc_id_a)] = p.jaccard
    mmed, mmin, differs, cnt = [], [], 0, 0
    for cid, mem in labels.items():
        if len(mem) < 2:
            continue
        cnt += 1
        dsum = {
            a: sum(1.0 - sims.get((a, b), 0.0) for b in mem if b != a)
            for a in mem
        }
        medoid = min(mem, key=lambda a: (dsum[a], a))
        minid = min(mem)
        mmed.append(dsum[medoid] / (len(mem) - 1))
        mmin.append(dsum[minid] / (len(mem) - 1))
        differs += int(medoid != minid)
    assert r.n_multi_clusters == cnt
    assert r.n_policy_differs == differs
    assert abs(r.avg_d_medoid - round(sum(mmed) / cnt, 6)) < 1e-6
    assert abs(r.avg_d_minid - round(sum(mmin) / cnt, 6)) < 1e-6
    assert r.avg_d_medoid <= r.avg_d_minid + 1e-9


def test_fairness_audit_matches_pure_python(spark, sf_smoke):
    """x331: replay the stump threshold and all per-source rates;
    gaps must equal max-min of the respective columns."""
    from social_warner_spark.queries.x23_series import x298_decision_stump
    from social_warner_spark.queries.x29_series import (
        FA_LANG,
        x331_fairness_audit,
    )

    rows = {r.source: r for r in x331_fairness_audit(spark, sf_smoke).collect()}
    thr = x298_decision_stump(spark, sf_smoke).collect()[0].threshold
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    d["y"] = (d["lang"] == FA_LANG).astype(int)
    d["pred"] = (d["n_chars"] <= thr).astype(int)
    prs, tprs = [], []
    for src, g in d.groupby("source"):
        r = rows[src]
        pr = round(g["pred"].mean(), 6)
        assert abs(r.pos_rate - pr) < 1e-6
        prs.append(pr)
        pos = g[g["y"] == 1]
        if len(pos):
            tpr = round(pos["pred"].mean(), 6)
            assert abs(r.tpr - tpr) < 1e-6
            tprs.append(tpr)
        neg = g[g["y"] == 0]
        if len(neg):
            assert abs(r.fpr - round(neg["pred"].mean(), 6)) < 1e-6
    any_row = next(iter(rows.values()))
    assert abs(any_row.dp_gap - round(max(prs) - min(prs), 6)) < 1e-6
    assert abs(any_row.eo_gap - round(max(tprs) - min(tprs), 6)) < 1e-6
    assert 0.0 <= any_row.dp_gap <= 1.0
