"""Semantic invariants for the x33-series operators — independent
pure-Python recomputes plus definitional identities."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd


def _arm(uid):
    return 1 if int(
        hashlib.md5(f"did|{uid}".encode()).hexdigest()[:8], 16
    ) % 2 == 0 else 0


def test_qini_matches_pure_python(spark, sf_smoke):
    """x347: replay deciles and the uplift curve; the final cumulative
    incremental equals the full-population incremental."""
    from social_warner_spark.queries.x33_series import (
        QU_BINS,
        QU_MIN_PURCHASES,
        x347_qini_uplift,
    )

    rows = {r.dec: r for r in x347_qini_uplift(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    users = ev.groupby("user_id").agg(
        cnt=("event_id", "size"),
        purchases=("event_type", lambda t: (t == "purchase").sum()),
    )
    users["y"] = (users["purchases"] >= QU_MIN_PURCHASES).astype(int)
    users["t"] = [_arm(u) for u in users.index]
    users = users.sort_values(
        ["cnt"], ascending=False, kind="mergesort"
    )
    users = users.sort_values(
        ["cnt", "user_id"], ascending=[False, True]
    )
    n = len(users)
    base, extra = divmod(n, QU_BINS)
    sizes = [base + (1 if i < extra else 0) for i in range(QU_BINS)]
    idx = 0
    ct = crt = cnc = crc = 0
    recs = []
    for dec, sz in enumerate(sizes, start=1):
        chunk = users.iloc[idx : idx + sz]
        idx += sz
        ct += int(chunk["t"].sum())
        crt += int((chunk["t"] * chunk["y"]).sum())
        cnc += int((1 - chunk["t"]).sum())
        crc += int(((1 - chunk["t"]) * chunk["y"]).sum())
        inc = crt - crc * ct / max(cnc, 1)
        recs.append((dec, ct, round(inc, 6)))
    for dec, ct_, inc in recs:
        r = rows[dec]
        assert r.cum_treated == ct_
        assert abs(r.incremental - inc) < 1e-5
    # last decile's random baseline equals its incremental definitionally
    last = rows[QU_BINS]
    assert abs(last.incremental - last.random_baseline) < 1e-5
    assert abs(last.qini_gap) < 1e-5


def test_design_effect_matches_pure_python(spark, sf_smoke):
    """x348: recompute within-strata variance; deff in (0, 1]."""
    from social_warner_spark.queries.x33_series import x348_design_effect

    r = x348_design_effect(spark, sf_smoke).collect()[0]
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    n = len(d)
    s2 = d["n_chars"].var()
    within = sum(
        len(g) / n * g["n_chars"].var()
        for _, g in d.groupby("source")
    )
    assert r.n_docs == n
    assert abs(r.var_total - round(s2, 6)) < 1e-4
    assert abs(r.var_within - round(within, 6)) < 1e-4
    assert abs(r.deff - round(within / s2, 6)) < 1e-6
    # with SAMPLE variances and no between-strata structure, DEFF can
    # exceed 1 by Bessel-correction slack — allow a small margin
    assert 0.0 < r.deff <= 1.01
    assert abs(r.deff + r.variance_saved - 1.0) < 1e-5


def test_fpc_ci_matches_pure_python(spark, sf_smoke):
    """x349: replay the md5 sample; FPC half-width < naive."""
    from social_warner_spark.queries.x33_series import (
        FPC_MOD,
        FPC_Z,
        x349_fpc_ci,
    )

    r = x349_fpc_ci(spark, sf_smoke).collect()[0]
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    mask = [
        int(hashlib.md5(f"fpc|{i}".encode()).hexdigest()[:8], 16)
        % FPC_MOD
        == 0
        for i in d["doc_id"]
    ]
    samp = d[pd.Series(mask, index=d.index)]["n_chars"].astype(float)
    assert r.population == len(d)
    assert r.sample_n == len(samp)
    assert abs(r.sample_mean - round(samp.mean(), 6)) < 1e-6
    half = FPC_Z * math.sqrt(samp.var() / len(samp))
    fpc = math.sqrt(1 - len(samp) / len(d))
    assert abs(r.half_width_naive - round(half, 6)) < 1e-5
    assert abs(r.half_width_fpc - round(half * fpc, 6)) < 1e-5
    assert r.half_width_fpc < r.half_width_naive


def test_knn_ood_matches_pure_python(spark, sf_smoke):
    """x350: recompute 5th-NN distances within buckets."""
    import numpy as np

    from social_warner_spark.queries.x31_series import HUB_BUCKETS
    from social_warner_spark.queries.x33_series import (
        OOD_K,
        OOD_TOP,
        x350_knn_ood,
    )

    rows = x350_knn_ood(spark, sf_smoke).collect()
    e = pd.read_parquet(f"{sf_smoke}/embeddings.parquet")
    vecs = {
        int(r2.vec_id): np.array(r2.embedding, dtype=np.float64)
        for r2 in e.itertuples()
    }
    bks = defaultdict(list)
    for v in sorted(vecs):
        b = int(hashlib.md5(f"hub|{v}".encode()).hexdigest()[:8], 16) % HUB_BUCKETS
        bks[b].append(v)
    scores = {}
    for mem in bks.values():
        for q in mem:
            ds = []
            vq = vecs[q]
            nq = math.sqrt(float(vq @ vq))
            for c in mem:
                if c == q:
                    continue
                vc = vecs[c]
                nc = math.sqrt(float(vc @ vc))
                ds.append(
                    (1.0 - round(float(vq @ vc) / (nq * nc), 6), c)
                )
            ds.sort()
            if len(ds) >= OOD_K:
                scores[q] = round(ds[OOD_K - 1][0], 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:OOD_TOP]
    assert len(rows) == min(OOD_TOP, len(want))
    for r2, (v, s) in zip(rows, want):
        assert r2.vec_id == v
        assert abs(r2.ood_score - s) < 1e-6
        assert 0.0 <= r2.ood_score <= 2.0


def test_quantile_effects_matches_pure_python(spark, sf_smoke):
    """x351: recompute both arms' quantiles; QTE = difference, and
    the A/A effects should be modest relative to the IQR."""
    from social_warner_spark.queries.x33_series import (
        QTE_QS,
        x351_quantile_effects,
    )

    rows = {r.q: r for r in x351_quantile_effects(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["t"] = [_arm(u) for u in ev["user_id"]]
    tre = ev[ev["t"] == 1]["value"]
    ctl = ev[ev["t"] == 0]["value"]
    for q in QTE_QS:
        r = rows[q]
        qt = round(tre.quantile(q, interpolation="linear"), 6)
        qc = round(ctl.quantile(q, interpolation="linear"), 6)
        assert abs(r.q_treated - qt) < 1e-6
        assert abs(r.q_control - qc) < 1e-6
        assert abs(r.qte - round(qt - qc, 6)) < 1e-5
    qs_sorted = sorted(QTE_QS)
    # quantiles are monotone within each arm
    ts = [rows[q].q_treated for q in qs_sorted]
    assert ts == sorted(ts)
