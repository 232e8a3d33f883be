"""Semantic invariants for the x19-series operators — independent
pure-Python recomputes plus definitional identities (ROUGE bounds,
log-rank symmetry, Shapley efficiency, gains monotonicity)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd


def test_rouge_pairs_matches_pure_python(spark, sf_smoke):
    """x277: recompute clipped n-gram overlap per returned pair; F1
    must land in [0,1] and ROUGE-2 <= ROUGE-1 + epsilon (shared bigrams
    imply shared unigrams on these near-dup pairs)."""
    from social_warner_spark.queries.x19_series import x277_rouge_pairs

    rows = x277_rouge_pairs(spark, sf_smoke).collect()
    assert rows, "threshold should produce pairs on the smoke corpus"
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    txt = dict(zip(d["doc_id"], d["text"]))

    def grams(doc, n):
        toks = txt[doc].strip().split()
        if n == 1:
            return Counter(toks)
        return Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    for r in rows:
        for n, tag in ((1, "rouge1"), (2, "rouge2")):
            ga, gb = grams(r.a, n), grams(r.b, n)
            ov = sum(min(c, gb[g]) for g, c in ga.items())
            p = ov / sum(gb.values())
            rec = ov / sum(ga.values())
            f = 2 * p * rec / (p + rec) if p + rec > 0 else 0.0
            assert abs(getattr(r, f"{tag}_p") - round(p, 6)) < 1e-6
            assert abs(getattr(r, f"{tag}_r") - round(rec, 6)) < 1e-6
            assert abs(getattr(r, f"{tag}_f") - round(f, 6)) < 1e-6
            assert 0.0 <= getattr(r, f"{tag}_f") <= 1.0


def test_logrank_matches_pure_python(spark, sf_smoke):
    """x278: rebuild subjects and accumulate O-E/V over event times in
    Python; chi2 must be symmetric in the group labels."""
    from social_warner_spark.queries.x19_series import (
        LR_G1,
        LR_G2,
        SHAP_CONV,
        x278_logrank_test,
    )

    r = x278_logrank_test(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    import hashlib

    subj = []
    for uid, g in ev.groupby("user_id"):
        views = g[g["event_type"] == "view"]
        if not len(views):
            continue
        h = hashlib.md5(f"lr|{uid}".encode()).hexdigest()
        grp = LR_G1 if int(h[:8], 16) % 2 == 0 else LR_G2
        t0 = views["ts"].min()
        pur = g[(g["event_type"] == SHAP_CONV) & (g["ts"] > t0)]
        if len(pur):
            dur = (pur["ts"].min() - t0).value // 1000
            evf = 1
        else:
            dur = (g["ts"].max() - t0).value // 1000
            evf = 0
        if dur > 0:
            subj.append((grp, dur, evf))
    n1 = sum(1 for s in subj if s[0] == LR_G1)
    n2 = len(subj) - n1
    times = sorted({d for _, d, e in subj if e})
    o1 = e1 = v = 0.0
    for t in times:
        at1 = sum(1 for g, d, _ in subj if g == LR_G1 and d >= t)
        at2 = sum(1 for g, d, _ in subj if g == LR_G2 and d >= t)
        d1 = sum(1 for g, d, e in subj if g == LR_G1 and d == t and e)
        d2 = sum(1 for g, d, e in subj if g == LR_G2 and d == t and e)
        nt, dt = at1 + at2, d1 + d2
        o1 += d1
        e1 += dt * at1 / nt
        if nt > 1:
            v += dt * (at1 / nt) * (1 - at1 / nt) * (nt - dt) / (nt - 1)
    assert (r.n_g1, r.n_g2, r.observed_g1) == (n1, n2, int(o1))
    assert abs(r.expected_g1 - round(e1, 6)) < 1e-5
    assert abs(r.var_s - round(v, 6)) < 1e-5
    assert abs(r.chi2 - round((o1 - e1) ** 2 / v, 6)) < 1e-4
    assert r.chi2 >= 0.0


def test_shapley_matches_pure_python_and_efficiency(spark, sf_smoke):
    """x279: recompute the 16-coalition Shapley sum in Python; the
    efficiency axiom sum(phi) == v(full info proxy) is checked in its
    attribution form: shares sum to 1 when total > 0."""
    from social_warner_spark.queries.x19_series import (
        SHAP_CHANNELS,
        SHAP_CONV,
        x279_shapley_attribution,
    )

    got = {r.channel: r for r in x279_shapley_attribution(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    users = []
    for uid, g in ev.groupby("user_id"):
        types = g["event_type"].to_list()
        conv = SHAP_CONV in types
        cut = types.index(SHAP_CONV) if conv else len(types)
        mask = 0
        for t in set(types[:cut]) - {SHAP_CONV}:
            mask |= 1 << SHAP_CHANNELS.index(t)
        users.append((mask, 1.0 if conv else 0.0))
    vs = defaultdict(list)
    for m, y in users:
        vs[m].append(y)
    v = {m: round(sum(ys) / len(ys), 6) for m, ys in vs.items()}
    k = len(SHAP_CHANNELS)
    for ci, c in enumerate(SHAP_CHANNELS):
        phi = 0.0
        for mask in range(2**k):
            if mask & (1 << ci):
                continue
            s = bin(mask).count("1")
            w = round(
                math.factorial(s) * math.factorial(k - 1 - s) / math.factorial(k),
                6,
            )
            phi += w * (v.get(mask | (1 << ci), 0.0) - v.get(mask, 0.0))
        assert abs(got[c].shapley - round(phi, 6)) < 1e-6
    total = sum(r.shapley for r in got.values())
    if abs(total) > 1e-9:
        assert abs(sum(r.share for r in got.values()) - 1.0) < 1e-4


def test_gains_table_matches_pure_python(spark, sf_smoke):
    """x280: replay the ntile assignment and every decile statistic;
    cum_gain must be nondecreasing and end at 1.0."""
    from social_warner_spark.queries.x19_series import (
        GAINS_BUCKETS,
        GAINS_LANG,
        x280_gains_table,
    )

    rows = x280_gains_table(spark, sf_smoke).collect()
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    ordered = d.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    n = len(ordered)
    base, extra = divmod(n, GAINS_BUCKETS)
    sizes = [base + (1 if i < extra else 0) for i in range(GAINS_BUCKETS)]
    pos = (ordered["lang"] == GAINS_LANG).astype(int).to_list()
    np_tot = sum(pos)
    idx = 0
    cum_pos = cum_n = 0
    gains = []
    for dec, sz in enumerate(sizes, start=1):
        chunk = pos[idx : idx + sz]
        idx += sz
        npos = sum(chunk)
        cum_pos += npos
        cum_n += sz
        row = rows[dec - 1]
        assert (row.decile, row.n_docs, row.n_pos) == (dec, sz, npos)
        assert abs(row.pos_rate - round(npos / sz, 6)) < 1e-6
        assert row.cum_pos == cum_pos
        assert abs(row.cum_gain - round(cum_pos / np_tot, 6)) < 1e-6
        assert abs(
            row.lift - round((npos / sz) / (np_tot / n), 6)
        ) < 1e-6
        ks = cum_pos / np_tot - (cum_n - cum_pos) / (n - np_tot)
        assert abs(row.ks - round(ks, 6)) < 1e-6
        gains.append(row.cum_gain)
    assert gains == sorted(gains)
    assert abs(gains[-1] - 1.0) < 1e-9


def test_cochran_armitage_matches_pure_python(spark, sf_smoke):
    """x281: replay the bucket assignment and trend algebra exactly."""
    from social_warner_spark.queries.x19_series import (
        CA_BUCKETS,
        CA_MIN_PURCHASES,
        SHAP_CONV,
        x281_cochran_armitage,
    )

    r = x281_cochran_armitage(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    g = ev.groupby("user_id").agg(
        cnt=("event_id", "size"),
        purchases=("event_type", lambda t: (t == SHAP_CONV).sum()),
    )
    g["y"] = (g["purchases"] >= CA_MIN_PURCHASES).astype(int)
    g = g.sort_values(["cnt", "user_id"], ascending=[False, True])
    n = len(g)
    base, extra = divmod(n, CA_BUCKETS)
    sizes = [base + (1 if i < extra else 0) for i in range(CA_BUCKETS)]
    ys = g["y"].to_list()
    idx = 0
    per = []
    for s, sz in enumerate(sizes, start=1):
        per.append((s, sz, sum(ys[idx : idx + sz])))
        idx += sz
    nn = sum(sz for _, sz, _ in per)
    rr = sum(rv for _, _, rv in per)
    t = sum(s * (rv - sz * rr / nn) for s, sz, rv in per)
    pbar = rr / nn
    var = pbar * (1 - pbar) * (
        sum(s * s * sz for s, sz, _ in per)
        - sum(s * sz for s, sz, _ in per) ** 2 / nn
    )
    assert (r.n_users, r.n_converted) == (nn, rr)
    assert abs(r.t_stat - round(t, 6)) < 1e-6
    assert abs(r.var_t - round(var, 6)) < 1e-6
    if var > 0:
        assert abs(r.z - round(t / math.sqrt(var), 6)) < 1e-6
    assert 0 < rr < nn, "outcome must vary for the test to be meaningful"
