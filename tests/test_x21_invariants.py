"""Semantic invariants for the x21-series operators — independent
pure-Python recomputes (greedy MMR replay, RM3 pipeline replay, metric
definitions) plus definitional identities."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd


def _r6(v: float) -> float:
    """Half-up 6dp rounding (Spark/DuckDB ROUND); Python's round() is
    half-even and disagrees exactly on .5 ulp boundaries."""
    return math.floor(v * 1e6 + 0.5) / 1e6 if v >= 0 else -math.floor(-v * 1e6 + 0.5) / 1e6


def _bm25_py(docs: dict[int, list[str]], terms) -> dict[int, float]:
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        q: sum(1 for t in docs.values() if q in t) for q in terms
    }
    out = {}
    for d, toks in docs.items():
        s = 0.0
        for q in terms:
            tf = toks.count(q)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += round(
                idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(toks) / avgdl)),
                6,
            )
        out[d] = s
    return out


def _docs_tokens(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    return {
        int(i): t.strip().split() for i, t in zip(d["doc_id"], d["text"])
    }


def test_mmr_matches_greedy_replay(spark, sf_smoke):
    """x287: replay the exact greedy selection in Python — candidate
    pool, 6dp step scores, first-max tie-break — row for row."""
    from social_warner_spark.queries.x21_series import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
        Q_TERMS,
        x287_mmr_rerank,
    )

    rows = x287_mmr_rerank(spark, sf_smoke).collect()
    docs = _docs_tokens(sf_smoke)
    scores = _bm25_py(docs, Q_TERMS)
    pool = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:MMR_POOL]
    sets = {d: set(docs[d]) for d, _ in pool}

    def jac(a, b):
        return round(
            len(sets[a] & sets[b]) / len(sets[a] | sets[b]), 6
        )

    sel: list[int] = []
    want = []
    for _ in range(MMR_K):
        best = None
        for idx, (d, rel) in enumerate(pool):
            if idx in sel:
                continue
            pen = max((jac(d, pool[j][0]) for j in sel), default=0.0)
            sc = round(MMR_LAMBDA * rel - (1 - MMR_LAMBDA) * pen, 6)
            if best is None or sc > best[0]:
                best = (sc, idx)
        sel.append(best[1])
        want.append(best[1])
    assert len(rows) == MMR_K
    for p, (row, idx) in enumerate(zip(rows, want), start=1):
        assert row.rk_mmr == p
        assert row.doc_id == pool[idx][0]
        assert row.rk_bm25 == idx + 1
    # first pick is always the BM25 top-1
    assert rows[0].rk_bm25 == 1
    # selections are distinct
    assert len({r.doc_id for r in rows}) == MMR_K


def test_rm3_matches_pipeline_replay(spark, sf_smoke):
    """x288: replay feedback voting, expansion choice, and the
    join-based re-score in Python; every returned row must agree."""
    from social_warner_spark.queries.x21_series import (
        MMR_POOL,
        Q_TERMS,
        RM3_BETA,
        RM3_FDOCS,
        RM3_MIN_LEN,
        RM3_TERMS,
        x288_rm3_expansion,
    )

    rows = x288_rm3_expansion(spark, sf_smoke).collect()
    docs = _docs_tokens(sf_smoke)
    base = _bm25_py(docs, Q_TERMS)
    ranked = sorted(base.items(), key=lambda kv: (-kv[1], kv[0]))
    base_rk = {d: i + 1 for i, (d, _) in enumerate(ranked[:MMR_POOL])}
    fb = ranked[:RM3_FDOCS]
    stot = sum(s for _, s in fb)
    votes: dict[str, float] = defaultdict(float)
    for d, s in fb:
        toks = docs[d]
        cnt = Counter(toks)
        for t, tf in cnt.items():
            if len(t) >= RM3_MIN_LEN and t not in Q_TERMS:
                votes[t] += tf / len(toks) * (s / stot)
    expansions = sorted(
        ((round(w, 6), t) for t, w in votes.items()),
        key=lambda wv: (-wv[0], wv[1]),
    )[:RM3_TERMS]
    terms = {t: RM3_BETA for _, t in expansions}
    for q in Q_TERMS:
        terms[q] = 1.0
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in terms
    }
    prf = {}
    for d, toks in docs.items():
        s = 0.0
        for t, qw in terms.items():
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += qw * round(
                idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(toks) / avgdl)),
                6,
            )
        if s:
            prf[d] = _r6(s)
    want = sorted(prf.items(), key=lambda kv: (-kv[1], kv[0]))[:MMR_POOL]
    assert len(rows) == len(want)
    for row, (d, s) in zip(rows, want):
        assert row.doc_id == d
        assert abs(row.score_prf - s) < 1e-6
        assert row.rk_base == base_rk.get(d)


def test_alignment_uniformity_matches_numpy(spark, sf_smoke):
    """x289: recompute both metrics over the same md5 buckets;
    alignment in [0,4], uniformity <= 0."""
    import numpy as np

    from social_warner_spark.queries.x21_series import (
        AU_BUCKETS,
        x289_alignment_uniformity,
    )

    r = x289_alignment_uniformity(spark, sf_smoke).collect()[0]
    e = pd.read_parquet(f"{sf_smoke}/embeddings.parquet")
    vecs = {
        int(t.vec_id): (
            int(t.label),
            np.array(t.embedding, dtype=np.float64),
        )
        for t in e.itertuples()
    }
    buckets = {
        v: int(hashlib.md5(f"au|{v}".encode()).hexdigest()[:8], 16)
        % AU_BUCKETS
        for v in vecs
    }

    def d2(a, b):
        va, vb = vecs[a][1], vecs[b][1]
        cos = round(
            float(va @ vb)
            / (math.sqrt(float(va @ va)) * math.sqrt(float(vb @ vb))),
            6,
        )
        return 2.0 - 2.0 * cos

    ids = sorted(vecs)
    align, unif = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if buckets[a] != buckets[b]:
                continue
            dd = d2(a, b)
            unif.append(math.exp(-2.0 * dd))
            if vecs[a][0] == vecs[b][0]:
                align.append(dd)
    assert r.n_align_pairs == len(align)
    assert r.n_unif_pairs == len(unif)
    assert abs(r.alignment - round(sum(align) / len(align), 6)) < 1e-6
    assert abs(
        r.uniformity - round(math.log(sum(unif) / len(unif)), 6)
    ) < 1e-6
    assert 0.0 <= r.alignment <= 4.0
    assert r.uniformity <= 0.0


def test_chi2_homogeneity_matches_pure_python(spark, sf_smoke):
    """x290: contingency recompute; chi2 >= 0, V in [0,1]."""
    from social_warner_spark.queries.x21_series import x290_chi2_homogeneity

    r = x290_chi2_homogeneity(spark, sf_smoke).collect()[0]
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    tab = pd.crosstab(d["lang"], d["source"])
    n = tab.values.sum()
    exp = (
        tab.sum(axis=1).values[:, None]
        * tab.sum(axis=0).values[None, :]
        / n
    )
    chi2 = float(((tab.values - exp) ** 2 / exp).sum())
    rr, cc = tab.shape
    assert (r.n, r.r, r.c) == (n, rr, cc)
    assert abs(r.chi2 - round(chi2, 6)) < 1e-5
    assert r.df == (rr - 1) * (cc - 1)
    v = math.sqrt(chi2 / (n * min(rr - 1, cc - 1)))
    assert abs(r.cramers_v - round(v, 6)) < 1e-6
    assert 0.0 <= r.cramers_v <= 1.0


def test_jsd_matrix_matches_pure_python(spark, sf_smoke):
    """x291: recompute every pair JSD over the top-V grid; JSD in
    [0,1] bits and symmetric by construction."""
    from social_warner_spark.queries.x21_series import (
        JSD_VOCAB,
        x291_jsd_source_matrix,
    )

    rows = x291_jsd_source_matrix(spark, sf_smoke).collect()
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    toks = []
    for src, txt in zip(d["source"], d["text"]):
        for t in txt.strip().split():
            toks.append((src, t))
    cnt_all = Counter(t for _, t in toks)
    vocab = {
        t
        for t, _ in sorted(cnt_all.items(), key=lambda kv: (-kv[1], kv[0]))[
            :JSD_VOCAB
        ]
    }
    per = defaultdict(Counter)
    for src, t in toks:
        if t in vocab:
            per[src][t] += 1
    dist = {
        s: {t: c / sum(cs.values()) for t, c in cs.items()}
        for s, cs in per.items()
    }

    def h(x):
        return -x * math.log2(x) if x > 0 else 0.0

    srcs = sorted(dist)
    want = {}
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            p, q = dist[srcs[i]], dist[srcs[j]]
            jsd = 0.0
            for t in vocab:
                a, b = p.get(t, 0.0), q.get(t, 0.0)
                jsd += h((a + b) / 2) - (h(a) + h(b)) / 2
            want[(srcs[i], srcs[j])] = round(jsd, 6)
    assert len(rows) == len(want)
    for r in rows:
        assert abs(r.jsd - want[(r.s1, r.s2)]) < 1e-6
        assert -1e-9 <= r.jsd <= 1.0
