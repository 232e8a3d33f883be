"""Semantic invariants for the x24-series operators — independent
pure-Python recomputes plus definitional identities."""

from __future__ import annotations

import hashlib
import math
import statistics
from collections import Counter, defaultdict

import pandas as pd


def test_ccnet_buckets_match_pure_python(spark, sf_smoke):
    """x302: replay the per-lang LM, perplexities, terciles and
    bucket counts; head avg_ppl < tail avg_ppl per lang."""
    from social_warner_spark.queries.x24_series import (
        CC_Q1,
        CC_Q2,
        x302_ccnet_buckets,
    )

    got = {
        (r.lang, r.bucket): r
        for r in x302_ccnet_buckets(spark, sf_smoke).collect()
    }
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    per_lang = defaultdict(list)
    for lang, g in d.groupby("lang"):
        lm = Counter()
        docs = {}
        for i, t in zip(g["doc_id"], g["text"]):
            toks = t.strip().split()
            docs[i] = toks
            lm.update(toks)
        tot, v = sum(lm.values()), len(lm)
        ppls = {}
        for i, toks in docs.items():
            ce = -sum(
                math.log((lm[t] + 1.0) / (tot + v)) for t in toks
            ) / len(toks)
            ppls[i] = round(math.exp(ce), 6)
        vals = list(ppls.values())
        q1 = round(
            statistics.quantiles(vals, n=3, method="inclusive")[0], 6
        )
        q2 = round(
            statistics.quantiles(vals, n=3, method="inclusive")[1], 6
        )
        for i, p in ppls.items():
            b = "head" if p <= q1 else "middle" if p <= q2 else "tail"
            per_lang[(lang, b)].append((p, len(docs[i])))
    for key, rows in per_lang.items():
        r = got[key]
        assert r.n_docs == len(rows)
        assert abs(r.avg_ppl - round(sum(p for p, _ in rows) / len(rows), 6)) < 1e-4
    for lang in d["lang"].unique():
        assert got[(lang, "head")].avg_ppl < got[(lang, "tail")].avg_ppl


def test_wasserstein_matches_pure_python(spark, sf_smoke):
    """x303: exact CDF-difference integral per source; W1 >= 0."""
    from social_warner_spark.queries.x24_series import (
        x303_wasserstein_sources,
    )

    got = {r.source: r.w1 for r in x303_wasserstein_sources(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    xs = sorted(d["n_chars"].unique())
    n = len(d)
    for src, g in d.groupby("source"):
        cnt = Counter(g["n_chars"])
        gcnt = Counter(d["n_chars"])
        cs = cg = 0
        w1 = 0.0
        for i, x in enumerate(xs[:-1]):
            cs += cnt.get(x, 0)
            cg += gcnt[x]
            w1 += abs(cs / len(g) - cg / n) * (xs[i + 1] - x)
        assert abs(got[src] - round(w1, 6)) < 1e-6
        assert got[src] >= 0.0


def test_lexical_diversity_matches_pure_python(spark, sf_smoke):
    """x304: recompute Yule's K / Simpson / Herdan / TTR per source."""
    from social_warner_spark.queries.x24_series import x304_lexical_diversity

    got = {r.source: r for r in x304_lexical_diversity(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    for src, g in d.groupby("source"):
        f = Counter()
        for t in g["text"]:
            f.update(t.strip().split())
        n = sum(f.values())
        v = len(f)
        sq = sum(c * c for c in f.values())
        r = got[src]
        assert (r.n_tokens, r.vocab) == (n, v)
        assert abs(r.yule_k - round(1e4 * (sq - n) / (n * n), 6)) < 1e-5
        assert abs(
            r.simpson_d
            - round(sum(c * (c - 1) for c in f.values()) / (n * (n - 1)), 6)
        ) < 1e-6
        assert abs(r.herdan_c - round(math.log(v) / math.log(n), 6)) < 1e-6
        assert abs(r.ttr - round(v / n, 6)) < 1e-6
        assert 0.0 < r.herdan_c <= 1.0


def test_block_bootstrap_matches_pure_python(spark, sf_smoke):
    """x305: replay every replicate's deterministic block draw; the CI
    must bracket sensibly (lo <= hi) and match exactly."""
    from social_warner_spark.queries.x24_series import (
        BB_B,
        BB_L,
        x305_block_bootstrap,
    )

    r = x305_block_bootstrap(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    ys = ev.groupby("day")["value"].sum().round(6).sort_index().to_list()
    n = len(ys)
    means = []
    for b in range(1, BB_B + 1):
        picked = []
        for blk in range(math.ceil(n / BB_L)):
            h = hashlib.md5(f"bb|{b}#{blk}".encode()).hexdigest()
            u = int(h[:8], 16) / 4294967296.0
            s = int(u * n) + 1
            for off in range(BB_L):
                pos = blk * BB_L + off
                if pos < n:
                    t = (s - 1 + off) % n + 1
                    picked.append(ys[t - 1])
        means.append((round(sum(picked) / len(picked), 6), b))
    means.sort()
    lo = means[max(1, int(0.025 * BB_B)) - 1][0]
    hi = means[int(0.975 * BB_B) - 1][0]
    assert r.n_replicates == BB_B
    assert abs(r.ci_lo - lo) < 1e-6
    assert abs(r.ci_hi - hi) < 1e-6
    assert r.ci_lo <= r.ci_hi
    assert abs(r.observed_mean - round(sum(ys) / n, 6)) < 1e-6


def test_roc_youden_matches_exhaustive_scan(spark, sf_smoke):
    """x306: scan all thresholds; J must be the max, AUC in [0,1] and
    equal to the trapezoid recompute."""
    from social_warner_spark.queries.x24_series import (
        ROC_LANG,
        x306_roc_youden,
    )

    r = x306_roc_youden(spark, sf_smoke).collect()[0]
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    pts = sorted(
        zip(d["n_chars"], (d["lang"] == ROC_LANG).astype(int)),
        reverse=True,
    )
    npos = sum(y for _, y in pts)
    nneg = len(pts) - npos
    grouped = defaultdict(lambda: [0, 0])
    for x, y in pts:
        grouped[x][0] += 1
        grouped[x][1] += y
    tp = fp = 0
    best = None
    curve = [(0.0, 0.0)]
    for x in sorted(grouped, reverse=True):
        c, p = grouped[x]
        tp += p
        fp += c - p
        tpr, fpr = tp / npos, fp / nneg
        j = round(tpr - fpr, 6)
        if best is None or j > best[0] or (j == best[0] and x < best[1]):
            if best is None or j > best[0]:
                best = (j, x, tpr, fpr)
        curve.append((fpr, tpr))
    j, x, tpr, fpr = best
    assert r.threshold == x
    assert abs(r.youden_j - j) < 1e-6
    assert abs(r.tpr - round(tpr, 6)) < 1e-6
    assert abs(r.fpr - round(fpr, 6)) < 1e-6
    curve.sort()
    auc = sum(
        (b - a) * (tb + ta) / 2
        for (a, ta), (b, tb) in zip(curve, curve[1:])
    )
    assert abs(r.auc_trapezoid - round(auc, 6)) < 1e-5
    assert 0.0 <= r.auc_trapezoid <= 1.0
