"""Semantic invariants for the x16-series operators — full independent
pure-Python reimplementations (no Spark, no DuckDB) compared exactly,
plus the bounds each statistic must satisfy by definition."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pandas as pd


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _winnow_fps(text: str, w: int) -> set[str]:
    toks = text.strip().split()
    grams = [
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    ]
    hashes = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    return {
        min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)
    }


def test_winnowing_matches_pure_python(spark, sf_smoke):
    """x262: recompute every document's fingerprint set and every pair
    resemblance with hashlib; the ranked top-20 must agree row-for-row."""
    from social_warner_spark.queries.x16_series import (
        WIN_MAX_DF,
        WIN_TOPK,
        WIN_W,
        x262_winnowing_overlap,
    )

    got = x262_winnowing_overlap(spark, sf_smoke).collect()
    d = _docs(sf_smoke)
    fps = {
        i: _winnow_fps(t, WIN_W)
        for i, t in zip(d["doc_id"], d["text"])
        if len(t.strip().split()) >= 3
    }
    dfreq: dict[str, int] = defaultdict(int)
    for s in fps.values():
        for fp in s:
            dfreq[fp] += 1
    kept = {
        i: {fp for fp in s if dfreq[fp] <= WIN_MAX_DF}
        for i, s in fps.items()
    }
    pairs = []
    ids = sorted(kept)
    inv: dict[str, list[int]] = defaultdict(list)
    for i in ids:
        for fp in kept[i]:
            inv[fp].append(i)
    shared: dict[tuple[int, int], int] = defaultdict(int)
    for fp, docs in inv.items():
        docs.sort()
        for x in range(len(docs)):
            for y in range(x + 1, len(docs)):
                shared[(docs[x], docs[y])] += 1
    for (a, b), sh in shared.items():
        resem = round(sh / (len(fps[a]) + len(fps[b]) - sh), 6)
        pairs.append((a, b, sh, resem))
    pairs.sort(key=lambda t: (-t[3], t[0], t[1]))
    assert len(got) == min(WIN_TOPK, len(pairs))
    for row, want in zip(got, pairs):
        assert (row.a, row.b, row.shared_fps) == want[:3]
        assert abs(row.resemblance - want[3]) < 1e-6


def test_changepoint_matches_brute_force(spark, sf_smoke):
    """x263: scan every admissible split in Python; the argmin (and all
    its reported statistics) must agree, and the winning split must
    reduce SSE at least as much as any other split."""
    from social_warner_spark.queries.x16_series import (
        CP_MIN_SEG,
        x263_changepoint,
    )

    r = x263_changepoint(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    ys = ev.groupby("day")["value"].sum().round(6).sort_index()
    days, y = ys.index.to_list(), ys.to_list()
    n = len(y)

    def sse(seg):
        m = sum(seg) / len(seg)
        return sum((v - m) ** 2 for v in seg)

    best = None
    for s in range(CP_MIN_SEG, n - CP_MIN_SEG + 1):
        cost = round(sse(y[:s]) + sse(y[s:]), 6)
        if best is None or cost < best[0]:
            best = (cost, s)
    cost, s = best
    assert r.n_left == s and r.n_right == n - s
    assert r.split_day == days[s - 1]
    assert abs(r.sse_split - cost) < 1e-5
    assert abs(r.mean_left - round(sum(y[:s]) / s, 6)) < 1e-6
    assert abs(r.mean_right - round(sum(y[s:]) / (n - s), 6)) < 1e-6
    assert abs(r.sse_total - round(sse(y), 6)) < 1e-5
    assert 0.0 <= r.reduction <= 1.0


def test_permutation_test_matches_pure_python(spark, sf_smoke):
    """x264: replay the deterministic md5 relabeling for every
    replicate in Python; the p-value must agree exactly."""
    from social_warner_spark.queries.x16_series import (
        PERM_A,
        PERM_B,
        PERM_R,
        x264_permutation_test,
    )

    r = x264_permutation_test(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    two = ev[ev["event_type"].isin([PERM_A, PERM_B])]
    va = two[two["event_type"] == PERM_A]["value"]
    vb = two[two["event_type"] == PERM_B]["value"]
    diff_obs = round(va.mean() - vb.mean(), 6)
    assert (r.n_a, r.n_b) == (len(va), len(vb))
    assert abs(r.diff_obs - diff_obs) < 1e-6
    hits = 0
    rows = list(zip(two["event_id"], two["value"]))
    for rep in range(1, PERM_R + 1):
        g0, g1 = [], []
        for eid, val in rows:
            h = hashlib.md5(f"{eid}#{rep}".encode()).hexdigest()
            (g0 if int(h[:8], 16) % 2 == 0 else g1).append(val)
        dr = round(sum(g0) / len(g0) - sum(g1) / len(g1), 6)
        if abs(dr) >= abs(diff_obs):
            hits += 1
    assert abs(r.p_value - round((1 + hits) / (PERM_R + 1), 6)) < 1e-6
    assert 0.0 < r.p_value <= 1.0


def test_powerlaw_matches_pure_python(spark, sf_smoke):
    """x265: rebuild the co-purchase degree distribution and the
    discrete MLE in Python; alpha must agree and exceed 1."""
    from social_warner_spark.queries.x16_series import (
        PL_XMIN,
        x265_powerlaw_degree,
    )

    r = x265_powerlaw_degree(spark, sf_smoke).collect()[0]
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    nbrs: dict[int, set[int]] = defaultdict(set)
    for _, g in li.groupby("l_orderkey"):
        pks = sorted(set(g["l_partkey"]))
        for i in range(len(pks)):
            for j in range(i + 1, len(pks)):
                nbrs[pks[i]].add(pks[j])
                nbrs[pks[j]].add(pks[i])
    degs = [len(s) for s in nbrs.values()]
    tail = [d for d in degs if d >= PL_XMIN]
    sll = sum(math.log(d / (PL_XMIN - 0.5)) for d in tail)
    alpha = 1.0 + len(tail) / sll
    assert (r.n_nodes, r.max_degree, r.n_tail) == (
        len(degs),
        max(degs),
        len(tail),
    )
    assert abs(r.alpha - round(alpha, 6)) < 1e-6
    assert r.alpha > 1.0
    assert abs(r.alpha_se - round((alpha - 1) / math.sqrt(len(tail)), 6)) < 1e-6


def test_matryoshka_recall_invariants(spark, sf_smoke):
    """x266: the full-dim row must be exactly 1.0, every recall must be
    in [0,1], and a numpy brute-force recompute must agree per dim."""
    import numpy as np

    from social_warner_spark.queries.x16_series import (
        MAT_DIMS,
        MAT_PROBES,
        MAT_TOPK,
        x266_matryoshka_recall,
    )

    got = {r.dim: r.recall_at_10 for r in x266_matryoshka_recall(spark, sf_smoke).collect()}
    assert set(got) == set(MAT_DIMS)
    assert got[MAT_DIMS[-1]] == 1.0
    e = pd.read_parquet(f"{sf_smoke}/embeddings.parquet")
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for r in e.itertuples()}
    ids = sorted(vecs)

    def topk(dim):
        out = {}
        for p in range(MAT_PROBES):
            scores = []
            pv = vecs[p][:dim]
            pn = math.sqrt(float(pv @ pv))
            for c in ids:
                if c == p:
                    continue
                cv = vecs[c][:dim]
                cn = math.sqrt(float(cv @ cv))
                scores.append((round(float(pv @ cv) / (pn * cn), 6), c))
            scores.sort(key=lambda t: (-t[0], t[1]))
            out[p] = {c for _, c in scores[:MAT_TOPK]}
        return out

    full = topk(MAT_DIMS[-1])
    for dim in MAT_DIMS:
        tops = topk(dim)
        hits = sum(len(tops[p] & full[p]) for p in range(MAT_PROBES))
        want = round(hits / (MAT_PROBES * MAT_TOPK), 6)
        assert abs(got[dim] - want) < 1e-6
        assert 0.0 <= got[dim] <= 1.0
