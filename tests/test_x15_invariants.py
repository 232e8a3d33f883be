"""Semantic invariants for the x15-series operators — full independent
pure-Python (pandas, no Spark/DuckDB) reimplementations compared
exactly, plus the bounds each statistic must satisfy by definition."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_spearman_matches_pandas_average_ranks(spark, sf_smoke):
    """x257: pandas rank(method='average') + Pearson-on-ranks must agree
    with the distinct-value cumulative-rank formulation to 6dp."""
    from social_warner_spark.queries.x15_series import x257_spearman_quality

    r = x257_spearman_quality(spark, sf_smoke).collect()[0]
    d = _docs(sf_smoke)
    a = d["text"].str.strip().str.split().str.len()
    b = d["n_chars"]
    rho = a.rank(method="average").corr(b.rank(method="average"))
    assert r.n_docs == len(d)
    assert abs(r.spearman_rho - round(rho, 6)) < 1e-6
    assert abs(r.pearson_r - round(a.corr(b), 6)) < 1e-6
    assert -1.0 <= r.spearman_rho <= 1.0


def test_kendall_matches_pure_python(spark, sf_smoke):
    """x258: brute-force O(k^2) tau-b over the per-source aggregates."""
    from social_warner_spark.queries.x15_series import x258_kendall_sources

    r = x258_kendall_sources(spark, sf_smoke).collect()[0]
    d = _docs(sf_smoke)
    d = d.assign(toks=d["text"].str.strip().str.split().str.len())
    pts = []
    for src, g in d.groupby("source"):
        share = round(g["lang"].value_counts().max() / len(g), 6)
        pts.append((int(g["toks"].sum()), share))
    c = disc = t1 = t2 = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                disc += 1
            if dx == 0:
                t1 += 1
            if dy == 0:
                t2 += 1
    n0 = len(pts) * (len(pts) - 1) // 2
    assert (r.n_sources, r.n_pairs) == (len(pts), n0)
    assert (r.concordant, r.discordant) == (c, disc)
    tau = (c - disc) / math.sqrt((n0 - t1) * (n0 - t2))
    assert abs(r.tau_b - round(tau, 6)) < 1e-6
    assert -1.0 <= r.tau_b <= 1.0


def test_adamic_adar_matches_brute_force(spark, sf_smoke):
    """x259: recompute every capped AA score from adjacency sets in
    Python; the ranked top-20 must agree row-for-row."""
    from social_warner_spark.queries.x15_series import (
        AA_MAX_DEG,
        AA_TOPK,
        x259_adamic_adar,
    )

    got = x259_adamic_adar(spark, sf_smoke).collect()
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    nbrs: dict[int, set[int]] = defaultdict(set)
    for _, g in li.groupby("l_orderkey"):
        pks = sorted(set(g["l_partkey"]))
        for i in range(len(pks)):
            for j in range(i + 1, len(pks)):
                nbrs[pks[i]].add(pks[j])
                nbrs[pks[j]].add(pks[i])
    scores: dict[tuple[int, int], float] = defaultdict(float)
    commons: dict[tuple[int, int], int] = defaultdict(int)
    for z, ns in nbrs.items():
        if len(ns) > AA_MAX_DEG:
            continue
        ns_sorted = sorted(ns)
        for i in range(len(ns_sorted)):
            for j in range(i + 1, len(ns_sorted)):
                pair = (ns_sorted[i], ns_sorted[j])
                scores[pair] += 1.0 / math.log(len(ns))
                commons[pair] += 1
    pred = [
        (a, b, commons[(a, b)], round(s, 6))
        for (a, b), s in scores.items()
        if b not in nbrs[a]
    ]
    pred.sort(key=lambda t: (-t[3], t[0], t[1]))
    assert len(got) == min(AA_TOPK, len(pred))
    for row, want in zip(got, pred):
        assert (row.a, row.b, row.common_neighbors) == want[:3]
        assert abs(row.score - want[3]) < 1e-6


def test_t_closeness_matches_pandas(spark, sf_smoke):
    """x260: recompute per-class ordered EMD from the band
    distributions; every EMD must land in [0, 1]."""
    from social_warner_spark.queries.x15_series import (
        TCLOSE_BAND,
        TCLOSE_T,
        x260_t_closeness,
    )

    got = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in x260_t_closeness(spark, sf_smoke).collect()
    }
    c = pd.read_parquet(f"{sf_smoke}/customer.parquet")
    c = c.assign(band=(c["c_acctbal"] / TCLOSE_BAND).apply(math.floor))
    bands = sorted(c["band"].unique())
    gdist = c["band"].value_counts(normalize=True)
    n_classes = 0
    for (nat, seg), g in c.groupby(["c_nationkey", "c_mktsegment"]):
        n_classes += 1
        p = g["band"].value_counts(normalize=True)
        cum = emd = 0.0
        for band in bands:
            cum += p.get(band, 0.0) - gdist.get(band, 0.0)
            emd += abs(cum)
        emd = round(emd / (len(bands) - 1), 6)
        row = got[(nat, seg)]
        assert row.k == len(g)
        assert abs(row.emd - emd) < 1e-6
        assert 0.0 <= row.emd <= 1.0
        assert row.t_close_ok == (row.emd <= TCLOSE_T)
    assert len(got) == n_classes


def test_acf_matches_pure_python(spark, sf_smoke):
    """x261: replay the ACF + cumulative Ljung-Box recursion in plain
    Python over the pandas daily grid; every acf must be in [-1, 1] and
    Q must be nondecreasing in lag."""
    from social_warner_spark.queries.x15_series import (
        ACF_MAX_LAG,
        x261_acf_ljung_box,
    )

    got = x261_acf_ljung_box(spark, sf_smoke).collect()
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    ys = ev.groupby("day")["value"].sum().round(6).sort_index().to_list()
    n = len(ys)
    mu = sum(ys) / n
    cen = [y - mu for y in ys]
    den = sum(x * x for x in cen)
    q = 0.0
    assert len(got) == ACF_MAX_LAG
    for row in got:
        k = row.lag
        r = round(
            sum(cen[t] * cen[t + k] for t in range(n - k)) / den, 6
        )
        q += r * r / (n - k)
        assert abs(row.acf - r) < 1e-6
        assert -1.0 <= row.acf <= 1.0
        assert abs(row.ljung_box_q - round(n * (n + 2) * q, 6)) < 1e-6
    qs = [row.ljung_box_q for row in got]
    assert qs == sorted(qs)
