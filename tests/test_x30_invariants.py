"""Semantic invariants for the x30-series operators — independent
pure-Python recomputes plus definitional identities."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd


def _r6(v: float) -> float:
    """Half-up 6dp rounding (Spark/DuckDB ROUND semantics)."""
    return math.floor(v * 1e6 + 0.5) / 1e6 if v >= 0 else -math.floor(-v * 1e6 + 0.5) / 1e6


def test_join_advisor_matches_pure_python(spark, sf_smoke):
    """x332: recompute the width estimates from pandas; every small
    dimension must come out broadcastable at smoke scale."""
    from social_warner_spark.queries.x30_series import (
        BA_TABLES,
        BA_THRESHOLD,
        x332_join_advisor,
    )

    rows = {r.table_name: r for r in x332_join_advisor(spark, sf_smoke).collect()}
    for name, strcols, nnum in BA_TABLES:
        t = pd.read_parquet(f"{sf_smoke}/{name}.parquet")
        width = 8.0 * nnum + sum(
            t[c].str.len().mean() for c in strcols
        )
        r = rows[name]
        assert r.n_rows == len(t)
        assert abs(r.est_row_bytes - round(width, 2)) < 0.02
        assert r.est_bytes == math.ceil(len(t) * width)
        assert r.broadcastable == (r.est_bytes <= BA_THRESHOLD)
        assert r.broadcastable  # everything fits at smoke scale
    assert rows["region"].est_bytes < rows["lineitem"].est_bytes


def test_wilson_ci_matches_pure_python(spark, sf_smoke):
    """x333: recompute both intervals; Wilson must stay in [0,1] and
    contain p_hat."""
    from social_warner_spark.queries.x30_series import (
        WI_LANG,
        WI_Z,
        x333_wilson_ci,
    )

    rows = {r.source: r for r in x333_wilson_ci(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    for src, g in d.groupby("source"):
        n = len(g)
        p = (g["lang"] == WI_LANG).mean()
        z2 = WI_Z * WI_Z
        hw = WI_Z * math.sqrt(p * (1 - p) / n)
        cw = (p + z2 / (2 * n)) / (1 + z2 / n)
        hwil = (
            WI_Z
            / (1 + z2 / n)
            * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        )
        r = rows[src]
        assert r.n == n
        assert abs(r.p_hat - round(p, 6)) < 1e-6
        assert abs(r.wald_lo - round(p - hw, 6)) < 1e-6
        assert abs(r.wilson_lo - round(cw - hwil, 6)) < 1e-6
        assert abs(r.wilson_hi - round(cw + hwil, 6)) < 1e-6
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0
        assert r.wald_escapes_unit == (p - hw < 0 or p + hw > 1)


def test_shuffle_quality_matches_pure_python(spark, sf_smoke):
    """x334: replay shard assignment and both serial correlations."""
    from social_warner_spark.queries.x30_series import (
        SQ_SHARDS,
        WI_LANG,
        x334_shuffle_quality,
    )

    r = x334_shuffle_quality(spark, sf_smoke).collect()[0]
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet").sort_values(
        "doc_id"
    )
    ys = (d["lang"] == WI_LANG).astype(float).to_list()
    ids = d["doc_id"].to_list()
    hs = {
        i: int(hashlib.md5(f"sq|{i}".encode()).hexdigest()[:8], 16)
        for i in ids
    }
    shards = defaultdict(list)
    for i, y in zip(ids, ys):
        shards[hs[i] % SQ_SHARDS].append((hs[i], i, y))
    pairs = []
    for mem in shards.values():
        mem.sort()
        for (_, _, a), (_, _, b) in zip(mem, mem[1:]):
            pairs.append((b, a))
    sc = pd.DataFrame(pairs, columns=["y", "yl"])
    assert r.n_pairs_shuffled == len(pairs)
    assert abs(
        r.serial_corr_shuffled - round(sc["y"].corr(sc["yl"]), 6)
    ) < 1e-6
    bo = pd.DataFrame(
        {"y": ys[1:], "yl": ys[:-1]}
    )
    assert r.n_pairs_ordered == len(bo)
    assert abs(
        r.serial_corr_ordered - round(bo["y"].corr(bo["yl"]), 6)
    ) < 1e-6


def test_watermark_planner_matches_pure_python(spark, sf_smoke):
    """x335: replay the deterministic delays; the drop curve must be
    nonincreasing in the watermark."""
    from social_warner_spark.queries.x30_series import (
        WM_CANDIDATES,
        WM_MEAN_LATE_S,
        x335_watermark_planner,
    )

    rows = {r.watermark_min: r for r in x335_watermark_planner(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    delays = []
    for eid in ev["event_id"]:
        h = int(hashlib.md5(f"wm|{eid}".encode()).hexdigest()[:8], 16)
        u = (h + 1.0) / 4294967296.0
        delays.append(round(-WM_MEAN_LATE_S * math.log(u), 6))
    n = len(delays)
    prev = None
    for m in WM_CANDIDATES:
        frac = round(sum(d > m * 60.0 for d in delays) / n, 6)
        r = rows[m]
        assert r.n_events == n
        assert abs(r.late_fraction - frac) < 1e-6
        if prev is not None:
            assert r.late_fraction <= prev
        prev = r.late_fraction


def test_crosssource_dups_matches_pure_python(spark, sf_smoke):
    """x336: relabel the pair sample with sources; shares must sum
    to 1."""
    from social_warner_spark.operators.dedup import exact_jaccard_pairs
    from social_warner_spark.queries.common import T
    from social_warner_spark.queries.x30_series import (
        XS_THRESHOLD,
        x336_crosssource_dups,
    )

    rows = {(r.s1, r.s2): r for r in x336_crosssource_dups(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    src = dict(zip(d["doc_id"], d["source"]))
    pairs = exact_jaccard_pairs(
        T(spark, sf_smoke, "documents"), XS_THRESHOLD
    ).collect()
    want = defaultdict(list)
    for p in pairs:
        a, b = sorted([src[p.doc_id_a], src[p.doc_id_b]])
        want[(a, b)].append(p.jaccard)
    assert set(rows) == set(want)
    for k, js in want.items():
        r = rows[k]
        assert r.n_pairs == len(js)
        assert abs(r.avg_jaccard - _r6(sum(js) / len(js))) < 1e-6
        assert r.same_source == (k[0] == k[1])
    assert abs(sum(r.pair_share for r in rows.values()) - 1.0) < 1e-4
