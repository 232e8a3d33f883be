"""Semantic invariants for the x36-series operators — independent
pure-Python recomputes plus guarantee audits."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd


def test_dedup_waterfall_matches_pure_python(spark, sf_smoke):
    """x362: replay exact keep and verify monotone survivor counts;
    exact stage must match a set-based recompute."""
    from social_warner_spark.queries.x36_series import x362_dedup_waterfall

    rows = {r.stage: r for r in x362_dedup_waterfall(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    toks = {
        i: len(t.strip().split()) for i, t in zip(d["doc_id"], d["text"])
    }
    keep = {}
    for i, t in zip(d["doc_id"], d["text"]):
        h = t.strip().lower()
        if h not in keep or i < keep[h]:
            keep[h] = i
    survivors = set(keep.values())
    r1 = rows[1]
    assert r1.docs_surviving == len(survivors)
    assert r1.docs_removed == len(d) - len(survivors)
    t0 = sum(toks.values())
    t1 = sum(toks[i] for i in survivors)
    assert abs(r1.token_survival - round(t1 / t0, 6)) < 1e-6
    r2 = rows[2]
    assert r2.docs_surviving <= r1.docs_surviving
    assert r2.token_survival <= r1.token_survival + 1e-9


def test_chunking_planner_matches_pure_python(spark, sf_smoke):
    """x363: replay the closed forms; redundancy >= 1 and increases
    as chunks shrink (more overlap boundaries)."""
    from social_warner_spark.queries.x36_series import (
        CK_SIZES,
        x363_chunking_planner,
    )

    rows = {r.chunk_size: r for r in x363_chunking_planner(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    lens = [len(t.strip().split()) for t in d["text"]]
    for cs in CK_SIZES:
        stride = cs // 2
        nch = emitted = tails = 0
        for nt in lens:
            k = 1 if nt <= cs else 1 + math.ceil((nt - cs) / stride)
            last = nt - stride * (k - 1)
            nch += k
            emitted += (k - 1) * cs + last
            tails += int(last < cs / 2)
        r = rows[cs]
        assert r.n_chunks == nch
        assert r.emitted_tokens == emitted
        assert abs(r.redundancy - round(emitted / sum(lens), 6)) < 1e-6
        assert r.redundancy >= 1.0
        assert abs(
            r.tail_waste_share - round(tails / len(lens), 6)
        ) < 1e-6


def test_temperature_scaling_matches_pure_python(spark, sf_smoke):
    """x364: recompute NLL per temperature; exactly one is_best and
    it attains the minimum NLL."""
    from social_warner_spark.queries.x36_series import (
        TS_GRID,
        TS_LANG,
        x364_temperature_scaling,
    )

    rows = {r.temperature: r for r in x364_temperature_scaling(spark, sf_smoke).collect()}
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    s = d["n_chars"].astype(float)
    lo, hi = s.min(), s.max()
    eps = 1e-6
    p0 = ((s - lo) / (hi - lo)).clip(eps, 1 - eps)
    z = (p0 / (1 - p0)).apply(math.log)
    y = (d["lang"] == TS_LANG).astype(float)
    nlls = {}
    for tt in TS_GRID:
        p = 1 / (1 + (-z / tt).apply(math.exp))
        nll = -(y * p.apply(math.log) + (1 - y) * (1 - p).apply(math.log)).mean()
        nlls[tt] = round(nll, 6)
        assert abs(rows[tt].nll - nlls[tt]) < 1e-5
        assert rows[tt].ece >= 0.0
    best = min(nlls.values())
    flags = [t for t, r in rows.items() if r.is_best]
    assert len(flags) == 1
    assert nlls[flags[0]] == best


def test_behavioral_unicity_matches_pure_python(spark, sf_smoke):
    """x365: replay fingerprints; unicity is nondecreasing in n."""
    from social_warner_spark.queries.x36_series import (
        BU_NS,
        x365_behavioral_unicity,
    )

    rows = {r.ngram: r for r in x365_behavioral_unicity(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    seqs = [
        "".join(t[0] for t in g["event_type"])
        for _, g in ev.groupby("user_id")
    ]
    prev = None
    for n in BU_NS:
        fps = Counter()
        cnt = 0
        for s in seqs:
            if len(s) < n:
                continue
            cnt += 1
            grams = sorted({s[i : i + n] for i in range(len(s) - n + 1)})
            fps[hashlib.md5("|".join(grams).encode()).hexdigest()] += 1
        uniq = sum(1 for c in fps.values() if c == 1)
        r = rows[n]
        assert r.n_users == cnt
        assert r.n_unique == uniq
        assert abs(r.unicity - round(uniq / cnt, 6)) < 1e-6
        if prev is not None:
            assert r.unicity >= prev - 1e-9
        prev = r.unicity


def test_behavioral_unicity_cap_bites_and_oracle_mirrors(spark, tmp_path):
    """x365's BU_CAP contract on a >cap user (the x318 bite-test
    pattern): user 1's only purchase sits beyond event BU_CAP, so the
    capped fingerprint ("v"*512 initials) collides with user 2's exact
    512-view stream — n_unique must be 0 at every n.  Uncapped, user
    1's purchase-bearing n-grams would make both users unique, so a
    broken cap on EITHER engine flips the result; Spark and the DuckDB
    oracle must also agree row-for-row on the same parquet."""
    import duckdb

    from social_warner_spark.queries.x36_series import (
        BU_CAP,
        BU_NS,
        ORACLES,
        x365_behavioral_unicity,
    )

    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(BU_CAP):
        rows.append((1, base + pd.Timedelta(seconds=i), i, "view"))
    rows.append((1, base + pd.Timedelta(seconds=9_999), 9_999, "purchase"))
    for i in range(BU_CAP):
        rows.append((2, base + pd.Timedelta(seconds=i), 20_000 + i, "view"))
    pd.DataFrame(
        rows, columns=["user_id", "ts", "event_id", "event_type"]
    ).to_parquet(tmp_path / "events.parquet", index=False)

    got = {
        r.ngram: r
        for r in x365_behavioral_unicity(spark, str(tmp_path)).collect()
    }
    for n in BU_NS:
        assert got[n].n_users == 2
        assert got[n].n_unique == 0, f"cap leaked at n={n}"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    want = con.execute(ORACLES["x365_behavioral_unicity"]).fetchall()
    spark_rows = sorted(
        (r.ngram, r.n_users, r.n_unique, r.unicity) for r in got.values()
    )
    assert spark_rows == sorted(tuple(r) for r in want)


def test_winnowing_density_near_theory(spark, sf_smoke):
    """x366: replay per-doc densities; the observed mean must sit
    within 50% of the 2/(w+1) theory (distinct-fingerprint collapsing
    pulls it below) and every density is in (0, 1]."""
    from social_warner_spark.queries.x16_series import WIN_W
    from social_warner_spark.queries.x36_series import (
        x366_winnowing_density,
    )

    r = x366_winnowing_density(spark, sf_smoke).collect()[0]
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    dens = []
    for t in d["text"]:
        toks = t.strip().split()
        grams = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        if len(grams) < WIN_W:
            continue
        hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        fps = {
            min(hs[i : i + WIN_W])
            for i in range(len(hs) - WIN_W + 1)
        }
        dens.append(len(fps) / len(grams))
    assert r.n_docs == len(dens)
    assert abs(r.observed_density - round(sum(dens) / len(dens), 6)) < 1e-6
    theory = 2.0 / (WIN_W + 1)
    assert 0.5 * theory < r.observed_density < 1.5 * theory
    assert abs(r.ratio - round(r.observed_density / theory, 5)) < 1e-4
