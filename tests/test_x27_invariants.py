"""Semantic invariants for the x27-series operators — independent
pure-Python recomputes plus definitional identities."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd


def test_burn_rate_matches_pure_python(spark, sf_smoke):
    """x317: replay the hourly grid and both trailing windows; every
    emitted hour must satisfy both burn conditions."""
    from social_warner_spark.queries.x27_series import (
        BURN_LONG_H,
        BURN_LONG_X,
        BURN_SHORT_X,
        SLO_BUDGET,
        x317_burn_rate,
    )

    out = x317_burn_rate(spark, sf_smoke).collect()
    rows = {r.hour: r for r in out}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["hour"] = ev["ts"].dt.floor("h")
    g = ev.groupby("hour").agg(
        n=("event_id", "size"),
        e=("event_type", lambda t: (t == "error").sum()),
    )
    hs = {int(h.timestamp() // 3600): (r.n, r.e) for h, r in g.iterrows()}
    burns = {}
    for h, (n, e) in hs.items():
        n1 = e1 = n6 = e6 = 0
        for back in range(BURN_LONG_H):
            if h - back in hs:
                nn, ee = hs[h - back]
                n6 += nn
                e6 += ee
                if back == 0:
                    n1, e1 = nn, ee
        burns[h] = (round(e1 / n1 / SLO_BUDGET, 6), round(e6 / n6 / SLO_BUDGET, 6))
    want = sorted(
        burns.items(), key=lambda kv: (-kv[1][0], -kv[1][1], kv[0])
    )[:10]
    assert len(out) == min(10, len(burns))
    for r, (h, (b1, b6)) in zip(out, want):
        assert int(pd.Timestamp(r.hour).timestamp() // 3600) == h
        assert abs(r.burn_1h - b1) < 1e-6
        assert abs(r.burn_6h - b6) < 1e-6
        assert r.alert == (b1 > BURN_SHORT_X and b6 > BURN_LONG_X)


def test_sequence_pattern_matches_pure_python(spark, sf_smoke):
    """x318: rebuild per-user initials strings and re-run the same
    regexes with Python's engine."""
    from social_warner_spark.queries.x27_series import (
        SEQ_PATTERNS,
        x318_sequence_pattern,
    )

    got = {r.pattern: r for r in x318_sequence_pattern(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    seqs = [
        "".join(t[0] for t in g["event_type"])
        for _, g in ev.groupby("user_id")
    ]
    for name, pat in SEQ_PATTERNS:
        cs = [len(re.findall(pat, s)) for s in seqs]
        r = got[name]
        assert r.n_users_matched == sum(1 for c in cs if c > 0)
        assert r.total_matches == sum(cs)
        denom = max(1, sum(1 for c in cs if c > 0))
        assert abs(r.matches_per_user - round(sum(cs) / denom, 6)) < 1e-6


def test_sequence_pattern_cap_bites_and_oracle_mirrors(spark, tmp_path):
    """x318's SEQ_CAP contract on a >cap user: the driver testdata never
    exceeds 512 events/user, so this synthesizes the case — a power user
    whose only purchase sits BEYOND the first 512 events (capped journey
    has no 'p', so view_to_purchase must NOT match) plus a control user
    converting within the cap.  Spark and the DuckDB oracle must agree
    row-for-row on the same parquet, proving the cap is mirrored."""
    import duckdb

    from social_warner_spark.queries.x27_series import (
        ORACLES,
        SEQ_CAP,
        x318_sequence_pattern,
    )

    base = pd.Timestamp("2024-01-01", tz=None)
    rows = []
    # power user 1: SEQ_CAP+87 views, then the purchase — outside the cap
    for i in range(SEQ_CAP + 87):
        rows.append((1, base + pd.Timedelta(seconds=i), i, "view"))
    rows.append((1, base + pd.Timedelta(seconds=10_000), 10_000, "purchase"))
    # control user 2: view -> click -> purchase, all inside the cap
    for i, et in enumerate(["view", "click", "purchase"]):
        rows.append((2, base + pd.Timedelta(seconds=i), 20_000 + i, et))
    pd.DataFrame(
        rows, columns=["user_id", "ts", "event_id", "event_type"]
    ).to_parquet(tmp_path / "events.parquet", index=False)

    got = {
        r.pattern: r
        for r in x318_sequence_pattern(spark, str(tmp_path)).collect()
    }
    # the cap bit: only the control user converts
    assert got["view_to_purchase"].n_users_matched == 1
    assert got["view_to_purchase"].total_matches == 1

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    want = con.execute(ORACLES["x318_sequence_pattern"]).fetchall()
    spark_rows = sorted(
        (r.pattern, r.n_users_matched, r.total_matches, r.matches_per_user)
        for r in got.values()
    )
    assert spark_rows == sorted(tuple(r) for r in want)


def test_simhash_audit_matches_pure_python(spark, sf_smoke):
    """x319: recompute fingerprints and hamming distances; the
    fidelity direction (dup pairs closer in hamming) must hold."""
    import hashlib

    from social_warner_spark.operators.dedup import exact_jaccard_pairs
    from social_warner_spark.queries.common import T
    from social_warner_spark.queries.x27_series import (
        SH_BITS,
        SH_SAMPLE_MIN,
        x319_simhash_audit,
    )

    r = x319_simhash_audit(spark, sf_smoke).collect()[0]
    d = pd.read_parquet(f"{sf_smoke}/documents.parquet")

    def fp(text):
        toks = set(text.split(" "))
        bits = []
        for j in range(SH_BITS):
            s = sum(
                1 if hashlib.md5(t.encode()).hexdigest()[j] >= "8" else -1
                for t in toks
            )
            bits.append("1" if s > 0 else "0")
        return "".join(bits)

    fps = {i: fp(t) for i, t in zip(d["doc_id"], d["text"])}
    pairs = exact_jaccard_pairs(
        T(spark, sf_smoke, "documents"), SH_SAMPLE_MIN
    ).collect()
    hams, jacs = [], []
    for p in pairs:
        h = sum(
            a != b for a, b in zip(fps[p.doc_id_a], fps[p.doc_id_b])
        )
        hams.append(h)
        jacs.append(p.jaccard)
    assert r.n_pairs == len(pairs)
    dup = [h for h, j in zip(hams, jacs) if j >= 0.5]
    non = [h for h, j in zip(hams, jacs) if j < 0.5]
    if dup:
        assert abs(r.mean_ham_dup - round(sum(dup) / len(dup), 6)) < 1e-6
    if non:
        assert abs(
            r.mean_ham_nondup - round(sum(non) / len(non), 6)
        ) < 1e-6
    if dup and non:
        assert r.mean_ham_dup <= r.mean_ham_nondup  # fidelity direction
    assert -1.0 <= r.pearson_r <= 1.0


def test_feature_mi_matches_pure_python(spark, sf_smoke):
    """x320: recompute MI from the binned contingency; 0 <= MI <=
    min(H(bins), H(type)) and NMI in [0,1]."""
    from social_warner_spark.queries.x27_series import (
        MI_BINS,
        x320_feature_mi,
    )

    r = x320_feature_mi(spark, sf_smoke).collect()[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    cuts = [
        round(ev["value"].quantile(i / MI_BINS, interpolation="linear"), 6)
        for i in range(1, MI_BINS)
    ]
    cells = Counter()
    for t, v in zip(ev["event_type"], ev["value"]):
        b = 1 + sum(v > c for c in cuts)
        cells[(b, t)] += 1
    n = sum(cells.values())
    pb = Counter()
    pt = Counter()
    for (b, t), c in cells.items():
        pb[b] += c
        pt[t] += c
    mi = sum(
        c / n * math.log2(c * n / (pb[b] * pt[t]))
        for (b, t), c in cells.items()
    )
    ht = -sum(c / n * math.log2(c / n) for c in pt.values())
    assert r.n_events == n
    assert abs(r.mi_bits - round(mi, 6)) < 1e-6
    assert abs(r.h_type_bits - round(ht, 6)) < 1e-6
    assert -1e-9 <= r.mi_bits <= ht + 1e-9
    assert 0.0 <= r.nmi <= 1.0


def test_bitemporal_matches_pure_python(spark, sf_smoke):
    """x321: replay the amendment ledger and the as-known-at pick;
    amendments posted after the cutoff must be invisible."""
    from social_warner_spark.queries.x27_series import (
        BT_AS_OF,
        BT_LAG_DAYS,
        BT_MOD,
        BT_UPLIFT,
        x321_bitemporal_asof,
    )

    rows = {r.order_year: r for r in x321_bitemporal_asof(spark, sf_smoke).collect()}
    o = pd.read_parquet(f"{sf_smoke}/orders.parquet")
    cutoff = pd.Timestamp(BT_AS_OF)
    per = defaultdict(lambda: [0, 0, 0.0])
    for k, dte, price in zip(
        o["o_orderkey"], o["o_orderdate"], o["o_totalprice"]
    ):
        d = pd.Timestamp(dte)
        if d > cutoff:
            continue
        amended = (
            k % BT_MOD == 0
            and d + pd.Timedelta(days=BT_LAG_DAYS) <= cutoff
        )
        p = round(float(price) * BT_UPLIFT, 2) if amended else float(price)
        y = d.year
        per[y][0] += 1
        per[y][1] += int(amended)
        per[y][2] += p
    assert set(rows) == set(per)
    for y, (n, na, rev) in per.items():
        r = rows[y]
        assert (r.n_orders, r.n_amended_visible) == (n, na)
        assert abs(r.revenue_as_known - round(rev, 2)) < 0.05
    # visibility boundary: any year fully after the cutoff-lag has no
    # visible amendments
    for y, r in rows.items():
        if y > cutoff.year:
            assert r.n_amended_visible == 0
