"""Semantic invariants for the x34-series operators — independent
pure-Python recomputes plus the physical-design orderings each
advisor must reproduce."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd


def test_zorder_audit_ordering(spark, sf_smoke):
    """x352: day-major must be (near-)perfect for day filters,
    user-major worst, Z-order in between — and a pure-Python replay
    of the Morton interleave must agree."""
    from social_warner_spark.queries.x34_series import (
        ZO_BITS,
        x352_zorder_audit,
    )

    rows = {r.layout: r for r in x352_zorder_audit(spark, sf_smoke).collect()}
    assert rows["day_major"].avg_read_amp <= rows["zorder"].avg_read_amp + 1e-6
    assert rows["zorder"].avg_read_amp <= rows["user_major"].avg_read_amp + 1e-6
    # user-major interleaves every day through the whole key range
    assert rows["user_major"].avg_read_amp > 10 * rows["day_major"].avg_read_amp
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    d0 = ev["ts"].dt.floor("D").min()
    ds = (ev["ts"].dt.floor("D") - d0).dt.days
    us = ev["user_id"]

    def zval(u, d):
        z = 0
        for i in range(ZO_BITS):
            z += ((u >> i) & 1) << (2 * i)
            z += ((d >> i) & 1) << (2 * i + 1)
        return z

    zs = [zval(int(u), int(d)) for u, d in zip(us, ds)]
    rng = max(zs) - min(zs) + 1
    n = len(zs)
    per = defaultdict(list)
    for z, d in zip(zs, ds):
        per[int(d)].append(z)
    amps = [
        ((max(v) - min(v) + 1) / rng) / (len(v) / n)
        for v in per.values()
    ]
    assert abs(
        rows["zorder"].avg_read_amp - round(sum(amps) / len(amps), 6)
    ) < 1e-5


def test_salt_planner_matches_pure_python(spark, sf_smoke):
    """x353: replay the histogram and salting; post-salt max must not
    exceed the cap by more than rounding."""
    from social_warner_spark.queries.x34_series import (
        HOT_X,
        SALT_TOP,
        x353_salt_planner,
    )

    rows = x353_salt_planner(spark, sf_smoke).collect()
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    cnt = li["l_suppkey"].value_counts()
    mean_c = cnt.mean()
    cap = mean_c * HOT_X
    plans = {}
    for k, c in cnt.items():
        sf_ = math.ceil(c / cap) if c > cap else 1
        plans[k] = (c, sf_, math.ceil(c / sf_))
    want = sorted(plans.items(), key=lambda kv: (-kv[1][0], kv[0]))[
        :SALT_TOP
    ]
    assert len(rows) == min(SALT_TOP, len(want))
    max_after = max(v[2] for v in plans.values())
    for r, (k, (c, sf_, ma)) in zip(rows, want):
        assert (r.k, r.rows_before, r.salt_factor, r.max_after_key) == (
            k,
            c,
            sf_,
            ma,
        )
        assert r.max_after == max_after
        assert r.max_after_key <= cap + sf_  # cap respected modulo ceil
    assert rows[0].skew_reduction >= 1.0


def test_ivm_merge_all_match(spark, sf_smoke):
    """x354: the merge flag must be TRUE for every status — the
    distributive property this query exists to certify."""
    from social_warner_spark.queries.x34_series import x354_ivm_merge

    rows = x354_ivm_merge(spark, sf_smoke).collect()
    assert rows
    o = pd.read_parquet(f"{sf_smoke}/orders.parquet")
    assert len(rows) == o["o_orderstatus"].nunique()
    for r in rows:
        assert r.merge_matches
        assert r.m_cnt == r.f_cnt


def test_join_order_advisor_fk_exactness(spark, sf_smoke):
    """x355: on FK joins the Selinger estimate is near-exact (the
    divisor equals the referenced side's key count), so rel_error
    must be small."""
    from social_warner_spark.queries.x34_series import (
        x355_join_order_advisor,
    )

    rows = {r.join_step: r for r in x355_join_order_advisor(spark, sf_smoke).collect()}
    o = pd.read_parquet(f"{sf_smoke}/orders.parquet")
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    c = pd.read_parquet(f"{sf_smoke}/customer.parquet")
    a_co = o["o_custkey"].isin(set(c["c_custkey"])).sum()
    a_ol = li["l_orderkey"].isin(set(o["o_orderkey"])).sum()
    assert rows["customer_join_orders"].actual == a_co
    assert rows["orders_join_lineitem"].actual == a_ol
    for r in rows.values():
        assert r.rel_error < 0.25  # FK joins estimate well
        assert r.estimated > 0


def test_bloom_planner_matches_closed_form(spark, sf_smoke):
    """x356: recompute the fpp curve; it must be decreasing in the
    bits-per-key budget."""
    from social_warner_spark.queries.x34_series import (
        BF_BPKS,
        x356_bloom_planner,
    )

    rows = {r.bits_per_key: r for r in x356_bloom_planner(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    nk = ev["user_id"].nunique()
    prev = None
    for bpk in BF_BPKS:
        k = round(math.log(2) * bpk)
        fpp = (1 - math.exp(-k / bpk)) ** k
        r = rows[bpk]
        assert r.n_keys == nk
        assert r.filter_bits == nk * bpk
        assert r.n_hashes == k
        assert abs(r.fpp - round(fpp, 6)) < 1e-9
        if prev is not None:
            assert r.fpp < prev
        prev = r.fpp
