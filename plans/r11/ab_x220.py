#!/usr/bin/env python
"""Interleaved A/B for the x220 PQ fit/encode shapes (r11 builder tool).

A = r10 shape: Lloyd means via posexplode + groupBy(sub,code,pos) +
    groupBy(sub,code) collect_list; encode via _pq_assign (groupBy(id,sub)
    min_by) + groupBy(id) collect_list.
B = r11 tree: one per-position-avg aggregate for the means; encode fused
    into one groupBy(id) with per-subspace min(CASE WHEN ...) aggregates.

Both arms run the FULL x220 pipeline (fit -> encode -> LUT -> ADC ->
re-rank) in one session, alternating, with per-run steal.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from social_warner_spark.caching import register_persisted, release_persisted_intermediates  # noqa: E402
from social_warner_spark.operators.similarity import (  # noqa: E402
    _l2sq,
    _pq_assign,
    _subvectors,
)
from social_warner_spark.queries.common import T  # noqa: E402
from social_warner_spark.session import get_spark  # noqa: E402

M, K, SUBLEN, ITERS, RERANK, TOPK = 16, 16, 4, 1, 50, 5


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def pq_codebooks_old(corpus, m, k, sublen, iters, vec_col="embedding", id_col="vec_id"):
    w = Window.partitionBy("sub").orderBy("sid")
    seeds = _subvectors(
        corpus.orderBy(id_col).limit(k), m, sublen, vec_col, id_col, "sid"
    ).select(
        "sub", (F.row_number().over(w) - 1).alias("code"), F.col("sv").alias("cw")
    )
    subs = _subvectors(corpus, m, sublen, vec_col, id_col, id_col)
    books = seeds
    for _ in range(iters):
        assigned = _pq_assign(subs, books, sublen)
        books = (
            assigned.select("sub", "code", F.posexplode("sv"))
            .groupBy("sub", "code", "pos")
            .agg(F.round(F.avg("col"), 6).alias("mv"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                    lambda x: x["mv"],
                ).alias("cw")
            )
        )
    return books


def pq_encode_old(corpus, books, m, sublen, vec_col="embedding", id_col="vec_id"):
    subs = _subvectors(corpus, m, sublen, vec_col, id_col, id_col)
    assigned = _pq_assign(subs, books, sublen)
    return assigned.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))), lambda x: x["code"]
        ).alias("codes")
    )


def tail_search(corpus, probes, books, codes, k, m, ncode, sublen, rerank,
                vec_col="embedding", id_col="vec_id"):
    luts = (
        _subvectors(probes, m, sublen, vec_col, id_col, "probe_id")
        .join(F.broadcast(books), "sub")
        .select(
            "probe_id",
            (F.col("sub") * ncode + F.col("code")).alias("slot"),
            F.round(_l2sq(F.col("sv"), F.col("cw"), sublen), 6).alias("pd"),
        )
        .groupBy("probe_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("slot", "pd"))).alias("lut"))
    )
    dist = F.round(
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, s: acc
            + F.element_at(F.col("lut"), s * ncode + F.element_at(F.col("codes"), s + 1)),
        ),
        6,
    )
    scored = (
        codes.join(F.broadcast(luts), F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("adist", dist)
        .select("probe_id", "neighbor_id", "adist")
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("adist"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("srk", F.row_number().over(w))
        .where(F.col("srk") <= rerank)
        .select("probe_id", "neighbor_id")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vc"),
    )
    pv = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("vp"),
    )
    exact = (
        cv.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(pv), "probe_id")
        .withColumn("edist", F.round(_l2sq(F.col("vp"), F.col("vc"), m * sublen), 6))
    )
    we = Window.partitionBy("probe_id").orderBy(F.asc("edist"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rk", F.row_number().over(we))
        .where(F.col("rk") <= k)
        .select("probe_id", "neighbor_id", "edist", "rk")
    )


def x220_old(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 10)
    books = register_persisted(
        pq_codebooks_old(emb, M, K, SUBLEN, ITERS).persist()
    )
    codes = pq_encode_old(emb, books, M, SUBLEN).select(
        F.col("vec_id").alias("neighbor_id"), "codes"
    )
    return tail_search(emb, probes, books, codes, TOPK, M, K, SUBLEN, RERANK)


def x220_new(spark, sf_dir):
    from social_warner_spark.queries.x13_series import x220_pq_ann

    return x220_pq_ann(spark, sf_dir)


def main() -> None:
    runs = int(os.environ.get("SWS_PROFILE_RUNS", "7"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-x220")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    from social_warner_spark.catalog import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.agg(*[F.count(c) for c in df.columns]).collect()

    variants = {"A_old": x220_old, "B_new": x220_new}
    ref = None
    for name, fn in variants.items():
        got = {tuple(r) for r in fn(spark, sf_dir).collect()}
        release_persisted_intermediates()
        if ref is None:
            ref = got
        print(f"{name}: rows={len(got)} equal_to_A={got == ref}", flush=True)

    res = {k: [] for k in variants}
    stl = {k: [] for k in variants}
    for i in range(runs):
        for name, fn in variants.items():
            release_persisted_intermediates()
            spark.sparkContext.setJobDescription(f"x220 {name} run {i}")
            s0, t0 = steal(), time.perf_counter()
            fn(spark, sf_dir).count()
            res[name].append(round(time.perf_counter() - t0, 2))
            stl[name].append(steal() - s0)
            release_persisted_intermediates()
    for name in res:
        clean = [t for t, s in zip(res[name], stl[name]) if s < 60]
        med = round(statistics.median(clean), 2) if clean else None
        print(
            f"{name}: clean_median {med} (n={len(clean)}) runs {res[name]} steal {stl[name]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
