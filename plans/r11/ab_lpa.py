#!/usr/bin/env python
"""Interleaved A/B for the x239 LPA round shape (r11 builder tool).

A = current lpa_fixed (votes groupBy(src,lbl) -> best groupBy(node) -> join)
B = single-exchange round: votes repartition(node) first, so the two
    aggregates and the labels join all reuse HashPartitioning(node)
C = B + edges persisted PRE-PARTITIONED by dst (round joins reuse it)

Per the r10 verdict task 6: the earlier ~7% reading was noise-bound; this
measures steal-clean interleaved runs in one session.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import pyspark.sql.functions as F  # noqa: E402

from social_warner_spark.caching import register_persisted, release_persisted_intermediates  # noqa: E402
from social_warner_spark.queries.common import T  # noqa: E402
from social_warner_spark.session import get_spark  # noqa: E402

LPA_ITERS = 3


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _graph(spark, sf_dir):
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    cust = T(spark, sf_dir, "customer").select((F.col("c_custkey") * 2).alias("node"))
    supp = T(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") * 2 + 1).alias("node")
    )
    nodes = cust.unionAll(supp)
    e0 = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return nodes, edges


def lpa_current(nodes, edges, iters=LPA_ITERS):
    from social_warner_spark.operators.graph import lpa_fixed

    return lpa_fixed(nodes, edges, iters)


def _lpa_single_exchange(nodes, edges, iters, prepart):
    ed = edges.repartition("dst") if prepart else edges
    ed = register_persisted(ed.persist())
    labels = nodes.select("node", F.col("node").alias("lbl"))
    for i in range(iters):
        if i == 0:
            votes = ed.groupBy(
                F.col("src").alias("node"), F.col("dst").alias("lbl")
            ).agg(F.count("*").alias("c"))
        else:
            votes = (
                ed.join(labels.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"), "lbl")
                .repartition("node")
                .groupBy("node", "lbl")
                .agg(F.count("*").alias("c"))
            )
        best = votes.groupBy("node").agg(
            F.min_by("lbl", F.struct(-F.col("c"), F.col("lbl"))).alias("new_lbl")
        )
        labels = register_persisted(
            labels.join(best, "node", "left")
            .select("node", F.coalesce(F.col("new_lbl"), F.col("lbl")).alias("lbl"))
            .persist()
        )
    return labels


def q(labels):
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count("*").alias("n_nodes")
    )


def main() -> None:
    runs = int(os.environ.get("SWS_PROFILE_RUNS", "7"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-lpa")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    from social_warner_spark.catalog import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.agg(*[F.count(c) for c in df.columns]).collect()

    variants = {
        "A_current": lambda n, e: lpa_current(n, e),
        "B_single_exch": lambda n, e: _lpa_single_exchange(n, e, LPA_ITERS, False),
        "C_single_prepart": lambda n, e: _lpa_single_exchange(n, e, LPA_ITERS, True),
    }
    # result equivalence first
    ref = None
    for name, fn in variants.items():
        nodes, edges = _graph(spark, sf_dir)
        got = {(r.community, r.n_nodes) for r in q(fn(nodes, edges)).collect()}
        release_persisted_intermediates()
        if ref is None:
            ref = got
        print(f"{name}: rows={len(got)} equal_to_A={got == ref}", flush=True)

    res = {k: [] for k in variants}
    stl = {k: [] for k in variants}
    for i in range(runs):
        for name, fn in variants.items():
            release_persisted_intermediates()
            spark.sparkContext.setJobDescription(f"lpa {name} run {i}")
            nodes, edges = _graph(spark, sf_dir)
            s0, t0 = steal(), time.perf_counter()
            q(fn(nodes, edges)).count()
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
