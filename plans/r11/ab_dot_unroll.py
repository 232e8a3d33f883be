#!/usr/bin/env python
"""Interleaved A/B: interpreted fold `dot` vs unrolled element_at chain
(r11 builder tool).  Arm B monkeypatches vectors.dot with an unrolled
64-term sum that reproduces the fold's exact operation order
(((0.0+t1)+t2)+...), so results must be bit-identical; all probed
queries score 64-dim embeddings.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import pyspark.sql.functions as F  # noqa: E402

from social_warner_spark.caching import release_persisted_intermediates  # noqa: E402
from social_warner_spark.functions import vectors  # noqa: E402
from social_warner_spark.queries import all_queries  # noqa: E402
from social_warner_spark.session import get_spark  # noqa: E402

DOT_FOLD = vectors.dot


def dot_unrolled64(a, b):
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    expr = F.lit(0.0)
    for i in range(1, 65):
        expr = expr + F.element_at(ad, i) * F.element_at(bd, i)
    return expr


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    runs = int(os.environ.get("SWS_PROFILE_RUNS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-dot")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    from social_warner_spark.catalog import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.agg(*[F.count(c) for c in df.columns]).collect()
    q = all_queries()
    names = ["x7_embed_neardup", "x229_margin_bitext_mining", "l3_topk_cosine"]

    # result equivalence at sf0.01 first (hash-sensitive values)
    for name in names:
        vectors.dot = DOT_FOLD
        a = {tuple(r) for r in q[name](spark, "/root/testdata/sf0.01").collect()}
        release_persisted_intermediates()
        vectors.dot = dot_unrolled64
        b = {tuple(r) for r in q[name](spark, "/root/testdata/sf0.01").collect()}
        release_persisted_intermediates()
        print(f"{name}: rows={len(a)} identical={a == b}", flush=True)
    vectors.dot = DOT_FOLD

    for name in names:
        res = {"A_fold": [], "B_unrolled": []}
        stl = {"A_fold": [], "B_unrolled": []}
        for i in range(runs):
            for arm, fn in (("A_fold", DOT_FOLD), ("B_unrolled", dot_unrolled64)):
                vectors.dot = fn
                release_persisted_intermediates()
                spark.sparkContext.setJobDescription(f"{name} {arm} run {i}")
                s0, t0 = steal(), time.perf_counter()
                q[name](spark, sf_dir).count()
                res[arm].append(round(time.perf_counter() - t0, 2))
                stl[arm].append(steal() - s0)
                release_persisted_intermediates()
        vectors.dot = DOT_FOLD
        for arm in res:
            clean = [t for t, s in zip(res[arm], stl[arm]) if s < 60]
            med = round(statistics.median(clean), 2) if clean else None
            print(
                f"{name} {arm}: clean_median {med} (n={len(clean)}) runs {res[arm]} steal {stl[arm]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
