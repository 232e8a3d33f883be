#!/usr/bin/env python
"""Interleaved A/B for x31 decon variants (r11 builder tool).

A = old shape (corpus re-scan + semi-join + re-shingle at n=4)
B = current tree (decon shingles from the persisted survivor set)

Alternating runs in ONE session so JIT/cache/host drift hits both arms;
per-run steal recorded.  Not driver contract.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import pyspark.sql.functions as F  # noqa: E402

from social_warner_spark.caching import register_persisted, release_persisted_intermediates  # noqa: E402
from social_warner_spark.operators.corpus import prepare_corpus  # noqa: E402
from social_warner_spark.operators.dedup import doc_shingles  # noqa: E402
from social_warner_spark.operators.ordered import with_grouped_cumsum  # noqa: E402
from social_warner_spark.queries.common import T  # noqa: E402
from social_warner_spark.session import get_spark  # noqa: E402


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _pack(clean):
    BUDGET = 512
    cum = with_grouped_cumsum(clean, ["lang"], ["doc_id"], {"_cum": "n_tokens"})
    start = (F.col("_cum") - F.col("n_tokens")).cast("long")
    return cum.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "quality",
        F.floor(start / BUDGET).cast("long").alias("pack_id"),
        (start % BUDGET).cast("long").alias("pack_offset"),
    )


def x31_old(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    prepared = register_persisted(prepare_corpus(docs).persist())
    probe_sh = (
        doc_shingles(docs.where(F.col("doc_id") < 5), n=4)
        .select("shingle")
        .distinct()
    )
    surv_docs = docs.join(prepared.select("doc_id"), "doc_id", "left_semi")
    contaminated = (
        doc_shingles(surv_docs, n=4)
        .join(F.broadcast(probe_sh), "shingle")
        .select("doc_id")
        .distinct()
    )
    clean = prepared.where(F.col("doc_id") >= 5).join(
        contaminated, "doc_id", "left_anti"
    )
    return _pack(clean)


def x31_new(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    prepared, surv4 = prepare_corpus(docs, decon_shingle_n=4)
    prepared = register_persisted(prepared.persist())
    probe_sh = (
        doc_shingles(docs.where(F.col("doc_id") < 5), n=4)
        .select("shingle")
        .distinct()
    )
    contaminated = (
        surv4.join(F.broadcast(probe_sh), "shingle").select("doc_id").distinct()
    )
    clean = prepared.where(F.col("doc_id") >= 5).join(
        contaminated, "doc_id", "left_anti"
    )
    return _pack(clean)


def main() -> None:
    runs = int(os.environ.get("SWS_PROFILE_RUNS", "7"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-x31")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    from social_warner_spark.catalog import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.agg(*[F.count(c) for c in df.columns]).collect()

    res = {"A_old": [], "B_new": []}
    stl = {"A_old": [], "B_new": []}
    for i in range(runs):
        for name, fn in (("A_old", x31_old), ("B_new", x31_new)):
            release_persisted_intermediates()
            spark.sparkContext.setJobDescription(f"x31 {name} run {i}")
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
