#!/usr/bin/env python
"""x170 BPE phase breakdown (r11 builder tool, r10 verdict task 8).

Times, per round: (a) the pair-count pass (split + explode + groupBy +
TakeOrdered) and (b) the merged-sequence materialization (replace +
persist).  The batched two-merge variant would replace two count passes
with ONE pass that also counts trigrams and 4-grams (~3x the explode
rows) plus correction-table algebra; whether that can win is decided by
the a:b ratio measured here.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import pyspark.sql.functions as F  # noqa: E402

from social_warner_spark.caching import register_persisted, release_persisted_intermediates  # noqa: E402
from social_warner_spark.operators.tokenizer import MERGE_SEP  # noqa: E402
from social_warner_spark.functions.text import tokens  # noqa: E402
from social_warner_spark.queries.common import T  # noqa: E402
from social_warner_spark.session import get_spark  # noqa: E402


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = 5
    spark = get_spark(app_name="phase-x170")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    from social_warner_spark.catalog import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.agg(*[F.count(c) for c in df.columns]).collect()

    for rep in range(3):
        docs = T(spark, sf_dir, "documents")
        toks = tokens(F.col("text"))
        seq = docs.where(F.trim(F.col("text")) != "").select(
            F.col("doc_id").alias("_id"),
            F.concat(F.lit("||"), F.concat_ws("||", toks), F.lit("||")).alias("s"),
        )
        tot0 = time.perf_counter()
        for r in range(1, rounds + 1):
            s0, t0 = steal(), time.perf_counter()
            seq = register_persisted(seq.persist())
            seq.count()  # materialize the sequence relation
            t_mat = time.perf_counter() - t0
            s1, t1 = steal(), time.perf_counter()
            t = F.split(F.btrim(F.col("s"), F.lit("|")), r"\|\|")
            staged = seq.select(t.alias("t"))
            ex = staged.select(
                "t",
                F.explode(
                    F.when(
                        F.size("t") >= 2, F.sequence(F.lit(1), F.size("t") - 1)
                    ).otherwise(F.array().cast("array<int>"))
                ).alias("i"),
            )
            pairs = ex.select(
                F.element_at("t", F.col("i")).alias("p1"),
                F.element_at("t", F.col("i") + 1).alias("p2"),
            )
            best = register_persisted(
                pairs.groupBy("p1", "p2")
                .agg(F.count("*").alias("n"))
                .orderBy(F.desc("n"), "p1", "p2")
                .limit(1)
                .persist()
            )
            best.count()  # materialize the round's rule
            t_cnt = time.perf_counter() - t1
            s2 = steal()
            pat = F.concat(F.lit("|"), F.col("p1"), F.lit("||"), F.col("p2"), F.lit("|"))
            rep_ = F.concat(
                F.lit("|"), F.col("p1"), F.lit(MERGE_SEP), F.col("p2"), F.lit("|")
            )
            seq = seq.crossJoin(F.broadcast(best.select("p1", "p2"))).select(
                "_id", F.replace(F.col("s"), pat, rep_).alias("s")
            )
            print(
                f"rep{rep} round {r}: materialize {t_mat:.2f}s (steal {s1 - s0})"
                f" count-pass {t_cnt:.2f}s (steal {s2 - s1})",
                flush=True,
            )
        print(f"rep{rep} total {time.perf_counter() - tot0:.2f}s", flush=True)
        release_persisted_intermediates()


if __name__ == "__main__":
    main()
