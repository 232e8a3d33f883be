#!/usr/bin/env python
"""Round-11 optimization harness: isolate one query — timed runs + plan.

Usage: python plans/r11/profile_one.py <query> [runs] [--noop] [--plan-only]

Prints per-run seconds (count() action, same as bench.py, unless --noop),
then writes the formatted plan to plans/r11/<query>_current.txt.
Not part of the driver contract; a builder-side measurement tool only.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from social_warner_spark.caching import release_persisted_intermediates  # noqa: E402
from social_warner_spark.queries import all_queries  # noqa: E402
from social_warner_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 5
    noop = "--noop" in sys.argv
    plan_only = "--plan-only" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()[name]

    # warm session like bench.py does
    spark.range(1).count()
    from social_warner_spark.catalog import TABLES, load_table
    import pyspark.sql.functions as F

    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.agg(*[F.count(c) for c in df.columns]).collect()

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q(spark, sf_dir).explain("formatted")
    release_persisted_intermediates()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), f"{name}_current.txt")
    with open(out, "w") as f:
        f.write(buf.getvalue())
    print(f"plan -> {out}")
    if plan_only:
        return

    times = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{name} run {i}")
        t0 = time.perf_counter()
        df = q(spark, sf_dir)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        dt = round(time.perf_counter() - t0, 3)
        times.append(dt)
        release_persisted_intermediates()
        print(f"run {i}: {dt}s")
    times_sorted = sorted(times)
    print(f"median {times_sorted[len(times)//2]}s  min {times_sorted[0]}s")


if __name__ == "__main__":
    main()
