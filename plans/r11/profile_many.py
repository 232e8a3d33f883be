#!/usr/bin/env python
"""Round-11: capture formatted plans + isolated timings for a query list.

Usage: python plans/r11/profile_many.py <suffix> <q1> <q2> ...
Writes plans/r11/<query>_<suffix>.txt and prints timing lines with
per-query steal deltas (/proc/stat cpu col 8) so co-tenant bursts are
visible in every measurement.  Builder-side tool, not driver contract.
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


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    runs = int(os.environ.get("SWS_PROFILE_RUNS", "4"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"profile-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    spark.range(1).count()
    from social_warner_spark.catalog import TABLES, load_table
    import pyspark.sql.functions as F

    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.agg(*[F.count(c) for c in df.columns]).collect()

    here = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        release_persisted_intermediates()
        t0 = time.perf_counter()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q[name](spark, sf_dir).explain("formatted")
        build_s = round(time.perf_counter() - t0, 2)
        with open(os.path.join(here, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        release_persisted_intermediates()
        times, steals = [], []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            s0, t0 = steal(), time.perf_counter()
            q[name](spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 2))
            steals.append(steal() - s0)
            release_persisted_intermediates()
        med = sorted(times)[len(times) // 2]
        print(
            f"{name}: median {med} runs {times} steal {steals} build+explain {build_s}",
            flush=True,
        )


if __name__ == "__main__":
    main()
