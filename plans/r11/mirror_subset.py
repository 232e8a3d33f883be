#!/usr/bin/env python
"""Round-11: driver-strict oracle mirror for a SUBSET of queries.

Usage: python plans/r11/mirror_subset.py <sf_dir> <q1> <q2> ...
Same compare as tests/run_strict_mirror.py mirror mode, restricted to the
named queries, so an operator change can be re-proven against every
consumer without the full 445-query sweep.  Builder-side tool only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from social_warner_spark.caching import release_persisted_intermediates  # noqa: E402
from social_warner_spark.queries import all_oracles, all_queries  # noqa: E402
from social_warner_spark.session import get_spark  # noqa: E402

from tests.oracle_harness import compare, duck_connection  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="mirror-subset")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = all_queries(), all_oracles()
    con = duck_connection(sf_dir)
    fails = 0
    for name in names:
        release_persisted_intermediates()
        try:
            sdf = queries[name](spark, sf_dir)
            ddf = con.execute(oracles[name]).df()
            ok, msg = compare(sdf, ddf)
        except Exception as e:  # noqa: BLE001 - report and keep going
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        print(f"{'PASS' if ok else 'FAIL'} {name}" + ("" if ok else f": {msg}"), flush=True)
        fails += 0 if ok else 1
    print(f"{len(names) - fails}/{len(names)} pass")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
