"""t2 mirror: every declared query must match its DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from social_warner_spark.queries import all_oracles, all_queries

from tests.oracle_harness import compare, duck_connection

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_query_has_oracle():
    missing = [q for q in QUERIES if q not in ORACLES]
    assert not missing, f"queries without oracles: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_correct, name):
    sdf = QUERIES[name](spark, sf_correct)
    con = duck_connection(sf_correct)
    try:
        ddf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    ok, msg = compare(sdf, ddf)
    assert ok, f"{name}: {msg}"
