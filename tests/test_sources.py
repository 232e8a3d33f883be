"""Paginated REST source tests (A1): Spark 4 Python DataSource with one
partition per page + driver-side fallback."""

from __future__ import annotations

import json

from pyspark.sql.types import StructType

from social_warner_spark.sources import PagedRestDataSource, read_paged

SCHEMA_DDL = "page int, item_id int, name string"


def fake_fetch_page(page_index: int, options: dict):
    """Deterministic fake API: 3 rows per page."""
    per_page = int(options.get("per_page", "3"))
    for i in range(per_page):
        yield {"page": page_index, "item_id": page_index * 100 + i, "name": f"row{i}"}


def test_datasource_one_partition_per_page(spark):
    spark.dataSource.register(PagedRestDataSource)
    df = (
        spark.read.format("paged_rest")
        .schema(SCHEMA_DDL)
        .option("fetcher", "tests.test_sources:fake_fetch_page")
        .option("num_pages", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # page == partition
    rows = df.collect()
    assert len(rows) == 12
    assert {r.page for r in rows} == {0, 1, 2, 3}
    assert any(r.item_id == 301 for r in rows)


def test_driver_side_fallback_union(spark):
    def pages():
        yield [{"page": 0, "item_id": 1, "name": "a"}]
        yield [{"page": 1, "item_id": 2, "name": "b"}, {"page": 1, "item_id": 3, "name": "c"}]

    df = read_paged(spark, pages, SCHEMA_DDL)
    assert df.count() == 3


def test_driver_side_fallback_empty_returns_none(spark):
    assert read_paged(spark, lambda: iter(()), SCHEMA_DDL) is None


def test_credentials_resolved_into_options(monkeypatch):
    """A17: the provider runs once driver-side; options carry materialized
    credentials as JSON (DataSource options are strings)."""
    import json

    from social_warner_spark.sources.rest import (
        CREDENTIALS_OPTION,
        DEFAULT_CREDENTIALS_ENV,
        resolve_credentials,
    )

    creds = {"client_id": "cid", "client_secret": "cs", "api_key": "k"}
    monkeypatch.setenv(DEFAULT_CREDENTIALS_ENV, json.dumps(creds))
    opts = resolve_credentials({"num_pages": "3"})
    assert opts["num_pages"] == "3"
    assert json.loads(opts[CREDENTIALS_OPTION]) == creds

    calls = []

    def custom_provider():
        calls.append(1)
        return {"api_key": "other"}

    opts2 = resolve_credentials({}, provider=custom_provider)
    assert json.loads(opts2[CREDENTIALS_OPTION]) == {"api_key": "other"}
    assert calls == [1]


def test_credentials_env_missing_raises(monkeypatch):
    import pytest

    from social_warner_spark.sources.rest import (
        DEFAULT_CREDENTIALS_ENV,
        resolve_credentials,
    )

    monkeypatch.delenv(DEFAULT_CREDENTIALS_ENV, raising=False)
    with pytest.raises(KeyError, match="SOCIAL_WARNER_CREDENTIALS"):
        resolve_credentials({})
