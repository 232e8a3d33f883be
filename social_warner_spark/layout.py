"""Physical data layout utilities — the 100 TB storage contract (PERF.md).

- `write_partitioned`: date-partitioned facts → date filters become
  partition pruning (tested in tests/test_sinks.py).
- `write_bucketed` + `bucketed_join_ready`: join-key bucketing → co-located
  joins with NO shuffle on either side.  At 100 TB this removes the single
  largest cost of fact-fact joins (the Exchange of the big table); tested
  by asserting the bucketed join plan contains no shuffle
  (tests/test_layout.py).

Bucketed tables must live in a catalog (saveAsTable) — bucket metadata
does not survive a bare path write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Persist hive-partitioned by the given columns (date partitioning for
    facts).  Filters on partition columns then prune whole directories at
    plan time (`PartitionFilters` in the scan, zero data bytes for excluded
    dates) — at 100 TB this is the difference between scanning a day and
    scanning a year.  Partition columns should be low-cardinality (a date,
    not a timestamp): each value is a directory.
    """
    df.write.mode("overwrite").format(fmt).partitionBy(*partition_cols).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Matching (num_buckets, bucket_col) on both sides of a join lets Spark
    plan SortMergeJoin with zero Exchange; sorting within buckets also
    removes the per-task Sort.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True if both catalog tables exist (convenience for guards)."""
    return spark.catalog.tableExists(left) and spark.catalog.tableExists(right)
