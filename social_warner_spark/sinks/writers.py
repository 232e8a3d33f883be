"""Batch sinks with the reference's BigQuery load semantics (SURVEY.md A14/A15).

Reference behavior (data_load.py:7-63):
- write_disposition from env: WRITE_TRUNCATE | WRITE_APPEND (main.py:11)
- schema autodetect + ALLOW_FIELD_ADDITION (additive evolution)
- empty-input guard raises ValueError (data_load.py:27-33)
- blocking wait for job completion

Spark mapping: mode("overwrite"/"append") + mergeSchema=true on a parquet
dev sink (schema-on-write from the DataFrame's StructType — strictly better
than re-inferring from JSON rows); the real BigQuery connector path is the
same `df.write` call with format("bigquery") and is gated on the connector
jar being present.  The write action itself is the blocking barrier.
"""

from __future__ import annotations

import enum
import os

from pyspark.sql import DataFrame

from social_warner_spark import logging_util as logu


class WriteDisposition(str, enum.Enum):
    WRITE_TRUNCATE = "WRITE_TRUNCATE"
    WRITE_APPEND = "WRITE_APPEND"

    @property
    def spark_mode(self) -> str:
        return "overwrite" if self is WriteDisposition.WRITE_TRUNCATE else "append"


def bigquery_available(spark) -> bool:
    """True if the spark-bigquery-connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
        )
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    path_or_table: str,
    disposition: WriteDisposition | str = WriteDisposition.WRITE_APPEND,
    fmt: str = "parquet",
    allow_field_addition: bool = True,
    partition_by: list[str] | None = None,
) -> int:
    """Write with reference dispositions; returns row count written.

    Raises ValueError on empty input (reference data_load.py:27-33).
    The row count is captured with the Observation API riding the write
    action itself — no separate count() scan (the reference's explicit
    record count, main.py:88-91, for free).
    """
    from pyspark.sql import Observation
    import pyspark.sql.functions as F

    if isinstance(disposition, str):
        disposition = WriteDisposition(disposition)
    if df.isEmpty():
        raise ValueError("no rows to load (reference raises on empty input)")
    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    writer = df.write.mode(disposition.spark_mode)
    if fmt == "bigquery":
        writer = writer.format("bigquery").option(
            "writeDisposition", disposition.value
        )
        if allow_field_addition:
            writer = writer.option("allowFieldAddition", "true")
        writer.save(path_or_table)
    else:
        writer = writer.format(fmt)
        if allow_field_addition:
            # additive schema evolution on read: mergeSchema resolves the
            # union of file schemas (ALLOW_FIELD_ADDITION equivalent)
            writer = writer.option("mergeSchema", "true")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path_or_table)
    rows = int(obs.get["rows"])
    logu.info("sink write complete", target=path_or_table, rows=rows,
              disposition=disposition.value, format=fmt)
    return rows


def read_table(spark, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a dev-sink table with schema merging (field-addition parity)."""
    return spark.read.option("mergeSchema", "true").format(fmt).load(path)
