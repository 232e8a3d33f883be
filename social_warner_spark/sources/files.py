"""File-based corpus sources — JSONL (the LLM-corpus interchange format)
with an explicit corrupt-record policy, and text-file ingestion.

Crawl dumps arrive as line-delimited JSON with a long tail of malformed
lines; silently dropping them skews corpus statistics, and failing the
whole job on one bad line is worse.  `read_jsonl` makes the policy a
parameter and the damage measurable.

Scale notes: JSON line parsing is splittable (newline-delimited → one
task per split, same as any text source); ALWAYS pass an explicit
schema — schema inference is a full extra pass over 100 TB and infers
from whichever sample it saw.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType, StringType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema and policy:

    - PERMISSIVE (default): malformed lines produce a row whose declared
      fields are NULL and whose ``_corrupt_record`` holds the raw line —
      quarantine-able downstream (see split_corrupt).
    - DROPMALFORMED: malformed lines vanish (use only when the drop rate
      is monitored elsewhere).
    - FAILFAST: any malformed line fails the read.
    """
    full = schema
    if mode == "PERMISSIVE" and CORRUPT_COL not in [f.name for f in schema.fields]:
        full = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the corrupt column dropped,
    and the raw text of every malformed line.

    The frame is cached first — Spark refuses queries that reference ONLY
    the internal corrupt column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the two
    outputs should share one parse of the input anyway.  Registered for
    host-controlled release like every persisted intermediate.
    """
    from social_warner_spark.caching import register_persisted

    cached = register_persisted(df.cache())
    clean = cached.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = cached.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine
