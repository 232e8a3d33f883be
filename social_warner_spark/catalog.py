"""Table resolution over the driver testdata layout (TESTDATA.md).

Maps logical table names → parquet paths under a scale-factor directory.
This is the engine's "dataset selection" surface (reference: `dataset_id`
routing, data_extract.py:46; SURVEY.md B7): a query names a table, the
catalog resolves it to a distributed scan.  At 100 TB the same interface
resolves to partitioned parquet/Delta paths; nothing above it changes.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return os.path.join(sf_dir, f"{name}.parquet")


def prepare_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs required for deterministic testdata reads.

    - ``nanosAsLong``: events.parquet carries TIMESTAMP(NANOS), which the
      vectorized parquet reader rejects; read as long and convert below.
    - UTC session timezone: deterministic rendering regardless of who built
      the session (the driver passes us its own).
    - shuffle-partition right-sizing: a session still at Spark's static
      default (200) pays ~6× task-scheduling overhead on the multi-stage /
      iterative pipelines at test SF (measured: x31 57s → 9s).  A session
      whose builder/spark-submit conf set the key explicitly is never
      touched (detected via the SparkContext conf) — the 200-default check
      alone can't distinguish a deliberate runtime set of exactly 200,
      which is the one case this heuristic would override.  At cluster
      scale the equivalent knob is 2-3× total cores with AQE coalescing
      down (session.py).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = "spark.sql.shuffle.partitions"
    explicitly_built = spark.sparkContext.getConf().contains(key)
    if not explicitly_built and spark.conf.get(key, "200") == "200":
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set(key, str(max(8, min(64, 2 * cores))))
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Distributed parquet scan for one logical table.

    Column pruning and predicate pushdown happen in Catalyst — callers
    filter/select on the returned DataFrame and the scan narrows itself
    (verify with .explain(): PushedFilters / ReadSchema).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark has no nanos
    timestamp, so it is read as long and truncated to microseconds — the
    same truncation DuckDB applies on read, so both engines see identical
    values.
    """
    prepare_session(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: truncate nanos→micros exactly as DuckDB does
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
