"""Structured Streaming surface for the events table (SURVEY.md §2.d S-series).

Batch/stream parity contract: every streaming aggregation here reuses the
SAME window expressions as the batch queries (queries/s_series.py); the
tests run both on identical input and assert equal results (S4/S5).

At scale: file source → Kafka swap is a one-line readStream change; state
store sizing is bounded by the watermark horizon, and `availableNow`
triggers give exactly-once batch-equivalent replays.
"""

from __future__ import annotations

import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: Schema of the events parquet after nanos→micros normalization
EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def read_events_stream(spark: SparkSession, directory: str) -> DataFrame:
    """File-source stream over parquet event files (micro-batch).

    Expects files whose ts column is already a micros timestamp (use
    catalog.load_table(...).write to stage testdata — the raw testdata
    carries TIMESTAMP(NANOS) which the streaming parquet reader rejects).
    """
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", "8")
        .parquet(directory)
    )


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """S1/S4: tumbling 1h sum/count per event_type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.round(F.sum("value"), 6).alias("sum_value"), F.count("*").alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "event_type",
            "sum_value",
            "cnt",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """S5: stateful stream dedup on event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def followup_join_stream(
    left: DataFrame,
    right: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each event paired with the same user's
    follow-up events within `horizon` (the streaming form of the c7 range
    join).

    Both sides carry watermarks and the join condition bounds event time,
    so the state store retains only `watermark + horizon` of each side —
    the canonical bounded-state join shape.  Append-mode output; rows emit
    once both sides' watermarks pass the joinable window.
    """
    l = left.withWatermark("ts", watermark).select(
        F.col("event_id").alias("a_id"),
        "user_id",
        F.col("ts").alias("a_ts"),
        F.col("event_type").alias("a_type"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    )
    return l.join(
        r,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {horizon}"))
        & (F.col("a_id") < F.col("b_id")),
    ).select("a_id", "b_id", "user_id", "a_type", "a_ts", "b_ts")


def enrich_stream(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each streaming event picks up the
    static dimension's attributes via a broadcast hash join — the
    standard streaming enrichment shape (reference parity: the meta-
    dimension attach of §2.b B3, applied to a stream).

    Stream-static joins are stateless: the static side is planned as an
    ordinary broadcast (re-resolved per micro-batch, so slowly-refreshed
    dim snapshots are picked up on restart), and no watermark is needed.
    """
    return events.join(F.broadcast(dim), on, "left")


def run_stream_to_memory(
    stream_df: DataFrame,
    output_mode: str = "complete",
    timeout_sec: float = 120.0,
) -> DataFrame:
    """Execute a stream with trigger(availableNow) into a memory sink and
    return the final result as a batch DataFrame (test harness)."""
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError("stream did not drain within timeout")
    spark = stream_df.sparkSession
    return spark.table(name)
