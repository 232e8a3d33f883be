"""Streaming sliding/session windows + foreachBatch sink (S-series
completeness beyond the S4/S5 parity tests)."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from social_warner_spark.catalog import load_table
from social_warner_spark.sinks import WriteDisposition, write_table
from social_warner_spark.streaming import read_events_stream, run_stream_to_memory


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream_w")
    load_table(spark, sf_smoke, "events").repartition(4).write.mode("overwrite").parquet(str(d))
    return str(d)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_sliding_window_stream_equals_batch(spark, events_dir):
    def sliding(df):
        return (
            df.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
            .agg(F.count("*").alias("cnt"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("wstart"), "cnt"
            )
        )

    batch = _canon(sliding(spark.read.parquet(events_dir)))
    stream_src = read_events_stream(spark, events_dir).withWatermark("ts", "2 hours")
    got = _canon(run_stream_to_memory(sliding(stream_src), "complete"))
    assert got == batch and len(got) > 0


def test_session_window_stream_equals_batch(spark, events_dir):
    def sessions(df):
        return (
            df.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("cnt"))
            .select(
                "user_id",
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("start"),
                "cnt",
            )
        )

    batch = _canon(sessions(spark.read.parquet(events_dir)))
    stream_src = read_events_stream(spark, events_dir).withWatermark("ts", "2 hours")
    got = _canon(run_stream_to_memory(sessions(stream_src), "complete"))
    assert got == batch and len(got) > 0


def test_foreachbatch_sink_writes_all_rows(spark, events_dir, tmp_path):
    """foreachBatch bridges streams onto the batch sink API (the reference's
    load stage applied per micro-batch)."""
    target = str(tmp_path / "fb_sink")
    total = spark.read.parquet(events_dir).count()

    def sink_batch(df, epoch_id):
        if not df.isEmpty():
            write_table(df, target, WriteDisposition.WRITE_APPEND)

    q = (
        read_events_stream(spark, events_dir)
        .writeStream.foreachBatch(sink_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    assert spark.read.parquet(target).count() == total
