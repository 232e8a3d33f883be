"""Durable streaming sinks: exactly-once file sink (replay adds nothing),
foreachBatch epoch delivery + idempotence contract."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from social_warner_spark.catalog import load_table
from social_warner_spark.streaming import read_events_stream, tumbling_counts_stream
from social_warner_spark.streaming.sinks import stream_foreach_batch, stream_to_parquet


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_sink_stream")
    ev = load_table(spark, sf_smoke, "events")
    ev.repartition(6).write.mode("overwrite").parquet(str(d))
    return str(d)


def test_parquet_sink_exactly_once_on_replay(spark, events_dir, tmp_path):
    """Same input + same checkpoint, drained twice: the second run must
    commit ZERO new rows (the checkpoint WAL makes the file sink
    exactly-once), and the sink content equals the batch execution of the
    same windowed aggregation."""
    out = str(tmp_path / "agg_out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        agg = tumbling_counts_stream(read_events_stream(spark, events_dir))
        stream_to_parquet(agg, out, ckpt, output_mode="append")

    drain()
    first = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert first, "sink must have committed finalized windows"
    drain()  # replay: no new input past the checkpoint
    second = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert second == first

    # parity with batch over the same files: append mode emits exactly the
    # watermark-finalized windows, i.e. those whose END ≤ max(ts) − 1h
    ev = spark.read.parquet(events_dir)
    max_ts = ev.agg(F.max("ts")).first()[0]
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.round(F.sum("value"), 6).alias("sum_value"), F.count("*").alias("cnt"))
        .where(F.col("w.end") <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "event_type", "sum_value", "cnt",
        )
    )
    finalized = sorted(tuple(r) for r in batch.collect())
    assert first == finalized


def test_foreach_batch_delivers_epochs_idempotently(spark, events_dir, tmp_path):
    """foreachBatch receives every epoch exactly once per checkpoint
    lineage; writing partition-overwrite-by-epoch makes retries idempotent
    and the union of epochs equals the input."""
    out = tmp_path / "epochs"
    ckpt = str(tmp_path / "ckpt_fb")
    seen: list[int] = []

    def write_epoch(batch_df, epoch_id: int) -> None:
        seen.append(epoch_id)
        # epoch id as the idempotence key: same epoch → same directory,
        # overwrite semantics → retries converge
        batch_df.write.mode("overwrite").parquet(str(out / f"epoch={epoch_id}"))

    src = read_events_stream(spark, events_dir).select("event_id", "event_type")
    stream_foreach_batch(src, write_epoch, ckpt)
    assert seen and seen == sorted(set(seen)), "each epoch delivered once"

    got = spark.read.option("basePath", str(out)).parquet(str(out / "epoch=*"))
    want = spark.read.parquet(events_dir).select("event_id", "event_type")
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in want.collect()
    )

    # replay with the same checkpoint: no further epochs fire
    n = len(seen)
    stream_foreach_batch(src, write_epoch, ckpt)
    assert len(seen) == n
