"""S4/S5: stream/batch parity.  The streaming execution of the S-series
window expressions must equal the batch execution on identical input."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from social_warner_spark.catalog import load_table
from social_warner_spark.streaming import (
    dedup_stream,
    read_events_stream,
    run_stream_to_memory,
    tumbling_counts_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke, tmp_path_factory):
    """Stage events as micros-timestamp parquet files (several files so the
    file stream sees multiple batches)."""
    d = tmp_path_factory.mktemp("events_stream")
    ev = load_table(spark, sf_smoke, "events")
    ev.repartition(6).write.mode("overwrite").parquet(str(d))
    return str(d)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_s4_tumbling_stream_equals_batch(spark, events_dir):
    batch_events = spark.read.parquet(events_dir)
    expected = _canon(tumbling_counts_stream(batch_events))

    stream = tumbling_counts_stream(read_events_stream(spark, events_dir))
    got = _canon(run_stream_to_memory(stream, output_mode="complete"))
    assert got == expected and len(got) > 0


def test_stream_stream_join_equals_batch_join(spark, events_dir):
    from social_warner_spark.streaming import followup_join_stream

    batch = spark.read.parquet(events_dir)
    expected = _canon(followup_join_stream(batch, batch))

    got = _canon(
        run_stream_to_memory(
            followup_join_stream(
                read_events_stream(spark, events_dir),
                read_events_stream(spark, events_dir),
            ),
            output_mode="append",
        )
    )
    assert got == expected and len(got) > 0


def test_rocksdb_state_store_parity(spark, events_dir):
    """The large-state scale path: the same stateful aggregation must
    produce identical results under the RocksDB state store provider
    (bounded-memory state at 100 TB) as under the default HDFS-backed one."""
    batch_events = spark.read.parquet(events_dir)
    expected = _canon(tumbling_counts_stream(batch_events))

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = tumbling_counts_stream(read_events_stream(spark, events_dir))
        got = _canon(run_stream_to_memory(stream, output_mode="complete"))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert got == expected and len(got) > 0


def test_stream_static_enrichment_equals_batch_join(spark, events_dir):
    from social_warner_spark.streaming import enrich_stream

    batch = spark.read.parquet(events_dir)
    dim = (
        batch.select("user_id")
        .distinct()
        .withColumn("segment", F.concat(F.lit("seg"), (F.col("user_id") % 4)))
    )
    expected = _canon(enrich_stream(batch, dim).select("event_id", "segment"))

    got = _canon(
        run_stream_to_memory(
            enrich_stream(read_events_stream(spark, events_dir), dim),
            output_mode="append",
        ).select("event_id", "segment")
    )
    assert got == expected and len(got) > 0


def test_s5_stream_dedup_equals_batch_distinct(spark, events_dir, tmp_path):
    # duplicate the input: write the same files twice into one dir
    dup_dir = str(tmp_path / "dup")
    base = spark.read.parquet(events_dir)
    base.write.mode("overwrite").parquet(dup_dir)
    base.write.mode("append").parquet(dup_dir)
    assert spark.read.parquet(dup_dir).count() == 2 * base.count()

    deduped = dedup_stream(read_events_stream(spark, dup_dir))
    out = run_stream_to_memory(deduped, output_mode="append")
    assert out.count() == base.count()
    assert out.select("event_id").distinct().count() == base.count()
