"""applyInPandasWithState: running totals across micro-batches must equal
the batch aggregate after the stream drains."""

from __future__ import annotations

import pyspark.sql.functions as F

from social_warner_spark.catalog import load_table
from social_warner_spark.streaming import read_events_stream
from social_warner_spark.streaming.stateful import running_user_totals


def test_stateful_running_totals_converge_to_batch(spark, sf_smoke, tmp_path):
    d = str(tmp_path / "ev")
    # several files → several micro-batches (maxFilesPerTrigger=8 over 12 files)
    load_table(spark, sf_smoke, "events").repartition(12).write.parquet(d)

    out = (
        running_user_totals(read_events_stream(spark, d))
        .writeStream.format("memory")
        .queryName("state_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(180)
    assert not out.isActive

    # memory sink in update mode appends every emitted update; n_events is
    # strictly increasing per user, so the max-n_events row is the final state
    emitted = spark.table("state_totals").toPandas()
    final = (
        emitted.sort_values("n_events").groupby("user_id").tail(1).set_index("user_id")
    )

    batch = (
        load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("exp_n"), F.round(F.sum("value"), 4).alias("exp_tv"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    joined = final.join(batch)
    assert (joined["n_events"].astype(int) == joined["exp_n"]).all()
    assert (joined.eval("abs(total_value - exp_tv)") < 1e-3).all()
