"""Custom stateful streaming operator via applyInPandasWithState
(north-star C6: the escape hatch when built-in windows can't express the
semantics — per-key running state across micro-batches).

`running_user_totals`: per-user cumulative event count + value sum,
emitting one updated row per user per micro-batch.  State is a single
(count, total) pair per user — O(keys) state, watermark-free because the
state never grows with time.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user running totals (stream-only operator).

    The update function is defined as a closure so cloudpickle serializes
    it BY VALUE; a module-level function is pickled by reference and fails
    on executors that don't have this package on their import path.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 6)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
