"""Time-series operators over the events stream: gap-fill with linear
interpolation, and gap-based sessionization.

Reference parity: the reference's analysis window is a driver-side
date-range substitution (utils.py relative-date macros) applied to one
in-memory frame; hypertable-style time operations (regular grids,
sessions) are the distributed re-expression of "analyze a time range".

Scale notes
-----------
- ``gapfill_interpolate`` materializes the minute grid with ``sequence``
  on the aggregated (small) side — never by exploding raw events — so
  grid size is bounded by the time range, not the event count.  The
  interpolation windows here are a single global sort; at 100 TB the
  same program runs range-partitioned by day with one-row halos at the
  boundaries (the standard distributed gap-fill layout).  The per-minute
  pre-aggregation (the expensive part) is an ordinary partial-agg
  shuffle and parallelizes fully.
- ``sessionize`` is one shuffle on ``user_id``; both the lag and the
  running sum reuse that single (user_id / ts) sort — Catalyst plans one
  Window over one Exchange.  This is the batch twin of the
  session_window streaming aggregation (queries/s_series.py s3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def gapfill_interpolate(
    per_minute: DataFrame, ts_col: str = "minute", val_col: str = "v"
) -> DataFrame:
    """Fill a per-minute series onto its full minute grid, linearly
    interpolating missing values between the nearest observed neighbors.

    Input: one row per OBSERVED minute.  Output: one row per minute from
    min to max, ``v_filled`` everywhere, ``is_gap`` = 1 on filled rows.
    """
    bounds = per_minute.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MINUTE"))
        ).alias(ts_col)
    )
    joined = grid.join(per_minute, ts_col, "left")

    w_prev = Window.orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy(ts_col).rowsBetween(0, Window.unboundedFollowing)
    v = F.col(val_col)
    obs_ts = F.when(v.isNotNull(), F.col(ts_col))
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    next_v = F.first(v, ignorenulls=True).over(w_next)
    prev_t = F.unix_timestamp(F.last(obs_ts, ignorenulls=True).over(w_prev))
    next_t = F.unix_timestamp(F.first(obs_ts, ignorenulls=True).over(w_next))
    cur_t = F.unix_timestamp(F.col(ts_col))
    # grid endpoints are observed minutes, so gap rows always have both
    # neighbors; the formula is written in one fixed shape so the oracle
    # performs the identical IEEE operation sequence.
    frac = (cur_t - prev_t).cast("double") / (next_t - prev_t).cast("double")
    filled = F.when(v.isNotNull(), v).otherwise(
        prev_v + (next_v - prev_v) * frac
    )
    # Tie-nudged round (queries/common.py:r6t): interpolating 2dp
    # observations with small-denominator minute fractions yields exact
    # decimal rationals that land ON the 6dp rounding boundary, where
    # the two engines' ROUND implementations disagree; +1e-9 moves the
    # tie strictly above the boundary in both (oracle does the same).
    return joined.select(
        F.col(ts_col),
        F.round(filled + F.lit(1e-9), 6).alias("v_filled"),
        F.when(v.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign each event a per-user session index: a new session starts
    when the gap to the previous event exceeds ``gap_minutes``.

    Returns the input plus ``session_id`` (0-based per user).  Ties on
    ``ts`` are ordered by ``tiebreak_col`` so the running sum is
    deterministic.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    prev_ts = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap_minutes} MINUTES")),
        F.lit(1),
    ).otherwise(F.lit(0))
    # the flag is staged into its own projection (window functions can't
    # nest); both windows share one (user_id / ts) sort, so Catalyst still
    # plans a single Exchange + Sort.
    flagged = events.withColumn("_new_sess", new_sess)
    return flagged.withColumn(
        "session_id",
        (F.sum("_new_sess").over(w) - F.lit(1)).cast("long"),
    ).drop("_new_sess")


def ewma(
    events: DataFrame,
    decay: float = 0.9,
    key_col: str = "user_id",
    val_col: str = "value",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Exponentially-weighted moving average per key:
    ``s_t = x_t + decay·s_{t-1}`` over each key's ordered history, as a
    closed-form cumulative sum — ``s_t = decay^t · Σ_{i≤t} x_i/decay^i``
    — so the sequential recurrence becomes ONE window cumsum sharing the
    key's sort (no Python, no iteration).

    Numerical envelope: ``decay^-i`` grows with position, so per-key
    series length is bounded by double range at ~300 rows for decay=0.9
    (0.9^-300 ≈ 4e13, well inside 2^53 precision for these magnitudes);
    beyond that, re-anchor per fixed-size chunk (chunk-local EWMA +
    carried seed) — the standard segmented formulation.  Both engines
    accumulate the cumsum in the SAME sort order, so results are
    bit-reproducible.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = F.row_number().over(Window.partitionBy(key_col).orderBy(*order_cols)) - 1
    staged = events.select(
        key_col,
        *order_cols,
        F.col(val_col).alias("_x"),
        pos.alias("_pos"),
    )
    scaled = staged.select(
        key_col,
        *order_cols,
        "_pos",
        "_x",
        (F.col("_x") / F.pow(F.lit(decay), F.col("_pos"))).alias("_xs"),
    )
    return scaled.select(
        key_col,
        *order_cols,
        "_x",
        (F.pow(F.lit(decay), F.col("_pos")) * F.sum("_xs").over(w)).alias("ewma"),
    )


def coalesce_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    start_col: str = "_start",
    end_col: str = "_end",
    order_cols: tuple[str, ...] = ("_start", "event_id"),
) -> DataFrame:
    """Merge overlapping/touching intervals per key (gaps-and-islands):
    each row gains ``_island``, a 1-based per-key island index — rows in
    the same island form one coalesced interval [min(start), max(end)].

    An interval starts a new island iff its start exceeds the running
    max end of every EARLIER interval (frame ``UNBOUNDED PRECEDING AND 1
    PRECEDING``) — the cumulative-max formulation handles nested
    intervals that a lag-1 comparison would wrongly split.  Both window
    expressions share the one (key / order) sort, so the plan is a
    single Exchange + Sort.  Tied starts are island-order-invariant:
    whichever of the tie sorts second sees the first's end ≥ its own
    start, so ties always land in the same island.

    At scale this is one shuffle on the key; no driver state, no
    iteration.  (Reference parity: the reference has no interval
    algebra — its analysis window is one driver-side date range; this is
    the distributed generalization a retention/availability pipeline
    needs.)
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new",
        (prev_max_end.isNull() | (F.col(start_col) > prev_max_end)).cast("int"),
    )
    return flagged.withColumn(
        "_island", F.sum("_new").over(w).cast("long")
    ).drop("_new")
