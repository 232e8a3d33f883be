"""x39 series — round-4 stateful-twin anchors (x377–x378): hard driver
rows for the `applyInPandasWithState` surface (streaming/stateful.py)
and the streaming drift-cell monitor (streaming/corpus.py +
operators/drift.py), per the round-3 verdict task 7.

x377 is the deterministic BATCH twin of
streaming/stateful.py:streaming_heavy_hitters — the same textbook
Misra–Gries fold, run per event_type over a totally-ordered
(ts, event_id) pass via ``applyInPandas``.  Feeding the whole table as
one micro-batch to the streaming operator produces the identical
summary (parity-tested in tests/test_streaming_state.py), so this query
gives the stateful path a hard driver signal.  The raw summary is
sequential by nature — not SQL-expressible — so the DECLARED output is
the theorem-anchored projection of it: the guaranteed-present set
(users with exact_count·k > n_processed, which Misra–Gries provably
retains) with their exact counts, plus a ``bound_ok`` column computed
FROM the fold's estimates asserting the theorem-true error bound
0 ≤ exact_count − est_count ≤ n_processed/k.  That projection is a
pure filtered aggregate for the DuckDB oracle (``bound_ok`` is
constant TRUE by theorem), while the Spark side still runs the real
``applyInPandas`` fold: a dropped heavy hitter surfaces as a missing
row (the guaranteed set inner-joins the summary) and a broken counter
surfaces as ``bound_ok = false`` — either way a hard hash mismatch.

x378 is the batch twin of the streaming drift monitor
(streaming/corpus.py:value_cells_stream → merge_cells →
accumulated_drift): per-epoch value cells are built day-by-day exactly
as the stream's epoch partitions would land, merged by summation, and
KS-tested against the frozen baseline half.  Fully SQL-expressible →
full DuckDB oracle.

Reference scope note: the reference ETL (main.py, data_*.py) has no
streaming surface; these queries anchor the north-star C6 extension
(SURVEY.md §2.c) exactly where Spark's built-in windows end.

Scale: the DECLARED x377 runs the mergeable-summaries layout (Agarwal,
Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012):
a per-scan-partition Misra–Gries partial fold via ``mapInPandas`` (no
shuffle, no corpus-sized group — parallelism is the scan's partition
count, state O(k·|event_type|) per task) followed by one grouped merge
over the BOUNDED partial-summary relation (≤ partitions·k rows per
event_type).  Merged MG carries the same theorems as the sequential
fold — every item with frequency > n/k is retained and
0 ≤ exact − est ≤ n/k — so the declared guaranteed-set projection is
bit-identical to the sequential fold's and invariant to partition
layout, even though internal est_counts differ.  The k=20 sequential
twin (`_mg_summary`) is kept solely as the streaming operator's parity
anchor (one group per event_type IS that operator's state contract).
x378 runs entirely on count cells — the only corpus-sized step is one
map-side-combined groupBy.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

import pyspark.sql.functions as F

from social_warner_spark.queries.common import T

#: Misra–Gries capacity — matches streaming_heavy_hitters' default.
MG_K = 20

#: Capacity of the DECLARED x377 fold.  The guarantee theorem only
#: surfaces users with frequency > n/k, so k must sit below the
#: corpus's true max user frequency for the output to be non-trivial:
#: at the test scales the most active user holds ~0.1–1% of an
#: event_type's rows (user cardinality grows with SF), so k = 1024
#: yields 75/750/397 guaranteed rows at sf0.001/0.01/0.1.  At 100 TB
#: the same dial applies — pick k ≈ 1/(minimum frequency of interest);
#: state stays O(k) per group regardless of corpus size.
MG_DECLARED_K = 1024

#: x378 — baseline/current split and the daily epoch grain.
DRIFT_SPLIT = "2024-01-16"


def _mg_summary(spark, sf_dir, k: int = MG_K):
    """Full Misra–Gries summary joined with exact counts (internal —
    the declared x377 projects its guaranteed set from this; the
    parity/guarantee tests in tests/test_streaming_state.py consume it
    directly).

    Per event_type the rows are sorted by (ts, event_id) — a total
    order, event_id is unique — and folded through the textbook update:
    increment if tracked, insert if fewer than k-1 counters, else
    decrement all (dropping zeros).  The summary is therefore a pure
    function of the data, reproducible across runs and engines.
    """
    ev = T(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts", "event_id"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        table: dict[int, int] = {}
        n = 0
        for uid in pdf["user_id"]:
            uid = int(uid)
            n += 1
            if uid in table:
                table[uid] += 1
            elif len(table) < k - 1:
                table[uid] = 1
            else:
                table = {u: c - 1 for u, c in table.items() if c > 1}
        ids = sorted(table)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]] * len(ids),
                "user_id": ids,
                "est_count": [table[u] for u in ids],
                "n_processed": [n] * len(ids),
            }
        )

    summary = ev.groupBy("event_type").applyInPandas(
        fold,
        schema=(
            "event_type string, user_id long, est_count long,"
            " n_processed long"
        ),
    )
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("exact_count")
    )
    return (
        summary.join(exact, ["event_type", "user_id"])
        .select(
            "event_type",
            "user_id",
            "est_count",
            "exact_count",
            "n_processed",
        )
        .orderBy("event_type", "user_id")
    )


def _mg_summary_merged(spark, sf_dir, k: int = MG_DECLARED_K):
    """Scale-path Misra–Gries: per-scan-partition partial folds merged
    by the mergeable-summaries rule (Agarwal et al., PODS 2012, §3.1).

    Stage 1 (``mapInPandas``, narrow — no shuffle): each scan partition
    folds its rows in arrival order through the textbook MG update,
    keeping one (k−1)-counter table per event_type seen in the
    partition.  MG's guarantees are order-independent, and a scan
    partition's row order is deterministic, so the partials are a pure
    function of (data, partition layout).  Emits the counter rows plus
    one flagged sentinel row per (event_type, partition) carrying the
    partition's row count (so n_processed is exact even when every
    counter decremented away).

    Stage 2 (grouped merge over the BOUNDED partial relation —
    ≤ P·k counter rows per event_type): fold the per-partition tables
    in partition-id order through the pairwise merge — sum counters,
    and while more than k−1 remain subtract the k-th largest count
    from all and drop the non-positive.  The PODS'12 theorem gives the
    merged summary the SAME bounds as a sequential fold: every item
    with frequency > n/k retained, 0 ≤ exact − est ≤ n/k.  Addition is
    commutative and the subtraction constant depends only on counter
    values, so the merge is deterministic given the partials.

    The |docs|-scale work is therefore one embarrassingly-parallel scan
    pass; nothing corpus-sized ever crosses into a single task (the
    sequential `_mg_summary` routes each event_type's ENTIRE row set
    through one pandas group — fine as the streaming twin's parity
    anchor, wrong as a 100 TB layout).
    """
    ev = (
        T(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .withColumn("pid", F.spark_partition_id())
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tables: dict[str, dict[int, int]] = {}
        ns: dict[str, int] = {}
        pid = -1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["pid"].iloc[0])
            for et, uid in zip(pdf["event_type"], pdf["user_id"]):
                uid = int(uid)
                t = tables.setdefault(et, {})
                ns[et] = ns.get(et, 0) + 1
                if uid in t:
                    t[uid] += 1
                elif len(t) < k - 1:
                    t[uid] = 1
                else:
                    tables[et] = {u: c - 1 for u, c in t.items() if c > 1}
        rows = []
        for et, n in ns.items():
            # Sentinel rows are FLAGGED, not NULL-keyed: a NULL in the
            # long user_id column would make Arrow hand the whole
            # column to pandas as float64, where ids ≥ 2^53 are already
            # rounded before any astype could save them (ADVICE r07,
            # verified against a 2^62-range id) — snowflake-style
            # 64-bit ids would silently collide in the merge.
            rows.append((et, pid, 0, 0, n, True))  # sentinel: row count only
            for uid in sorted(tables.get(et, {})):
                rows.append((et, pid, uid, tables[et][uid], 0, False))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "event_type", "pid", "user_id", "est_count",
                    "n_local", "_sentinel",
                ],
            )

    partials = ev.mapInPandas(
        partial,
        schema=(
            "event_type string, pid int, user_id long, est_count long,"
            " n_local long, _sentinel boolean"
        ),
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        et = pdf["event_type"].iloc[0]
        n = int(pdf["n_local"].sum())
        table: dict[int, int] = {}
        # user_id is never NULL (sentinels are flagged), so the column
        # arrives as true int64 and every id round-trips bit-exactly.
        # Raise (not assert — stripped under python -O) if Arrow ever
        # hands float64: ids >= 2^53 would already be silently rounded.
        if str(pdf["user_id"].dtype) != "int64":
            raise TypeError(
                f"Misra-Gries merge needs int64 user_id, got "
                f"{pdf['user_id'].dtype} — NULLs leaked into the column?"
            )
        counters = pdf[~pdf["_sentinel"]]
        for _, sub in counters.groupby("pid", sort=True):
            for uid, c in zip(sub["user_id"], sub["est_count"]):
                uid = int(uid)
                table[uid] = table.get(uid, 0) + int(c)
            if len(table) > k - 1:
                kth = sorted(table.values(), reverse=True)[k - 1]
                table = {u: c - kth for u, c in table.items() if c > kth}
        ids = sorted(table)
        return pd.DataFrame(
            {
                "event_type": [et] * len(ids),
                "user_id": ids,
                "est_count": [table[u] for u in ids],
                "n_processed": [n] * len(ids),
            }
        )

    summary = partials.groupBy("event_type").applyInPandas(
        merge,
        schema=(
            "event_type string, user_id long, est_count long,"
            " n_processed long"
        ),
    )
    exact = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("exact_count"))
    )
    return (
        summary.join(exact, ["event_type", "user_id"])
        .select(
            "event_type",
            "user_id",
            "est_count",
            "exact_count",
            "n_processed",
        )
        .orderBy("event_type", "user_id")
    )


def x377_misra_gries_twin(spark, sf_dir):
    """Guaranteed heavy-hitter set from the Misra–Gries batch twin
    (r04-verdict reformulation: oracle-checkable while still running
    the real ``applyInPandas`` fold).

    Misra–Gries with k−1 counters provably retains every item whose
    frequency exceeds n/k, with estimate error in [0, n/k].  The query
    therefore emits exactly the users with exact_count·k > n_processed
    (an integer comparison — no rounding grid), their exact counts, and
    ``bound_ok`` computed from the fold's est_count:
    est ≤ exact AND (exact − est)·k ≤ n.  Both facts are theorems, so
    the DuckDB oracle is a plain filtered aggregate with constant TRUE;
    any implementation defect in the stateful fold breaks the hash
    (missing row via the inner join, or a FALSE bound_ok).

    Runs the MERGEABLE fold (`_mg_summary_merged`: per-scan-partition
    partials + bounded PODS'12 merge — the 100 TB layout; no
    corpus-sized pandas group) at MG_DECLARED_K (1024, vs the streaming
    default 20) so the guaranteed set is non-trivial at every test
    scale — see the MG_DECLARED_K note.  Merged est_counts differ from
    the sequential fold's, but the declared projection is a theorem
    invariant of BOTH (guaranteed set from exact counts; bound_ok holds
    for any valid MG summary), so the oracle hash is unchanged and
    partition-layout independent.  The k=20 sequential twin parity with
    the streaming operator stays covered by tests/test_streaming_state.py.
    """
    full = _mg_summary_merged(spark, sf_dir, k=MG_DECLARED_K)
    return (
        full.where(
            F.col("exact_count") * MG_DECLARED_K > F.col("n_processed")
        )
        .select(
            "event_type",
            "user_id",
            "exact_count",
            "n_processed",
            (
                (F.col("est_count") <= F.col("exact_count"))
                & (
                    (F.col("exact_count") - F.col("est_count"))
                    * MG_DECLARED_K
                    <= F.col("n_processed")
                )
            ).alias("bound_ok"),
        )
        .orderBy("event_type", "user_id")
    )


def x378_drift_cells(spark, sf_dir):
    """Batch twin of the streaming drift monitor: daily epoch cell
    relations (exactly the stream's ``epoch=<id>`` partitions) merged by
    summation, KS-tested against the frozen first-half baseline.

    Cells bin ``value`` by floor() — the additive (v, c) relation of
    operators/drift.py — so the KS grid is value-domain-bounded
    (~500 cells) regardless of row count.
    """
    from social_warner_spark.operators.drift import merge_cells, two_sample_ks

    ev = T(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.floor("value").cast("long").alias("vbin"),
    )
    # ONE corpus scan: daily cells keyed (day, v) — exactly the stream's
    # per-epoch partitions.  Both halves then derive at CELL granularity
    # (days x bins rows), so baseline assembly exercises the same
    # additive merge the streaming monitor relies on.  The cell relation
    # is persisted because it has two consumers — without it Catalyst
    # re-expands the corpus scan per consumer.
    from social_warner_spark.caching import register_persisted

    daily = register_persisted(
        ev.groupBy("day", F.col("vbin").alias("v"))
        .agg(F.count("*").alias("c"))
        .persist()
    )
    baseline = merge_cells(
        daily.where(F.col("day") < F.lit(DRIFT_SPLIT)).select("v", "c")
    )
    current = merge_cells(
        daily.where(F.col("day") >= F.lit(DRIFT_SPLIT)).select("v", "c")
    )
    return two_sample_ks(baseline, current)


ORACLES = {
    # Misra–Gries guarantee (k−1 counters): every item with
    # frequency > n/k is retained and 0 ≤ exact − est ≤ n/k — both
    # theorems, so the oracle is the exact guaranteed set with
    # constant-TRUE bound_ok.  Integer compare (·k, no division) keeps
    # the filter off any rounding grid.
    "x377_misra_gries_twin": f"""
        WITH exact AS (
            SELECT event_type, user_id,
                   CAST(COUNT(*) AS BIGINT) AS exact_count
            FROM events
            GROUP BY event_type, user_id
        ), tot AS (
            SELECT event_type,
                   CAST(SUM(exact_count) AS BIGINT) AS n_processed
            FROM exact
            GROUP BY event_type
        )
        SELECT e.event_type,
               e.user_id,
               e.exact_count,
               t.n_processed,
               TRUE AS bound_ok
        FROM exact e
        JOIN tot t ON e.event_type = t.event_type
        WHERE e.exact_count * {MG_DECLARED_K} > t.n_processed
        ORDER BY e.event_type, e.user_id
    """,
    "x378_drift_cells": f"""
        WITH ev AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(FLOOR(value) AS BIGINT) AS vbin
            FROM events
        ), a AS (
            SELECT vbin AS v, COUNT(*) AS c FROM ev
            WHERE day < DATE '{DRIFT_SPLIT}' GROUP BY vbin
        ), epoch_cells AS (
            SELECT day, vbin AS v, COUNT(*) AS c FROM ev
            WHERE day >= DATE '{DRIFT_SPLIT}' GROUP BY day, vbin
        ), b AS (
            SELECT v, SUM(c) AS c FROM epoch_cells GROUP BY v
        ), grid AS (
            SELECT COALESCE(a.v, b.v) AS v,
                   COALESCE(a.c, 0) AS ca,
                   COALESCE(b.c, 0) AS cb
            FROM a FULL OUTER JOIN b ON a.v = b.v
        ), tot AS (
            SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
                   CAST(SUM(cb) AS BIGINT) AS n_b
            FROM grid
        ), stepped AS (
            SELECT SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b
            FROM grid
            WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
        ), ks AS (
            SELECT MAX(ABS(cum_a * 1.0 / tot.n_a
                           - cum_b * 1.0 / tot.n_b)) AS ks_raw,
                   tot.n_a, tot.n_b
            FROM stepped, tot
            GROUP BY tot.n_a, tot.n_b
        )
        SELECT n_a, n_b,
               ROUND(ks_raw, 6) AS ks,
               ROUND(1.3581015157406195
                     * SQRT((n_a + n_b) * 1.0 / (n_a * n_b)), 6)
                   AS ks_crit,
               ks_raw > 1.3581015157406195
                   * SQRT((n_a + n_b) * 1.0 / (n_a * n_b)) AS drifted
        FROM ks
    """,
}

QUERIES = {
    "x377_misra_gries_twin": x377_misra_gries_twin,
    "x378_drift_cells": x378_drift_cells,
}
