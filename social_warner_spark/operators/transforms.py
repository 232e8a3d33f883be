"""Reference transform operators, Spark-first (SURVEY.md §2.a A2, A5–A7, A10–A12).

Every function is DataFrame → DataFrame and stays entirely inside Catalyst
expressions (whole-stage codegen; no Python in the row path), so at 100 TB
these are narrow, pipelined map stages with zero shuffle.

Reference semantics (cited per function): pandas transforms in
/root/reference/data_transform.py.
"""

from __future__ import annotations

from functools import reduce
from operator import or_
from typing import Iterable, Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def qcol(name: str) -> Column:
    """Column reference that tolerates dots in the name (reference columns
    are dotted, e.g. `lfm.fact.date_str`); backtick-quoted so Spark does not
    parse the dots as struct-field access."""
    return F.col(f"`{name}`")


def scrub_sentinel_rows(df: DataFrame, sentinel: str = "unauthorized") -> DataFrame:
    """Drop rows where ANY string column equals `sentinel`.

    Reference: ``df[~df.isin(['unauthorized']).any(axis=1)]``
    (data_transform.py:24).  The pandas version compares every column; a
    non-string column can never equal a string sentinel, so restricting the
    disjunction to string columns is semantically identical and keeps the
    predicate sane under ANSI SQL typing.
    """
    string_cols = [c for c, t in df.dtypes if t == "string"]
    if not string_cols:
        return df
    hit = reduce(or_, [qcol(c) == F.lit(sentinel) for c in string_cols])
    # coalesce(hit, false): NULL columns must not drop the row (pandas isin
    # treats NaN as non-match).
    return df.filter(~F.coalesce(hit, F.lit(False)))


def project_columns(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """Keep exactly `columns`, in order (reference data_transform.py:31-32).

    Catalyst column pruning pushes this into the scan's ReadSchema.
    """
    return df.select(*[qcol(c).alias(c) for c in columns])


#: config dtype → (spark type, fill value) per the reference cast table
#: (data_transform.py:34-44; SURVEY.md §1.2)
_CAST_RULES: dict[str, tuple[str, object | None]] = {
    "int64": ("long", 0),
    "float64": ("double", 0.0),
    "datetime64[ns]": ("timestamp", None),
    "string": ("string", None),
}


def cast_with_fill(df: DataFrame, dtype_map: Mapping[str, str]) -> DataFrame:
    """Per-column typed cast with the reference's null-fill semantics.

    - int64:  unparsable/null → 0   (data_transform.py:38)
    - float64: unparsable/null → 0.0 (data_transform.py:40)
    - datetime64[ns]: unparsable → NULL (data_transform.py:42)
    - string: nullable string (data_transform.py:44)

    Uses ``try_cast`` so ANSI mode keeps coerce-to-null semantics; the whole
    map compiles to a single `select` of codegen'd expressions.
    """
    exprs: list[Column] = []
    for name in df.columns:
        dtype = dtype_map.get(name)
        if dtype is None:
            exprs.append(qcol(name))
            continue
        if dtype not in _CAST_RULES:
            raise ValueError(f"unsupported config dtype {dtype!r} for column {name!r}")
        spark_type, fill = _CAST_RULES[dtype]
        casted = qcol(name).try_cast(spark_type)
        if fill is not None:
            casted = F.coalesce(casted, F.lit(fill).cast(spark_type))
        exprs.append(casted.alias(name))
    return df.select(*exprs)


def format_date_columns(
    df: DataFrame, columns: Iterable[str], fmt: str = "yyyy-MM-dd"
) -> DataFrame:
    """Date/timestamp → formatted string (reference data_transform.py:71-72)."""
    out = df
    for c in columns:
        if c in out.columns:
            out = out.withColumn(c, F.date_format(qcol(c), fmt))
    return out


def format_timestamp_columns(
    df: DataFrame, columns: Iterable[str], fmt: str = "yyyy-MM-dd'T'HH:mm:ss"
) -> DataFrame:
    """Timestamp → ISO-8601 string (reference data_transform.py:73-76)."""
    return format_date_columns(df, columns, fmt)


def sanitize_column_names(df: DataFrame, old: str = ".", new: str = "&") -> DataFrame:
    """Bulk rename: every column name `.` → `&` (data_transform.py:152-173).

    Single ``toDF`` — a pure metadata operation, no job.
    """
    return df.toDF(*[c.replace(old, new) for c in df.columns])


def union_pages(pages: Iterable[DataFrame]) -> DataFrame:
    """Vertical concat of per-page frames (reference ``pd.concat``,
    data_extract.py:94).  `unionByName` aligns columns by name, matching
    pandas concat semantics; in a distributed source the pages are simply
    partitions and this is a no-op metadata union.
    """
    pages = list(pages)
    if not pages:
        raise ValueError("union_pages: no pages to union (reference raises on empty)")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), pages
    )


def global_index(
    df: DataFrame,
    order_exprs: list[Column],
    out_col: str = "gidx",
    partitions: int | None = None,
) -> DataFrame:
    """Dense global row numbering 1..N in total (order_exprs) order WITHOUT
    the single-partition window anti-pattern.

    ``row_number() OVER (ORDER BY …)`` with no partition moves the whole
    table through ONE task — the canonical scale-killer.  This operator
    instead: range-partitions on the order expressions (disjoint, ordered
    key ranges), ranks WITHIN each partition, computes per-partition row
    counts (a |partitions|-row relation), turns them into cumulative
    offsets with a window over that tiny relation, and broadcasts the
    offsets back: gidx = offset(partition) + local rank.

    The result is identical for ANY disjoint ordered partitioning, so the
    range sampler's boundary choices never affect values.  order_exprs
    must be a total order (include a unique tiebreak column).

    The staged relation is PERSISTED (registered for host release):
    the offsets branch and the rank branch are two separate range
    exchanges in the physical plan (verified: Catalyst does NOT reuse
    them — column pruning makes the subtrees differ), so without the
    pin the two branches could in principle sample different partition
    bounds and the offsets would label the wrong partitions.  Spark's
    samplers happen to be deterministic per input today; the persist
    makes the single-materialization guarantee explicit instead of
    relying on that implementation detail (same discipline as
    operators/ordered.py).

    Cost: the range exchange, the per-partition sort, and one extra hash
    exchange on the partition id (Catalyst can't see that range
    partitioning already satisfies the window's clustering).  At 100 TB
    fuse rank+offset into mapInPandas over sortWithinPartitions if that
    exchange matters; the offsets relation stays |partitions| rows either
    way.
    """
    from pyspark.sql import Window

    num = int(
        partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    from social_warner_spark.caching import register_persisted

    staged = register_persisted(
        df.repartitionByRange(num, *order_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = staged.groupBy("_pid").agg(F.count("*").alias("_c"))
    # window over |partitions| rows — bounded, not a data-volume window
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_c").over(wo), F.lit(0)).alias("_off")
    )
    ranked = staged.withColumn(
        "_r", F.row_number().over(Window.partitionBy("_pid").orderBy(*order_exprs))
    )
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_r")).cast("long"))
        .drop("_pid", "_r", "_off")
    )
