"""Local mirror of the driver's correctness gate: run a declared query in
Spark AND its DuckDB oracle, canonicalize both (sort columns by name, sort
rows, round floats), and diff values.

Used by tests/test_correctness.py for every (queries, oracle_sql) pair.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from social_warner_spark.catalog import TABLES, table_path

FLOAT_DECIMALS = 6


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(FLOAT_DECIMALS)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif s.dtype == object:
            df[c] = s.where(pd.notna(s), None)
    df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def compare(spark_df, duck_df: pd.DataFrame) -> tuple[bool, str]:
    a = canonicalize(spark_df.toPandas())
    b = canonicalize(duck_df)
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return False, f"row counts differ: spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            bad = ~(
                (av.isna() & bv.isna())
                | ((av - bv).abs() <= 10 ** -(FLOAT_DECIMALS - 1))
            )
        else:
            bad = ~((av.isna() & bv.isna()) | (av.astype(object) == bv.astype(object)))
        if bad.any():
            i = bad.idxmax()
            return False, (
                f"column {c!r} differs at canonical row {i}: "
                f"spark={a[c][i]!r} duck={b[c][i]!r} "
                f"(spark row: {a.iloc[i].to_dict()})"
            )
    return True, "ok"
