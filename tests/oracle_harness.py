"""Local mirror of the driver's correctness gate: run a declared query in
Spark AND its DuckDB oracle, canonicalize both (sort columns by name, sort
rows, round floats), and diff values.

Used by tests/test_correctness.py for every (queries, oracle_sql) pair.
"""

from __future__ import annotations

import decimal
import math
from decimal import Decimal

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


def _dtype_class(s: pd.Series) -> str:
    """Serialization class of a column — the driver hashes SERIALIZED
    values, so an int column and a float column holding the same numbers
    hash differently ("331" vs "331.0").  This is the class that must
    match between the Spark result and the DuckDB oracle (the r03 x272
    defect: DuckDB's windowed SUM(BIGINT) returns HUGEINT → pandas
    float64 → "331.0" vs Spark long "331")."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def _render_float(f: float) -> str:
    """Decimal-string rendering with explicit ROUND_HALF_UP at
    FLOAT_DECIMALS — the documented driver rounding — independent of
    Python round()'s banker's rounding and of numpy's repr (numpy >= 2
    renders np.float64 as 'np.float64(x)'; ADVICE r04).  Trailing zeros
    are stripped but one fractional digit is kept, matching the float
    repr forms the mirror hashed historically ('331.0', '0.1').

    Extreme magnitudes render POSITIONALLY, not scientifically
    (1.5e16 → '15000000000000000.0', 1e-05 → '0.00001') — this differs
    from repr() but is harmless for driver parity: the driver hashes
    BOTH the Spark result and the oracle result through its own single
    serializer, so the mirror only has to reproduce the driver's
    EQUALITY semantics (ROUND_HALF_UP at FLOAT_DECIMALS), not its exact
    byte forms.  tests/test_oracle_harness.py pins these renderings so
    any change is a conscious one (ADVICE r05)."""
    if math.isinf(f):
        return repr(f)
    with decimal.localcontext() as ctx:
        ctx.prec = 60
        d = Decimal(repr(f)).quantize(
            Decimal(1).scaleb(-FLOAT_DECIMALS), rounding=decimal.ROUND_HALF_UP
        )
    s = format(d, "f")
    s = s.rstrip("0")
    if s.endswith("."):
        s += "0"
    return s


def _render_cell(v) -> str:
    """Dtype-faithful canonical rendering of one value — mirrors the
    driver's hash input: ints render bare, floats with a fractional
    part, nulls as NULL."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return _render_float(float(v))
    if isinstance(v, (bool,)):
        return "true" if v else "false"
    if isinstance(v, (int,)):
        return str(v)
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def compare(spark_df, duck_df: pd.DataFrame) -> tuple[bool, str]:
    a = canonicalize(spark_df.toPandas())
    b = canonicalize(duck_df)
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return False, f"row counts differ: spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # Tolerant numeric pass first: catches real VALUE bugs with a
        # precise message before the stricter serialization pass runs.
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avf = pd.to_numeric(av, errors="coerce").astype(float)
            bvf = pd.to_numeric(bv, errors="coerce").astype(float)
            bad = ~(
                (avf.isna() & bvf.isna())
                | ((avf - bvf).abs() <= 10 ** -(FLOAT_DECIMALS - 1))
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
        # Strict serialization pass: the driver hashes the SERIALIZED
        # canonical rows, so the dtype class (int vs float rendering)
        # must agree even when values are numerically equal.
        ka, kb = _dtype_class(av), _dtype_class(bv)
        if ka != kb:
            return False, (
                f"column {c!r} serialization class differs: spark={ka} "
                f"({av.dtype}) duck={kb} ({bv.dtype}) — values match but "
                f"the driver's value hash would not (int vs float render)"
            )
        if ka in ("object", "float"):
            ra = av.map(_render_cell)
            rb = bv.map(_render_cell)
            badr = ra != rb
            if badr.any():
                i = badr.idxmax()
                return False, (
                    f"column {c!r} canonical rendering differs at row {i}: "
                    f"spark={ra[i]!r} duck={rb[i]!r} — within numeric "
                    f"tolerance but the driver's value hash would differ"
                )
    return True, "ok"
