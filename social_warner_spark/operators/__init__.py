"""Operator library.

Each module re-expresses one family of reference capabilities (SURVEY.md §2)
as composable DataFrame→DataFrame functions, plus the north-star extension
operators (dedup, similarity, text analysis, multimodal).
"""

from social_warner_spark.operators.transforms import (
    scrub_sentinel_rows,
    project_columns,
    cast_with_fill,
    format_date_columns,
    format_timestamp_columns,
    sanitize_column_names,
    union_pages,
)
from social_warner_spark.operators.nested import (
    parse_kv_list,
    dynamic_pivot_map,
)
from social_warner_spark.operators.datemacro import eval_date_macro

__all__ = [
    "scrub_sentinel_rows",
    "project_columns",
    "cast_with_fill",
    "format_date_columns",
    "format_timestamp_columns",
    "sanitize_column_names",
    "union_pages",
    "parse_kv_list",
    "dynamic_pivot_map",
    "eval_date_macro",
]
