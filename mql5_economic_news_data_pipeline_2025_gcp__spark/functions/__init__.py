"""Scalar column-expression library (no Python UDFs in the hot path)."""

from .parsers import (
    clean_text,
    combine_date_time,
    format_event_date,
    impact_ordinal,
    month_bucket,
    parse_date_multi,
    parse_numeric,
    parse_time_to_seconds,
    trim_fill_dim,
)

__all__ = [
    "clean_text",
    "combine_date_time",
    "format_event_date",
    "impact_ordinal",
    "month_bucket",
    "parse_date_multi",
    "parse_numeric",
    "parse_time_to_seconds",
    "trim_fill_dim",
]
