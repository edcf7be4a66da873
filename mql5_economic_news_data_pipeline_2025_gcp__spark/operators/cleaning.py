"""Ingest cleaning chain (reference PUSH:194-231, rebuilt as ONE lazy
DataFrame lineage — SURVEY §3.1).

Reference steps → Spark mapping:
- drop `IsHoliday`/`WeekRange` (P2)           → column pruning at select
- parse Date (F1, 9 formats) / Time (F2)      → expression coalesce chains
- clean text cols to 'N/A' sentinel (F3)      → when/trim expressions
- dropna on Date/Time (P3)                    → filter on parse success
- DateTime = Date + Time (F6)                 → event_ts timestamp
- high-water-mark filter (P4, A1)             → scalar max + filter

Catalyst folds all of this into a single scan stage; nothing here
shuffles. At 100 TB the chain is embarrassingly parallel per input split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parsers import (
    clean_text,
    parse_date_multi,
    parse_time_to_seconds,
)


def clean_raw_events(raw: DataFrame) -> DataFrame:
    """Raw 10-col string CSV frame → canonical typed events frame.

    Returns columns: event_ts, Date, Time (normalized 'HH:mm'), Currency,
    Event, Impact, Actual, Forecast, Previous. Rows whose Date or Time
    fail every accepted format are dropped (reference PUSH:220).
    """
    d = parse_date_multi(F.col("Date"))
    secs = parse_time_to_seconds(F.col("Time"))
    time_norm = F.concat_ws(
        ":",
        F.lpad(F.floor(secs / 3600).cast("string"), 2, "0"),
        F.lpad(F.floor((secs % 3600) / 60).cast("string"), 2, "0"),
    )
    out = (
        raw.select(
            d.alias("_date"),
            secs.alias("_secs"),
            time_norm.alias("Time"),
            clean_text("Currency").alias("Currency"),
            clean_text("Event").alias("Event"),
            clean_text("Impact").alias("Impact"),
            clean_text("Actual").alias("Actual"),
            clean_text("Forecast").alias("Forecast"),
            clean_text("Previous").alias("Previous"),
        )
        .filter(F.col("_date").isNotNull() & F.col("_secs").isNotNull())
        .withColumn(
            "event_ts",
            F.to_timestamp(F.col("_date")) + F.make_interval(secs=F.col("_secs")),
        )
        .select(
            "event_ts",
            F.col("_date").alias("Date"),
            "Time",
            "Currency",
            "Event",
            "Impact",
            "Actual",
            "Forecast",
            "Previous",
        )
    )
    return out


def high_water_mark_filter(new_df: DataFrame, existing: DataFrame | None) -> DataFrame:
    """P4/A1: keep only rows strictly newer than the existing table's max
    event_ts (reference PUSH:160-167). The scalar max is one tiny agg job;
    Catalyst then folds it into a literal pushed-down predicate."""
    if existing is None:
        return new_df
    hwm = existing.agg(F.max("event_ts").alias("hwm")).first()["hwm"]
    if hwm is None:
        return new_df
    return new_df.filter(F.col("event_ts") > F.lit(hwm))
