"""Unit tests for the scalar function library (F1-F9) against edge cases
lifted from the reference parsers (SURVEY §2.8, FIXTURES.md B1)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.functions import (
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


def _eval(spark, col, values, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], schema=f"v {in_type}")
    return [r[0] for r in df.select(col).collect()]


def test_parse_date_formats(spark):
    cases = {
        "2025-03-04": datetime.date(2025, 3, 4),
        "4 March 2025": datetime.date(2025, 3, 4),
        "03/04/2025": datetime.date(2025, 3, 4),  # US wins ambiguity (F1 order)
        "25/12/2025": datetime.date(2025, 12, 25),  # unambiguous day-first
        "2025/3/4": datetime.date(2025, 3, 4),
        "03-04-2025": datetime.date(2025, 3, 4),
        "25-12-2025": datetime.date(2025, 12, 25),
        "Mar 4, 2025": datetime.date(2025, 3, 4),
        "March 4, 2025": datetime.date(2025, 3, 4),
        " 2025-03-04 ": datetime.date(2025, 3, 4),
        "garbage": None,
        "": None,
    }
    got = _eval(spark, parse_date_multi(F.col("v")), list(cases))
    assert got == list(cases.values())


def test_parse_time_formats(spark):
    cases = {
        "17:00": 17 * 3600,
        "5:30 PM": 17 * 3600 + 30 * 60,
        "05:30": 5 * 3600 + 30 * 60,
        "17:00:30": 17 * 3600 + 30,
        "0 days 17:00:00": 17 * 3600,
        "nonsense": None,
        "": None,
    }
    got = _eval(spark, parse_time_to_seconds(F.col("v")), list(cases))
    assert got == list(cases.values())


def test_clean_text(spark):
    cases = {
        "  USD ": "USD",
        "": "N/A",
        "nan": "N/A",
        "None": "N/A",
        "NULL": "N/A",
        None: "N/A",
        "ok": "ok",
    }
    got = _eval(spark, clean_text(F.col("v")), list(cases))
    assert got == list(cases.values())


def test_parse_numeric(spark):
    cases = {
        "3.4%": 3.4,
        "-0.1": -0.1,
        "250K": 250_000.0,
        "1.2M": 1_200_000.0,
        "0.5B": 500_000_000.0,
        "2T": 2e12,
        "+1.5k": 1500.0,
        "abc": None,
        "N/A": None,
        None: None,
        "42": 42.0,
        " -2.5% ": -2.5,
    }
    got = _eval(spark, parse_numeric(F.col("v")), list(cases))
    for g, e in zip(got, cases.values()):
        if e is None:
            assert g is None
        else:
            assert abs(g - e) < 1e-9


def test_impact_ordinal(spark):
    cases = {"low": 1, "medium": 2, "high": 3, "High": 0, "": 0, None: 0}
    got = _eval(spark, impact_ordinal(F.col("v")), list(cases))
    assert got == list(cases.values())


def test_combine_and_format(spark):
    df = spark.createDataFrame(
        [("2025-03-04", "17:00")], schema="d string, t string"
    )
    row = df.select(
        combine_date_time(F.to_date("d"), F.col("t")).alias("ts"),
        format_event_date(F.to_date("d")).alias("fmt"),
        month_bucket(F.to_date("d")).alias("m"),
    ).first()
    assert row["ts"] == datetime.datetime(2025, 3, 4, 17, 0)
    assert row["fmt"] == "4 March 2025"
    assert row["m"] == datetime.date(2025, 3, 1)


def test_trim_fill_dim(spark):
    cases = {" x ": "x", None: "Unknown"}
    got = _eval(spark, trim_fill_dim(F.col("v")), list(cases))
    assert got == list(cases.values())
