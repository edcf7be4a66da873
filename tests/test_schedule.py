"""Cadence arithmetic for the monthly batch (reference DAG
schedule_interval '0 0 1 * *')."""

from __future__ import annotations

import datetime as dt

from mql5_economic_news_data_pipeline_2025_gcp__spark.streaming.schedule import (
    fires_between,
    next_monthly_fire,
)


def test_next_fire_basic_and_rollover():
    # mid-month -> 1st of next month
    assert next_monthly_fire(dt.datetime(2025, 3, 15, 12)) == dt.datetime(2025, 4, 1)
    # exactly at a fire time -> strictly after, so next month
    assert next_monthly_fire(dt.datetime(2025, 4, 1)) == dt.datetime(2025, 5, 1)
    # one microsecond before the fire -> that fire
    assert next_monthly_fire(
        dt.datetime(2025, 3, 31, 23, 59, 59, 999999)
    ) == dt.datetime(2025, 4, 1)
    # December rolls into January of the next year
    assert next_monthly_fire(dt.datetime(2025, 12, 31)) == dt.datetime(2026, 1, 1)
    # non-default cadence (15th at 02:30)
    assert next_monthly_fire(
        dt.datetime(2025, 3, 20), day=15, hour=2, minute=30
    ) == dt.datetime(2025, 4, 15, 2, 30)


def test_catchup_fires():
    fires = fires_between(dt.datetime(2025, 1, 10), dt.datetime(2025, 4, 10))
    assert fires == [
        dt.datetime(2025, 2, 1),
        dt.datetime(2025, 3, 1),
        dt.datetime(2025, 4, 1),
    ]
    # empty window -> nothing to catch up
    assert fires_between(dt.datetime(2025, 1, 2), dt.datetime(2025, 1, 20)) == []
