"""Property-based gates for the session-3 operators: random inputs vs
pure-python brute force (beyond the fixed testdata the oracle covers)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.asof import (
    asof_nearest_join,
)

BASE = dt.datetime(2024, 1, 1)


@st.composite
def _events(draw):
    lts = draw(
        st.lists(st.integers(0, 1000), min_size=1, max_size=12, unique=True)
    )
    rts = draw(
        st.lists(st.integers(0, 1000), min_size=0, max_size=12, unique=True)
    )
    return lts, rts


@given(_events())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_nearest_matches_bruteforce(spark, ev):
    lts, rts = ev
    left = spark.createDataFrame(
        [(i, "k", BASE + dt.timedelta(seconds=s)) for i, s in enumerate(lts)],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", BASE + dt.timedelta(seconds=s), s * 10) for s in rts]
        or [("zz", BASE, 0)],  # schema needs ≥1 row; unmatched key
        "user_id string, ts timestamp, rv long",
    )
    out = {
        r["event_id"]: r["rv_near"]
        for r in asof_nearest_join(
            left, right, key=["user_id"], value_col="rv"
        ).collect()
    }

    def brute(s):
        if not rts:
            return None
        # nearest |Δ|, ties to the EARLIER right row
        best = min(rts, key=lambda r: (abs(r - s), r))
        return best * 10

    for i, s in enumerate(lts):
        assert out[i] == brute(s), (s, sorted(rts), out[i])


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)),  # (user, day)
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rolling_distinct_matches_bruteforce(spark, pairs):
    """The interval-merge + sweep form equals the brute-force 'users
    active in the trailing 7 days' count on random activity sets."""
    rows = [
        (u, BASE + dt.timedelta(days=d, hours=1), "view")
        for u, d in pairs
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, (u, ts, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r4b import (
        rolling_distinct_days,
    )

    got = {
        (r["day"], r["n_active_7d"]): None
        for r in rolling_distinct_days(ev, window=7).collect()
    }
    days = {d for _, d in pairs}
    for d in days:
        want = len({u for u, dd in pairs if d - 6 <= dd <= d})
        key = ((BASE + dt.timedelta(days=d)).date(), want)
        assert key in got, (d, want, sorted(got))
