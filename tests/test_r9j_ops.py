"""Property gates for the round-9j randomness/complexity batch
(plans/queries_r9j.py): brute-force the daily series from raw parquet,
recount turning points and ordinal patterns in Python, and assemble the
z-score / permutation entropy against float references.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _day_series():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    out = {}
    for et, g in ev.groupby("event_type"):
        s = g.groupby("day")["v"].sum().sort_index()
        out[et] = [int(x) for x in s]
    return out


def test_turning_points_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_turning_points"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    series = _day_series()
    assert set(got) == set(series)
    for et, xs in series.items():
        n = len(xs)
        t = sum(
            1
            for i in range(1, n - 1)
            if (xs[i - 1] < xs[i] and xs[i] > xs[i + 1])
            or (xs[i - 1] > xs[i] and xs[i] < xs[i + 1])
        )
        row = got[et]
        assert int(row["n"]) == n
        assert int(row["n_turning"]) == t, et
        assert int(row["mu_num"]) == 2 * (n - 2)
        assert int(row["var_num"]) == 16 * n - 29
        mu = 2.0 * (n - 2) / 3.0
        sd = math.sqrt((16.0 * n - 29.0) / 90.0)
        z = (t - mu) / sd
        assert math.isfinite(z)
        # daily totals of random event values: not wildly non-random
        assert abs(z) < 10.0, (et, z)


def _pattern(a, b, c):
    r0 = (b < a) + (c < a)
    r1 = (a <= b) + (c < b)
    r2 = (a <= c) + (b <= c)
    assert sorted((r0, r1, r2)) == [0, 1, 2]
    return 100 * r0 + 10 * r1 + r2


def test_permutation_entropy_matches_bruteforce(spark):
    rows = (
        REGISTRY["evt_permutation_entropy"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = defaultdict(dict)
    m_of = {}
    for r in rows:
        got[r["event_type"]][int(r["pattern"])] = int(r["c"])
        m_of[r["event_type"]] = int(r["m"])
    series = _day_series()
    assert set(got) == set(series)
    valid = {
        100 * r0 + 10 * r1 + r2
        for r0 in range(3)
        for r1 in range(3)
        for r2 in range(3)
        if sorted((r0, r1, r2)) == [0, 1, 2]
    }
    assert len(valid) == 6
    for et, xs in series.items():
        want = Counter(
            _pattern(xs[i], xs[i + 1], xs[i + 2])
            for i in range(len(xs) - 2)
        )
        assert got[et] == dict(want), et
        assert set(got[et]) <= valid
        m = m_of[et]
        assert m == len(xs) - 2 == sum(want.values())
        # assembled permutation entropy: 0 <= H <= ln 6, normalized <= 1
        h = -sum(
            (c / m) * math.log(c / m) for c in want.values() if c
        )
        hn = h / math.log(6.0)
        assert 0.0 <= hn <= 1.0 + 1e-12
        # a noisy daily aggregate should not look deterministic
        assert hn > 0.2, (et, hn)
