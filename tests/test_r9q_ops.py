"""Property gates for the round-9q control-chart/fractal batch
(plans/queries_r9q.py): brute-force subgroups and curve lengths from
raw parquet, assemble control limits (A2/D3/D4 for n=5) and the
log-log FD slope against float references.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_N = 5
_A2, _D3, _D4 = 0.577, 0.0, 2.114


def _events():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    return ev


def test_xbar_r_chart_subgroups_and_limits(spark):
    df = (
        REGISTRY["evt_xbar_r_chart"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values(["event_type", "day"])
    )
    ev = _events().sort_values(["ts", "event_id"])
    want = defaultdict(dict)
    for (et, day), g in ev.groupby(["event_type", "day"]):
        vs = [int(x) for x in g["v"].head(_N)]
        if len(vs) == _N:
            want[et][day] = (sum(vs), max(vs) - min(vs))
    for et, days in want.items():
        g = df[df["event_type"] == et]
        got = {
            r["day"]: (int(r["sg_sum"]), int(r["sg_range"]))
            for r in g.to_dict("records")
        }
        assert got == days, et
        k = len(days)
        assert set(g["k"]) == {k}
        assert set(g["sum_sums"]) == {sum(s for s, _ in days.values())}
        assert set(g["sum_ranges"]) == {sum(r for _, r in days.values())}
        # assemble the chart: limits and out-of-control counts
        xbb = sum(s for s, _ in days.values()) / (_N * k)
        rbar = sum(r for _, r in days.values()) / k
        ucl_x, lcl_x = xbb + _A2 * rbar, xbb - _A2 * rbar
        ucl_r, lcl_r = _D4 * rbar, _D3 * rbar
        assert rbar >= 0 and ucl_r >= rbar
        viol = sum(
            1
            for s, r in days.values()
            if not (lcl_x <= s / _N <= ucl_x) or not (lcl_r <= r <= ucl_r)
        )
        assert 0 <= viol <= k


def test_higuchi_fd_sums_and_slope(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_higuchi_fd"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = _events()
    series = {
        et: [int(x) for x in g.groupby("day")["v"].sum().sort_index()]
        for et, g in ev.groupby("event_type")
    }
    assert set(got) == set(series)
    for et, xs in series.items():
        row = got[et]
        n = len(xs)
        assert int(row["n"]) == n
        lengths = []
        for k in (1, 2, 3, 4):
            s = sum(abs(xs[i] - xs[i - k]) for i in range(k, n))
            m = n - k
            assert int(row[f"s{k}"]) == s, (et, k)
            assert int(row[f"m{k}"]) == m
            # Higuchi normalization: mean |diff| per step, scaled 1/k
            lengths.append(s / m / k)
        # log-log slope: L(k) ~ k^(1-FD)  =>  FD = 1 - slope
        lx = [math.log(1.0 / k) for k in (1, 2, 3, 4)]
        ly = [math.log(l) for l in lengths]
        mx, my = sum(lx) / 4, sum(ly) / 4
        slope = sum((a - mx) * (b - my) for a, b in zip(lx, ly)) / sum(
            (a - mx) ** 2 for a in lx
        )
        fd = 1.0 + slope  # L(k)/k ~ k^(-FD) against 1/k axes
        # daily aggregates of noisy values: rough, not smooth
        assert 0.5 < fd < 2.5, (et, fd)
