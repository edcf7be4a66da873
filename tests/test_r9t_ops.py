"""Property gates for the round-9t risk batch (plans/queries_r9t.py):
brute-force the train-half VaR order statistic, the held-out violation
count, and the partial moments from raw parquet; assemble the Kupiec
LR and Omega/Sortino; pin the UPM−LPM identity in Python bigints.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_S20 = 1048576


def _diffs():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    out = {}
    for et, g in ev.groupby("event_type"):
        xs = [int(x) for x in g.groupby("day")["v"].sum().sort_index()]
        out[et] = [b - a for a, b in zip(xs, xs[1:])]
    return out


def test_kupiec_var_backtest_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_kupiec_var_backtest"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    diffs = _diffs()
    assert set(got) == set(diffs)
    for et, dr in diffs.items():
        n = len(dr)
        train = [dr[i] for i in range(n) if 2 * (i + 1) <= n]
        test = [dr[i] for i in range(n) if 2 * (i + 1) > n]
        m = len(train)
        # nearest-rank 10th percentile: smallest value with 10*rk >= m
        srt = sorted(train)
        var_c = next(
            v for rk, v in enumerate(srt, start=1) if 10 * rk >= m
        )
        x = sum(1 for v in test if v < var_c)
        row = got[et]
        assert int(row["n_train"]) == m
        assert int(row["n_test"]) == len(test)
        assert int(row["var_c"]) == var_c, et
        assert int(row["x_viol"]) == x, et
        assert 0 <= x <= len(test)
        # Kupiec POF LR (guard the boundary cases)
        p, nt = 0.1, len(test)
        if 0 < x < nt:
            ll0 = (nt - x) * math.log(1 - p) + x * math.log(p)
            ph = x / nt
            ll1 = (nt - x) * math.log(1 - ph) + x * math.log(ph)
            lr = -2.0 * (ll0 - ll1)
            assert lr >= -1e-9


def test_downside_risk_partial_moments(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_downside_risk"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    diffs = _diffs()
    assert set(got) == set(diffs)
    for et, dr in diffs.items():
        row = got[et]
        n = len(dr)
        lpm1 = sum(-v for v in dr if v < 0)
        upm1 = sum(v for v in dr if v > 0)
        lpm2 = sum(v * v for v in dr if v < 0)
        assert int(row["n"]) == n
        assert int(row["sum_dr"]) == sum(dr)
        assert int(row["lpm1"]) == lpm1
        assert int(row["upm1"]) == upm1
        got_lpm2 = (
            int(row["lpm2_2"]) * _S20 * _S20
            + int(row["lpm2_1"]) * _S20
            + int(row["lpm2_0"])
        )
        assert got_lpm2 == lpm2, et
        # identity pinned exactly in bigints
        assert upm1 - lpm1 == sum(dr)
        # assemble Omega and Sortino
        if lpm1 > 0:
            omega = upm1 / lpm1
            assert omega > 0
        if lpm2 > 0:
            sortino = (sum(dr) / n) / math.sqrt(lpm2 / n)
            assert math.isfinite(sortino)
