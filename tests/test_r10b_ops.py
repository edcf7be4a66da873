"""Property gates for the round-10b forecast-evaluation batch
(plans/queries_r10b.py): replay the daily differences in pandas,
assemble VR(q)/pinball/DM from the emitted sufficient statistics, and
pin the statistics' internal identities.
"""

from __future__ import annotations

import math

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_Q = 5
_SEASON = 7


def _daily(ev: pd.DataFrame) -> dict[str, list[int]]:
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["c"] = (ev["value"].astype(float) * 100).round().astype("int64")
    d = ev.groupby(["event_type", "day"])["c"].sum().reset_index()
    return {
        et: [int(v) for v in g.sort_values("day")["c"]]
        for et, g in d.groupby("event_type")
    }


def test_variance_ratio_matches_replay_and_assembles(spark):
    rows = (
        REGISTRY["evt_variance_ratio_test"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {r["event_type"]: r for r in rows}
    series = _daily(pd.read_parquet(f"{SF}/events.parquet"))
    assert set(got) == set(series)
    for et, xs in series.items():
        d1 = [b - a for a, b in zip(xs, xs[1:])]
        dq = [xs[i] - xs[i - _Q] for i in range(_Q, len(xs))]
        r = got[et]
        assert int(r["n1"]) == len(d1)
        assert int(r["s1"]) == sum(d1)
        assert int(r["ss1"]) == sum(v * v for v in d1)
        assert int(r["nq"]) == len(dq)
        assert int(r["sq"]) == sum(dq)
        assert int(r["ssq"]) == sum(v * v for v in dq)
        # assemble VR(q): biased variances of each difference series
        n1, nq = len(d1), len(dq)
        v1 = (int(r["ss1"]) - int(r["s1"]) ** 2 / n1) / n1
        vq = (int(r["ssq"]) - int(r["sq"]) ** 2 / nq) / nq
        vr = (vq / _Q) / v1
        assert math.isfinite(vr) and vr > 0
        # asymptotic z under homoskedastic null
        z = (vr - 1.0) / math.sqrt(
            2.0 * (2 * _Q - 1) * (_Q - 1) / (3.0 * _Q * n1)
        )
        assert math.isfinite(z)


def test_pinball_loss_matches_replay(spark):
    rows = (
        REGISTRY["evt_pinball_loss"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {(r["event_type"], int(r["tau_pm"])): r for r in rows}
    series = _daily(pd.read_parquet(f"{SF}/events.parquet"))
    for et, xs in series.items():
        for tau in (100, 500, 900):
            want = 0
            for yhat, y in zip(xs, xs[1:]):
                want += (
                    tau * (y - yhat)
                    if y >= yhat
                    else (1000 - tau) * (yhat - y)
                )
            r = got[(et, tau)]
            assert int(r["n"]) == len(xs) - 1
            assert int(r["pinball_mc"]) == want
    # τ=500 pinball is exactly 500×(sum of absolute errors): MAE twin
    for et, xs in series.items():
        sae = sum(abs(b - a) for a, b in zip(xs, xs[1:]))
        assert int(got[(et, 500)]["pinball_mc"]) == 500 * sae


def test_diebold_mariano_matches_replay_and_assembles(spark):
    rows = (
        REGISTRY["evt_diebold_mariano"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {r["event_type"]: r for r in rows}
    series = _daily(pd.read_parquet(f"{SF}/events.parquet"))
    for et, xs in series.items():
        ds = []
        for i in range(_SEASON, len(xs)):
            l1 = abs(xs[i] - xs[i - 1])
            l7 = abs(xs[i] - xs[i - _SEASON])
            ds.append(l1 - l7)
        r = got[et]
        assert int(r["n"]) == len(ds)
        assert int(r["sd"]) == sum(ds)
        assert int(r["sdd"]) == sum(v * v for v in ds)
        assert int(r["sd_lag1"]) == sum(
            a * b for a, b in zip(ds, ds[1:])
        )
        # assemble the DM statistic with HAC lag-1 variance
        n = len(ds)
        mean = int(r["sd"]) / n
        g0 = int(r["sdd"]) / n - mean * mean
        g1 = int(r["sd_lag1"]) / (n - 1) - mean * mean
        hac = g0 + 2.0 * g1
        if hac > 0:
            dm = mean / math.sqrt(hac / n)
            assert math.isfinite(dm)
