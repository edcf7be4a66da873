"""Property gates for the round-12d batch: exact-integer replay of the
risk ratios plus the Sortino/Sharpe and Omega/sign-count relationships."""

from __future__ import annotations

import math

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _daily_changes():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["value_c"] = (ev["value"] * 100).round().astype("int64")
    ev["day"] = ev["ts"].dt.date
    d = (
        ev.groupby(["event_type", "day"])["value_c"]
        .sum()
        .reset_index(name="x")
        .sort_values(["event_type", "day"])
    )
    out = {}
    for t_, g in d.groupby("event_type"):
        xs = list(g["x"])
        out[t_] = [b - a for a, b in zip(xs, xs[1:])]
    return out


def test_sharpe_sortino_matches_replay(spark):
    rows = (
        REGISTRY["evt_sharpe_sortino"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    chg = _daily_changes()
    for r in rows:
        rs = chg[r["event_type"]]
        n, s = len(rs), sum(rs)
        q = sum(x * x for x in rs)
        dsq = sum(x * x for x in rs if x < 0)
        assert (int(r["n"]), int(r["s"]), int(r["q"]), int(r["dsq"])) == (
            n,
            s,
            q,
            dsq,
        )
        if n * q - s * s > 0:
            assert abs(
                r["sharpe"] - round(s / math.sqrt(n * q - s * s), 6)
            ) < 1e-12
        if dsq > 0:
            assert abs(
                r["sortino"] - round(s / math.sqrt(n * dsq), 6)
            ) < 1e-12
            # downside variance never exceeds total variance around 0:
            # n*dsq <= n*q, so |sortino| >= |sharpe|-ish only holds vs
            # the UNCENTERED form; assert the exact inequality we own:
            assert dsq <= q


def test_omega_matches_replay_and_sign_counts(spark):
    rows = (
        REGISTRY["evt_omega_ratio"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    chg = _daily_changes()
    for r in rows:
        rs = chg[r["event_type"]]
        gain = sum(x for x in rs if x > 0)
        loss = sum(-x for x in rs if x < 0)
        gd = sum(1 for x in rs if x > 0)
        ld = sum(1 for x in rs if x < 0)
        assert (
            int(r["gain_sum"]),
            int(r["loss_sum"]),
            int(r["gain_days"]),
            int(r["loss_days"]),
        ) == (gain, loss, gd, ld)
        # identity: gain_sum - loss_sum == sum of all changes
        assert gain - loss == sum(rs)
        # day counts partition the non-zero days
        assert gd + ld == sum(1 for x in rs if x != 0)
        if loss > 0:
            assert abs(r["omega"] - round(gain / loss, 6)) < 1e-12
