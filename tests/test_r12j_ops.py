"""Property gates for the round-12j batch: variogram/madogram replay
with the monotone-pair-count identity and a Theil U2 replay."""

from __future__ import annotations

import math

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _daily():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["value_c"] = (ev["value"] * 100).round().astype("int64")
    ev["day"] = ev["ts"].dt.date
    return (
        ev.groupby(["event_type", "day"])["value_c"]
        .sum()
        .reset_index(name="x")
        .sort_values(["event_type", "day"])
    )


def test_variogram_matches_replay(spark):
    rows = (
        REGISTRY["evt_variogram_lags"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    d = _daily()
    got = {(r["event_type"], int(r["lag_h"])): r for r in rows}
    for t_, g in d.groupby("event_type"):
        xs = [int(x) for x in g["x"]]
        n = len(xs)
        for h in range(1, 6):
            pairs = [(xs[i], xs[i + h]) for i in range(n - h)]
            if not pairs:
                continue
            r = got[(t_, h)]
            assert int(r["n_pairs"]) == len(pairs) == n - h
            assert int(r["madogram_sum"]) == sum(
                abs(b - a) for a, b in pairs
            )
            sq = sum((b - a) ** 2 for a, b in pairs)
            assert int(r["variogram_sum"]) == sq
            assert int(r["semivariance_floor"]) == sq // (2 * len(pairs))
        # madogram <= sqrt(n_pairs * variogram) (Cauchy-Schwarz)
        for h in range(1, 6):
            r = got.get((t_, h))
            if r:
                assert int(r["madogram_sum"]) ** 2 <= int(
                    r["n_pairs"]
                ) * int(r["variogram_sum"])


def test_theil_u2_matches_replay(spark):
    rows = (
        REGISTRY["evt_theil_u2_naive"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    d = _daily()
    for r in rows:
        xs = [int(x) for x in d[d["event_type"] == r["event_type"]]["x"]]
        seas = sum(
            (xs[i] - xs[i - 7]) ** 2 for i in range(7, len(xs))
        )
        rw = sum((xs[i] - xs[i - 1]) ** 2 for i in range(7, len(xs)))
        assert int(r["n"]) == max(0, len(xs) - 7)
        assert int(r["seasonal_sq_sum"]) == seas
        assert int(r["rw_sq_sum"]) == rw
        if rw > 0:
            assert abs(
                r["theil_u2"] - round(math.sqrt(seas / rw), 6)
            ) < 1e-9
            assert int(r["weekly_structure"]) == int(seas < rw)
