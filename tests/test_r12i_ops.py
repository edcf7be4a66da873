"""Property gates for the round-12i batch: Ulcer index replay and an
Aroon replay against a naive windowed argmax."""

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


def test_ulcer_matches_replay(spark):
    rows = (
        REGISTRY["evt_ulcer_index"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    d = _daily()
    for r in rows:
        xs = [int(x) for x in d[d["event_type"] == r["event_type"]]["x"]]
        cum = 0
        peak = None
        dd = []
        for x in xs:
            cum += x
            peak = cum if peak is None else max(peak, cum)
            dd.append(round(1_000_000 * (cum - peak) / peak))
        assert int(r["n_days"]) == len(dd)
        assert int(r["dd_sq_sum"]) == sum(v * v for v in dd)
        assert int(r["days_under_water"]) == sum(1 for v in dd if v < 0)
        want = round(
            math.sqrt(sum(v * v for v in dd) / len(dd)) / 10000, 6
        )
        assert abs(r["ulcer_pct"] - want) < 1e-9
        # drawdowns are never positive; the index is a percentage >= 0
        assert all(v <= 0 for v in dd) and r["ulcer_pct"] >= 0


def test_aroon_matches_naive_argmax(spark):
    rows = (
        REGISTRY["evt_aroon"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    d = _daily()
    for r in rows:
        xs = [int(x) for x in d[d["event_type"] == r["event_type"]]["x"]]
        n = len(xs)
        n_window_highs = 0
        for t in range(1, n + 1):  # 1-based day index
            lo = max(0, t - 14)
            win = xs[lo:t]
            hi_val = max(win)
            # latest day holding the max (the pack's tie-break)
            hi_t = max(
                i + 1 for i in range(lo, t) if xs[i] == hi_val
            )
            since_high = t - hi_t
            if since_high == 0:
                n_window_highs += 1
            if t == n:
                lo_val = min(win)
                lo_t = max(
                    i + 1 for i in range(lo, t) if xs[i] == lo_val
                )
                assert int(r["last_since_high"]) == since_high
                assert int(r["last_since_low"]) == t - lo_t
                assert abs(
                    r["aroon_up"] - round(100.0 * (14 - since_high) / 14, 6)
                ) < 1e-9
                assert abs(
                    r["aroon_down"] - round(100.0 * (14 - (t - lo_t)) / 14, 6)
                ) < 1e-9
        assert int(r["n_window_highs"]) == n_window_highs
        assert int(r["n_days"]) == n
        # bounds: 0 <= since <= 13 -> aroon in [100/14*1, 100]
        assert 0 <= int(r["last_since_high"]) <= 13
        assert 0 <= int(r["last_since_low"]) <= 13
