"""Property gates for the round-12e batch: Page's L replay with exact
midranks and Hjorth parameters replayed from numpy moments."""

from __future__ import annotations

import math

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _daily(ev):
    ev = ev[ev["value"].notna()].copy()
    ev["value_c"] = (ev["value"] * 100).round().astype("int64")
    ev["day"] = ev["ts"].dt.date
    return ev


def test_page_trend_matches_replay(spark):
    rows = (
        REGISTRY["evt_page_trend"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    ev = _daily(pd.read_parquet(f"{SF}/events.parquet"))
    ev["j"] = ev["ts"].dt.hour // 6 + 1
    for r in rows:
        g = ev[ev["event_type"] == r["event_type"]]
        days = sorted(set(g["day"]))
        l2 = 0
        for day in days:
            tot = {
                j: int(
                    g[(g["day"] == day) & (g["j"] == j)]["value_c"].sum()
                )
                for j in (1, 2, 3, 4)
            }
            for j in (1, 2, 3, 4):
                less = sum(1 for o in (1, 2, 3, 4) if tot[o] < tot[j])
                eq = sum(
                    1 for o in (1, 2, 3, 4) if o != j and tot[o] == tot[j]
                )
                l2 += j * (2 * less + eq + 2)
        assert int(r["n_days"]) == len(days)
        assert int(r["l2"]) == l2
        assert int(r["e_l2"]) == 50 * len(days)
        assert int(r["l2_centered"]) == l2 - 50 * len(days)
        # per-block doubled ranks always sum to 2(1+2+3+4)=20, so L2 is
        # bounded by the extreme orderings: n*(1*2+2*4+3*6+4*8) etc.
        n = len(days)
        lo = n * (1 * 8 + 2 * 6 + 3 * 4 + 4 * 2)  # perfectly decreasing
        hi = n * (1 * 2 + 2 * 4 + 3 * 6 + 4 * 8)  # perfectly increasing
        assert lo <= l2 <= hi


def test_hjorth_matches_replay(spark):
    rows = (
        REGISTRY["evt_hjorth_parameters"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    ev = _daily(pd.read_parquet(f"{SF}/events.parquet"))
    d = (
        ev.groupby(["event_type", "day"])["value_c"]
        .sum()
        .reset_index(name="x")
        .sort_values(["event_type", "day"])
    )
    for r in rows:
        xs = [int(x) for x in d[d["event_type"] == r["event_type"]]["x"]]
        d1 = [b - a for a, b in zip(xs, xs[1:])]
        d2 = [b - a for a, b in zip(d1, d1[1:])]

        def vnum(v):
            return len(v) * sum(x * x for x in v) - sum(v) ** 2

        assert int(r["n"]) == len(xs)
        assert int(r["v_num"]) == vnum(xs)
        assert int(r["m"]) == len(d1)
        assert int(r["vd_num"]) == vnum(d1)
        assert int(r["l"]) == len(d2)
        assert int(r["vdd_num"]) == vnum(d2)
        if vnum(xs) > 0 and d1:
            mob = math.sqrt(
                (vnum(d1) * len(xs) ** 2) / (vnum(xs) * len(d1) ** 2)
            )
            assert abs(r["mobility"] - round(mob, 6)) < 1e-9
            if vnum(d1) > 0 and d2:
                mob_d = math.sqrt(
                    (vnum(d2) * len(d1) ** 2) / (vnum(d1) * len(d2) ** 2)
                )
                assert abs(r["complexity"] - round(mob_d / mob, 6)) < 1e-9
                # differencing amplifies relative roughness on these
                # noisy series: complexity is positive and finite
                assert r["complexity"] > 0
